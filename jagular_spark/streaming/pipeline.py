"""Structured Streaming variant of the dataflow (SURVEY §2.9 / M8).

The reference's block-at-a-time pipeline with carried state
(``jagular/utils.py:443-446``) is exactly Structured Streaming's shape:
event-time = sample ts, gaps-and-islands → ``session_window``, dead-time
censor → ``applyInPandasWithState`` (the carried ``last_kept`` edge is
the GroupState), late/out-of-order packets → watermark.

Batch remains the primary surface; these operators exist so the same
semantics run incrementally. Parity with the batch operators is pinned
by tests (single ``availableNow`` pass ≡ batch result).

Scale notes: session_window and the stateful censor shuffle once on the
group key; state size is O(1) per (channel) for the censor and O(open
sessions) for sessionization — both bounded by the watermark, which
evicts state for event times older than the lateness bound.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gaps-and-islands segmentation as a streaming session window
    (batch twin: workloads.events_sessionize): a session closes once the
    watermark passes its last event + gap. Returns
    ``(key, session_start, session_end, n_events, last_event)``."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max(ts_col).alias("last_event"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "last_event",
        )
    )


def stream_crossings(
    samples: DataFrame,
    threshold: float,
    value_col: str = "value",
    polarity: str = "pos",
) -> DataFrame:
    """Stateless part of detection: the threshold predicate (W1's first
    half). The debounce/censor stages are stateful — see stream_censor.
    Rejects unknown polarities like the batch twin (operators/spikes
    ``crossings`` raises ValueError) — the old silent fall-through to
    "both" turned a typo into wrong both-polarity output."""
    if polarity == "pos":
        return samples.where(F.col(value_col) > threshold)
    if polarity == "neg":
        return samples.where(F.col(value_col) < -threshold)
    if polarity == "both":
        return samples.where(F.abs(F.col(value_col)) > threshold)
    raise ValueError(f"polarity must be 'pos', 'neg' or 'both', got {polarity!r}")


def stream_censor(
    crossings: DataFrame,
    width: int = 30,
    ts_col: str = "ts",
    partition_cols: Sequence[str] = ("channel_id",),
    max_out_of_order: int = 0,
    event_time_col: str | None = None,
) -> DataFrame:
    """Dead-time suppression with carried state (batch twin:
    operators.spikes.censor): keep the first crossing per group, drop
    later ones within ``width`` samples of the last KEPT edge. The
    reference's sequential loop state (``spikes.py:334-336``) becomes a
    one-value GroupState (``last_kept``), surviving across micro-batches.

    Rows are processed in ts order *within* each micro-batch; an edge
    arriving in a later batch with an earlier ts than an already-kept
    edge cannot retract it (document-level caveat shared by any
    at-least-once streaming dead-time filter).

    Late-data policy: Spark does NOT watermark-filter the input of
    arbitrary stateful ops (``applyInPandasWithState``) — that is the
    operator's job. Pass ``event_time_col`` (a timestamp column on a
    stream that carries ``withWatermark``) and the kernel drops rows
    whose event time is behind the current watermark
    (``GroupState.getCurrentWatermarkMs``) before censoring — proven
    across micro-batches in tests/test_streaming.py. Without it,
    every row reaches the censor regardless of lateness.
    """
    keys = list(partition_cols)
    in_cols = [*keys, ts_col] + ([event_time_col] if event_time_col else [])
    fields = dict(crossings.select(*in_cols).dtypes)
    out_schema = ", ".join(f"{k} {fields[k]}" for k in keys) + f", {ts_col} {fields[ts_col]}"
    # GroupState.getCurrentWatermarkMs is UTC epoch ms, but Arrow hands
    # pandas kernels SESSION-LOCAL tz-naive timestamps, so the event
    # time is converted to epoch ms IN THE PLAN (unix_millis) rather
    # than in the kernel: plan expressions resolve the session zone at
    # execution time, so a timezone change between graph build and
    # query start — or a different zone on checkpoint restart — cannot
    # shift the lateness cutoff (r17 advice; the previous kernel-side
    # localize captured the zone at build time). The derived column
    # rides NEXT TO event_time_col (which stays projected, keeping the
    # stream's watermark tag) and never reaches the output schema.
    et_ms_col = "__jag_et_ms__"

    def kernel(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_kept = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        if event_time_col is not None:
            wm_ms = state.getCurrentWatermarkMs()
            if wm_ms > 0:
                pdf = pdf[pdf[et_ms_col].to_numpy() >= wm_ms]
        keep = []
        for i, t in enumerate(pdf[ts_col].to_numpy()):
            if last_kept is None or t - last_kept > width:
                keep.append(i)
                last_kept = int(t)
        if last_kept is not None:
            state.update((last_kept,))
        out = pdf.iloc[keep][[c for c in pdf.columns if c in set(keys) | {ts_col}]]
        yield out

    selected = crossings.select(*in_cols)
    if event_time_col is not None:
        selected = selected.withColumn(
            et_ms_col, F.unix_millis(F.col(event_time_col).cast("timestamp"))
        )
    return (
        selected
        .groupBy(*keys)
        .applyInPandasWithState(kernel, out_schema, "last_kept long", "append", "NoTimeout")
    )


def stream_dedup(
    samples: DataFrame,
    watermark: str,
    event_time_col: str,
    key_cols: Sequence[str] = ("channel_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """I1's streaming twin: keep the first-arriving row per
    (keys, ts); duplicate-detection state is evicted once the watermark
    passes (bounded memory — the batch operator's full-history window
    becomes O(in-flight ts) state). Built on Structured Streaming's
    native ``dropDuplicatesWithinWatermark`` — the primitive built for
    exactly this. Plain ``dropDuplicates`` (the pre-r17 form) only
    evicts state when the EVENT-TIME column is part of the dedup keys;
    with ``keys + [ts]`` it silently kept one state row per distinct
    key ever seen, growing without bound — the bounded-memory contract
    this docstring advertises was false. WithinWatermark dedups on the
    same (keys, ts) subset and evicts each entry once the watermark
    passes its event time (duplicates are only guaranteed dropped when
    they arrive within the watermark delay of the first occurrence —
    the same in-flight horizon every watermarked op in this module
    assumes; state-eviction pinned in tests/test_streaming.py).

    Semantics caveat vs batch ``dedup_keep_first``: the batch operator
    breaks ties by explicit physical order (file_idx, packet_idx);
    streaming keeps the first *arrival*. For in-order replay (the
    reference's file-by-file iteration) the two agree — pinned by the
    parity test."""
    keys = list(key_cols)
    return samples.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        keys + [ts_col]
    )


def stream_interpolate(
    samples: DataFrame,
    max_gap_size: int,
    ts_col: str = "ts",
    value_cols: Sequence[str] = ("value",),
    partition_cols: Sequence[str] = ("channel_id",),
    step: int = 1,
) -> DataFrame:
    """Linear gap interpolation with carried state (batch twin:
    operators.interpolate.interpolate_gaps; reference semantics
    ``jagular/utils.py:459-528``): interior gaps of 1..max_gap_size
    missing samples are filled by linear interpolation between the two
    boundary samples, truncation-cast back to the input type.

    The reference's cross-block carry (``prev_ts/prev_channel_data``,
    ``utils.py:443-446, 461-477``) IS this operator's GroupState: the
    last seen (ts, values) per key survives across micro-batches, so a
    gap straddling a batch boundary interpolates exactly like the
    in-core chain. State is O(1) per key (one boundary row).

    Rows must arrive in ts order across batches per key (same contract
    as the reference's sequential block iterator); disorder within one
    micro-batch is sorted away.
    """
    keys = list(partition_cols)
    vals = list(value_cols)
    fields = dict(samples.select(*keys, ts_col, *vals).dtypes)
    out_schema = ", ".join(f"{c} {fields[c]}" for c in keys + [ts_col] + vals)
    state_schema = "last_ts long, " + ", ".join(f"v{i} double" for i in range(len(vals)))

    def kernel(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        if len(ts) == 0:
            return
        vs = {c: pdf[c].to_numpy(dtype=np.float64) for c in vals}
        if state.exists:
            # carried boundary row: prepended for gap detection only —
            # it was already emitted by its own micro-batch
            st = state.get
            ts = np.concatenate(([int(st[0])], ts))
            for i, c in enumerate(vals):
                vs[c] = np.concatenate(([float(st[i + 1])], vs[c]))
        state.update((int(ts[-1]), *(float(vs[c][-1]) for c in vals)))

        n_missing = np.diff(ts) // step - 1
        gap_idx = np.flatnonzero((n_missing >= 1) & (n_missing <= max_gap_size))
        new_rows: dict[str, list] = {c: [] for c in keys + [ts_col] + vals}
        for g in gap_idx:
            # exactly n_missing grid points, like the batch twin's
            # sequence(left+step, right-step, step) — arange(..., ts[g+1],
            # step) emitted EXTRA rows inside (right-step, right) when the
            # gap is not a multiple of step (r17 parity fix, off-grid
            # pinned in tests/test_streaming.py)
            grid = ts[g] + step * np.arange(1, n_missing[g] + 1, dtype=np.int64)
            frac = (grid - ts[g]) / (ts[g + 1] - ts[g])
            new_rows[ts_col].extend(grid.tolist())
            for c in vals:
                interp = vs[c][g] + (vs[c][g + 1] - vs[c][g]) * frac
                new_rows[c].extend(interp.tolist())
            for kc, kv in zip(keys, key):
                new_rows[kc].extend([kv] * len(grid))
        out = pdf[keys + [ts_col] + vals]
        if new_rows[ts_col]:
            synth = pd.DataFrame(new_rows)
            for c in vals:
                if fields[c] in ("tinyint", "smallint", "int", "bigint"):
                    # truncation toward zero like numpy astype (utils.py:519)
                    synth[c] = np.trunc(synth[c].to_numpy()).astype(np.int64)
            out = pd.concat([out, synth[keys + [ts_col] + vals]], ignore_index=True)
        yield out

    return (
        samples.select(*keys, ts_col, *vals)
        .groupBy(*keys)
        .applyInPandasWithState(kernel, out_schema, state_schema, "append", "NoTimeout")
    )


def stream_curation(
    docs: DataFrame,
    event_time_col: str,
    watermark: str = "10 minutes",
    quality_floor: float = 0.6,
    lang: str = "en",
    sample_fraction: float = 0.5,
    content_keyed: bool = False,
) -> DataFrame:
    """The curation funnel, incremental (batch twin:
    workloads.docs_curation_funnel minus its near-dup stage): quality
    score + language ID (stateless row-local expressions), exact
    content dedup (``dropDuplicatesWithinWatermark`` on the md5 —
    state is O(in-flight hashes) and evicted past the watermark; plain
    ``dropDuplicates`` on a subset WITHOUT the event-time column never
    evicts, so the pre-r17 form accumulated every hash in stream
    history), and the deterministic md5 hash-sample (stateless).

    The near-dup connected-components stage is deliberately absent: a
    component is a GLOBAL property of the pair graph (a later doc can
    join two earlier clusters), so it cannot be emitted incrementally
    under append semantics — at scale it runs as a periodic batch
    compaction over the streamed survivor table, which is exactly how
    the batch operator composes here.

    ``content_keyed=True`` emits ``(content_hash, quality_score)`` with
    the hash-sample keyed on the content hash instead of ``doc_id``:
    every emitted column is then a pure function of the TEXT, so the
    output is identical whichever duplicate-text arrival the streaming
    dedup happens to keep first — the deterministic form an exact-SQL
    oracle can certify (r18; ``dropDuplicatesWithinWatermark`` keeps
    first ARRIVAL, and arrival order within a micro-batch is not
    deterministic, so doc_id-keyed output is only reproducible on a
    duplicate-free corpus). Default False keeps the per-document
    (doc_id, quality_score) shape.
    """
    from jagular_spark.operators.sampling import hash_bucket
    from jagular_spark.operators.text import language_id, quality_score_col

    scored = language_id(
        docs.withColumn("quality_score", quality_score_col("text")),
        keep=("text", "quality_score", event_time_col),
    )
    s1 = scored.where(
        (F.col("quality_score") >= F.lit(quality_floor)) & (F.col("pred_lang") == lang)
    ).select("doc_id", "text", "quality_score", event_time_col)
    s2 = (
        s1.withColumn("__h__", F.md5(F.col("text").cast("binary")))
        .withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["__h__"])
    )
    thr = int(sample_fraction * (1 << 32))
    if content_keyed:
        return s2.where(hash_bucket("__h__") < F.lit(thr)).select(
            F.col("__h__").alias("content_hash"), "quality_score"
        )
    return s2.where(hash_bucket("doc_id") < F.lit(thr)).select(
        "doc_id", "quality_score"
    )


def stream_lsh_candidate_pairs(
    docs: DataFrame,
    n_buckets: int = 256,
    horizon_ms: int | None = 600_000,
    max_members: int | None = None,
) -> DataFrame:
    """Incremental MinHash-LSH candidate generation (batch twin:
    operators.similarity.lsh_candidate_pairs): per arriving doc the
    row-local signature (no shuffle) bands into 4 bucket keys; each
    (band, key) bucket keeps its member ids in state — a new arrival
    emits one candidate pair against every EARLIER member of the
    bucket, then joins the state. Emitted pairs are (band, key,
    id_a < id_b); a pair colliding in several bands is emitted once per
    band (the batch operator's n_bands count is the same multiset).

    Scale shape (r9, same rework as stream_dup_kgram_marks): grouping
    keys are ``xxhash64(band, key) % n_buckets`` — the Python stateful
    kernel runs ``n_buckets`` times per micro-batch instead of once
    per distinct (band, key) (~4 × corpus size), and the per-(band,
    key) pair loops touch only that bucket's members (near-dup
    clusters — small by construction). State is flat membership rows
    ``(band, key, member id, last_seen)`` where last_seen is the
    BUCKET's last activity; whole buckets idle for longer than
    ``horizon_ms`` are pruned when state loads (the dedup window: a
    bucket untouched for a horizon no longer generates pairs against
    its ancient members — it changes recall against old history, not
    mechanics), so state holds one horizon-window of bucket
    membership, not the stream's history. ``horizon_ms=None`` disables pruning (bounded replays).
    Within one micro-batch, arrivals are processed in id order (the
    only deterministic order a replay has); an availableNow replay is
    one batch, so its output is batch-identical regardless of the
    horizon.

    ``max_members`` is the hot-bucket guard (batch twin:
    lsh_candidate_pairs' cap): a (band, key) already holding
    ``max_members`` ids FREEZES — later arrivals emit no pairs against
    it and are not appended, so per-bucket state and pair fanout are
    both hard-bounded even when a duplicate mega-cluster grows with
    the stream (the r12 scale probe measured a 9.4x step on 4x data
    without it). Streaming semantics differ from the batch cap by
    construction: the batch drops an oversized bucket RETROACTIVELY,
    which a stream that already emitted its early pairs cannot — the
    frozen-prefix rule is the causal equivalent. Default None keeps
    exact batch parity (the oracle-matched twin)."""
    from jagular_spark.operators.similarity import (
        _BAND_SHIFT,
        LSH_BANDS,
        minhash_signature_local,
    )

    sig = minhash_signature_local(docs)
    keys = F.array(
        *[
            F.col(f"m{2 * b}") * F.lit(_BAND_SHIFT) + F.col(f"m{2 * b + 1}")
            for b in range(LSH_BANDS)
        ]
    )
    bands = sig.select(
        F.col("doc_id").alias("id"), F.posexplode(keys).alias("band", "key")
    ).withColumn(
        "b", F.pmod(F.xxhash64("band", "key"), F.lit(n_buckets)).cast("int")
    )

    def kernel(key, pdfs, state: GroupState):
        now = state.getCurrentProcessingTimeMs()
        cut = now - horizon_ms if horizon_ms is not None else None
        members: dict[tuple[int, int], list[int]] = {}
        last: dict[tuple[int, int], int] = {}
        if state.exists:
            mb, mk, mid, mls = state.get
            for i in range(len(mb)):
                if cut is not None and mls[i] <= cut:
                    continue
                bk = (mb[i], mk[i])
                members.setdefault(bk, []).append(mid[i])
                last[bk] = max(last.get(bk, 0), mls[i])
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
            pdf = pdf.sort_values("id", kind="mergesort")
            out_band: list[int] = []
            out_key: list[int] = []
            out_a: list[int] = []
            out_b: list[int] = []
            for band, bkey, new_id in zip(
                pdf["band"].tolist(), pdf["key"].tolist(), pdf["id"].tolist()
            ):
                bk = (int(band), int(bkey))
                seen = members.setdefault(bk, [])
                if max_members is not None and len(seen) >= max_members:
                    # frozen hot bucket: no pairs, no append — but it is
                    # ACTIVE, so refresh last_seen (r17: without this, a
                    # continuously-hot bucket was horizon-pruned as idle,
                    # wiping membership and re-emitting the pairs the
                    # freeze exists to suppress, once per horizon)
                    last[bk] = now
                    continue
                for old in seen:
                    lo, hi = (old, new_id) if old < new_id else (new_id, old)
                    out_band.append(bk[0])
                    out_key.append(bk[1])
                    out_a.append(lo)
                    out_b.append(hi)
                seen.append(int(new_id))
                last[bk] = now
            if out_a:
                yield pd.DataFrame(
                    {
                        "band": out_band,
                        "key": out_key,
                        "id_a": out_a,
                        "id_b": out_b,
                    }
                )
        if members:
            mb2: list[int] = []
            mk2: list[int] = []
            mid2: list[int] = []
            mls2: list[int] = []
            for bk, ids in members.items():
                for i in ids:
                    mb2.append(bk[0])
                    mk2.append(bk[1])
                    mid2.append(i)
                    mls2.append(last[bk])
            state.update((mb2, mk2, mid2, mls2))
        elif state.exists:
            state.remove()

    return bands.groupBy("b").applyInPandasWithState(
        kernel,
        "band int, key long, id_a long, id_b long",
        "mb array<int>, mk array<long>, mid array<long>, mls array<long>",
        "append",
        "NoTimeout",
    )


def stream_dup_kgram_marks(
    docs: DataFrame,
    k: int = 8,
    n_buckets: int = 256,
    horizon_ms: int | None = 600_000,
) -> DataFrame:
    """Incremental duplicated-k-gram detection (batch twin:
    operators.text.repeated_kgram_spans' dup-mark stage): per arriving
    doc the row-local window hashes explode (no shuffle before the
    stateful groupBy); a hash's FIRST occurrence is buffered, the
    second arrival emits both (the retroactive mark), every later one
    emits immediately — so the emitted (doc_id, pos) multiset equals
    the batch operator's duplicated-window marks. The span merge
    (gaps-and-islands per doc) runs on the sink table, a pure batch
    aggregate.

    Scale shape (r9 rework of the r8 per-hash-group version, which was
    the worst bench query at 17.2 s sf0.1 and carried NoTimeout state
    per distinct corpus hash — trillions of rows at 100 TB):

    - **Bucketed state, not per-hash groups.** Grouping keys are
      ``xxhash64(h) % n_buckets``, so the Python stateful kernel runs
      ``n_buckets`` times per micro-batch instead of once per distinct
      hash (~O(corpus tokens) calls), and the per-bucket batch is
      processed with vectorized pandas masks — the emission set for a
      batch is {arrivals whose hash is known-dup, buffered, or occurs
      ≥2× in the batch} plus the retroactive buffered firsts, which
      needs no per-row Python loop. (A pre-shuffle per-hash aggregation
      is NOT available here: Structured Streaming forbids a streaming
      aggregate upstream of applyInPandasWithState, so row volume into
      the shuffle is unchanged — the win is group-call volume.)
    - **Dedup horizon.** ``horizon_ms`` bounds state: entries not
      touched within the horizon are pruned when the bucket's state is
      LOADED (per-entry last-seen, before any arrival is matched) — so
      state holds only hashes seen within the horizon, the standard
      streaming dedup contract (duplicates farther apart than the
      horizon are treated as fresh; sizing the horizon IS sizing the
      state). A single-occurrence (buffered) hash is exactly as
      evictable as an emitted one. Eviction piggy-backs on bucket
      invocations rather than engine timeouts, deliberately: the
      bucket count is fixed and small, so live traffic touches every
      bucket each micro-batch and pruning is continuous, while a
      ProcessingTimeTimeout would force an availableNow replay to keep
      scheduling empty drain batches until every registered timeout
      fires (measured: 30+ extra epochs on a one-file replay). A
      fully-idle stream leaves at most one horizon-window of entries
      behind, reclaimed on the next arrival. ``horizon_ms=None``
      disables pruning (exact, unbounded — only for bounded replays).
      An availableNow replay processes everything in one micro-batch,
      so no horizon can elapse mid-run and the output is
      batch-identical regardless of the setting.

    Full-string md5 hashes ride into state (no 64-bit truncation — a
    truncation collision would merge two distinct windows and break the
    batch-oracle hash match)."""
    from jagular_spark.operators.text import window_hash_expr

    wins = docs.select(
        F.col("doc_id"),
        F.posexplode(F.expr(window_hash_expr("text", k))).alias("pos", "h"),
    ).withColumn("b", F.pmod(F.xxhash64("h"), F.lit(n_buckets)).cast("int"))

    def kernel(key, pdfs, state: GroupState):
        now = state.getCurrentProcessingTimeMs()
        # state: parallel arrays; emitted entries carry (-1, -1) stubs.
        # Horizon pruning happens at LOAD, before any arrival is
        # matched: an entry unseen for longer than the horizon must not
        # retro-emit or insta-mark, however late the bucket's next
        # invocation lands.
        cut = now - horizon_ms if horizon_ms is not None else None
        buf: dict[str, tuple[int, int, int]] = {}  # h -> (doc, pos, last_seen)
        known: dict[str, int] = {}  # h -> last_seen
        if state.exists:
            hs, bd, bp, em, ls = state.get
            for i, h in enumerate(hs):
                if cut is not None and ls[i] <= cut:
                    continue
                if em[i]:
                    known[h] = ls[i]
                else:
                    buf[h] = (bd[i], bp[i], ls[i])
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
            # vectorized emission set: arrivals whose hash is known-dup,
            # buffered, or occurs >= 2x in this batch (no per-row loop)
            cnt = pdf["h"].value_counts()
            known_set = set(known)
            buf_set = set(buf)
            hser = pdf["h"]
            dup_mask = (
                hser.isin(known_set) | hser.isin(buf_set) | hser.map(cnt).ge(2)
            )
            emit = pdf.loc[dup_mask, ["doc_id", "pos"]]
            if len(emit):
                yield emit
            batch_hashes = set(cnt.index)
            # retroactive firsts: buffered hashes that arrived again
            touched = batch_hashes & buf_set
            if touched:
                yield pd.DataFrame(
                    {
                        "doc_id": [buf[h][0] for h in touched],
                        "pos": [buf[h][1] for h in touched],
                    }
                )
                for h in touched:
                    del buf[h]
                    known[h] = now
            for h in batch_hashes & known_set:
                known[h] = now
            # remaining batch hashes are new: singletons buffer their one
            # row; >= 2x hashes (already emitted above) become known
            new_single = pdf.loc[~dup_mask]
            buf.update(
                zip(
                    new_single["h"].tolist(),
                    zip(
                        new_single["doc_id"].tolist(),
                        new_single["pos"].tolist(),
                        itertools.repeat(now),
                    ),
                )
            )
            known.update(
                dict.fromkeys(batch_hashes - known.keys() - buf.keys(), now)
            )
        if buf or known:
            hs = list(buf) + list(known)
            state.update(
                (
                    hs,
                    [buf[h][0] for h in buf] + [-1] * len(known),
                    [buf[h][1] for h in buf] + [-1] * len(known),
                    [False] * len(buf) + [True] * len(known),
                    [buf[h][2] for h in buf] + list(known.values()),
                )
            )
        elif state.exists:
            state.remove()

    return wins.groupBy("b").applyInPandasWithState(
        kernel,
        "doc_id long, pos long",
        "hs array<string>, bd array<long>, bp array<long>, "
        "em array<boolean>, ls array<long>",
        "append",
        "NoTimeout",
    )


def stream_fluency_score(docs: DataFrame, model: DataFrame) -> DataFrame:
    """Frozen-model LM quality scoring on a document stream: the bigram
    model is fit offline (operators.text.bigram_model over the training
    corpus — the CCNet shape: the LM never updates while serving) and
    arriving docs are scored incrementally. The explode is row-local,
    the model join is STREAM-STATIC (stateless — no watermark needed for
    it), and the only stateful piece is the per-doc aggregate. The
    aggregate carries no watermark, so run the sink in ``update`` or
    ``complete`` mode (``append`` requires a watermarked aggregation
    and Spark rejects it here); each doc's bigrams arrive in one
    micro-batch, so every emitted row is already final.
    Bit-identical to the batch ``bigram_fluency`` when ``model`` is fit
    on the same corpus (parity test in tests/test_streaming.py)."""
    from jagular_spark.operators.text import bigram_explode, score_bigrams

    return score_bigrams(bigram_explode(docs), F.broadcast(model))


def stream_band_energy(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window signal energy per channel — the watermarked
    window-aggregate shape (the one streaming form the session-window /
    GroupState ops don't cover): each (channel, window) emits its exact
    integer energy once the watermark passes the window end. Late
    samples inside the watermark still land in their window; beyond it
    they're dropped — the documented trade of bounded state.
    Quanta match events_band_power (q = floor(value·10³), Σq² BIGINT).
    ``(key, win_start, win_end, n, power_q)``."""
    q = F.expr(f"CAST(floor({value_col} * 1000.0) AS BIGINT)")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(q * q).cast("long").alias("power_q"),
        )
        .select(
            key_col,
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n",
            "power_q",
        )
    )


def stream_interval_enrich(
    left: DataFrame,
    right: DataFrame,
    tolerance: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join — the windowed
    enrichment primitive (as-of's streaming sibling: every left event
    pairs with ALL right events in its trailing tolerance window;
    exact as-of needs a global argmax that append streams can't emit
    incrementally, so the interval form is the honest streaming
    contract). Both sides carry watermarks and the join condition
    bounds right's event time to [left − tolerance, left], which lets
    the state store evict rows older than watermark + tolerance —
    state stays O(in-flight window), not O(stream).
    Returns left's columns + ``r_ts`` / ``r_value``.
    Bit-identical to the batch range join (parity test)."""
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = (
        right.select(
            F.col(key_col).alias("r_key"),
            F.col(ts_col).alias("r_ts"),
            F.col("value").alias("r_value"),
        )
        .withWatermark("r_ts", watermark)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{key_col}") == F.col("r.r_key"))
        & (F.col("r.r_ts") >= F.col(f"l.{ts_col}") - F.expr(f"INTERVAL {tolerance}"))
        & (F.col("r.r_ts") <= F.col(f"l.{ts_col}"))
    )
    return l.join(r, cond, "inner").drop("r_key")


def stream_dsir_scores(
    docs: DataFrame,
    delta: list[int],
    mt: int,
    mr: int,
    n_buckets: int = 4096,
) -> DataFrame:
    """Frozen-model DSIR importance scoring on a document stream (the
    serving shape of targeted data selection: fit the hashed-ngram
    models offline on target + raw snapshots, then score every
    arriving crawl document incrementally). COMPLETELY stateless —
    the fitted delta table rides into the plan as a literal and
    scoring is a row-local projection (operators/selection.py
    score_with_deltas, shared with the batch operator), so there is no
    watermark, no state store, and ``append`` output mode works as-is.
    Bit-identical to the batch ``dsir_scores`` when the fit snapshot
    matches (parity pinned in tests/test_streaming.py; the driver
    query shares docs_dsir_scores' oracle verbatim)."""
    from jagular_spark.operators.selection import score_with_deltas

    return score_with_deltas(docs, delta, mt, mr, n_buckets=n_buckets)


def stream_bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frozen-tokenizer token accounting on a document stream: the BPE
    merges are fitted OFFLINE (operators/bpe.bpe_fit on the absolute
    hash-sample) and every arriving document's token count under that
    tokenizer is computed row-locally (literal replace chains — see
    operators/bpe.bpe_token_count_col). COMPLETELY stateless: no
    watermark, no state store, ``append`` mode works as-is, and the
    stream emits exactly the batch expression's values (parity pinned
    in tests/test_streaming.py)."""
    from jagular_spark.operators.bpe import bpe_token_count_col

    return docs.select(
        F.col(id_col),
        bpe_token_count_col(text_col, merges).alias("n_bpe_tokens"),
    )


def stream_token_budget_sample(
    docs: DataFrame,
    thresholds: dict[str, int],
    group_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Frozen-model token-budget mixture sampling on a document stream
    (the serving shape of mixture building: fit the per-stratum
    thresholds offline on the corpus snapshot, then admit/drop every
    arriving crawl document at ingest). COMPLETELY stateless — the
    thresholds ride into the plan as a literal CASE and membership is
    a row-local md5 filter (operators/sampling.apply_token_thresholds,
    shared with the batch operator), so there is no watermark, no
    state store, and ``append`` output mode works as-is. Bit-identical
    to the batch ``token_budget_sample`` when the fit snapshot matches
    (parity pinned in tests/test_streaming.py; the driver query shares
    docs_token_budget_sample's oracle verbatim)."""
    from jagular_spark.operators.sampling import apply_token_thresholds

    return apply_token_thresholds(
        docs, thresholds, group_col, key_col, text_col, salt
    )

def stream_training_shard_pack(
    docs: DataFrame,
    thresholds: dict[str, int],
    n_shards: int = 8,
    salt: str = "",
    group_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    admission_salt: str = "",
) -> DataFrame:
    """The TERMINAL composition's streaming twin (r15 verdict optional
    task): token-budget admission → deterministic shard assignment →
    per-shard 2048-token sequence packing, on a document stream. The
    admission and shard/order columns are the batch pipeline's frozen
    row-local md5 expressions (stateless); the only genuinely stateful
    step is the pack's running token offset, carried per shard through
    ``applyInPandasWithState`` — ONE long of state per shard, the
    bounded-state discipline every twin in this module follows.

    ``salt`` feeds the SHARD/ORDER hashes only; the token-budget
    ADMISSION membership is salted separately by ``admission_salt``
    (default ``""``, matching the batch composition's default — r16
    advice: the old signature implied one salt governed the whole
    operator, so a caller who salted admission batch-side got silent
    divergence here). Pass both to mirror a fully-salted batch
    pipeline. Within
    a micro-batch each shard's arrivals pack in the batch layout's
    deterministic (ord, id) order, and the offset carries across
    batches — under a one-pass availableNow drain this emits exactly
    the batch composition's per-document offsets, so the driver query
    shares docs_training_shards' DuckDB oracle VERBATIM (hash match,
    not rows-only). Emits ``(shard, doc_id, nt, off)`` per admitted
    document — the manifest rollup happens on the sink, where it is a
    plain bounded aggregate."""
    import pandas as pd

    from jagular_spark.operators.sampling import hash_bucket

    sampled = stream_token_budget_sample(
        docs, thresholds, group_col, key_col, text_col, salt=admission_salt,
    )
    sharded = sampled.select(
        F.col(key_col).alias("doc_id"),
        F.col("n_tokens"),
        F.pmod(hash_bucket(key_col, salt), F.lit(n_shards))
        .cast("long")
        .alias("shard"),
        hash_bucket(key_col, salt + "#pos").alias("__ord__"),
    )

    def kernel(key, pdfs, state):
        off = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # the batch layout's per-shard order: (ord, doc_id) — stable
        # sort so equal keys cannot reorder across pandas versions
        pdf = pdf.sort_values(["__ord__", "doc_id"], kind="mergesort")
        nts = pdf["n_tokens"].to_numpy()
        offs = off + nts.cumsum() - nts
        state.update((int(off + nts.sum()),))
        yield pd.DataFrame(
            {
                "shard": key[0],
                "doc_id": pdf["doc_id"].to_numpy(),
                "nt": nts,
                "off": offs,
            }
        )

    return sharded.groupBy("shard").applyInPandasWithState(
        kernel,
        "shard long, doc_id long, nt long, off long",
        "off long",
        "append",
        "NoTimeout",
    )
