"""Measured scaling curves for the headline operators.

SCALE.md argues the designs are O(corpus) by plan properties (pinned
in tests/test_plans.py); this probe MEASURES it across four axes:
text corpora at 1x/4x/16x the sf0.1 document count (5k -> 80k docs,
duplication structure scaling with the corpus), signal streams on the
channel axis (64 -> 1024 channels), cluster-structured embedding
corpora (4k -> 64k vectors, fixed-absolute-size quantizer fit — the
100 TB shape), and the stateful Structured-Streaming twins (20k ->
320k rows per availableNow drain). An operator whose time ratio
tracks the size ratio (within Spark's fixed per-job overhead) is
corpus-linear; a quadratic pair stage shows a 16x step between
adjacent sizes — which is exactly how the r12 run caught the uncapped
LSH hot-bucket blowup (pair volume 3.4k -> 396k across 16x docs) and
motivated lsh_candidate_pairs' max_members guard.

Since r14 four more measured axes close the r13 verdict's "argued
shapes get measured" gap: DSIR fit+score on the document axis (fixed
400-doc target; fit aggregates bounded at 4096 buckets, frozen-model
scoring zero-shuffle), quantizer-fit cost under ``fit_rows=2000`` vs
``fit_fraction=0.5`` on the vector axis (absolute budget must stay
flat where the fraction's sample grows with the corpus), Matryoshka
truncated-dimension recall on the vector axis, and MPEG-1
B-frame/half-pel encode on a fixed-payload media axis.

Usage: python tools/scale_probe.py [--sizes 5000,20000,80000]
                                   [--families dsir,fit_shapes,mrl,media]
Writes /tmp parquet only; prints one JSON line per operator.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from jagular_spark.session import get_spark, heap_ramp_warmup

WORDS = [f"w{i:03d}" for i in range(400)]



def _force(df) -> int:
    """Execute COMPLETELY and return the row count (r15 fidelity fix,
    same as bench.py force_full): ``.count()`` lets Catalyst prune
    every column that does not affect the row count — including
    aggregate-VALUE expressions (group counting needs only the keys),
    projected score/surgery columns, and whole unique-key left joins —
    so a probe timing ``count()`` can measure the scan instead of the
    operator. The noop sink materializes every column of every row
    JVM-side; the Observation rides the same job for the row count."""
    from pyspark.sql import Observation

    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
        "overwrite"
    ).format("noop").save()
    return int(obs.get["rows"])


def synth_docs(spark, n_docs: int, path: str) -> None:
    """Deterministic corpus with the duplication structure the dedup
    operators exist for: ~60-token docs from a 400-word vocabulary
    (hash-derived, partition-parallel — no driver-side generation);
    every 10th doc embeds one of 50 shared 12-token passages so
    substring dedup / minhash have real corpus-wide repeats whose
    FREQUENCY scales with the corpus, as near-dup density does in a
    real crawl."""
    if os.path.exists(path):
        return
    vocab = F.array(*[F.lit(w) for w in WORDS])
    passage_vocab = F.array(*[F.lit(f"p{i:02d}t{j:02d}") for i in range(50) for j in range(12)])
    base = spark.range(0, n_docs, 1, 32).select(F.col("id").alias("doc_id"))

    def elem(seed, i):
        return F.element_at(
            vocab, ((F.xxhash64(seed, i) % 400 + 400) % 400 + 1).cast("int")
        )

    # every doc_id%10==1 doc is a NEAR-DUP of doc_id-1 (same first 54
    # body tokens, own last 6). doc_id-1 is always a passage-carrying
    # doc (doc_id%10==0) whose full text is passage+body = 72 tokens,
    # so the realized shingle Jaccard vs its base is ~0.68 — above the
    # 0.5 probe threshold, and the LSH verify stage still sees a pair
    # volume that grows linearly with the corpus
    is_neardup = F.col("doc_id") % 10 == 1
    base_id = F.when(is_neardup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    body = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda i: F.when(is_neardup & (i >= 54), elem(F.col("doc_id"), i)).otherwise(
            elem(base_id, i)
        ),
    )
    passage = F.transform(
        F.sequence(F.lit(0), F.lit(11)),
        lambda j: F.element_at(
            passage_vocab,
            (((F.col("doc_id") / 10).cast("long") % 50) * 12 + j + 1).cast("int"),
        ),
    )
    text = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat_ws(" ", F.concat(passage, body)),
    ).otherwise(F.concat_ws(" ", body))
    base.select("doc_id", text.alias("text")).write.mode("overwrite").parquet(path)


def synth_samples(spark, n_channels: int, m: int, path: str) -> None:
    """Dense per-channel sample streams: sinusoid + hash noise, a
    spike bump every ~997 samples (so detection volume scales with
    the corpus), and a timestamp gap every 100 samples (so segment
    volume does too). Generated distributed — no driver-side data."""
    if os.path.exists(path):
        return
    total = n_channels * m
    base = spark.range(0, total, 1, 32).select(
        (F.col("id") / m).cast("int").alias("channel_id"),
        F.lit(0).cast("long").alias("segment_id"),
        (F.col("id") % m).alias("i"),
    )
    noise = ((F.xxhash64("channel_id", "i") % 1000 + 1000) % 1000) / 1000.0 * 0.2
    # 3-sample-wide bumps (~1 per 999 samples): the consecutive-crossing
    # rule (W1) needs >= 2 adjacent supra-threshold samples, so
    # single-sample impulses would never detect
    bump = (F.col("i") / 3).cast("long")
    spike = F.when(
        (F.xxhash64(bump, F.col("channel_id")) % 333 + 333) % 333 == 0, F.lit(4.0)
    ).otherwise(F.lit(0.0))
    value = F.sin(F.col("i") * (6.283185307 / 50.0)) * 0.5 + noise + spike
    ts = (F.col("i") + (F.col("i") / 100).cast("long") * 5).cast("long")
    base.select(
        "channel_id", "segment_id", ts.alias("ts"), value.alias("value")
    ).write.mode("overwrite").parquet(path)


def probe_events(spark, channel_sizes: list[int], m: int = 6250) -> list[dict]:
    import numpy as np  # noqa: F401 — filtering needs it transitively

    from jagular_spark.operators.filtering import filtfilt_segments
    from jagular_spark.operators.spikes import detect_spikes
    from jagular_spark.operators.timestamps import contiguous_segments
    from jagular_spark.workload_params import _BP_TAPS

    ops = {
        "filtfilt_segments": lambda d: filtfilt_segments(d, _BP_TAPS),
        "detect_spikes": lambda d: detect_spikes(
            d, multiplier=2.0, censor_width=5, patch_size=8, polarity="pos"
        ),
        "contiguous_segments": lambda d: contiguous_segments(
            d, partition_cols=["channel_id"], step=1.0
        ),
    }
    out = []
    for op_name, fn in ops.items():
        times = []
        for n in channel_sizes:
            path = f"/tmp/scale_probe_samples_{n}"
            synth_samples(spark, n, m, path)
            df = spark.read.parquet(path)
            _force(fn(df))  # warm
            best, rows = None, 0
            for _ in range(2):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                rows = _force(fn(df))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.append((n * m, round(best, 3), rows))
        rec = {"op": op_name, "points": times}
        for (n0, t0_, _), (n1, t1_, _) in zip(times, times[1:]):
            rec[f"time_ratio_{n1}v{n0}"] = round(t1_ / max(t0_, 1e-9), 2)
            rec[f"size_ratio_{n1}v{n0}"] = round(n1 / n0, 2)
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def synth_embeddings(spark, n_vecs: int, path: str) -> None:
    """Cluster-structured 64-dim float32 corpus, generated distributed
    (hash-derived, no driver-side data): 32 latent clusters whose
    centers are fixed ACROSS sizes, per-vector noise at ~0.8x the
    center scale so intra-cluster cosines straddle the 0.35 SemDeDup
    threshold, and every 10th vector a tight near-dup of its
    predecessor (tiny perturbation, cosine ~0.99) — so near-dup
    density, like a real crawl's, grows linearly with the corpus."""
    if os.path.exists(path):
        return
    base = spark.range(0, n_vecs, 1, 32).select(F.col("id").alias("vec_id"))
    is_neardup = F.col("vec_id") % 10 == 1
    src = F.when(is_neardup, F.col("vec_id") - 1).otherwise(F.col("vec_id"))
    cluster = F.pmod(F.xxhash64(src), F.lit(32))

    def unit(seed_a, seed_b, scale):
        return (
            (F.pmod(F.xxhash64(seed_a, seed_b), F.lit(2000)) - 1000) / 1000.0 * scale
        )

    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda g: (
            unit(cluster, g, 1.0)
            + unit(src, g + 64, 0.8)
            + F.when(is_neardup, unit(F.col("vec_id"), g + 128, 0.02)).otherwise(
                F.lit(0.0)
            )
        ).cast("float"),
    )
    base.select("vec_id", vec.alias("embedding")).write.mode("overwrite").parquet(
        path
    )


def probe_embeddings(spark, sizes: list[int]) -> list[dict]:
    """ANN-family scaling curves (r11 verdict task #4). The fit sample
    is held at a FIXED ABSOLUTE size (fit_fraction = 2000/N) — the
    100-TB deployment shape, where the sampled quantizer fit does not
    grow with the corpus — so the measured curve isolates the
    distributed stages: assignment projection (O(N·k·d) narrow map),
    inverted-list candidate equi-join, and for SemDeDup the
    guard-bounded within-cell pair join (<= N·max_cluster/2 pairs)."""
    from jagular_spark.operators.similarity import (
        ann_topk_ivf,
        ann_topk_ivf_pq,
        semantic_dedup,
    )
    from jagular_spark.workload_params import _SEMDEDUP_MAX_CLUSTER

    def ff(n):
        return min(0.5, 2000 / n)

    ops = {
        "ann_topk_ivf": lambda d, n: ann_topk_ivf(
            d, F.col("id") < 20, k=5, n_centroids=16, nprobe=4, n_iter=3,
            fit_fraction=ff(n),
        ),
        "ann_topk_ivf_pq": lambda d, n: ann_topk_ivf_pq(
            d, F.col("id") < 20, k=5, n_centroids=16, nprobe=4, n_iter=3,
            m=4, pq_k=16, pq_iter=2, refine=32, fit_fraction=ff(n),
        ),
        "semantic_dedup_guarded": lambda d, n: semantic_dedup(
            d, n_centroids=16, n_iter=3, threshold=0.35, fit_fraction=ff(n),
            max_cluster=_SEMDEDUP_MAX_CLUSTER,
        ),
    }
    out = []
    for op_name, fn in ops.items():
        times = []
        for n in sizes:
            path = f"/tmp/scale_probe_emb_{n}"
            synth_embeddings(spark, n, path)
            emb = spark.read.parquet(path)
            _force(fn(emb, n))  # warm
            best, rows = None, 0
            # best-of-3 (not 2): these queries are short enough that a
            # single host steal burst can outlast two runs — a one-off
            # 19 s reading at 64k re-measured at 4.9-6.0 s over 3 runs
            for _ in range(3):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                rows = _force(fn(emb, n))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.append((n, round(best, 3), rows))
        rec = {"op": op_name, "points": times}
        for (n0, t0_, _), (n1, t1_, _) in zip(times, times[1:]):
            rec[f"time_ratio_{n1}v{n0}"] = round(t1_ / max(t0_, 1e-9), 2)
            rec[f"size_ratio_{n1}v{n0}"] = round(n1 / n0, 2)
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def probe(spark, sizes: list[int]) -> list[dict]:
    from jagular_spark.operators.similarity import ngram_jaccard_pairs_lsh
    from jagular_spark.operators.text import (
        cut_spans,
        gopher_rules,
        repeated_kgram_spans,
    )

    ops = {
        "gopher_rules": lambda d: gopher_rules(d),
        "substring_dedup_keepfirst": lambda d: cut_spans(
            d,
            repeated_kgram_spans(d, k=8, min_count=2, keep_first=True).select(
                "doc_id", "span_start", "span_len"
            ),
        ),
        "ngram_jaccard_pairs_lsh": lambda d: ngram_jaccard_pairs_lsh(
            d, min_jaccard=0.5
        ),
    }
    out = []
    for op_name, fn in ops.items():
        times = []
        for n in sizes:
            path = f"/tmp/scale_probe_docs_{n}"
            synth_docs(spark, n, path)
            docs = spark.read.parquet(path)
            _force(fn(docs))  # warm (codegen + file listing)
            best, rows = None, 0
            for _ in range(2):  # this VM's steal bursts: best-of-2
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                rows = _force(fn(docs))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.append((n, round(best, 3), rows))
        rec = {"op": op_name, "points": times}
        for (n0, t0_, _), (n1, t1_, _) in zip(times, times[1:]):
            rec[f"time_ratio_{n1}v{n0}"] = round(t1_ / max(t0_, 1e-9), 2)
            rec[f"size_ratio_{n1}v{n0}"] = round(n1 / n0, 2)
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def _curve(op_name: str, times: list) -> dict:
    """The shared record shape: points + adjacent time/size ratios."""
    rec = {"op": op_name, "points": times}
    for p0, p1 in zip(times, times[1:]):
        n0, t0_, n1, t1_ = p0[0], p0[1], p1[0], p1[1]
        rec[f"time_ratio_{n1}v{n0}"] = round(t1_ / max(t0_, 1e-9), 2)
        rec[f"size_ratio_{n1}v{n0}"] = round(n1 / n0, 2)
    print(json.dumps(rec), flush=True)
    return rec


def probe_dsir(spark, sizes: list[int]) -> list[dict]:
    """DSIR scaling on the document axis (r13 verdict task #4). The
    TARGET is held at a FIXED ABSOLUTE size (the first 400 doc_ids —
    the paper's shape: a small high-quality seed set that does not grow
    with the raw pool), so the curves isolate the raw-corpus stages:

    - ``dsir_fit``: the two hashed-gram count aggregates. The SCAN is
      honestly linear (every gram occurrence is counted once) but the
      aggregate map-side-combines to <= 4096 rows per task and the
      collect is bounded at 4096 buckets regardless of corpus — so
      time must track corpus size with no superlinear step (a
      growing-state fit would step harder than the size ratio).
    - ``dsir_score_frozen``: scoring against an ALREADY-FITTED delta
      table (the frozen-model serving half; fit once on the smallest
      corpus, score every size against it). Row-local literal-table
      lookup, zero shuffles — must be linear."""
    from jagular_spark.operators.selection import (
        dsir_fit_deltas,
        score_with_deltas,
    )

    out = []
    # fit the frozen scoring model ONCE (smallest corpus) so the
    # scoring curve measures serving alone, not refits
    path0 = f"/tmp/scale_probe_docs_{sizes[0]}"
    synth_docs(spark, sizes[0], path0)
    d0 = spark.read.parquet(path0)
    delta0, mt0, mr0 = dsir_fit_deltas(
        d0.where(F.col("doc_id") >= 400), d0.where(F.col("doc_id") < 400)
    )

    times_fit, times_score = [], []
    for n in sizes:
        path = f"/tmp/scale_probe_docs_{n}"
        synth_docs(spark, n, path)
        docs = spark.read.parquet(path)
        raw = docs.where(F.col("doc_id") >= 400)
        target = docs.where(F.col("doc_id") < 400)
        dsir_fit_deltas(raw, target)  # warm
        best = None
        for _ in range(3):  # best-of-3: same GC-spike exposure as scoring
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            delta, _, _ = dsir_fit_deltas(raw, target)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times_fit.append((n, round(best, 3), len(delta)))

        scored = score_with_deltas(raw, delta0, mt0, mr0)
        _force(scored)  # warm
        best, rows = None, 0
        # best-of-3 (the probe_embeddings precedent): the 320k scoring
        # job's GC variance spans 1-11 s per run on this shared host
        # (shape/order/warmup-independent — r16 A/Bs), so best-of-2
        # can catch two spiked runs and read 12 s where best-of-3
        # reads the stable ~2.7 s (= exactly 4x the 80k point)
        for _ in range(3):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            rows = _force(scored)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times_score.append((n, round(best, 3), rows))
    out.append(_curve("dsir_fit", times_fit))
    out.append(_curve("dsir_score_frozen", times_score))
    return out


def probe_fit_shapes(spark, sizes: list[int]) -> list[dict]:
    """Quantizer-fit cost vs corpus size (r13 verdict task #4): the
    whole claim of ``fit_rows`` is that the fit budget is ABSOLUTE —
    exactly 2000 smallest-hash rows are selected (TakeOrderedAndProject:
    per-task heap, no shuffle), collected, and Lloyd-fit driver-side,
    so the measured curve must stay FLAT up to the narrow O(N)
    sample-selection scan. The ``fit_fraction=0.5`` contrast is the
    shape a 100-TB deployment must NOT use: its sample (and therefore
    the collect and the driver-side Lloyd loop) grows linearly with
    the corpus, and the curve shows it."""
    from jagular_spark.operators.similarity import ivf_fit_centroids

    ops = {
        "ivf_fit_rows2000": lambda d: ivf_fit_centroids(
            d, k=16, n_iter=3, fit_rows=2000
        ),
        "ivf_fit_fraction_half": lambda d: ivf_fit_centroids(
            d, k=16, n_iter=3, fit_fraction=0.5
        ),
    }
    out = []
    for op_name, fn in ops.items():
        times = []
        for n in sizes:
            path = f"/tmp/scale_probe_emb_{n}"
            synth_embeddings(spark, n, path)
            emb = spark.read.parquet(path)
            fn(emb)  # warm
            best = None
            for _ in range(3):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                cents = fn(emb)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.append((n, round(best, 3), len(cents)))
        out.append(_curve(op_name, times))
    return out


def probe_mrl(spark, sizes: list[int]) -> list[dict]:
    """Matryoshka truncated-dimension recall audit on the vector axis
    (r13 verdict task #4): full-dimension exact top-k vs 16- and 32-dim
    prefix top-k for 20 broadcast probes. Every stage is a broadcast
    join against the (never-shuffled) corpus plus bounded per-probe
    aggregates, so time must track corpus size linearly — the probe
    count, not the corpus, is the only quadratic-risk axis and it is
    fixed."""
    from jagular_spark.operators.similarity import mrl_recall

    out = []
    times = []
    for n in sizes:
        path = f"/tmp/scale_probe_emb_{n}"
        synth_embeddings(spark, n, path)
        emb = spark.read.parquet(path)
        q = mrl_recall(emb, F.col("id") < 20, k=5, dims_list=(16, 32))
        _force(q)  # warm
        best, rows = None, 0
        for _ in range(3):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            rows = _force(q)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times.append((n, round(best, 3), rows))
    out.append(_curve("mrl_recall_16_32", times))
    return out


def probe_ivf_prebuilt(spark, sizes: list[int]) -> list[dict]:
    """Persisted-index SERVING scaling (r14): the index is built once
    per corpus size (untimed — build-once/serve-many is the shape's
    whole point) and only the search is timed. The flat index scan
    reads ~nprobe/n_centroids of the corpus bytes via static partition
    pruning; the IVFADC codes index additionally shrinks every row to
    m small ints. Serve time must therefore grow no faster than
    corpus × nprobe/n_centroids — at these sizes the fixed job floor
    dominates, so the curve should sit well under the 4× data ratio."""
    from jagular_spark.operators.similarity import (
        ivf_pq_search_index,
        ivf_pq_write_index,
        ivf_probe_rows,
        ivf_search_index,
        ivf_write_index,
    )

    out = []
    for variant in ("flat", "pq"):
        times = []
        for n in sizes:
            epath = f"/tmp/scale_probe_emb_{n}"
            synth_embeddings(spark, n, epath)
            emb = spark.read.parquet(epath)
            ipath = f"/tmp/scale_probe_ivfidx_{variant}_{n}"
            ff = min(0.5, 2000 / n)
            if variant == "flat":
                cents = ivf_write_index(
                    emb, ipath, n_centroids=16, n_iter=3,
                    id_col="vec_id", fit_fraction=ff,
                )
                probes = ivf_probe_rows(
                    emb, F.col("id") < 20, cents, nprobe=4, id_col="vec_id"
                )
                mk = lambda: ivf_search_index(spark, ipath, probes, k=5)  # noqa: E731
            else:
                cents, books = ivf_pq_write_index(
                    emb, ipath, n_centroids=16, n_iter=3, m=4, pq_k=16,
                    pq_iter=2, id_col="vec_id", fit_fraction=ff,
                )
                probes = ivf_probe_rows(
                    emb, F.col("id") < 20, cents, nprobe=4, id_col="vec_id"
                )
                mk = lambda: ivf_pq_search_index(  # noqa: E731
                    spark, emb, ipath, probes, books, k=5, refine=32,
                    id_col="vec_id",
                )
            _force(mk())  # warm
            best, rows = None, 0
            for _ in range(3):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                rows = _force(mk())
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.append((n, round(best, 3), rows))
        out.append(_curve(f"ivf_{variant}_index_serve", times))
    return out


def synth_media(spark, n_docs: int, path: str) -> None:
    """Fixed-size raw8 video payloads, generated distributed: 576
    deterministic md5-derived bytes per doc (72 rows x 8 cols), so the
    pframe cutter yields 6 frames/doc and the half-pel cutter 8 —
    every stream has real P/B pictures and per-doc encode work is
    CONSTANT, which is what makes the doc-axis curve a clean linearity
    read (the sf corpora's variable doc lengths would confound it)."""
    if os.path.exists(path):
        return
    base = spark.range(0, n_docs, 1, 32).select(F.col("id").alias("media_id"))
    hexes = F.concat(
        *[
            F.md5(F.concat_ws("-", F.col("media_id").cast("string"), F.lit(str(j))))
            for j in range(18)
        ]
    )
    base.select(
        "media_id",
        F.lit("video").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.unhex(F.concat(hexes, hexes)).alias("payload"),
    ).write.mode("overwrite").parquet(path)


def probe_media(spark, sizes: list[int]) -> list[dict]:
    """MPEG-1 B-frame and half-pel encode on the media axis (r13
    verdict task #4): both kernels are row-local Arrow ``mapInPandas``
    over never-shuffled payloads with constant per-doc work (fixed
    576 B payloads -> fixed frame counts), so wall time must track doc
    count. The overlapping-window frame cutter gives every stream real
    vertical motion (frame t+1 is frame t shifted up), so the measured
    cost includes the exhaustive motion searches actually running, not
    an all-intra fallback."""
    from jagular_spark.operators.multimodal import (
        mpeg1_halfpel_roundtrip_stats,
        mpeg1_pframe_roundtrip_stats,
    )

    ops = {
        "mpeg1_bframes_encode": lambda d: mpeg1_pframe_roundtrip_stats(
            d, qscale=1, tol=8, intra_period=3, flat_quant=16, b_frames=1
        ),
        "mpeg1_halfpel_encode": lambda d: mpeg1_halfpel_roundtrip_stats(
            d, qscale=1, tol=8, intra_period=4, flat_quant=16, max_frames=8
        ),
    }
    out = []
    for op_name, fn in ops.items():
        times = []
        for n in sizes:
            path = f"/tmp/scale_probe_media_{n}"
            synth_media(spark, n, path)
            media = spark.read.parquet(path)
            _force(fn(media))  # warm
            best, rows = None, 0
            for _ in range(2):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                rows = _force(fn(media))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.append((n, round(best, 3), rows))
        out.append(_curve(op_name, times))
    return out


def synth_docs_en(spark, n: int):
    """English-vocab variant of the shared synth corpus: the wNNN /
    pNNtNN tokens fail alphabetic-word filters (funnel quality /
    language gates, the BPE vocabulary), which would make any
    word-level probe vacuous. Mapping each token deterministically
    into a 40-word English vocabulary (7 en stopwords + alphabetic
    fillers, none colliding with the fr/de/es stopword profiles)
    preserves the duplication structure token-for-token while making
    the text real word-operator input."""
    en_vocab = F.array(*[F.lit(w) for w in (
        "the", "a", "of", "and", "to", "in", "is",
        "model", "data", "train", "shard", "token", "sample", "batch",
        "layer", "graph", "query", "index", "merge", "scale", "bench",
        "frame", "audio", "video", "text", "corpus", "filter", "window",
        "stream", "buffer", "vector", "metric", "engine", "worker",
        "driver", "output", "input", "cache", "spill", "probe",
    )])
    path = f"/tmp/scale_probe_docs_{n}"
    synth_docs(spark, n, path)
    en_path = f"/tmp/scale_probe_docsen_{n}"
    if not os.path.exists(en_path):
        spark.read.parquet(path).select(
            "doc_id",
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.element_at(
                        en_vocab,
                        ((F.xxhash64(t) % 40 + 40) % 40 + 1).cast("int"),
                    ),
                ),
            ).alias("text"),
        ).write.mode("overwrite").parquet(en_path)
    return spark.read.parquet(en_path)


def probe_r14_shapes(spark, sizes: list[int]) -> list[dict]:
    """Measured curves for the three r14 queries whose scale shapes
    were docstring arguments only (r14 verdict task #4), all on the
    document axis with the shared near-dup-structured synth corpus:

    - ``token_budget_sample``: absolute budgets held FIXED across
      sizes (the operator's semantics — "20k tokens of each source"
      does not grow with the pool). The fit is one bounded ≤|strata|
      aggregate and membership a scan-level literal CASE, so time must
      track the SCAN (linear), never a shuffle of the corpus.
    - ``neardup_source_matrix``: the pairs stage is timed alone and
      then the full matrix (pairs → two equi-joins against the
      2-column source projection → ≤|sources|² rollup). The matrix
      overhead (full − pairs) must track the capped-LSH PAIR volume
      (linear, recorded per point), not corpus².
    - ``dsir_select_funnel``: top-k selection at FIXED k=200 + the
      shared curation funnel over the selected rows. Selection is a
      TakeOrderedAndProject over the scan (linear, no corpus shuffle);
      the funnel runs on 200 rows whatever the pool size, so the total
      must flatten toward the scan cost as the pool grows."""
    from jagular_spark.operators import similarity as sim
    from jagular_spark.operators.sampling import token_budget_sample
    from jagular_spark.workloads import _curation_funnel, _dsir_selected_docs

    def matrix_df(docs, pairs):
        src = docs.select("doc_id", "source")
        lab = pairs.join(
            src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("s_a")),
            "id_a",
        ).join(
            src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("s_b")),
            "id_b",
        )
        return lab.groupBy(
            F.least("s_a", "s_b").alias("src_lo"),
            F.greatest("s_a", "s_b").alias("src_hi"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))

    budgets = {f"src{i}": 20_000 for i in range(4)}
    out = []
    t_tb, t_pairs, t_mx, t_sel = [], [], [], []
    for n in sizes:
        path = f"/tmp/scale_probe_docs_{n}"
        synth_docs(spark, n, path)
        docs = spark.read.parquet(path).withColumn(
            "source", F.concat(F.lit("src"), (F.col("doc_id") % 4).cast("string"))
        )
        docs_en = synth_docs_en(spark, n)

        def best_of(fn, warm=True):
            if warm:
                fn()
            best = None
            for _ in range(2):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                r = fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return round(best, 3), r

        bt, rows = best_of(lambda: _force(token_budget_sample(docs, budgets)))
        t_tb.append((n, bt, rows))

        pairs = sim.ngram_jaccard_pairs_lsh(docs, min_jaccard=0.5).select(
            "id_a", "id_b"
        )
        bt_p, n_pairs = best_of(lambda: _force(pairs))
        t_pairs.append((n, bt_p, n_pairs))
        bt_m, _ = best_of(lambda: _force(matrix_df(docs, pairs)))
        t_mx.append((n, bt_m, n_pairs))

        bt_s, rows = best_of(
            lambda: _force(_curation_funnel(
                _dsir_selected_docs(docs_en.select("doc_id", "text"), k=200)
            ))
        )
        t_sel.append((n, bt_s, rows))
    out.append(_curve("token_budget_sample", t_tb))
    out.append(_curve("neardup_pairs_stage", t_pairs))
    out.append(_curve("neardup_source_matrix", t_mx))
    out.append(_curve("dsir_select_funnel_k200", t_sel))
    return out


def probe_r15_shapes(spark, sizes: list[int]) -> list[dict]:
    """Measured curves for the r15 queries, before anyone has to ask
    (the repo's standard: argued shapes get measured):

    - ``bpe_fit``: merge selection on the ABSOLUTE 256-doc hash-sample
      — the whole claim is corpus-size invariance (TakeOrderedAndProject
      membership + driver-side fit on a fixed sample), so the curve
      must stay FLAT across 16× docs like ivf_fit_rows2000 does.
    - ``bpe_vocab_audit``: frozen-merge encode + bounded symbol-count
      aggregate over the FULL corpus — one scan, so time tracks the
      corpus linearly (under the job floor at small sizes), never a
      shuffle step.
    - ``training_shards``: the sample → shard → pack composition; the
      by-shard exchange carries only token-budget survivors (fixed
      absolute budgets → roughly constant survivor count), so the
      curve is the membership scan's, linear at most."""
    from jagular_spark.operators.bpe import bpe_fit, bpe_vocab_audit
    from jagular_spark.operators.sampling import (
        shuffle_shards,
        token_budget_sample,
    )
    from pyspark.sql import Window

    budgets = {f"src{i}": 20_000 for i in range(4)}

    def shards_df(docs):
        sampled = token_budget_sample(docs, budgets).select("doc_id", "n_tokens")
        sharded = shuffle_shards(sampled, "doc_id", n_shards=8, salt="probe")
        w = (
            Window.partitionBy("shard")
            .orderBy("pos_in_shard")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        base = sharded.select(
            "shard",
            F.col("n_tokens").alias("nt"),
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off"),
        )
        return base.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("nt").alias("n_tokens")
        )

    out = []
    t_fit, t_audit, t_shards = [], [], []
    for n in sizes:
        path = f"/tmp/scale_probe_docs_{n}"
        synth_docs(spark, n, path)
        docs = spark.read.parquet(path).withColumn(
            "source", F.concat(F.lit("src"), (F.col("doc_id") % 4).cast("string"))
        )

        def best_of(fn, warm=True):
            if warm:
                fn()
            best, r = None, None
            for _ in range(2):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                r = fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return round(best, 3), r

        docs_en = synth_docs_en(spark, n)
        bt, merges = best_of(lambda: bpe_fit(docs_en, n_merges=16, fit_rows=256))
        t_fit.append((n, bt, len(merges)))
        bt, rows = best_of(lambda: _force(bpe_vocab_audit(docs_en, merges)))
        t_audit.append((n, bt, rows))
        bt, rows = best_of(lambda: _force(shards_df(docs.select("doc_id", "source", "text"))))
        t_shards.append((n, bt, rows))
    out.append(_curve("bpe_fit_256", t_fit))
    out.append(_curve("bpe_vocab_audit", t_audit))
    out.append(_curve("training_shards", t_shards))
    return out


def synth_docs_rich(spark, n: int):
    """Rich-vocabulary variant of the shared synth corpus for the BPE
    merge-count probe: the 400 wNNN tokens (non-alphabetic, outside
    the BPE vocabulary) map deterministically into 4000 pronounceable
    pseudo-words (syllable pairs/triples over 95 CV syllables), so a
    fit can select 1024+ merges before the sample's pair structure
    exhausts — the 40-word English variant tops out near its total
    distinct-adjacency count."""
    syls = [c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiou"]
    vocab = []
    for i in range(4000):
        w = syls[i % 95] + syls[(i // 95) % 95]
        if i % 3 == 0:
            w += syls[(i // 9025) % 95]
        vocab.append(w)
    rich = F.array(*[F.lit(w) for w in vocab])
    path = f"/tmp/scale_probe_docs_{n}"
    synth_docs(spark, n, path)
    rich_path = f"/tmp/scale_probe_docsrich_{n}"
    if not os.path.exists(rich_path):
        spark.read.parquet(path).select(
            "doc_id",
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.element_at(
                        rich,
                        ((F.xxhash64(t) % 4000 + 4000) % 4000 + 1).cast("int"),
                    ),
                ),
            ).alias("text"),
        ).write.mode("overwrite").parquet(rich_path)
    return spark.read.parquet(rich_path)


def synth_skewed(spark, n: int, path: str) -> None:
    """90 %-one-key rows — the pathological-key regime salted_agg
    exists for (AQE splits oversized partitions, not a single hot key
    inside one)."""
    if os.path.exists(path):
        return
    h = (F.xxhash64("id") % 100 + 100) % 100
    key = F.when(h < 90, F.lit(0)).otherwise((h % 50) + 1).cast("long")
    spark.range(0, n, 1, 32).select(
        key.alias("k"), (F.col("id") % 1000).cast("long").alias("v")
    ).write.mode("overwrite").parquet(path)


def probe_skew(spark, sizes: list[int]) -> list[dict]:
    """Salted two-phase aggregation on the row axis (re-measured under
    forced materialization — the r11-era curves predate the fidelity
    fix): 90 % of rows share one key, so the unsalted plan's reduce
    task for key 0 carries 0.9·N rows while salted_agg bounds any
    reduce task at 1/n_salts of that. Both must track the data ratio
    (the map scan is the linear floor); the salted curve's constant
    overhead is the second (≤ keys×n_salts row) merge exchange."""
    from jagular_spark.operators.skew import salted_agg

    ops = {
        "agg_plain_hot_key": lambda d: d.groupBy("k").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
        ),
        "salted_agg_hot_key": lambda d: salted_agg(
            d, ["k"], {"s": ("sum", "v"), "n": ("count", "v")}, n_salts=8
        ),
    }
    out = []
    for op_name, fn in ops.items():
        times = []
        for n in sizes:
            path = f"/tmp/scale_probe_skew_{n}"
            synth_skewed(spark, n, path)
            df = spark.read.parquet(path)
            _force(fn(df))  # warm
            best, rows = None, 0
            for _ in range(2):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                rows = _force(fn(df))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.append((n, round(best, 3), rows))
        out.append(_curve(op_name, times))
    return out


def probe_bpe_serve(spark, n_docs: int = 80000) -> list[dict]:
    """BPE serving cost on the MERGE-COUNT axis (r15 verdict task #2):
    fixed 80k-doc rich-vocab corpus, merges 16/64/256/1024. The chain
    audit applies one literal replace per merge to EVERY word
    occurrence — its cost (and its expression-tree analysis) grows
    with merge count regardless of how many merges a word uses, which
    is the cliff a realistic 32k vocabulary falls off. The
    distinct-word audit's encode cost is |distinct words| × merges a
    word USES (rank-based encoder), so its curve must stay near-flat
    on this axis. The chain is skipped (recorded as such) once a level
    exceeds the cliff guard — the point is locating the cliff, not
    waiting on it."""
    from jagular_spark.operators.bpe import (
        bpe_fit,
        bpe_vocab_audit,
        bpe_vocab_audit_distinct,
    )

    docs = synth_docs_rich(spark, n_docs)
    out = []
    t_chain, t_dist, t_fit = [], [], []
    chain_dead = False
    for m in (16, 64, 256, 1024):
        t0 = time.perf_counter()
        merges = bpe_fit(docs, n_merges=m, fit_rows=512)
        t_fit.append((m, round(time.perf_counter() - t0, 3), len(merges)))

        def best_of(fn):
            fn()
            best, r = None, None
            for _ in range(2):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                r = fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return round(best, 3), r

        if not chain_dead:
            t0 = time.perf_counter()
            try:
                bt, rows = best_of(lambda: _force(bpe_vocab_audit(docs, merges)))
                t_chain.append((m, bt, rows))
                if bt > 60:
                    chain_dead = True
            except Exception as e:  # analysis/codegen cliff: record, move on
                t_chain.append((m, round(time.perf_counter() - t0, 3),
                                f"FAILED:{type(e).__name__}"))
                chain_dead = True
        else:
            t_chain.append((m, None, "skipped (cliff guard)"))

        bt, rows = best_of(lambda: _force(bpe_vocab_audit_distinct(docs, merges)))
        t_dist.append((m, bt, rows))
    out.append(_curve("bpe_fit_rich512_by_merges", t_fit))
    print(json.dumps({"op": "bpe_audit_chain_by_merges", "points": t_chain}),
          flush=True)
    out.append(_curve("bpe_audit_distinct_by_merges", t_dist))
    return out


def probe_substring_staged(spark, sizes: list[int]) -> list[dict]:
    """Composed one-job substring dedup vs the shipped
    substring_dedup_staged helper (r17: the r16 staged ATTRIBUTION —
    composed 15.5 s vs 6.2 s staged-sum at 160k, GC vs zero-GC — is
    now reproducible through the first-class operator instead of an
    ad-hoc breakdown). Per-run GC delta recorded alongside: the
    composed form's cost is peak-memory class, so best-of-N alone
    undersells the difference."""
    from jagular_spark.operators.text import (
        cut_spans,
        repeated_kgram_spans,
        substring_dedup_staged,
    )

    def gc_ms():
        t = 0
        beans = spark._jvm.java.lang.management.ManagementFactory
        for b in beans.getGarbageCollectorMXBeans():
            t += max(0, b.getCollectionTime())
        return t

    out = []
    shapes = {
        "substring_composed_keepfirst": lambda d, n: cut_spans(
            d, repeated_kgram_spans(d, k=8, min_count=2, keep_first=True)
        ),
        "substring_staged_keepfirst": lambda d, n: substring_dedup_staged(
            d, f"/tmp/scale_probe_subspans_{n}", k=8, min_count=2,
            keep_first=True,
        ),
    }
    for op_name, fn in shapes.items():
        times = []
        for n in sizes:
            path = f"/tmp/scale_probe_docs_{n}"
            synth_docs(spark, n, path)
            docs = spark.read.parquet(path)
            _force(fn(docs, n))  # warm
            best, rows, gc_best = None, 0, None
            for _ in range(3):
                spark._jvm.System.gc()
                g0 = gc_ms()
                t0 = time.perf_counter()
                rows = _force(fn(docs, n))
                dt = time.perf_counter() - t0
                if best is None or dt < best:
                    best, gc_best = dt, gc_ms() - g0
            times.append((n, round(best, 3), rows, {"gc_ms": gc_best}))
        out.append(_curve(op_name, times))
    return out


def synth_docs_card(spark, n_docs: int, n_words: int):
    """Heaps-law axis corpus for the BPE join-strategy probe: a FIXED
    occurrence volume (n_docs × 32 words) drawn uniformly from a
    target distinct-word universe of ``n_words`` pronounceable
    pseudo-words (4 syllables over 95 CV pairs — 81M combinations, so
    every target cardinality is reachable). Corpus-side join cost is
    held constant while the encoding MAP's cardinality sweeps the
    broadcast-budget axis."""
    path = f"/tmp/scale_probe_bpecard_{n_words}"
    if not os.path.exists(path):
        syls = [c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiou"]
        arr = F.array(*[F.lit(s) for s in syls])

        def word(j: int):
            wid = ((F.xxhash64(F.col("id"), F.lit(j)) % n_words) + n_words) % n_words
            return F.concat(*[
                F.element_at(
                    arr,
                    (F.floor(wid / F.lit(95 ** p)).cast("long") % 95 + 1).cast("int"),
                )
                for p in range(4)
            ])

        spark.range(0, n_docs, 1, 32).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[word(j) for j in range(32)]).alias("text"),
        ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def probe_bpe_cardinality(
    spark,
    word_counts: tuple[int, ...] = (10_000, 100_000, 1_000_000),
    n_docs: int = 200_000,
) -> list[dict]:
    """BPE corpus-encode on the DISTINCT-WORD-CARDINALITY axis (r16
    verdict Missing #1): the map's BUILD cost is Zipf-cheap, but its
    cardinality follows Heaps' law, and at web scale it exceeds any
    broadcast budget — so bpe_encode_corpus_words grew a broadcast_map
    knob. This probe holds the corpus occurrence volume constant
    (n_docs × 32) and sweeps the map 10k → 1M words, timing BOTH join
    shapes (broadcast vs shuffle-hash on word) plus the map
    build+encode pass — locating where the broadcast side's growth
    crosses the shuffle side's flat corpus-exchange price on this
    host, and proving the shuffle-hash path's cost is
    cardinality-flat (its exchange is the fixed corpus side)."""
    from jagular_spark.operators.bpe import (
        bpe_encode_corpus_words,
        bpe_fit,
        bpe_word_encodings,
        bpe_words_col,
    )

    out = []
    t_map, t_bc, t_sh = [], [], []
    merges = None
    for nw in word_counts:
        docs = synth_docs_card(spark, n_docs, nw)
        if merges is None:
            merges = bpe_fit(docs, n_merges=64, fit_rows=512)

        t0 = time.perf_counter()
        enc_map = bpe_word_encodings(
            docs.select(F.explode(bpe_words_col("text")).alias("word")).distinct(),
            merges,
        ).persist()
        n_distinct = enc_map.count()
        t_map.append((nw, round(time.perf_counter() - t0, 3), n_distinct))

        def best_of(fn):
            fn()  # discarded warm pass
            best = None
            for _ in range(3):  # this VM's steal bursts: best-of-3
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return round(best, 3)

        t_bc.append((nw, best_of(lambda: _force(bpe_encode_corpus_words(
            docs, merges, enc_map=enc_map, broadcast_map=True))), n_distinct))
        t_sh.append((nw, best_of(lambda: _force(bpe_encode_corpus_words(
            docs, merges, enc_map=enc_map, broadcast_map=False))), n_distinct))
        enc_map.unpersist()
    out.append(_curve("bpe_encmap_build_by_words", t_map))
    out.append(_curve("bpe_corpus_encode_broadcast_by_words", t_bc))
    out.append(_curve("bpe_corpus_encode_shufflehash_by_words", t_sh))
    return out


ALL_FAMILIES = (
    "text",
    "events",
    "embeddings",
    "streaming",
    "dsir",
    "fit_shapes",
    "mrl",
    "media",
    "ivf_prebuilt",
    "r14_shapes",
    "r15_shapes",
    "bpe_serve",
    "bpe_cardinality",
    "substring_staged",
    "skew",
)


def main() -> None:
    sizes = [5000, 20000, 80000]
    families = list(ALL_FAMILIES)
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            sizes = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--families"):
            families = a.split("=", 1)[1].split(",")
            unknown = set(families) - set(ALL_FAMILIES)
            if unknown:
                raise SystemExit(f"unknown families: {sorted(unknown)}")
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    heap_ramp_warmup(spark)  # steady-state heap before any curve (r16)
    chans = [64, 256, 1024]
    emb_sizes = [4000, 16000, 64000]
    media_sizes = [1000, 4000, 16000]
    if "text" in families:
        probe(spark, sizes)
    if "events" in families:
        probe_events(spark, chans)
    if "embeddings" in families:
        probe_embeddings(spark, emb_sizes)
    if "streaming" in families:
        probe_streaming(spark, [20000, 80000, 320000])
    if "dsir" in families:
        probe_dsir(spark, [20000, 80000, 320000])
    if "fit_shapes" in families:
        probe_fit_shapes(spark, emb_sizes)
    if "mrl" in families:
        probe_mrl(spark, emb_sizes)
    if "media" in families:
        probe_media(spark, media_sizes)
    if "ivf_prebuilt" in families:
        probe_ivf_prebuilt(spark, emb_sizes)
    if "r14_shapes" in families:
        probe_r14_shapes(spark, [20000, 80000, 320000])
    if "r15_shapes" in families:
        probe_r15_shapes(spark, [20000, 80000, 320000])
    if "bpe_serve" in families:
        probe_bpe_serve(spark, 80000)
    if "bpe_cardinality" in families:
        probe_bpe_cardinality(spark)
    if "substring_staged" in families:
        probe_substring_staged(spark, [20000, 80000, 160000])
    if "skew" in families:
        probe_skew(spark, [1_000_000, 4_000_000, 16_000_000])
    for n in sizes:
        shutil.rmtree(f"/tmp/scale_probe_docs_{n}", ignore_errors=True)
    for n in chans:
        shutil.rmtree(f"/tmp/scale_probe_samples_{n}", ignore_errors=True)
    for n in emb_sizes:
        shutil.rmtree(f"/tmp/scale_probe_emb_{n}", ignore_errors=True)
    for n in media_sizes:
        shutil.rmtree(f"/tmp/scale_probe_media_{n}", ignore_errors=True)
    for n in emb_sizes:
        for v in ("flat", "pq"):
            shutil.rmtree(f"/tmp/scale_probe_ivfidx_{v}_{n}", ignore_errors=True)
    for n in (20000, 80000, 320000):
        shutil.rmtree(f"/tmp/scale_probe_sess_{n}", ignore_errors=True)
        shutil.rmtree(f"/tmp/scale_probe_docs_{n}", ignore_errors=True)
        shutil.rmtree(f"/tmp/scale_probe_docsen_{n}", ignore_errors=True)
    for op in ("stream_sessionize", "stream_lsh_candidates",
               "stream_lsh_candidates_capped", "stream_training_shard_pack",
               "stream_curation"):
        shutil.rmtree(f"/tmp/scale_probe_ckpt_{op}", ignore_errors=True)
    for n in (20000, 80000, 320000):
        shutil.rmtree(f"/tmp/scale_probe_curdocs_{n}", ignore_errors=True)
    shutil.rmtree("/tmp/scale_probe_docsrich_80000", ignore_errors=True)
    for n in (10_000, 100_000, 1_000_000):
        shutil.rmtree(f"/tmp/scale_probe_bpecard_{n}", ignore_errors=True)
    for n in (20000, 80000, 160000):
        shutil.rmtree(f"/tmp/scale_probe_subspans_{n}", ignore_errors=True)
        shutil.rmtree(f"/tmp/scale_probe_docs_{n}", ignore_errors=True)
    for n in (20000, 80000, 320000):
        shutil.rmtree(f"/tmp/scale_probe_shardsrc_{n}", ignore_errors=True)
    for n in (1_000_000, 4_000_000, 16_000_000):
        shutil.rmtree(f"/tmp/scale_probe_skew_{n}", ignore_errors=True)


def probe_streaming(spark, sizes: list[int]) -> list[dict]:
    """Structured Streaming scaling (r12): drain the same corpora the
    batch probes use through the stateful streaming twins with one
    availableNow pass and measure wall time per corpus size. State
    stays bounded by construction (session windows close at the
    watermark; LSH buckets are a fixed n_buckets grouping), so time
    should track input volume — the curve verifies the stateful
    kernels have no per-batch rescan of history."""
    from jagular_spark.streaming import stream_sessionize
    from jagular_spark.streaming.pipeline import stream_lsh_candidate_pairs

    def drain(sdf, name):
        q = (
            sdf.writeStream.format("noop")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"/tmp/scale_probe_ckpt_{name}")
            .start()
        )
        q.awaitTermination(600)
        q.stop()

    def sessionize_run(n):
        path = f"/tmp/scale_probe_sess_{n}"
        if not os.path.exists(path):
            # n events over n//50 users; a >30-min gap every ~25 events
            # so session volume scales with the corpus
            base = spark.range(0, n, 1, 32)
            ev = base.select(
                (F.col("id") % (n // 50)).alias("user_id"),
                F.timestamp_micros(
                    F.col("id") * 60_000_000
                    + (F.col("id") / 25).cast("long") * 3_600_000_000
                ).alias("ts"),
            )
            ev.write.mode("overwrite").parquet(path)
        schema = spark.read.parquet(path).schema
        stream = spark.readStream.schema(schema).parquet(path)
        return stream_sessionize(stream, gap="30 minutes", watermark="0 seconds")

    def lsh_run(n):
        path = f"/tmp/scale_probe_docs_{n}"
        synth_docs(spark, n, path)
        schema = spark.read.parquet(path).schema
        stream = spark.readStream.schema(schema).parquet(path)
        return stream_lsh_candidate_pairs(stream)

    def lsh_capped_run(n):
        path = f"/tmp/scale_probe_docs_{n}"
        synth_docs(spark, n, path)
        schema = spark.read.parquet(path).schema
        stream = spark.readStream.schema(schema).parquet(path)
        return stream_lsh_candidate_pairs(stream, max_members=64)

    def shard_pack_run(n):
        # r16 terminal-composition twin: admission thresholds frozen
        # offline (absolute budgets fixed across sizes), pack state is
        # one long per shard — drain time must track input volume with
        # state-store cost CONSTANT (8 state rows whatever the corpus)
        from jagular_spark.operators.sampling import token_budget_thresholds
        from jagular_spark.streaming.pipeline import stream_training_shard_pack

        path = f"/tmp/scale_probe_docs_{n}"
        synth_docs(spark, n, path)
        docs = spark.read.parquet(path).withColumn(
            "source", F.concat(F.lit("src"), (F.col("doc_id") % 4).cast("string"))
        )
        spath = f"/tmp/scale_probe_shardsrc_{n}"
        if not os.path.exists(spath):
            docs.write.mode("overwrite").parquet(spath)
        thr = token_budget_thresholds(
            docs, {f"src{i}": 20_000 for i in range(4)}, group_col="source"
        )
        schema = spark.read.parquet(spath).schema
        stream = spark.readStream.schema(schema).parquet(spath)
        return stream_training_shard_pack(stream, thr, n_shards=8, salt="probe")

    def curation_run(n):
        # r18 registry twin (docs_curation_streamed): stateless scoring
        # + dropDuplicatesWithinWatermark content dedup + stateless md5
        # sample. State is O(in-flight hashes) bounded by the watermark
        # horizon, so drain time must track input volume — a
        # super-linear curve would mean the dedup state is rescanning
        # history (the exact bug class the r17 rework fixed)
        from jagular_spark.streaming.pipeline import stream_curation

        path = f"/tmp/scale_probe_docs_{n}"
        synth_docs(spark, n, path)
        cpath = f"/tmp/scale_probe_curdocs_{n}"
        if not os.path.exists(cpath):
            spark.read.parquet(path).select("doc_id", "text").withColumn(
                "event_time", F.timestamp_millis(F.col("doc_id"))
            ).write.mode("overwrite").parquet(cpath)
        schema = spark.read.parquet(cpath).schema
        stream = spark.readStream.schema(schema).parquet(cpath)
        return stream_curation(stream, "event_time", content_keyed=True)

    ops = {
        "stream_sessionize": sessionize_run,
        "stream_lsh_candidates": lsh_run,
        # the hot-bucket guard the uncapped curve motivated: duplicate
        # clusters growing with the corpus made uncapped pair volume
        # quadratic (9.4x time on 4x data at 320k); capped must be flat
        "stream_lsh_candidates_capped": lsh_capped_run,
        "stream_training_shard_pack": shard_pack_run,
        "stream_curation": curation_run,
    }
    out = []
    for op_name, mk in ops.items():
        times = []
        for i, n in enumerate(sizes):
            import shutil as _sh

            # one discarded warm drain per op (smallest size): the first
            # streaming query of a shape pays session-wide codegen +
            # state-store setup that would be misread as size-0 cost
            reps = 3 if i == 0 else 2
            best = None
            for rep in range(reps):
                _sh.rmtree(f"/tmp/scale_probe_ckpt_{op_name}", ignore_errors=True)
                t0 = time.perf_counter()
                drain(mk(n), op_name)
                dt = time.perf_counter() - t0
                if i == 0 and rep == 0:
                    continue  # warm pass, discard
                best = dt if best is None else min(best, dt)
            times.append((n, round(best, 3)))
        rec = {"op": op_name, "points": times}
        for (n0, t0_), (n1, t1_) in zip(times, times[1:]):
            rec[f"time_ratio_{n1}v{n0}"] = round(t1_ / max(t0_, 1e-9), 2)
            rec[f"size_ratio_{n1}v{n0}"] = round(n1 / n0, 2)
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


# entry point LAST so every function main() calls is already defined —
# r12 shipped this guard above probe_streaming and the documented CLI
# died with NameError after the batch probes finished (streaming curves
# never ran via the CLI, cleanup below the call was skipped)
if __name__ == "__main__":
    main()
