"""Streaming ↔ batch parity: a single availableNow pass over a file
source must reproduce the batch operators' results exactly."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from jagular_spark.operators.spikes import censor as batch_censor
from jagular_spark.streaming import stream_censor, stream_crossings, stream_sessionize

SF = "/root/testdata/sf0.001"
GAP_US = 30 * 60 * 1_000_000


def _events_batch(spark):
    """events with a real TimestampType event-time column (handles both
    parquet encodings: raw nano longs via nanosAsLong, and native
    TIMESTAMP(MICROS) read as TIMESTAMP_NTZ — same dispatch as
    workloads._us)."""
    from pyspark.sql.types import LongType

    ev = spark.read.parquet(f"{SF}/events.parquet")
    if isinstance(ev.schema["ts"].dataType, LongType):
        t = F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)"))
    else:
        t = F.timestamp_micros(F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC")))
    return ev.select("user_id", "event_id", "value", t.alias("ts"))


def _as_stream(spark, df, tmp_path, name):
    path = str(tmp_path / name)
    df.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(df.schema).parquet(path)


def _run_to_memory(sdf, name, output_mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def test_stream_sessionize_matches_batch_islands(spark, tmp_path):
    ev = _events_batch(spark)
    stream = _as_stream(spark, ev, tmp_path, "ev")
    out = stream_sessionize(stream, gap="30 minutes", watermark="0 seconds")
    _run_to_memory(out, "sessions", "append")
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    flag = F.when(us - F.lag(us).over(w) >= GAP_US, 1).otherwise(0)
    batch = (
        ev.withColumn("sid", F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    # append mode only emits sessions CLOSED by the final watermark
    # (watermark = global max event time): last_event + gap <= watermark
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    rows = batch.collect()
    want = {
        (r.user_id, r.session_start, r.n_events)
        for r in rows
        if r.last_event + pd.Timedelta(minutes=30) <= max_ts
    }
    still_open = {
        (r.user_id, r.session_start, r.n_events)
        for r in rows
        if r.last_event + pd.Timedelta(minutes=30) > max_ts
    }
    assert got == want
    assert len(still_open) >= 1  # the tail sessions really were the difference


def test_stream_censor_matches_batch_censor(spark, tmp_path):
    ev = _events_batch(spark).select(
        F.col("user_id").cast("int").alias("channel_id"),
        F.unix_micros(F.col("ts")).alias("ts"),
        "value",
    )
    crossings = stream_crossings(ev, threshold=100.0)
    batch = batch_censor(
        crossings, width=GAP_US, ts_col="ts", partition_cols=["channel_id"]
    )
    want = {(r.channel_id, r.ts) for r in batch.collect()}

    stream = _as_stream(spark, crossings, tmp_path, "cr")
    out = stream_censor(stream, width=GAP_US, ts_col="ts", partition_cols=["channel_id"])
    _run_to_memory(out, "censored", "append")
    got = {(r.channel_id, r.ts) for r in spark.sql("SELECT * FROM censored").collect()}
    assert got == want
    assert got  # non-degenerate


def test_stream_censor_state_carries_across_batches(spark, tmp_path):
    """Two sequential availableNow runs over a growing directory: edges
    in the second batch within `width` of the last kept edge of the
    first batch must be dropped (GroupState survives via checkpoint)."""
    path = str(tmp_path / "inc")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(path, exist_ok=True)
    pd.DataFrame({"channel_id": [1, 1], "ts": [100, 105]}).to_parquet(f"{path}/a.parquet")

    collected: list[tuple[int, int]] = []

    def run_once():
        stream = spark.readStream.schema("channel_id long, ts long").parquet(path)
        out = stream_censor(stream, width=30, ts_col="ts", partition_cols=["channel_id"])
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, _bid: collected.extend((r.channel_id, r.ts) for r in bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert {t for _, t in collected} == {100}

    # second file: 120 (within 30 of kept edge 100 → dropped), 140 (kept)
    pd.DataFrame({"channel_id": [1, 1], "ts": [120, 140]}).to_parquet(f"{path}/b.parquet")
    run_once()
    assert {t for _, t in collected} == {100, 140}


def test_stream_interpolate_matches_batch(spark, tmp_path):
    """Single availableNow pass == batch interpolate_gaps (same data,
    same inclusive max-gap boundary, same truncation cast)."""
    from jagular_spark.operators import interpolate_gaps
    from jagular_spark.streaming import stream_interpolate

    rows = []
    for ch in (1, 2):
        ts = [0, 1, 2, 5, 6, 20, 21, 24]  # gaps of 2 (fill), 13 (skip), 2 (fill)
        for t in ts:
            rows.append((ch, t, ch * 100 + t * 3))
    df = spark.createDataFrame(rows, "channel_id int, ts long, value int")

    want = {
        (r.channel_id, r.ts, r.value)
        for r in interpolate_gaps(
            df, max_gap_size=2, partition_cols=["channel_id"]
        ).collect()
    }

    stream = _as_stream(spark, df, tmp_path, "interp")
    out = stream_interpolate(stream, max_gap_size=2, partition_cols=["channel_id"])
    _run_to_memory(out, "interp_out", "append")
    got = {
        (r.channel_id, r.ts, r.value)
        for r in spark.sql("SELECT * FROM interp_out").collect()
    }
    assert got == want
    assert len(got) > len(rows)  # gaps actually filled


def test_stream_interpolate_gap_across_batches(spark, tmp_path):
    """A gap straddling two micro-batches is filled via the carried
    GroupState boundary row (the reference's prev_ts/prev_channel_data
    carry, utils.py:443-446)."""
    import os

    from jagular_spark.streaming import stream_interpolate

    path = str(tmp_path / "inc")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(path, exist_ok=True)
    pd.DataFrame({"channel_id": [1, 1], "ts": [10, 11], "value": [100, 110]}).to_parquet(
        f"{path}/a.parquet"
    )
    collected: list[tuple[int, int, int]] = []

    def run_once():
        stream = spark.readStream.schema("channel_id long, ts long, value long").parquet(path)
        out = stream_interpolate(stream, max_gap_size=3, partition_cols=["channel_id"])
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, _bid: collected.extend(
                    (r.channel_id, r.ts, r.value) for r in bdf.collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert {(t, v) for _, t, v in collected} == {(10, 100), (11, 110)}

    # batch 2 starts at ts=14: gap 11->14 has 2 missing samples, filled
    # by interpolating between the carried row (11, 110) and (14, 140)
    pd.DataFrame({"channel_id": [1], "ts": [14], "value": [140]}).to_parquet(f"{path}/b.parquet")
    run_once()
    assert {(t, v) for _, t, v in collected} == {
        (10, 100), (11, 110), (12, 120), (13, 130), (14, 140)
    }


def test_stream_dedup_matches_batch_on_inorder(spark, tmp_path):
    """Single availableNow pass of stream_dedup == batch keep-first on
    in-order data (arrival order = physical order)."""
    from jagular_spark.operators import dedup_keep_first
    from jagular_spark.streaming import stream_dedup

    ev = _events_batch(spark).select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("us")
    )
    batch = dedup_keep_first(
        ev, ts_col="us", tiebreak_cols=["event_id"], partition_cols=["user_id"]
    )
    want = {(r.user_id, r.us) for r in batch.collect()}

    stream = _as_stream(spark, ev, tmp_path, "ddp")
    out = stream_dedup(stream, "0 seconds", "ts", key_cols=["user_id"], ts_col="us")
    _run_to_memory(out, "ddp_out", "append")
    got = {(r.user_id, r.us) for r in spark.sql("SELECT * FROM ddp_out").collect()}
    assert got == want and got


def test_stateless_curation_ops_run_on_streams(spark, tmp_path):
    """The curation surface (simhash fingerprints, language ID,
    deterministic hash sampling) is stateless row-local — it must run
    unchanged as a Structured Streaming transformation and agree with
    the batch result. (The shuffle-free rewrites are what make this
    free: an explode+groupBy simhash would need watermarks.)"""
    from jagular_spark.operators.sampling import stratified_sample
    from jagular_spark.operators.similarity import simhash
    from jagular_spark.operators.text import language_id

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    stream = _as_stream(spark, docs, tmp_path, "docs")

    piped = stratified_sample(
        language_id(stream),
        "pred_lang",
        {"en": 0.5, "fr": 1.0, "de": 0.8, "es": 0.25},
        key_col="doc_id",
    ).select("doc_id", "pred_lang")
    _run_to_memory(piped, "curated", "append")
    got = {(r.doc_id, r.pred_lang) for r in spark.sql("SELECT * FROM curated").collect()}
    want = {
        (r.doc_id, r.pred_lang)
        for r in stratified_sample(
            language_id(docs), "pred_lang",
            {"en": 0.5, "fr": 1.0, "de": 0.8, "es": 0.25}, key_col="doc_id",
        ).select("doc_id", "pred_lang").collect()
    }
    assert got == want

    fp_stream = simhash(stream)
    _run_to_memory(fp_stream, "fps", "append")
    got_fp = {(r.doc_id, r.simhash) for r in spark.sql("SELECT * FROM fps").collect()}
    want_fp = {(r.doc_id, r.simhash) for r in simhash(docs).collect()}
    assert got_fp == want_fp

    # sequence chunking is projection+posexplode — also stream-stateless
    from jagular_spark.operators.text import chunk_documents

    _run_to_memory(chunk_documents(stream), "chunks", "append")
    got_ck = {
        tuple(r) for r in spark.sql("SELECT * FROM chunks").collect()
    }
    want_ck = {tuple(r) for r in chunk_documents(docs).collect()}
    assert got_ck == want_ck


def test_media_kernels_run_on_streams(spark, tmp_path):
    """The Arrow-batched media kernels (audio windows, resize grid) are
    per-batch maps — they must run unchanged on a stream with
    batch-equal results."""
    from jagular_spark.operators.multimodal import (
        audio_window_byte_stats,
        resize_pixel_grid,
        synthesize_media,
    )

    media = synthesize_media(spark)
    stream = _as_stream(spark, media, tmp_path, "media")

    _run_to_memory(audio_window_byte_stats(stream, window=64), "aw", "append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM aw").collect()}
    want = {tuple(r) for r in audio_window_byte_stats(media, window=64).collect()}
    assert got == want and len(got) > 0

    _run_to_memory(resize_pixel_grid(stream, 4, 4), "rg", "append")
    got2 = {tuple(r) for r in spark.sql("SELECT * FROM rg").collect()}
    want2 = {tuple(r) for r in resize_pixel_grid(media, 4, 4).collect()}
    assert got2 == want2 and len(got2) > 0


def test_stream_curation_matches_batch_on_distinct_texts(spark, tmp_path):
    """The incremental curation composition (quality -> lang -> content
    dedup -> hash sample) equals the batch replay on a duplicate-free
    corpus (where dedup is a no-op and every stage is deterministic)."""
    from jagular_spark.operators.sampling import hash_bucket
    from jagular_spark.operators.text import language_id
    from jagular_spark.streaming.pipeline import stream_curation

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn("__h__", F.md5(F.col("text").cast("binary")))
        .withColumn("__n__", F.count(F.lit(1)).over(Window.partitionBy("__h__")))
        .where(F.col("__n__") == 1)
        .select("doc_id", "text")
        .withColumn("event_ts", F.timestamp_micros(F.col("doc_id") * 1000000))
    )
    stream = _as_stream(spark, docs, tmp_path, "cur_docs")
    _run_to_memory(stream_curation(stream, "event_ts"), "curated_stream", "append")
    got = {
        (r.doc_id, round(r.quality_score, 12))
        for r in spark.sql("SELECT * FROM curated_stream").collect()
    }

    # batch replay of the same stages
    n = F.length(F.col("text")).cast("double")
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("double") / n
    digit = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double") / n
    stop = F.expr(
        "CAST(size(filter(split(trim(text), '\\\\s+'), t -> t IN ('the','a','of','and','to'))) AS DOUBLE)"
    ) / F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
    score = F.lit(0.4) * alpha + F.lit(0.3) * stop + F.lit(0.3) * (F.lit(1.0) - digit)
    s1 = language_id(
        docs.withColumn("quality_score", score), keep=("quality_score",)
    ).where((F.col("quality_score") >= 0.6) & (F.col("pred_lang") == "en"))
    want = {
        (r.doc_id, round(r.quality_score, 12))
        for r in s1.where(hash_bucket("doc_id") < int(0.5 * (1 << 32)))
        .select("doc_id", "quality_score")
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_curation_dedup_keeps_first_arrival(spark, tmp_path):
    """Crafted duplicate texts across micro-batches: the watermarked
    content dedup keeps the first-arriving copy (the batch funnel's
    min-id rule under in-order replay)."""
    from jagular_spark.streaming.pipeline import stream_curation

    # one high-quality english text, duplicated across two doc_ids that
    # BOTH pass the 50% md5 hash sample (6 and 11 do; e.g. 2 does not)
    text = "the cat and the dog of the house went to the big market and to the park"
    rows = [(6, text), (11, text)]
    schema = "doc_id long, text string"
    p1, p2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    df1 = spark.createDataFrame(rows[:1], schema).withColumn(
        "event_ts", F.timestamp_micros(F.col("doc_id") * 1000000)
    )
    df2 = spark.createDataFrame(rows[1:], schema).withColumn(
        "event_ts", F.timestamp_micros(F.col("doc_id") * 1000000)
    )
    src = str(tmp_path / "src")
    df1.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # append the second file before starting: availableNow processes the
    # files in order, one per micro-batch
    df2.coalesce(1).write.mode("append").parquet(src)
    _run_to_memory(stream_curation(stream, "event_ts"), "curated_dup", "append")
    kept = sorted(r.doc_id for r in spark.sql("SELECT doc_id FROM curated_dup").collect())
    assert kept == [6]  # first arrival survives, the later duplicate is dropped


def test_stream_lsh_candidates_match_batch(spark, tmp_path):
    """One availableNow pass emits exactly the batch band-bucket
    combinatorics: the (band-multiset of) pairs equals
    lsh_candidate_pairs' n_bands counts, and the row-local signature is
    bit-identical to the groupBy form."""
    from collections import Counter  # noqa: F401 — multiset compare

    from jagular_spark.operators.similarity import (
        lsh_candidate_pairs,
        minhash_signature,
        minhash_signature_local,
    )
    from jagular_spark.streaming.pipeline import stream_lsh_candidate_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")

    sig_g = {tuple(r) for r in minhash_signature(docs).collect()}
    sig_l = {tuple(r) for r in minhash_signature_local(docs).collect()}
    assert sig_g == sig_l

    stream = _as_stream(spark, docs, tmp_path, "lshdocs")
    _run_to_memory(stream_lsh_candidate_pairs(stream), "lsh_cand", "append")
    got = Counter(
        (r.id_a, r.id_b) for r in spark.sql("SELECT * FROM lsh_cand").collect()
    )
    want = {
        (r.id_a, r.id_b): r.n_bands for r in lsh_candidate_pairs(minhash_signature(docs)).collect()
    }
    assert dict(got) == want and len(want) > 0


def test_stream_lsh_candidates_state_across_batches(spark, tmp_path):
    """A doc arriving in a later micro-batch pairs against bucket
    members stored in GroupState from earlier batches."""
    import os

    path = str(tmp_path / "inc")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(path, exist_ok=True)
    text = "alpha beta gamma delta epsilon zeta"
    pd.DataFrame({"doc_id": [1], "text": [text]}).to_parquet(f"{path}/a.parquet")
    collected: list[tuple[int, int]] = []

    from jagular_spark.streaming.pipeline import stream_lsh_candidate_pairs

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(path)
        q = (
            stream_lsh_candidate_pairs(stream)
            .writeStream.foreachBatch(
                lambda bdf, _bid: collected.extend(
                    (r.id_a, r.id_b) for r in bdf.collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert collected == []  # lone doc, no pairs yet

    pd.DataFrame({"doc_id": [2], "text": [text]}).to_parquet(f"{path}/b.parquet")
    run_once()
    # identical text -> identical signature -> collides in ALL 4 bands
    assert sorted(collected) == [(1, 2)] * 4


def test_stream_ivfpq_index_maintenance(spark, tmp_path):
    """Serving-index maintenance is stateless once the quantizers are
    frozen: arriving vectors get their IVF cell and PQ codes from the
    same nested-literal expressions, identically to batch — the
    incremental \"add to index\" half of IVFADC."""
    from pyspark.sql import functions as F

    from jagular_spark.operators.similarity import (
        _dist_idx,
        _pq_codes,
        int_vec,
        ivf_fit_centroids,
        pq_fit_codebooks,
        with_int_norm,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    cents = ivf_fit_centroids(emb, k=4, n_iter=1, fit_fraction=1.0)
    books = pq_fit_codebooks(emb, m=4, k=4, n_iter=1, fit_fraction=1.0)

    def encode(df):
        return df.select(
            "vec_id", int_vec("embedding").alias("iv")
        ).select(
            "vec_id",
            F.array_min(_dist_idx(cents)).getField("i").cast("int").alias("cl"),
            _pq_codes(books).alias("codes"),
        )

    want = {(r.vec_id, r.cl, tuple(r.codes)) for r in encode(emb).collect()}
    stream = _as_stream(spark, emb, tmp_path, "embstream")
    _run_to_memory(encode(stream), "ivfpq_idx", "append")
    got = {
        (r.vec_id, r.cl, tuple(r.codes))
        for r in spark.sql("SELECT * FROM ivfpq_idx").collect()
    }
    assert got == want and len(got) > 0


def test_stream_fluency_matches_batch_with_frozen_model(spark, tmp_path):
    """Frozen-LM scoring: fit the bigram model in batch, score the same
    corpus as a stream — results must be bit-identical to the batch
    fit+score (same model, same docs, same integer sums)."""
    from jagular_spark.operators.text import (
        bigram_explode,
        bigram_fluency,
        bigram_model,
    )
    from jagular_spark.streaming.pipeline import stream_fluency_score

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    model = bigram_model(bigram_explode(docs)).localCheckpoint()
    stream = _as_stream(spark, docs, tmp_path, "fl_docs")
    out = stream_fluency_score(stream, model)
    _run_to_memory(out, "fluency", "complete")
    got = {tuple(r) for r in spark.sql("SELECT * FROM fluency").collect()}
    want = {tuple(r) for r in bigram_fluency(docs).collect()}
    assert got == want and len(got) > 0


def test_stream_band_energy_matches_batch_windows(spark, tmp_path):
    """Tumbling-window energy: the streaming watermarked window agg must
    emit exactly the batch per-(user, minute) integer energy."""
    from jagular_spark.streaming.pipeline import stream_band_energy

    ev = _events_batch(spark)
    stream = _as_stream(spark, ev, tmp_path, "be_ev")
    out = stream_band_energy(stream, window="1 minute", watermark="0 seconds")
    _run_to_memory(out, "band_energy", "append")
    got = {
        (r.user_id, r.win_start, r.win_end, r.n, r.power_q)
        for r in spark.sql("SELECT * FROM band_energy").collect()
    }
    q = F.expr("CAST(floor(value * 1000.0) AS BIGINT)")
    # append mode emits a window only once the watermark (= max event
    # time at availableNow completion) passes its END: the stream's
    # final still-open windows are correctly absent — mirror that
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    want = {
        tuple(r)
        for r in ev.groupBy("user_id", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(q * q).cast("long").alias("power_q"),
        )
        .select("user_id", F.col("w.start"), F.col("w.end"), "n", "power_q")
        .where(F.col("end") <= F.lit(max_ts))
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_interval_enrich_matches_batch_range_join(spark, tmp_path):
    """Stream-stream interval join == the batch range join row-for-row
    (views enriched with every purchase in the trailing 5 minutes)."""
    from jagular_spark.streaming.pipeline import stream_interval_enrich

    ev = _events_batch(spark)
    views = ev.where(F.col("event_type") == "view") if "event_type" in ev.columns else ev.where(F.col("event_id") % 2 == 0)
    buys = ev.where(F.col("event_type") == "purchase") if "event_type" in ev.columns else ev.where(F.col("event_id") % 2 == 1)
    vs = _as_stream(spark, views, tmp_path, "iv_views")
    bs = _as_stream(spark, buys, tmp_path, "iv_buys")
    out = stream_interval_enrich(vs, bs, tolerance="5 minutes", watermark="0 seconds")
    _run_to_memory(out, "enriched", "append")
    got = {
        (r.user_id, r.event_id, r.ts, r.r_ts, r.r_value)
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    want = {
        (r.user_id, r.event_id, r.ts, r.r_ts, r.r_value)
        for r in views.alias("l")
        .join(
            buys.select(
                F.col("user_id").alias("r_key"),
                F.col("ts").alias("r_ts"),
                F.col("value").alias("r_value"),
            ).alias("r"),
            (F.col("l.user_id") == F.col("r.r_key"))
            & (F.col("r.r_ts") >= F.col("l.ts") - F.expr("INTERVAL 5 minutes"))
            & (F.col("r.r_ts") <= F.col("l.ts")),
            "inner",
        )
        .collect()
    }
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# Real micro-batch triggers with late / out-of-order data: the
# availableNow replays above prove batch parity; these prove the
# WATERMARK POLICY — what gets dropped — across >= 3 distinct
# micro-batches under a processingTime trigger.
# ---------------------------------------------------------------------------


def _mins(m):
    import datetime

    return datetime.datetime(2024, 1, 1, 0, 0) + datetime.timedelta(minutes=m)


def _multi_batch_run(spark, tmp_path, name, build, feeds, output_mode="append"):
    """Drive a stream through len(feeds) micro-batches: one parquet
    file per feed, maxFilesPerTrigger=1 + processingTime trigger, with
    processAllAvailable() as the deterministic batch barrier."""
    src = str(tmp_path / f"{name}_src")
    feeds = [f.coalesce(1) for f in feeds]  # one file == one micro-batch
    schema = feeds[0].schema
    feeds[0].write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        for f in feeds[1:]:
            f.write.mode("append").parquet(src)
            q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= len(feeds), f"expected >= {len(feeds)} micro-batches"
    return spark.sql(f"SELECT * FROM {name}")


def test_sessionize_multibatch_drops_late_rows_per_watermark(spark, tmp_path):
    """stream_sessionize under a processingTime trigger, three
    micro-batches, with late rows straddling the watermark:

    - batch 1: user 1 events at minutes 0,1,2 + user 99 clock-advancer
      at 60 -> watermark after the batch = 50 (delay 10m)
    - batch 2: a LATE minute-1 duplicate-session event (behind the
      50-min watermark -> DROPPED), an accepted event at 52, a user-99
      advancer at 120 -> the [0..2] session closes with n_events = 3,
      proving the late row never joined it
    - batch 3: late user-1 event at 53 (behind the 110-min watermark ->
      DROPPED even though it would merge with the open [52] session),
      advancer at 125 -> the [52] session closes with n_events = 1

    Advancers live on their own key so they can't merge into user 1's
    sessions; the still-open tails are correctly NOT emitted in append
    mode."""
    from jagular_spark.streaming import stream_sessionize

    def rows(pairs):
        return spark.createDataFrame(
            [(u, _mins(m)) for u, m in pairs], "user_id long, ts timestamp"
        )

    out = _multi_batch_run(
        spark,
        tmp_path,
        "sess_mb",
        lambda s: stream_sessionize(s, gap="30 minutes", watermark="10 minutes"),
        [
            rows([(1, 0), (1, 1), (1, 2), (99, 60)]),
            rows([(1, 1), (1, 52), (99, 120)]),
            rows([(1, 53), (99, 125)]),
        ],
    )
    got = {(r.user_id, r.session_start, r.n_events) for r in out.collect()}
    assert got == {(1, _mins(0), 3), (1, _mins(52), 1), (99, _mins(60), 1)}, got


def test_censor_multibatch_state_and_watermark_drops(spark, tmp_path):
    """stream_censor across three micro-batches with a watermark on the
    crossings stream:

    - batch 1: channel 0 ts 100 kept (GroupState last_kept = 100);
      channel-99 advancer pushes the watermark to minute 50
    - batch 2: ts 90 arrives out-of-order but within the watermark ->
      reaches the kernel, censored against carried state (90 < 100);
      ts 140 kept (140 - 100 > width); advancer -> watermark min 110
    - batch 3: ts 5000 carries event time minute 20 (far behind the
      watermark): censor logic ALONE would keep it (5000 - 140 >
      width), so its absence proves the operator's watermark drop —
      Spark does NOT late-filter applyInPandasWithState input, so the
      kernel enforces it via getCurrentWatermarkMs (event_time_col);
      ts 180 kept (180 - 140 > width)

    Channel-0 kept set exactly {100, 140, 180}: state carries across
    batches, within-watermark disorder is censored by the kernel, and
    behind-watermark rows are dropped per the documented policy."""
    from jagular_spark.streaming import stream_censor

    def rows(pairs):
        return spark.createDataFrame(
            [(ch, int(t), _mins(m)) for ch, t, m in pairs],
            "channel_id int, ts long, event_time timestamp",
        )

    def build(stream):
        wm = stream.withWatermark("event_time", "10 minutes")
        return stream_censor(
            wm,
            width=30,
            ts_col="ts",
            partition_cols=("channel_id",),
            event_time_col="event_time",
        )

    out = _multi_batch_run(
        spark,
        tmp_path,
        "censor_mb",
        build,
        [
            rows([(0, 100, 0), (99, 1, 60)]),
            rows([(0, 90, 55), (0, 140, 55), (99, 2, 120)]),
            rows([(0, 5000, 20), (0, 180, 115)]),
        ],
    )
    kept = sorted(r.ts for r in out.where("channel_id = 0").collect())
    assert kept == [100, 140, 180], kept


def test_dup_kgram_horizon_evicts_single_occurrence_state(spark, tmp_path):
    """The dedup horizon (r9): a hash buffered as a SINGLE occurrence
    in batch 1 must be evicted once the horizon elapses — a duplicate
    arriving later is treated as fresh, so NOTHING is emitted (no
    retroactive first, no insta-mark). Control: the same two-batch feed
    with a wide horizon emits both occurrences, proving cross-batch
    retroactive marking still works and the eviction is the horizon's
    doing. Pins that buffered (never-emitted) entries are exactly as
    evictable as emitted ones."""
    from jagular_spark.streaming.pipeline import stream_dup_kgram_marks

    def rows(doc_id):
        return spark.createDataFrame(
            [(doc_id, "alpha bravo charlie delta")], "doc_id long, text string"
        )

    # wide horizon: batch-2 duplicate retro-emits batch-1's buffered mark
    out = _multi_batch_run(
        spark, tmp_path, "kg_wide",
        lambda s: stream_dup_kgram_marks(s, k=4, n_buckets=4, horizon_ms=3_600_000),
        [rows(1), rows(2)],
    )
    assert {(r.doc_id, r.pos) for r in out.collect()} == {(1, 0), (2, 0)}

    # 1 ms horizon: the buffered single-occurrence entry from batch 1 is
    # pruned at batch-2 state load (batches are >= 1 s apart under the
    # processingTime trigger), so the batch-2 arrival re-buffers fresh
    out = _multi_batch_run(
        spark, tmp_path, "kg_tiny",
        lambda s: stream_dup_kgram_marks(s, k=4, n_buckets=4, horizon_ms=1),
        [rows(1), rows(2)],
    )
    assert out.count() == 0


def test_lsh_candidates_horizon_evicts_idle_buckets(spark, tmp_path):
    """LSH bucket membership past the dedup window must not pair: two
    identical docs arriving in separate micro-batches pair under a
    wide horizon (state crossed batches) but NOT under a 1 ms horizon
    (the idle bucket's membership was pruned at state load)."""
    from jagular_spark.streaming.pipeline import stream_lsh_candidate_pairs

    text = "alpha beta gamma delta epsilon zeta"

    def rows(doc_id):
        return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")

    out = _multi_batch_run(
        spark, tmp_path, "lshh_wide",
        lambda s: stream_lsh_candidate_pairs(s, n_buckets=4, horizon_ms=3_600_000),
        [rows(1), rows(2)],
    )
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 2)}

    out = _multi_batch_run(
        spark, tmp_path, "lshh_tiny",
        lambda s: stream_lsh_candidate_pairs(s, n_buckets=4, horizon_ms=1),
        [rows(1), rows(2)],
    )
    assert out.count() == 0


def test_sessionize_streamed_rocksdb_state_store_matches_memory(spark, tmp_path):
    """SCALE.md prescribes the RocksDB state store for warehouse-scale
    streaming (state no longer bounded by executor heap); prove the
    documented config actually works: the same multi-batch
    stream_sessionize run under
    spark.sql.streaming.stateStore.providerClass = RocksDB yields the
    exact result set of the default (HDFS-backed in-memory) provider,
    and the query's state-operator metrics prove RocksDB really
    engaged (customMetrics carries rocksdb* counters)."""
    from jagular_spark.streaming import stream_sessionize

    ev = _events_batch(spark).where(F.col("user_id") < 20)
    # deterministic 3-file split -> 3 micro-batches with carried state
    feeds = [
        ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i).coalesce(1)
        for i in range(3)
    ]

    def run(name, provider=None):
        key = "spark.sql.streaming.stateStore.providerClass"
        old = spark.conf.get(key, None)
        if provider:
            spark.conf.set(key, provider)
        try:
            src = str(tmp_path / f"{name}_src")
            feeds[0].write.mode("overwrite").parquet(src)
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = (
                stream_sessionize(stream, gap="30 minutes", watermark="0 seconds")
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(processingTime="1 seconds")
                .start()
            )
            try:
                q.processAllAvailable()
                for f in feeds[1:]:
                    f.write.mode("append").parquet(src)
                    q.processAllAvailable()
                metrics = (
                    q.recentProgress[-1]["stateOperators"][0]["customMetrics"]
                    if q.recentProgress
                    else {}
                )
            finally:
                q.stop()
            rows = {
                (r.user_id, r.session_start, r.n_events)
                for r in spark.sql(f"SELECT * FROM {name}").collect()
            }
            return rows, metrics
        finally:
            if provider:
                if old:
                    spark.conf.set(key, old)
                else:
                    spark.conf.unset(key)

    base_rows, base_metrics = run("sess_mem_prov")
    rocks_rows, rocks_metrics = run(
        "sess_rocks_prov",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    assert rocks_rows == base_rows
    assert len(rocks_rows) > 0
    assert any(k.startswith("rocksdb") for k in rocks_metrics), rocks_metrics
    assert not any(k.startswith("rocksdb") for k in base_metrics)


def test_stream_lsh_hot_bucket_freezes_at_cap(spark, tmp_path):
    """max_members: 5 identical docs all band into the same buckets; a
    cap of 3 emits pairs only among the first 3 arrivals (3 pairs per
    band — the frozen-prefix rule), and the uncapped run emits the
    full 10 per band. Identical texts also collide in every one of the
    4 bands, so the counts are exact multiples."""
    from jagular_spark.streaming.pipeline import stream_lsh_candidate_pairs

    docs = spark.createDataFrame(
        [(i, "the same exact duplicated text content here") for i in range(5)],
        "doc_id long, text string",
    )
    stream = _as_stream(spark, docs, tmp_path, "hotlsh")
    _run_to_memory(
        stream_lsh_candidate_pairs(stream, max_members=3), "lsh_capped", "append"
    )
    capped = spark.sql("SELECT * FROM lsh_capped").collect()
    assert len(capped) == 4 * 3  # 4 bands x C(3,2)
    assert {(r.id_a, r.id_b) for r in capped} == {(0, 1), (0, 2), (1, 2)}

    stream2 = _as_stream(spark, docs, tmp_path, "hotlsh2")
    _run_to_memory(stream_lsh_candidate_pairs(stream2), "lsh_uncapped", "append")
    assert spark.sql("SELECT count(*) c FROM lsh_uncapped").collect()[0].c == 4 * 10


def test_stream_dsir_scores_parity_with_batch(spark, tmp_path):
    """Frozen-model streaming DSIR == batch dsir_scores bit-for-bit on
    the same fit snapshot (score_num exact BIGINT, score the same two
    IEEE divisions), with ZERO stateful operators — append mode, no
    watermark, no state store."""
    from jagular_spark.operators.selection import dsir_fit_deltas, dsir_scores
    from jagular_spark.streaming.pipeline import stream_dsir_scores

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    raw = docs.where("doc_id % 50 != 0")
    tgt = docs.where("doc_id % 50 = 0")
    batch = {
        r.doc_id: (r.n_grams, r.score_num, r.score)
        for r in dsir_scores(raw, tgt).collect()
    }
    delta, mt, mr = dsir_fit_deltas(raw, tgt)
    stage = str(tmp_path / "docs")
    raw.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(raw.schema).parquet(stage)
    q = (
        stream_dsir_scores(stream, delta, mt, mr)
        .writeStream.format("memory")
        .queryName("dsir_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_grams, r.score_num, r.score)
        for r in spark.table("dsir_parity").collect()
    }
    assert got == batch
    # stateless by construction: no state-store rows were ever created
    prog = q.lastProgress
    assert all(
        (op.get("numRowsTotal") or 0) == 0
        for op in (prog.get("stateOperators") or [])
    )


def test_stream_token_budget_sample_parity_with_batch(spark, tmp_path):
    """Frozen-threshold streaming mixture sampling == batch
    token_budget_sample bit-for-bit on the same fit snapshot (the
    thresholds are exact BIGINTs, membership a pure md5 compare), with
    ZERO stateful operators — append mode, no watermark, no state
    store."""
    from jagular_spark.operators.sampling import (
        token_budget_sample,
        token_budget_thresholds,
    )
    from jagular_spark.streaming.pipeline import stream_token_budget_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    budgets = {"src0": 120, "src1": 10**9, "src2": 40}
    batch = {
        (r.doc_id, r.source, r.n_tokens)
        for r in token_budget_sample(docs, budgets).collect()
    }
    thresholds = token_budget_thresholds(docs, budgets)
    stage = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(docs.schema).parquet(stage)
    q = (
        stream_token_budget_sample(stream, thresholds)
        .writeStream.format("memory")
        .queryName("tbs_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.doc_id, r.source, r.n_tokens)
        for r in spark.table("tbs_parity").collect()
    }
    assert got == batch and batch
    prog = q.lastProgress
    assert all(
        (op.get("numRowsTotal") or 0) == 0
        for op in (prog.get("stateOperators") or [])
    )


def test_stream_bpe_token_counts_parity_with_batch(spark, tmp_path):
    """Frozen-tokenizer token accounting on a stream == the batch
    bpe_token_count_col expression row for row (the merges fit offline
    on the absolute hash-sample; serving is literal replace chains),
    with ZERO stateful operators — append mode, no watermark, no
    state store."""
    from jagular_spark.operators.bpe import bpe_fit, bpe_token_count_col
    from jagular_spark.streaming.pipeline import stream_bpe_token_counts

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = bpe_fit(docs, n_merges=8, fit_rows=64)
    batch = {
        (r.doc_id, r.n)
        for r in docs.select(
            "doc_id", bpe_token_count_col("text", merges).alias("n")
        ).collect()
    }
    stage = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(docs.schema).parquet(stage)
    q = (
        stream_bpe_token_counts(stream, merges)
        .writeStream.format("memory")
        .queryName("bpe_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.doc_id, r.n_bpe_tokens) for r in spark.table("bpe_parity").collect()
    }
    assert got == batch and batch
    assert any(n > 0 for _, n in batch)
    prog = q.lastProgress
    assert all(
        (op.get("numRowsTotal") or 0) == 0
        for op in (prog.get("stateOperators") or [])
    )


def test_training_shard_pack_stream_matches_batch(spark, tmp_path):
    """The terminal composition's streaming twin: token-budget
    admission + shard assignment are stateless frozen expressions; the
    pack's running offset is ONE long of state per shard. Under a
    one-pass drain the per-doc (shard, nt, off) rows — and therefore
    the rolled-up manifest — are bit-identical to the batch
    composition (same oracle)."""
    from pyspark.sql import Window, functions as F

    from jagular_spark.operators.sampling import (
        shuffle_shards,
        token_budget_sample,
        token_budget_thresholds,
    )
    from jagular_spark.streaming.pipeline import stream_training_shard_pack

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    budgets = {"src0": 300, "src1": 200, "src2": 250}
    sampled = token_budget_sample(docs, budgets, group_col="source").select(
        "doc_id", "n_tokens"
    )
    sharded = shuffle_shards(sampled, "doc_id", n_shards=4, salt="t")
    w = (
        Window.partitionBy("shard")
        .orderBy("pos_in_shard")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    batch = {
        (r.shard, r.doc_id, r.nt, r.off)
        for r in sharded.select(
            "shard",
            "doc_id",
            F.col("n_tokens").alias("nt"),
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off"),
        ).collect()
    }
    thresholds = token_budget_thresholds(docs, budgets, group_col="source")
    stage = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(docs.schema).parquet(stage)
    q = (
        stream_training_shard_pack(stream, thresholds, n_shards=4, salt="t")
        .writeStream.format("memory")
        .queryName("shardpack_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.shard, r.doc_id, r.nt, r.off)
        for r in spark.table("shardpack_parity").collect()
    }
    assert got == batch and batch
    # bounded state: one row per shard, never per document
    prog = q.lastProgress
    tot = sum(
        (op.get("numRowsTotal") or 0) for op in (prog.get("stateOperators") or [])
    )
    assert 0 < tot <= 4


def test_training_shard_pack_admission_salt_is_separate(spark, tmp_path):
    """r16 advice: ``salt`` feeds the shard/order hashes only, while
    admission membership is salted by the separate ``admission_salt``
    (default "" = batch-twin parity, which the parity tests above rely
    on: batch admission unsalted + stream shard salt "t"). Pin that
    each salt reaches its own expression — the old single-`salt`
    signature implied one salt governed the whole operator and would
    silently diverge from a batch pipeline that salted admission."""
    from jagular_spark.streaming.pipeline import stream_training_shard_pack

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    stage = str(tmp_path / "docs_adm")
    docs.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(docs.schema).parquet(stage)

    df = stream_training_shard_pack(
        stream, {"src0": 300}, n_shards=4,
        salt="SHARDSALT", admission_salt="ADMITSALT",
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "SHARDSALT" in plan and "ADMITSALT" in plan
    # and the default keeps admission UNSALTED (batch-twin parity)
    df0 = stream_training_shard_pack(
        stream, {"src0": 300}, n_shards=4, salt="SHARDSALT"
    )
    plan0 = df0._jdf.queryExecution().analyzed().toString()
    assert "SHARDSALT" in plan0 and "ADMITSALT" not in plan0


def test_training_shard_pack_multibatch_semantics(spark, tmp_path):
    """Under a MULTI-batch drain (maxFilesPerTrigger=1) the pack is a
    well-defined incremental semantics: offsets still begin at 0 and
    stack contiguously per shard (the state carries across batches),
    so the order-independent manifest columns (n_docs, n_tokens,
    n_sequences = ceil(sum/2048)) are batch-split-invariant and equal
    the batch composition's; only the order-DEPENDENT straddle flags
    may differ — which is why the driver query drains the stage in
    one availableNow batch."""
    from pyspark.sql import functions as F

    from jagular_spark.operators.sampling import (
        token_budget_sample,
        token_budget_thresholds,
    )
    from jagular_spark.streaming.pipeline import stream_training_shard_pack

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    budgets = {"src0": 300, "src1": 200, "src2": 250}
    thresholds = token_budget_thresholds(docs, budgets, group_col="source")
    stage = str(tmp_path / "docs")
    docs.repartition(5).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        stream_training_shard_pack(stream, thresholds, n_shards=4, salt="t")
        .writeStream.format("memory")
        .queryName("shardpack_multibatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.table("shardpack_multibatch")
    # offsets stack contiguously per shard: sorted offs == cumsum of nts
    rows = sorted(
        ((r.shard, r.off, r.nt) for r in got.collect()),
    )
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for s, off, nt in rows:
        by_shard.setdefault(s, []).append((off, nt))
    for s, offs in by_shard.items():
        expect = 0
        for off, nt in sorted(offs):
            assert off == expect, (s, off, expect)
            expect = off + nt
    # order-independent manifest columns equal the batch composition's
    sampled = token_budget_sample(docs, budgets, group_col="source")
    from jagular_spark.operators.sampling import shuffle_shards

    sharded = shuffle_shards(
        sampled.select("doc_id", "n_tokens"), "doc_id", n_shards=4, salt="t"
    )
    batch = {
        (r.shard, r.n_docs, r.n_tokens)
        for r in sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .collect()
    }
    stream_agg = {
        (r.shard, r.n_docs, r.n_tokens)
        for r in got.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
        .collect()
    }
    assert stream_agg == batch and batch


def test_stream_dedup_state_evicted_past_watermark(spark, tmp_path):
    """r17: stream_dedup moved to dropDuplicatesWithinWatermark. Plain
    dropDuplicates with a (keys, ts) subset that lacks the event-time
    column NEVER evicts state — one row per distinct key ever seen,
    unbounded — so the docstring's bounded-memory contract was false.
    Three micro-batches: once the watermark passes batch 1's event
    times, its dedup entries are evicted and total state rows equal
    the still-in-flight entries only (the old form retained all four);
    the output is still exactly one row per (key, ts)."""
    from jagular_spark.streaming import stream_dedup

    src = str(tmp_path / "ddp_evict_src")
    feeds = [
        spark.createDataFrame(
            [(1, 100, _mins(0)), (1, 100, _mins(0)), (1, 101, _mins(0))],
            "user_id long, us long, ts timestamp",
        ),
        spark.createDataFrame(
            [(1, 200, _mins(60))], "user_id long, us long, ts timestamp"
        ),
        spark.createDataFrame(
            [(1, 201, _mins(61))], "user_id long, us long, ts timestamp"
        ),
    ]
    feeds = [f.coalesce(1) for f in feeds]
    feeds[0].write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(feeds[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_dedup(stream, "10 seconds", "ts", key_cols=["user_id"], ts_col="us")
        .writeStream.format("memory")
        .queryName("ddp_evict")
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        for f in feeds[1:]:
            f.write.mode("append").parquet(src)
            q.processAllAvailable()
        prog = q.lastProgress
        n_state = sum(
            (op.get("numRowsTotal") or 0)
            for op in (prog.get("stateOperators") or [])
        )
    finally:
        q.stop()
    got = sorted(r.us for r in spark.sql("SELECT * FROM ddp_evict").collect())
    assert got == [100, 101, 200, 201]  # dedup'd output, duplicates gone
    # batch-1 entries (event time minute 0) are far behind the final
    # watermark (minute ~61 - 10 s) -> evicted; only the in-flight tail
    # remains. The pre-r17 form reported 4 here.
    assert 0 < n_state <= 2, n_state


def test_stream_crossings_rejects_unknown_polarity(spark):
    """Parity with the batch twin (operators/spikes.crossings raises
    ValueError): an unrecognized polarity must not silently fall
    through to both-polarity detection."""
    import pytest

    from jagular_spark.streaming import stream_crossings

    ev = _events_batch(spark).select("user_id", F.col("value"))
    with pytest.raises(ValueError, match="polarity"):
        stream_crossings(ev, threshold=1.0, polarity="NEG")


def test_stream_interpolate_offgrid_matches_batch(spark, tmp_path):
    """Gaps that are NOT a multiple of step (r17): the batch twin fills
    sequence(left+step, right-step, step) — exactly n_missing points —
    while the old streaming kernel's arange(left+step, right, step)
    emitted extra rows inside (right-step, right). Misaligned gaps must
    produce bit-identical fills on both paths."""
    from jagular_spark.operators import interpolate_gaps
    from jagular_spark.streaming import stream_interpolate

    rows = []
    for ch in (1, 2):
        # step=4 grid with off-grid gaps: 0->10 (n_missing=1, fill {4}),
        # 10->27 (n_missing=3 > max_gap, skip), 27->38 (n_missing=1, {31})
        for t, v in ((0, 100), (10, 140), (27, 300), (38, 260)):
            rows.append((ch, t, ch * 1000 + v))
    df = spark.createDataFrame(rows, "channel_id int, ts long, value int")

    want = {
        (r.channel_id, r.ts, r.value)
        for r in interpolate_gaps(
            df, max_gap_size=2, partition_cols=["channel_id"], step=4
        ).collect()
    }
    stream = _as_stream(spark, df, tmp_path, "interp_og")
    out = stream_interpolate(
        stream, max_gap_size=2, partition_cols=["channel_id"], step=4
    )
    _run_to_memory(out, "interp_og_out", "append")
    got = {
        (r.channel_id, r.ts, r.value)
        for r in spark.sql("SELECT * FROM interp_og_out").collect()
    }
    assert got == want
    assert len(got) == len(rows) + 4  # exactly one fill per qualifying gap


def test_streaming_package_exports_every_pipeline_operator(spark):
    """One import surface (r17): every public stream_* operator defined
    in streaming/pipeline.py is re-exported by the package __init__."""
    import jagular_spark.streaming as pkg
    from jagular_spark.streaming import pipeline

    ops = {
        n for n in dir(pipeline)
        if n.startswith("stream_") and callable(getattr(pipeline, n))
    }
    missing = {n for n in ops if not hasattr(pkg, n)}
    assert not missing, missing


def test_censor_watermark_drop_independent_of_session_timezone(spark, tmp_path):
    """The r18 fix for the r17-advice bind-time timezone capture:
    stream_censor's lateness cutoff is computed by unix_millis IN THE
    PLAN, so changing spark.sql.session.timeZone between sessions (or
    a checkpoint restart under a different zone) cannot shift it. Run
    the canonical 3-batch watermark scenario under a -06:00 session
    zone and require the identical kept set {100, 140, 180} — under
    the old kernel-side localize, a zone captured at build time that
    no longer matched Arrow's session-local naive timestamps shifted
    every event time by the zone delta, flipping drop decisions."""
    from jagular_spark.streaming import stream_censor

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Chicago")
    try:
        def rows(pairs):
            return spark.createDataFrame(
                [(ch, int(t), _mins(m)) for ch, t, m in pairs],
                "channel_id int, ts long, event_time timestamp",
            )

        def build(stream):
            wm = stream.withWatermark("event_time", "10 minutes")
            return stream_censor(
                wm,
                width=30,
                ts_col="ts",
                partition_cols=("channel_id",),
                event_time_col="event_time",
            )

        out = _multi_batch_run(
            spark,
            tmp_path,
            "censor_tz",
            build,
            [
                rows([(0, 100, 0), (99, 1, 60)]),
                rows([(0, 90, 55), (0, 140, 55), (99, 2, 120)]),
                rows([(0, 5000, 20), (0, 180, 115)]),
            ],
        )
        kept = sorted(r.ts for r in out.where("channel_id = 0").collect())
        assert kept == [100, 140, 180], kept
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_stream_curation_content_keyed_duplicate_invariant(spark, tmp_path):
    """content_keyed=True emits only pure functions of the TEXT, so
    planted duplicate-text docs (different doc_ids — the case where
    dropDuplicatesWithinWatermark's first-arrival winner is
    nondeterministic) yield exactly one {content_hash, quality_score}
    row regardless of which arrival won, and re-running the drain
    reproduces the identical row set. The sf0.01 registry corpus is
    duplicate-free, so this pin is the only place the
    arrival-order-invariance argument is actually exercised."""
    from pyspark.sql import functions as F

    from jagular_spark.streaming.pipeline import stream_curation

    good = (
        "the cat and the dog of a house and the tree to a garden "
        "and the road of the town to a river and the hill"
    )
    rows = [
        (1, good),
        (2, good),          # exact duplicate, different doc_id
        (3, good + " extra words of the story and the end"),
        (4, "zz9 88x 77q"),  # fails quality/language
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "event_time", F.timestamp_millis(F.col("doc_id"))
    )
    src = str(tmp_path / "cur_src")
    df.write.mode("overwrite").parquet(src)

    def drain(name):
        stream = spark.readStream.schema(df.schema).parquet(src)
        q = (
            stream_curation(stream, "event_time", sample_fraction=1.0,
                            content_keyed=True)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {tuple(r) for r in spark.table(name).collect()}

    a = drain("cur_ck_a")
    b = drain("cur_ck_b")
    assert a == b and len(a) == 2  # dup collapsed, junk filtered
    hashes = {h for h, _ in a}
    import hashlib

    assert hashlib.md5(good.encode()).hexdigest() in hashes
