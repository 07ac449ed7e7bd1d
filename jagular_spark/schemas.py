"""Canonical relational schemas for the engine (SURVEY §1.5).

The reference's packet stream / per-channel columnar store / epoch /
spike-record shapes (``jagular/readers.py:335-338``,
``jagular/utils.py:441-450``, ``jagular/spikes.py:178-181``) map onto
these DataFrame schemas. Spark has no unsigned ints, so the uint32
sample counters ride in ``LongType``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Decoded raw scan: one row per packet (sample tick across all channels).
PACKETS_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.IntegerType(), False),
        T.StructField("packet_idx", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("channels", T.ArrayType(T.ShortType()), False),
    ]
)

# Exploded columnar stream: the engine-canonical shape most operators use.
SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.IntegerType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("value", T.ShortType(), False),
    ]
)

# File catalog with per-file timestamp bounds (partition-pruning stats).
FILES_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.IntegerType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("ts_start", T.LongType(), False),
        T.StructField("ts_stop", T.LongType(), False),
        T.StructField("n_packets", T.LongType(), True),
    ]
)

# Gaps-and-islands output: [ts_start, ts_stop) per contiguous segment.
SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("ts_start", T.LongType(), False),
        T.StructField("ts_stop", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
    ]
)

# Spike detection / alignment output.
SPIKES_SCHEMA = T.StructType(
    [
        T.StructField("channel_group", T.IntegerType(), False),
        T.StructField("peak_ts", T.LongType(), False),
        T.StructField("frac_peak", T.DoubleType(), True),
        T.StructField("waveform", T.ArrayType(T.ArrayType(T.FloatType())), True),
    ]
)
