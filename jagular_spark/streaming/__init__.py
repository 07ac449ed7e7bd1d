from jagular_spark.streaming.pipeline import (  # noqa: F401
    stream_censor,
    stream_crossings,
    stream_dedup,
    stream_interpolate,
    stream_sessionize,
)
