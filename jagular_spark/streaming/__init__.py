from jagular_spark.streaming.pipeline import (  # noqa: F401
    stream_censor,
    stream_crossings,
    stream_dedup,
    stream_fluency_score,
    stream_interpolate,
    stream_sessionize,
)
