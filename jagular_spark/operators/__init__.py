from jagular_spark.operators.timestamps import (  # noqa: F401
    check_timestamps,
    contiguous_segments,
    dedup_keep_first,
    duplicate_timestamps,
    gap_lengths,
    infer_step,
    is_sorted,
)
from jagular_spark.operators.interpolate import interpolate_gaps  # noqa: F401
