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
from jagular_spark.operators.graph import connected_components, dedup_clusters  # noqa: F401
from jagular_spark.operators.sampling import hash_sample, stratified_sample  # noqa: F401
