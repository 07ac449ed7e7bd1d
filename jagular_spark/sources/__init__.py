from jagular_spark.sources.rec import (  # noqa: F401
    RecConfig,
    extract_channels,
    file_catalog,
    read_config,
    read_packets,
    read_samples,
    timestamp_bounds,
)
