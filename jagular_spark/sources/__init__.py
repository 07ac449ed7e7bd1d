from jagular_spark.sources.rec import (  # noqa: F401
    RecConfig,
    extract_channels,
    file_catalog,
    read_config,
    read_packets,
    read_raw_channel,
    read_samples,
    read_scaled_channel,
    timestamp_bounds,
)
