from jagular_spark.sources.bucketed import (  # noqa: F401
    read_table,
    write_bucketed_table,
)
from jagular_spark.sources.rec import (  # noqa: F401
    RecConfig,
    compact_parquet,
    extract_channels,
    file_catalog,
    ns5_header,
    read_config,
    read_ns5_channel,
    read_packets,
    read_raw_channel,
    read_samples,
    read_scaled_channel,
    timestamp_bounds,
)
from jagular_spark.sources.spikes_io import (  # noqa: F401
    load_spikes,
    load_spikes_flat,
    save_spikes,
    save_spikes_flat,
)
