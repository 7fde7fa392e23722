"""Device-mesh / sharding helpers (data-parallel over ICI/DCN)."""
from selfcorr_tpu.parallel.sharding import (  # noqa: F401
    init_distributed,
    local_rows,
    local_value,
    make_mesh,
    process_row_range,
    replicate,
    shard_batch,
)
