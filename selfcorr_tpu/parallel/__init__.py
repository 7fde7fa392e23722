"""Device-mesh / sharding helpers (data-parallel over ICI)."""
from selfcorr_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)
