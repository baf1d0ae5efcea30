from gridnext_tpu.parallel.mesh import (  # noqa: F401
    default_mesh_shape,
    make_mesh,
    replicate,
    shard_grid_batch,
    shard_spot_batch,
    shard_token_batch,
)
from gridnext_tpu.parallel.multihost import (  # noqa: F401
    global_grid_batch,
    global_spot_batch,
    initialize_multihost,
    is_primary,
    local_shard_indices,
)
