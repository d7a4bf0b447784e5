from .mesh import make_mesh, batch_spec, replicated_spec
from .sharding import (
    make_global_batch_array,
    make_param_shardings,
    make_replicated_array,
    param_partition_spec,
    shard_params,
)
