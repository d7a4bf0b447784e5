from .mesh import make_mesh, batch_spec, replicated_spec
from .sharding import param_partition_spec, shard_params, make_param_shardings
