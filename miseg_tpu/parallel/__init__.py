from .mesh import (make_mesh, batch_sharding, replicated_sharding,  # noqa: F401
                   shard_batch, host_shard_info)
from .fsdp import (leaf_spec, tree_shardings, shard_state,  # noqa: F401
                   sharded_fraction)
from .spatial import spatial_spec, shard_spatial_batch  # noqa: F401
from .tensor import (tp_leaf_spec, tp_param_shardings,  # noqa: F401
                     tp_state_shardings, shard_state_tp)
from .pipeline import (pipeline_apply, stack_stages,  # noqa: F401
                       pipeline_spec, place_pipeline_params)
