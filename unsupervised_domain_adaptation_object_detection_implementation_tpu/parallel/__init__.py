from .mesh import (make_mesh, mesh_from_cfg, batch_sharding, replicated,
                   shard_batch, replicate_state)
from .multihost import init_multihost, global_batch_from_host_data
from .shardings import (param_shardings, shard_train_state,
                        fsdp_param_shardings)

__all__ = ['make_mesh', 'mesh_from_cfg', 'batch_sharding', 'replicated',
           'shard_batch', 'replicate_state', 'init_multihost',
           'global_batch_from_host_data', 'param_shardings',
           'shard_train_state', 'fsdp_param_shardings']
