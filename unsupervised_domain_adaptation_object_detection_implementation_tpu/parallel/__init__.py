from .mesh import (make_mesh, batch_sharding, replicated, shard_batch,
                   replicate_state)
from .multihost import init_multihost, global_batch_from_host_data

__all__ = ['make_mesh', 'batch_sharding', 'replicated', 'shard_batch',
           'replicate_state', 'init_multihost',
           'global_batch_from_host_data']
