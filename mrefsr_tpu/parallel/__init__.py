from .mesh import (batch_sharding, get_data_mesh, put_sharded, replicate,
                   replicate_sharding, shard_batch)

__all__ = ['get_data_mesh', 'batch_sharding', 'replicate_sharding',
           'shard_batch', 'replicate', 'put_sharded']
