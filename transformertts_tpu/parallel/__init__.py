from transformertts_tpu.parallel.mesh import (MeshConfig, make_mesh,
                                              batch_sharding,
                                              maybe_initialize_distributed,
                                              replicated, shard_batch,
                                              shard_params)

__all__ = ['MeshConfig', 'make_mesh', 'batch_sharding',
           'maybe_initialize_distributed', 'replicated', 'shard_batch',
           'shard_params']
