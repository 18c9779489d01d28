from bhnerf_tpu.parallel.mesh import (create_mesh, frame_sharding,
                                      ray_sharding_spec, replicate,
                                      replicated, shard_frames)
