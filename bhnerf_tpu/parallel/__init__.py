from bhnerf_tpu.parallel.mesh import (create_mesh, frame_sharding,
                                      replicate, replicated, shard_frames)
