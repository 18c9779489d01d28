"""Reference-API compatibility facade for the training-orchestration layer.

Mirrors `bhnerf.optimization` (reference bhnerf/optimization.py);
implementations live in `bhnerf_tpu.train`.
"""
from bhnerf_tpu.train.logging import SummaryWriter, StepTimer, profile_trace
from bhnerf_tpu.train.optimizer import (LogFn, Optimizer,
                                        TemporalBatchedArgs, TrainStep,
                                        total_movie_loss)
from bhnerf_tpu.parallel.mesh import shard_frames as shard
