"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding semantics (psum/NamedSharding) are backend-agnostic, so
an 8-device CPU mesh validates the TPU parallel paths (SURVEY.md §4).
"""
import os

# force CPU: the ambient environment exports JAX_PLATFORMS=axon (the real
# TPU chip), but tests need the virtual 8-device mesh, complex dtypes, and
# determinism of the CPU backend. Perf benchmarks (bench.py) use the TPU.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# the ambient axon TPU plugin ignores the JAX_PLATFORMS env var; the config
# knob does force the CPU backend
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_threefry_partitionable', True)

# persistent compilation cache: the CI box has a single CPU core and
# single-threaded XLA compiles dominate the suite; cache them across runs
from bhnerf_tpu.utils import compilation_cache_dir
jax.config.update('jax_compilation_cache_dir',
                  compilation_cache_dir())
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
