"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding semantics (psum/NamedSharding) are backend-agnostic, so
an 8-device CPU mesh validates the TPU parallel paths (SURVEY.md §4).
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_threefry_partitionable', True)
