"""Device-mesh and sharding policies.

The reference's only parallelism is frame-data-parallel jax.pmap with
pmean gradient sync (reference bhnerf/optimization.py:209-216,
network.py:620; SURVEY.md §2.4). The TPU-native equivalent is a single
jax.sharding.Mesh over ICI with two logical axes:

* 'data' — movie frames (the reference's pmap axis), and
* 'ray'  — image-plane rows (num_alpha), the structural analog of
  sequence parallelism for this workload: rays are embarrassingly
  parallel until the per-pixel reduction / image->visibility matmul,
  where XLA inserts the collective automatically.

Training steps are plain `jit`; sharding propagates from NamedSharding'd
inputs, and gradient all-reduce over replicated params is inserted by the
partitioner (no hand-written collectives).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape=None, axis_names=('data', 'ray'), devices=None):
    """Create a ('data', 'ray') mesh over the available devices.

    shape=None puts every device on the data axis (frame-DP, the
    reference's strategy); pass e.g. (4, 2) to also shard rays.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f'mesh shape {shape} != #devices {n}')
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def frame_sharding(mesh):
    """Sharding for per-frame batched tensors: leading axis over 'data'."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_frames(tree, mesh):
    """Place per-frame arrays (leading axis = frames) on the mesh."""
    sh = frame_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def ray_sharding_spec(ndim, mesh, ray_axis):
    """PartitionSpec sharding array axis `ray_axis` over the 'ray' mesh
    axis, everything else replicated."""
    spec = [None] * ndim
    spec[ray_axis] = 'ray'
    return NamedSharding(mesh, P(*spec))


