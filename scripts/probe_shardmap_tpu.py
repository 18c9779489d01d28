"""Probe: fused Pallas kernel inside shard_map on the real TPU chip.

Single chip -> 1-sized 'ray' axis; validates Mosaic lowering + timing of
the shard_map-wrapped production step vs the plain compact step.
Run: PYTHONPATH=/root/repo python scripts/probe_shardmap_tpu.py
"""
import os
import sys
import time

os.environ['JAX_PLATFORMS'] = ''
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bhnerf_tpu.utils import compilation_cache_dir
jax.config.update('jax_compilation_cache_dir', compilation_cache_dir())

from jax.sharding import Mesh
from bhnerf_tpu import constants, units
from bhnerf_tpu.geodesics import image_plane_geos
from bhnerf_tpu.geodesics.dataset import Geodesics
from bhnerf_tpu.models import NeRFPredictor
from bhnerf_tpu.train import TrainState, make_optimizer, raytracing_args
from bhnerf_tpu.train.step import compact_raytracing_args, make_step_fns

print('backend:', jax.default_backend(), jax.devices())

num = 64
ngeo = 100
fov = 16.0
cache = f'/tmp/bhnerf_tpu_geos_bench_{num}x{num}x{ngeo}_f{fov}.npz'
if os.path.exists(cache):
    geos = Geodesics.load(cache)
else:
    geos = image_plane_geos(0.2, np.deg2rad(60.0), (-fov / 2, fov / 2),
                            (-fov / 2, fov / 2), ngeo=ngeo, num_alpha=num,
                            num_beta=num, n_fine=4096)
    geos.save(cache)
Omega = geos.keplerian_omega()
t_injection = -float(geos.r_o + fov / 4)
GM_hr = constants.GM_c3(constants.sgra_mass).to('hr').value
nt = 64
t_frames = np.linspace(0.0, 200.0 * GM_hr, nt).astype(np.float32)
rt = raytracing_args(geos, Omega, t_injection,
                     units.Quantity(t_frames[0], 'hr'))
predictor = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                          z_width=2.0, compute_dtype='bfloat16')

mesh = Mesh(np.asarray(jax.devices()).reshape(1, 1), ('data', 'ray'))
crt_plain = compact_raytracing_args(rt, predictor)
crt_sh = compact_raytracing_args(rt, predictor, mesh=mesh)

rng = np.random.default_rng(0)
target = jnp.asarray(rng.random((nt, num, num), dtype=np.float32))
batch = (target, jnp.ones_like(target), jnp.zeros_like(target),
         jnp.asarray(t_frames),
         np.asarray(rng.choice(nt, 6, replace=False), np.int32))

grad_step, _ = make_step_fns(predictor, kind='image', dtype='full',
                             donate_state=True, fused=True, gather=True)


def run(crt, label):
    global batch
    if crt.mesh is not None:
        # production placement (TemporalBatchedArgs.ensure_placed +
        # TrainStep.__call__ committed indices): EVERY input committed
        # on the mesh, or pjit falls off the fast dispatch path and
        # re-shards per call (a per-step re-upload behind the tunnel)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(crt.mesh, P())
        batch = tuple(jax.device_put(jnp.asarray(b), sh) for b in batch)
    state = TrainState.create(predictor.init_params(seed=0),
                              make_optimizer(50000))
    loss, state, _ = grad_step(state, *batch, crt, 1.0)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(50):
        loss, state, _ = grad_step(state, *batch, crt, 1.0)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / 50
    print(f'{label}: {1 / dt:.2f} steps/s  loss={float(np.asarray(loss)):.3f}')
    return float(np.asarray(loss))


l1 = run(crt_plain, 'plain compact+fused')
l2 = run(crt_sh, 'shard_map compact+fused')
assert np.isclose(l1, l2, rtol=1e-4), (l1, l2)
print('OK: losses match')
