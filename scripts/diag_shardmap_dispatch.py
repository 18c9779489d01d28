"""Diagnose per-call host overhead of the shard_map step on the chip."""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ['JAX_PLATFORMS'] = ''

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bhnerf_tpu.utils import compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir', compilation_cache_dir())

    from bhnerf_tpu import constants, units
    from bhnerf_tpu.geodesics.dataset import Geodesics
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.train import TrainState, make_optimizer, raytracing_args
    from bhnerf_tpu.train.step import compact_raytracing_args, make_step_fns

    fov, num, ngeo, nt = 16.0, 64, 100, 64
    cache = f'/tmp/bhnerf_tpu_geos_bench_{num}x{num}x{ngeo}_f{fov}.npz'
    geos = Geodesics.load(cache)
    GM_hr = constants.GM_c3(constants.sgra_mass).to('hr').value
    rt = raytracing_args(geos, geos.keplerian_omega(),
                         -float(geos.r_o + 4), units.Quantity(0.0, 'hr'))
    predictor = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                              z_width=2.0, compute_dtype='bfloat16')
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 1), ('data', 'ray'))
    crt = compact_raytracing_args(rt, predictor, mesh=mesh)

    rng = np.random.default_rng(0)
    sh = NamedSharding(mesh, P())
    target = jax.device_put(
        jnp.asarray(rng.random((nt, num, num), dtype=np.float32)), sh)
    batch = (target, jax.device_put(jnp.ones_like(target), sh),
             jax.device_put(jnp.zeros_like(target), sh),
             jax.device_put(jnp.asarray(
                 np.linspace(0, 200 * GM_hr, nt, dtype=np.float32)), sh),
             jax.device_put(jnp.asarray(
                 rng.choice(nt, 6, replace=False).astype(np.int32)), sh))
    grad_step, _ = make_step_fns(predictor, kind='image', dtype='full',
                                 donate_state=True, fused=True, gather=True)
    state = TrainState.create(predictor.init_params(seed=0),
                              make_optimizer(50000))
    t0 = time.perf_counter()
    loss, state, _ = grad_step(state, *batch, crt, 1.0)
    jax.block_until_ready(loss)
    print(f'first call (compile): {time.perf_counter() - t0:.1f}s')

    for _ in range(3):
        loss, state, _ = grad_step(state, *batch, crt, 1.0)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(10):
        loss, state, _ = grad_step(state, *batch, crt, 1.0)
    jax.block_until_ready(loss)
    print(f'steady state: {(time.perf_counter() - t0) * 100:.1f} ms/step')

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(5):
        loss, state, _ = grad_step(state, *batch, crt, 1.0)
    jax.block_until_ready(loss)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats('cumulative').print_stats(18)
    print(s.getvalue())


if __name__ == '__main__':
    main()
