"""On-device component timing for the fused train step.

Wraps each component in lax.scan so one dispatch runs `REPS` iterations —
the network-tunnel dispatch latency (ms per call) is amortized away and
the per-iteration time is the true device time. Run on the real chip:
python scripts/perf_probe3.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ['JAX_PLATFORMS'] = ''

import numpy as np  # noqa: E402

REPS = 50


def main():
    import jax
    import jax.numpy as jnp

    from bhnerf_tpu.utils import compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir',
                      compilation_cache_dir())
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)

    from bhnerf_tpu import constants, units
    from bhnerf_tpu.geodesics import image_plane_geos
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.ops import fused
    from bhnerf_tpu.train import TrainState, make_optimizer, raytracing_args
    from bhnerf_tpu.train.step import (compact_raytracing_args,
                                       make_scan_step)

    fov = 16.0
    geos = image_plane_geos(
        spin=0.2, inclination=np.deg2rad(60.0),
        alpha_range=(-fov / 2, fov / 2), beta_range=(-fov / 2, fov / 2),
        ngeo=100, num_alpha=64, num_beta=64, n_fine=4096)
    Omega = geos.keplerian_omega()
    GM_hr = constants.GM_c3(constants.sgra_mass).to('hr').value
    rt = raytracing_args(geos, Omega, -float(geos.r_o + 4),
                         units.Quantity(0.0, 'hr'))
    compute_dtype = os.environ.get('BENCH_COMPUTE_DTYPE', 'bfloat16')
    predictor = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                              z_width=2.0, compute_dtype=compute_dtype)
    params = predictor.init_params(seed=0)
    t_frames_M = jnp.asarray(np.linspace(0, 200, 6), jnp.float32)
    crt = compact_raytracing_args(rt, predictor)
    n = crt.coords.shape[-1]
    print(f'device={jax.devices()[0].device_kind} n={n} '
          f'dtype={compute_dtype} TILE_N={fused.TILE_N}', flush=True)

    def scan_time(name, body, init):
        @jax.jit
        def run(carry):
            return jax.lax.scan(lambda c, _: (body(c), None), carry,
                                None, length=REPS)[0]
        out = run(init)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(init)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS
        print(f'{name}: {1e3 * dt:.3f} ms/iter', flush=True)
        return dt

    # forward kernel only (carry a scalar through to serialize iterations)
    def fwd_body(c):
        em = fused.render_samples(params, predictor, t_frames_M + c,
                                  crt.coords, crt.Omega, crt.t_geos_rel,
                                  crt.t_injection)
        return jnp.sum(em) * 1e-20

    scan_time('fwd kernel', fwd_body, jnp.float32(0.0))

    # fwd + bwd kernels (params grad), no optimizer
    def grad_body(c):
        def loss(p):
            em = fused.render_samples(p, predictor, t_frames_M + c,
                                      crt.coords, crt.Omega,
                                      crt.t_geos_rel, crt.t_injection)
            return jnp.sum(em ** 2)
        g = jax.grad(loss)(params)
        return jnp.sum(g['dense_0']['kernel']) * 1e-20

    scan_time('fwd+bwd kernels', grad_body, jnp.float32(0.0))

    # full train step (gather + kernels + segment-sum + loss + adam)
    nt = 64
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((nt, 64, 64), dtype=np.float32))
    sigma = jnp.ones_like(target)
    offset = jnp.zeros_like(target)
    t_all = jnp.asarray(np.linspace(0.0, 200.0 * GM_hr, nt,
                                    dtype=np.float32))
    scan_fn = make_scan_step(predictor=predictor, kind='image',
                             dtype='full', fused=True, batchsize=6,
                             chunk=REPS)
    state = TrainState.create(predictor.init_params(seed=0),
                              make_optimizer(50000))
    key = jax.random.PRNGKey(0)
    state, losses = scan_fn(state, target, sigma, offset, t_all, key, crt,
                            1.0)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    state, losses = scan_fn(state, target, sigma, offset, t_all,
                            jax.random.PRNGKey(1), crt, 1.0)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / REPS
    print(f'full train step: {1e3 * dt:.3f} ms/iter '
          f'({1.0 / dt:.1f} steps/s)', flush=True)


if __name__ == '__main__':
    main()
