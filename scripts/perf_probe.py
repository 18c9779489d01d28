"""One-off TPU perf probe: fused f32 vs bf16 vs dense-XLA train steps.

Not part of the driver contract; used to tune bench.py. Run on the real
chip: python scripts/perf_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ['JAX_PLATFORMS'] = ''

import numpy as np  # noqa: E402


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bhnerf_tpu.utils import compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir',
                      compilation_cache_dir())
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)

    from bhnerf_tpu import constants, emission, units
    from bhnerf_tpu.geodesics import image_plane_geos
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.train import TrainState, make_optimizer, raytracing_args
    from bhnerf_tpu.train.step import compact_raytracing_args, make_step_fns

    num_alpha = num_beta = 64
    ngeo = 100
    batch = 6
    fov = 16.0

    print('device:', jax.devices()[0].device_kind, flush=True)
    geos = image_plane_geos(
        spin=0.2, inclination=np.deg2rad(60.0),
        alpha_range=(-fov / 2, fov / 2), beta_range=(-fov / 2, fov / 2),
        ngeo=ngeo, num_alpha=num_alpha, num_beta=num_beta, n_fine=4096)
    Omega = geos.keplerian_omega()
    t_injection = -float(geos.r_o + fov / 4)
    GM_hr = constants.GM_c3(constants.sgra_mass).to('hr').value
    t_frames = np.linspace(0.0, 200.0 * GM_hr, 64).astype(np.float32)
    rt = raytracing_args(geos, Omega, t_injection,
                         units.Quantity(t_frames[0], 'hr'))

    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((batch, num_alpha, num_beta),
                                    dtype=np.float32))
    sigma = jnp.ones_like(target)
    offset = jnp.zeros_like(target)
    t_batch = jnp.asarray(t_frames[:batch])

    def bench_one(name, predictor, rt_used, fused, n_steps=30):
        params = predictor.init_params(seed=0)
        state = TrainState.create(params, make_optimizer(50000))
        grad_step, _ = make_step_fns(predictor, kind='image', dtype='full',
                                     donate_state=True, fused=fused)
        t0 = time.perf_counter()
        loss, state, _ = grad_step(state, target, sigma, offset, t_batch,
                                   rt_used, 1.0)
        jax.block_until_ready(loss)
        print(f'{name}: compile+1 {time.perf_counter() - t0:.1f}s',
              flush=True)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            loss, state, _ = grad_step(state, target, sigma, offset,
                                       t_batch, rt_used, 1.0)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        print(f'{name}: {n_steps / dt:.2f} steps/s  '
              f'loss={float(np.asarray(loss)):.3f}', flush=True)
        return n_steps / dt

    base = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                         z_width=2.0, net_depth=4, net_width=128,
                         posenc_deg=3)
    crt = compact_raytracing_args(rt, base)
    n_eff = int(np.asarray(
        emission.domain_mask(rt.coords, base.rmin, base.rmax,
                             base.z_width)).sum())
    print(f'in-domain samples/frame: {n_eff} '
          f'(padded {crt.coords.shape[-1]})', flush=True)

    bench_one('fused f32 compact', base, crt, fused=True)
    bf16 = dataclasses.replace(base, compute_dtype='bfloat16')
    bench_one('fused bf16 compact', bf16, crt, fused=True)
    bench_one('xla compact', base, crt, fused=False, n_steps=10)
    bench_one('xla dense (reference-semantics)', base, rt, fused=False,
              n_steps=10)


if __name__ == '__main__':
    main()
