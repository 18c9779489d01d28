"""Benchmark: training-step throughput of the flagship recovery workload.

Workload matches the reference's production configuration (SURVEY.md §6):
64x64 image-plane rays x ngeo=100 samples, NeRF 4x128 + posenc deg 3,
batch of 6 frames per step, full-image chi^2 loss — forward + backward +
adam update per step.

Prints ONE JSON line:
  {"metric": "train_ray_samples_per_sec", "value": N, "unit": "samples/s",
   "vs_baseline": R}
vs_baseline is measured against the reference's published numbers — the
reference publishes none (BASELINE.md), so R is computed against the
north-star proxy of 1 step/s at this workload size (2.46M ray-samples/s).
"""
import json
import os
import sys
import time

# the TPU plugin registers under an inconsistent platform name across
# sessions ('axon' or 'tpu'); auto-choose always resolves the real chip
os.environ['JAX_PLATFORMS'] = ''

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/bhnerf_tpu_jax_cache')
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)

    def mark(msg):
        print(f'# [{time.strftime("%H:%M:%S")}] {msg}', file=sys.stderr,
              flush=True)

    from bhnerf_tpu import constants, units
    from bhnerf_tpu.geodesics import image_plane_geos
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.train import TrainState, make_optimizer, raytracing_args
    from bhnerf_tpu.train.step import compact_raytracing_args, make_step_fns

    num_alpha = num_beta = 64
    ngeo = 100
    batch = 6
    nt = 64
    fov = 16.0

    mark(f'backend={jax.default_backend()} tracing geodesics')
    geos = image_plane_geos(
        spin=0.2, inclination=np.deg2rad(60.0),
        alpha_range=(-fov / 2, fov / 2), beta_range=(-fov / 2, fov / 2),
        ngeo=ngeo, num_alpha=num_alpha, num_beta=num_beta, n_fine=4096)
    Omega = geos.keplerian_omega()
    t_injection = -float(geos.r_o + fov / 4)
    GM_hr = constants.GM_c3(constants.sgra_mass).to('hr').value
    t_frames = np.linspace(0.0, 200.0 * GM_hr, nt).astype(np.float32)
    rt = raytracing_args(geos, Omega, t_injection,
                         units.Quantity(t_frames[0], 'hr'))

    predictor = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                              z_width=2.0, net_depth=4, net_width=128,
                              posenc_deg=3)
    params = predictor.init_params(seed=0)
    state = TrainState.create(params, make_optimizer(50000))
    # domain compaction + fused Pallas MLP kernel: the optimized TPU path
    rt = compact_raytracing_args(rt, predictor)

    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((batch, num_alpha, num_beta),
                                    dtype=np.float32))
    sigma = jnp.ones_like(target)
    offset = jnp.zeros_like(target)
    t_batch = jnp.asarray(t_frames[:batch])

    # compile + warmup (fall back to the pure-XLA path if the Pallas
    # kernel fails to compile on this TPU generation)
    mark('geodesics done, compiling train step')
    try:
        grad_step, _ = make_step_fns(predictor, kind='image', dtype='full',
                                     donate_state=True, fused=True)
        loss, state, _ = grad_step(state, target, sigma, offset, t_batch,
                                   rt, 1.0)
        jax.block_until_ready(loss)
    except Exception as e:  # pragma: no cover - hardware dependent
        mark(f'fused kernel unavailable ({type(e).__name__}); XLA fallback')
        grad_step, _ = make_step_fns(predictor, kind='image', dtype='full',
                                     donate_state=True, fused=False)
        loss, state, _ = grad_step(state, target, sigma, offset, t_batch,
                                   rt, 1.0)
        jax.block_until_ready(loss)
    mark('compile done, timing')

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        loss, state, _ = grad_step(state, target, sigma, offset, t_batch,
                                   rt, 1.0)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    ray_samples_per_sec = steps_per_sec * batch * num_alpha * num_beta * ngeo
    baseline_proxy = 1.0 * batch * num_alpha * num_beta * ngeo  # 1 step/s
    print(json.dumps({
        'metric': 'train_ray_samples_per_sec',
        'value': round(ray_samples_per_sec),
        'unit': 'samples/s',
        'vs_baseline': round(ray_samples_per_sec / baseline_proxy, 3),
    }))
    print(f'# steps/sec: {steps_per_sec:.2f}  backend: '
          f'{jax.default_backend()}  loss: {float(np.asarray(loss)):.3f}',
          file=sys.stderr)


if __name__ == '__main__':
    main()
