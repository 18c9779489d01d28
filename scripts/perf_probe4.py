"""Isolate the fwd-kernel cost drivers: tile size, frame count, posenc.

Times the raw fused fwd kernel under lax.scan (single dispatch, device
time only) while sweeping one factor at a time. Run on the real chip.
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

    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.ops import fused

    n = 69632
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(-8, 8, (3, n)), jnp.float32)
    omega = jnp.asarray(rng.uniform(0.01, 0.03, (n,)), jnp.float32)
    tg = jnp.asarray(rng.uniform(-50, 0, (n,)), jnp.float32)
    print(f'device={jax.devices()[0].device_kind} n={n}', flush=True)

    def scan_time(name, body):
        @jax.jit
        def run(c):
            return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                                length=REPS)[0]
        out = run(jnp.float32(0.0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(jnp.float32(0.0))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS
        print(f'{name}: {1e3 * dt:.3f} ms/iter', flush=True)
        return dt

    def make_body(pred, params, nt):
        t_frames_M = jnp.asarray(np.linspace(0, 200, nt), jnp.float32)

        def body(c):
            em = fused.render_samples(params, pred, t_frames_M + c, coords,
                                      omega, tg, 0.0)
            return jnp.sum(em) * 1e-20
        return body

    base = NeRFPredictor(scale=8.0, compute_dtype='bfloat16')
    params = base.init_params(seed=0)

    for tile in (2048, 4096, 8192):
        fused.TILE_N = tile
        scan_time(f'fwd nt=6 tile={tile}', make_body(base, params, 6))
    fused.TILE_N = 4096
    for nt in (1, 2, 3, 6, 12):
        scan_time(f'fwd nt={nt} tile=4096', make_body(base, params, nt))
    # posenc cost: deg=0 removes the 18-row sin block (in_dim 21 -> 3)
    import dataclasses
    p0 = dataclasses.replace(base, posenc_deg=0)
    scan_time('fwd nt=6 deg=0', make_body(p0, p0.init_params(seed=0), 6))
    # f32 for reference
    pf = dataclasses.replace(base, compute_dtype='float32')
    scan_time('fwd nt=6 f32', make_body(pf, params, 6))


if __name__ == '__main__':
    main()
