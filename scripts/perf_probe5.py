"""Measure per-pallas_call fixed overhead: trivial kernel vs real kernel,
vmem_limit sweep, and repeated-invocation scaling. Run on the real chip.
"""
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bhnerf_tpu.utils import compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir',
                      compilation_cache_dir())

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

    n = 69632
    x = jnp.asarray(np.random.default_rng(0).random((8, n), np.float32))

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def make_copy(tile, vmem_mb, grid_steps=None):
        def body(c):
            out = pl.pallas_call(
                copy_kernel,
                grid=(n // tile,),
                in_specs=[pl.BlockSpec((8, tile), lambda j: (0, j))],
                out_specs=pl.BlockSpec((8, tile), lambda j: (0, j)),
                out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem_mb * 1024 * 1024),
            )(x + c)
            return jnp.sum(out[0, :8]) * 1e-20
        return body

    for vmem in (16, 100):
        for tile in (4096, 69632):
            scan_time(f'copy kernel tile={tile} vmem={vmem}MB',
                      make_copy(tile, vmem))

    # two copy kernels back-to-back: does fixed overhead double?
    def body2(c):
        f = make_copy(4096, 100)
        return f(c) + f(c + 1.0) * 2.0
    scan_time('2x copy kernel tile=4096', body2)

    # real fwd kernel with lower vmem limit
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.ops import fused
    coords = jnp.asarray(np.random.default_rng(0).uniform(-8, 8, (3, n)),
                         jnp.float32)
    omega = jnp.asarray(np.full(n, 0.02), jnp.float32)
    tg = jnp.asarray(np.full(n, -10.0), jnp.float32)
    pred = NeRFPredictor(scale=8.0, compute_dtype='bfloat16')
    params = pred.init_params(seed=0)
    t6 = jnp.asarray(np.linspace(0, 200, 6), jnp.float32)

    def fwd_body(c):
        em = fused.render_samples(params, pred, t6 + c, coords, omega, tg,
                                  0.0)
        return jnp.sum(em) * 1e-20
    scan_time('fwd kernel (100MB limit)', fwd_body)


if __name__ == '__main__':
    main()
