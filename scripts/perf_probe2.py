"""Isolate the fused-kernel regression: trig cost, tile size, fwd vs bwd."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ['JAX_PLATFORMS'] = ''

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from bhnerf_tpu.utils import compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir',
                      compilation_cache_dir())

    from bhnerf_tpu import constants, units
    from bhnerf_tpu.geodesics import image_plane_geos
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.ops import fused
    from bhnerf_tpu.train import raytracing_args
    from bhnerf_tpu.train.step import compact_raytracing_args

    fov = 16.0
    geos = image_plane_geos(
        spin=0.2, inclination=np.deg2rad(60.0),
        alpha_range=(-fov / 2, fov / 2), beta_range=(-fov / 2, fov / 2),
        ngeo=100, num_alpha=64, num_beta=64, n_fine=4096)
    Omega = geos.keplerian_omega()
    GM_hr = constants.GM_c3(constants.sgra_mass).to('hr').value
    rt = raytracing_args(geos, Omega, -float(geos.r_o + 4),
                         units.Quantity(0.0, 'hr'))
    predictor = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                              z_width=2.0)
    params = predictor.init_params(seed=0)
    t_frames_M = jnp.asarray(np.linspace(0, 200, 6), jnp.float32)

    def timeit(name, fn, *args, n=30):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f'{name}: {1e3 * dt:.2f} ms', flush=True)
        return dt

    for tile in (2048, 4096, 8192, 16384):
        fused.TILE_N = tile
        crt = compact_raytracing_args(rt, predictor, tile=tile)
        n = crt.coords.shape[-1]

        def fwd(params):
            return fused.render_samples(params, predictor, t_frames_M,
                                        crt.coords, crt.Omega,
                                        crt.t_geos_rel, crt.t_injection)

        def train(params):
            def loss(p):
                em = fused.render_samples(p, predictor, t_frames_M,
                                          crt.coords, crt.Omega,
                                          crt.t_geos_rel, crt.t_injection)
                return jnp.sum(em ** 2)
            return jax.grad(loss)(params)

        timeit(f'tile={tile} fwd  (n={n})', jax.jit(fwd), params)
        timeit(f'tile={tile} grad (n={n})', jax.jit(train), params)


if __name__ == '__main__':
    main()
