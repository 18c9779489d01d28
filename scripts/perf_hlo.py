"""Dump the compiled HLO of the fused scan step; print the big fusions."""
import os
import re
import sys

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
    predictor = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                              z_width=2.0, compute_dtype='bfloat16')
    crt = compact_raytracing_args(rt, predictor)

    nt = 64
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((nt, 64, 64), dtype=np.float32))
    sigma = jnp.ones_like(target)
    offset = jnp.zeros_like(target)
    t_all = jnp.asarray(np.linspace(0.0, 200.0 * GM_hr, nt,
                                    dtype=np.float32))
    scan_fn = make_scan_step(predictor=predictor, kind='image',
                             dtype='full', fused=True, batchsize=6,
                             chunk=50)
    state = TrainState.create(predictor.init_params(seed=0),
                              make_optimizer(50000))
    txt = scan_fn.lower(
        state, target, sigma, offset, t_all, jax.random.PRNGKey(0), crt,
        1.0).compile().as_text()
    out = '/tmp/scan_step_hlo.txt'
    with open(out, 'w') as f:
        f.write(txt)
    print('HLO written to', out, 'lines:', txt.count('\n'))
    for m in re.finditer(r'\n *(\S+) = \S+ fusion\(([^)]*)\), kind=(\S+?),'
                         r' calls=(\S+)', txt):
        print('FUSION', m.group(1), 'kind', m.group(3), 'calls',
              m.group(4)[:60])


if __name__ == '__main__':
    main()
