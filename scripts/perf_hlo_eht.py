"""Dump the optimized HLO of the EHT scan step (same shapes as
perf_trace --eht) and print the named fusions' definitions.

Usage: python scripts/perf_hlo_eht.py [fusion.70 fusion.76 ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ['JAX_PLATFORMS'] = ''

import numpy as np  # noqa: E402

from perf_trace import _cached_geos  # noqa: E402


def main():
    import jax

    from bhnerf_tpu.utils import compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir',
                      compilation_cache_dir())

    from bhnerf_tpu import constants, observation, units
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.train import (TrainState, TrainStep, make_optimizer,
                                  raytracing_args)
    from bhnerf_tpu.train.step import (compact_raytracing_args,
                                       make_scan_step)

    fov = 16.0
    predictor = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                              z_width=2.0, compute_dtype='bfloat16')
    nt = 64
    rng = np.random.default_rng(0)
    geos = _cached_geos(fov)
    Omega = geos.keplerian_omega()
    t_frames = units.Quantity(
        np.linspace(4.0, 15.5, nt).astype(np.float32), 'hr')
    rt = raytracing_args(geos, Omega, -float(geos.r_o + 4), t_frames[0])
    crt = compact_raytracing_args(rt, predictor)
    movie = rng.random((nt, 64, 64), dtype=np.float32)
    array = observation.load_txt(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'eht_arrays', 'ngEHT.txt'))
    obs_empty = observation.empty_eht_obs(array, nt=nt, tint=30.0)
    fov_rad = float(fov * constants.GM_c2(constants.sgra_mass).value
                    / constants.sgra_distance.to('m').value)
    obs = observation.observe_same(movie, np.asarray(t_frames.value),
                                   fov_rad / 64, obs_empty,
                                   thermal_noise=True, seed=0)
    train_step = TrainStep.eht(t_frames, obs, fov_rad, 64, predictor,
                               dtype='vis', fused=True)
    scan_fn = make_scan_step(batchsize=6, chunk=50,
                             **train_step.scan_meta)
    state = TrainState.create(predictor.init_params(seed=0),
                              make_optimizer(50000))
    dev_args = train_step.args[0].device_args
    print('A shape:', dev_args[2].shape, dev_args[2].dtype, flush=True)
    lowered = scan_fn.lower(state, *dev_args, jax.random.PRNGKey(0),
                            crt, 1.0)
    txt = lowered.compile().as_text()
    out = '/tmp/eht_scan_hlo.txt'
    with open(out, 'w') as f:
        f.write(txt)
    print(f'wrote {out} ({len(txt)} bytes)')
    names = sys.argv[1:] or ['fusion.70']
    lines = txt.splitlines()
    for name in names:
        print(f'===== {name} =====')
        # print the computation a fusion op calls plus the op line itself
        for i, ln in enumerate(lines):
            if f'{name} = ' in ln and 'fusion(' in ln:
                print(ln.strip()[:400])


if __name__ == '__main__':
    main()
