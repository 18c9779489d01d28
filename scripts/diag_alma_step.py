"""Diagnose the production ALMA fit's on-chip step time.

The fit (scripts/fit_alma_lp_apr11_sgra_flare.py) measured ~2.2 s/step
on the chip while bench_alma_shape's synthetic flagship of the SAME
nominal configuration (lc loss, 3 Stokes, 10-variant ensemble,
batchsize 6) runs at ~147 steps/s. This script rebuilds the fit's exact
training objects (real geodesics, real preprocessing) and times the
scan-chunked dispatch in isolation, printing the shapes that differ.

Run: timeout 3600 python scripts/diag_alma_step.py [--chunk 100]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ['JAX_PLATFORMS'] = ''

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--chunk', type=int, default=100)
    ap.add_argument('--trace', action='store_true',
                    help='capture a jax.profiler trace of one dispatch')
    args = ap.parse_args()

    from bench import ensure_tpu_reachable
    ensure_tpu_reachable(metric='diag_alma_step')

    import jax
    import jax.numpy as jnp
    import yaml

    from bhnerf_tpu import alma, config as config_lib, units
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.ops import fused as fused_lib
    from bhnerf_tpu.train import TrainStep
    from bhnerf_tpu.train.step import (compact_ensemble_args,
                                       make_scan_step, stack_ensemble)
    from bhnerf_tpu.train.state import TrainState, make_optimizer
    from drive_alma_production import make_synthetic_csv

    print('devices:', jax.devices())
    print('fused interpret mode:', fused_lib._interpret())

    cfg = config_lib.RunConfig.from_yaml(os.path.join(
        REPO, 'scripts', 'fit_alma_lp_apr11_sgra_flare.yaml'))
    csv = '/tmp/diag_alma_synth.csv'
    if not os.path.exists(csv):
        make_synthetic_csv(csv)
    cfg.preprocess.data_path = csv
    target, t_frames = alma.preprocess_data(
        **config_lib.dataclasses.asdict(cfg.preprocess))
    t_vals = np.asarray(units.Quantity(t_frames, 'hr').value)
    print(f'nt={len(t_vals)} target shape={target.shape}')

    model = cfg.model
    model.num_subrays = 10
    rmax = model.fov_M / 2
    predictor = NeRFPredictor(scale=rmax, rmin=model.resolved_rmin(),
                              rmax=rmax, z_width=model.z_width)
    print('predictor:', predictor.rmin, predictor.rmax, predictor.z_width)

    # cache the host-traced ensemble (the expensive precompute)
    cache = '/tmp/diag_alma_rt.npz'
    t0 = time.time()
    rot_angle = np.deg2rad(cfg.preprocess.de_rot_angle + 20.0)
    if os.path.exists(cache):
        import pickle
        with open(cache, 'rb') as f:
            rt_list = pickle.load(f)
        print(f'rt ensemble loaded from cache ({time.time()-t0:.0f}s)')
    else:
        rt_list = alma.get_raytracing_args(
            np.deg2rad(60), model.spin, model.asdict(),
            rot_angle=rot_angle, num_subpixel_rays=model.num_subrays,
            rng=np.random.default_rng(7))
        import pickle
        with open(cache, 'wb') as f:
            pickle.dump(jax.device_get(rt_list), f)
        print(f'rt ensemble traced on host ({time.time()-t0:.0f}s)')

    rt0 = rt_list[0]
    print('rt coords shape:', np.shape(rt0.coords),
          'J shape:', np.shape(rt0.J),
          'Omega ndim:', np.ndim(rt0.Omega))

    t0 = time.time()
    crt_list = compact_ensemble_args(rt_list, predictor, layout='gather')
    print(f'compaction: {time.time()-t0:.0f}s; '
          f'n_eff={crt_list[0].coords.shape[-1]} '
          f'n_groups={crt_list[0].red_group_ids.shape[-1]} '
          f'polarized={crt_list[0].polarized}')
    stacked = stack_ensemble(crt_list)

    ts = TrainStep.image(units.Quantity(t_vals, 'hr'), target, predictor,
                         sigma=np.asarray(cfg.optimization.sigma),
                         dtype='lc', fused=True)
    print('scan_meta:', {k: v for k, v in ts.scan_meta.items()
                         if k != 'predictor'})

    scan_fn = make_scan_step(batchsize=cfg.optimization.batchsize,
                             chunk=args.chunk, num_variants=len(crt_list),
                             **ts.scan_meta)
    state = TrainState.create(predictor.init_params(seed=4),
                              make_optimizer(50000))
    scale = float(ts.scale[0])
    dev_args = ts.args[0].device_args

    t0 = time.time()
    state, losses = scan_fn(state, *dev_args, jax.random.PRNGKey(0),
                            stacked, scale)
    jax.block_until_ready(losses)
    print(f'first dispatch (compile + {args.chunk} steps): '
          f'{time.time()-t0:.1f}s')

    for rep in range(3):
        t0 = time.time()
        state, losses = scan_fn(state, *dev_args,
                                jax.random.PRNGKey(rep + 1), stacked,
                                scale)
        jax.block_until_ready(losses)
        dt = time.time() - t0
        print(f'rep {rep}: {dt:.2f}s for {args.chunk} steps '
              f'= {args.chunk/dt:.1f} steps/s')

    if args.trace:
        logdir = '/tmp/diag_alma_trace'
        with jax.profiler.trace(logdir):
            state, losses = scan_fn(state, *dev_args,
                                    jax.random.PRNGKey(99), stacked,
                                    scale)
            jax.block_until_ready(losses)
        print('trace written to', logdir)


if __name__ == '__main__':
    main()
