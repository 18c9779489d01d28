"""End-to-end recovery benchmark: the README / BASELINE.md north star.

Default mode runs the Tutorial-3 image-plane workload (64x64 rays x
ngeo=100, 64 frames, 1000 iterations, domain compaction + fused Pallas
kernel); `--eht` runs the BASELINE.md north-star problem instead —
recover the Tutorial-4 hotspot FROM AN ngEHT OBSERVATION (thermal-noise
visibility synthesis -> complex-visibility chi^2 loss, reference
Tutorial4 / network.py:537-559). Both print ONE JSON line:

  {"metric": ..., "wall_s": ..., "psnr_3d": ..., "lc_err_pct": ...}

wall_s is training time only (geodesic precompute + compiles excluded —
both are one-time, cached costs); psnr_3d is the recovered-vs-true 3D
volume PSNR on a 64^3 grid; lc_err_pct is the mean absolute lightcurve
error of the recovered movie in percent of the mean true flux
(BASELINE.md target for --eht: < 10 min / < 1%). Results are also
appended to RECOVERY.json (mode-keyed) as a per-round artifact.
"""
import json
import os
import sys
import time

os.environ['JAX_PLATFORMS'] = ''

import numpy as np


def record(result):
    """Append the result into RECOVERY.json next to this script."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'RECOVERY.json')
    blob = {}
    if os.path.exists(path):
        try:
            blob = json.loads(open(path).read())
        except Exception:
            blob = {}
    # key by configuration, not just metric: the npix-128/factored
    # production entry must not overwrite the npix-64 default one
    key = result['metric']
    if result.get('npix') not in (None, 64):
        key += f"_npix{result['npix']}"
    if result.get('operator') not in (None, 'dense'):
        key += f"_{result['operator']}"
    blob[key] = result
    with open(path, 'w') as f:
        json.dump(blob, f, indent=1)


def main(num_iters=1000, small=False, eht=False, npix=None,
         operator=None):
    from bench import ensure_tpu_reachable
    ensure_tpu_reachable(
        metric='time_to_recover_eht' if eht else 'time_to_recover')
    import jax

    from bhnerf_tpu.utils import compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir',
                      compilation_cache_dir())
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)

    def mark(msg):
        print(f'# [{time.strftime("%H:%M:%S")}] {msg}', file=sys.stderr,
              flush=True)

    from bhnerf_tpu import constants, emission, units, utils
    from bhnerf_tpu.models import NeRFPredictor, sample_3d_grid
    from bhnerf_tpu.geodesics import image_plane_geos
    from bhnerf_tpu.train import (Optimizer, TrainStep, raytracing_args,
                                  total_movie_loss)
    from bhnerf_tpu.train.step import compact_raytracing_args

    spin, inc = 0.2, np.deg2rad(60.0)
    fov_M = 16.0
    num = npix if npix else (16 if small else 64)
    # the dense per-frame DFT operator stops fitting past npix=64
    # (~320 MB at ngEHT nvis); the factored separable form is the
    # production default there (chisq-equal, npix-fold smaller)
    if operator is None:
        operator = 'factored' if num > 64 else 'dense'
    ngeo = 32 if small else 100
    nt = 16 if small else 64
    compute_dtype = os.environ.get('BENCH_COMPUTE_DTYPE', 'bfloat16')

    mark(f'backend={jax.default_backend()}; tracing geodesics')
    from bhnerf_tpu.geodesics.dataset import Geodesics
    cache = f'/tmp/bhnerf_tpu_geos_rec_{num}x{num}x{ngeo}_f{fov_M}.npz'
    if os.path.exists(cache):
        geos = Geodesics.load(cache)
    else:
        geos = image_plane_geos(spin, inc, (-fov_M / 2, fov_M / 2),
                                (-fov_M / 2, fov_M / 2), ngeo=ngeo,
                                num_alpha=num, num_beta=num)
        geos.save(cache)
    Omega = geos.keplerian_omega()
    r_isco = float(constants.isco_pro(spin))
    hotspot = emission.generate_hotspot(
        resolution=(64, 64, 64), rot_axis=[0, 0, 1], rot_angle=0.0,
        orbit_radius=1.1 * r_isco, std=0.7, r_isco=r_isco, fov=fov_M)
    # --eht frames sit on the ngEHT scan window [4, 15.5] UT (reference
    # Tutorial4); image mode keeps the 1-hour Tutorial-3 movie
    t_frames = units.Quantity(
        np.linspace(4.0, 15.5, nt).astype(np.float32) if eht
        else np.linspace(0.0, 1.0, nt), 'hr')
    t_injection = -float(geos.r_o + fov_M / 4)
    mark('rendering ground-truth movie')
    movie = np.asarray(emission.image_plane_dynamics(
        hotspot, geos, Omega, t_frames, t_injection))

    predictor = NeRFPredictor(scale=fov_M / 2, rmin=0.0, rmax=fov_M / 2,
                              z_width=2.0, compute_dtype=compute_dtype)
    rt = raytracing_args(geos, Omega, t_injection, t_frames[0])
    crt = compact_raytracing_args(rt, predictor)
    if eht:
        # north star (BASELINE.md): recover from an ngEHT observation —
        # thermal-noise visibility synthesis + complex-vis chi^2 loss
        from bhnerf_tpu import constants as consts, observation
        mark('synthesizing ngEHT observation')
        array = observation.load_txt(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), 'eht_arrays',
            'ngEHT.txt'))
        obs_empty = observation.empty_eht_obs(array, nt=nt, tint=30.0)
        fov_rad = float(fov_M * consts.GM_c2(consts.sgra_mass).value
                        / consts.sgra_distance.to('m').value)
        obs = observation.observe_same(movie, np.asarray(t_frames.value),
                                       fov_rad / num, obs_empty,
                                       thermal_noise=True, seed=0)
        train_step = TrainStep.eht(t_frames, obs, fov_rad, num, predictor,
                                   dtype='vis', fused=True,
                                   operator=operator)
    else:
        train_step = TrainStep.image(t_frames, movie, predictor,
                                     dtype='full', fused=True)
    optimizer = Optimizer({'num_iters': num_iters, 'lr_init': 1e-3,
                           'lr_final': 1e-5}, predictor, crt,
                          checkpoint_dir='')

    # pre-compile the scanned train step outside the timed window
    # (one-time cost, persistent-cached across runs)
    mark('compiling train step')
    from bhnerf_tpu.train.step import make_scan_step
    chunk = int(os.environ.get('BENCH_SCAN_CHUNK', 500))
    from bhnerf_tpu.train import TrainState
    scan_fn = make_scan_step(batchsize=min(6, nt), chunk=chunk,
                             **train_step.scan_meta)
    # throwaway state (the scanned step donates its state argument) with
    # the SAME tx object: tx is pytree aux, so a different optax instance
    # would shift the compile out of this warmup into the timed window
    state_warm = TrainState.create(predictor.init_params(seed=9),
                                   optimizer.state.tx)
    state_warm, _ = scan_fn(state_warm, *train_step.args[0].device_args,
                            jax.random.PRNGKey(0), crt, 1.0)
    jax.block_until_ready(state_warm.params['dense_0']['kernel'])
    tail = num_iters % chunk
    if tail:  # ragged tail chunk would otherwise compile inside t0..t1
        tail_fn = make_scan_step(batchsize=min(6, nt), chunk=tail,
                                 **train_step.scan_meta)
        state_warm, _ = tail_fn(state_warm,
                                *train_step.args[0].device_args,
                                jax.random.PRNGKey(0), crt, 1.0)
        jax.block_until_ready(state_warm.params['dense_0']['kernel'])

    mark('training')
    t0 = time.perf_counter()
    optimizer.run(batchsize=min(6, nt), train_step=train_step,
                  raytracing_args=crt, verbose=False, scan_chunk=chunk)
    jax.block_until_ready(optimizer.state.params['dense_0']['kernel'])
    wall_s = time.perf_counter() - t0

    mark(f'training done in {wall_s:.1f}s; evaluating')
    vol = sample_3d_grid(predictor, optimizer.params, fov=fov_M,
                         resolution=64)
    truth = np.asarray(hotspot.data)
    psnr_3d = float(utils.psnr(truth, vol))

    _, frames = total_movie_loss(min(8, nt), optimizer.state, train_step,
                                 crt, return_frames=True)
    lc_rec = np.asarray(frames).sum(axis=(-1, -2))
    lc_true = movie.sum(axis=(-1, -2))
    lc_err_pct = float(100.0 * np.mean(np.abs(lc_rec - lc_true))
                       / np.mean(lc_true))

    result = {
        'metric': 'time_to_recover_eht' if eht else 'time_to_recover',
        'wall_s': round(wall_s, 2),
        'psnr_3d': round(psnr_3d, 2),
        'lc_err_pct': round(lc_err_pct, 4),
        'num_iters': num_iters,
        'npix': num,
        'compute_dtype': compute_dtype,
        'chip': jax.devices()[0].device_kind,
    }
    if eht:
        result['operator'] = operator
    record(result)
    print(json.dumps(result))


if __name__ == '__main__':
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--num-iters', type=int, default=None,
                   help='default: 1000 (image mode) / 5000 (--eht, the '
                        'reference Tutorial-4 iteration count)')
    p.add_argument('--small', action='store_true')
    p.add_argument('--eht', action='store_true',
                   help='recover from an ngEHT visibility observation '
                        '(the BASELINE.md north-star problem)')
    p.add_argument('--npix', type=int, default=None,
                   help='image/ray grid size (default 64; 128 = the '
                        'production ALMA/EHT image size, auto-selects '
                        'the factored measurement operator)')
    p.add_argument('--operator', default=None,
                   choices=['dense', 'factored'],
                   help='EHT measurement operator (default: dense up '
                        'to npix=64, factored past it)')
    args = p.parse_args()
    n = args.num_iters if args.num_iters else (5000 if args.eht else 1000)
    main(n, args.small, eht=args.eht, npix=args.npix,
         operator=args.operator)
