"""One-off drive: closure-loss training steps (logcamp / bs), fused
path, real chip. Usage: python drive_logcamp_tpu.py [dtype]"""
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
    jax.config.update('jax_compilation_cache_dir', compilation_cache_dir())

    from bhnerf_tpu import constants, observation, units
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.train import (TrainState, TrainStep, make_optimizer,
                                  raytracing_args)
    from bhnerf_tpu.train.step import (compact_raytracing_args,
                                      make_scan_step)

    fov = 16.0
    predictor = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                              z_width=2.0, compute_dtype='bfloat16')
    nt = 16
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
        'eht_arrays', 'EHT2017.txt'))
    obs_empty = observation.empty_eht_obs(array, nt=nt, tint=30.0)
    fov_rad = float(fov * constants.GM_c2(constants.sgra_mass).value
                    / constants.sgra_distance.to('m').value)
    obs = observation.observe_same(movie, np.asarray(t_frames.value),
                                   fov_rad / 64, obs_empty,
                                   thermal_noise=True, seed=0)
    dtype = sys.argv[1] if len(sys.argv) > 1 else 'logcamp'
    train_step = TrainStep.eht(t_frames, obs, fov_rad, 64, predictor,
                               dtype=dtype, fused=True)
    scan_fn = make_scan_step(batchsize=6, chunk=50,
                             **train_step.scan_meta)
    state = TrainState.create(predictor.init_params(seed=0),
                              make_optimizer(1000, lr_init=1e-3))
    dev_args = train_step.args[0].device_args
    losses = []
    for i in range(4):
        state, ls = scan_fn(state, *dev_args, jax.random.PRNGKey(i),
                            crt, 1.0)
        losses.append(np.asarray(ls))
    losses = np.concatenate(losses)
    assert np.isfinite(losses).all(), losses
    grads = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert all(np.isfinite(g).all() for g in grads)
    print(f'{dtype} fused scan on {jax.devices()[0].device_kind}: '
          f'loss {losses[0]:.4g} -> {losses[-1]:.4g}, '
          f'all finite over {losses.size} steps')
    assert losses[-20:].mean() < losses[:20].mean()


if __name__ == '__main__':
    main()
