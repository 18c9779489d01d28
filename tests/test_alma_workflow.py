"""ALMA polarized-lightcurve workflow tests (Config-5 of SURVEY.md §7)."""
import numpy as np
import pandas as pd
import pytest

from bhnerf_tpu import alma, config as config_lib, units
from bhnerf_tpu.models import NeRFPredictor
from bhnerf_tpu.train import TrainState, TrainStep, make_optimizer

MODEL_PARAMS = {
    'spin': 0.0, 'fov_M': 16.0, 'z_width': 2.0, 'rmin': 'ISCO',
    'Q_frac': 0.85, 'b_consts': {'arad': 0, 'avert': 1, 'ator': 0},
    'Omega_dir': 'cw', 'Omega_frac': 1.0,
    'num_alpha': 16, 'num_beta': 16, 't_start_obs': 9.4,
}


def test_preprocess_data(tmp_path):
    """Window-averaging, shadow subtraction, Faraday de-rotation."""
    rng = np.random.default_rng(0)
    n = 400
    t = 9.2 + np.arange(n) * 4.0 / 3600  # 4s cadence
    Q = 0.1 * np.cos(2 * np.pi * t / 0.5) + 0.16 * np.cos(
        2 * np.deg2rad(-37.0))
    U = 0.1 * np.sin(2 * np.pi * t / 0.5) + 0.16 * np.sin(
        2 * np.deg2rad(-37.0))
    df = pd.DataFrame({'time': t, 'I': 2.4 + 0 * t, 'Q': Q, 'U': U})
    path = tmp_path / 'alma.csv'
    df.to_csv(path)

    target, t_frames = alma.preprocess_data(
        str(path), window_size=8, I_hs_mean=0.3, P_sha=0.16,
        chi_sha=-37.0, de_rot_angle=0.0, t_start=9.3, t_end=11.0)
    assert target.shape[1] == 3  # I prior + Q + U
    np.testing.assert_allclose(target[:, 0], 0.3)
    # shadow polarization removed: Q/U amplitude ~0.1 centered at 0
    assert np.abs(target[:, 1:]).max() < 0.15
    assert np.abs(target[:, 1:].mean(axis=0)).max() < 0.05
    assert t_frames.unit == units.hr


@pytest.fixture(scope='module')
def alma_rt_args():
    return alma.get_raytracing_args(np.deg2rad(60.0), 0.0, MODEL_PARAMS,
                                    stokes=['I', 'Q', 'U'])


def test_image_plane_model_polarized(alma_rt_args):
    rt = alma_rt_args[0]
    assert rt.num_stokes == 3
    J = np.asarray(rt.J)
    assert np.isfinite(J).all()
    # Q_frac bound on linear polarization fraction
    P = np.sqrt(J[1] ** 2 + J[2] ** 2)
    assert (P <= 0.85 * J[0] * (1 + 1e-4) + 1e-9).all()


def test_subpixel_ray_ensemble():
    rng = np.random.default_rng(7)
    args = alma.get_raytracing_args(np.deg2rad(30.0), 0.0, MODEL_PARAMS,
                                    stokes=['Q', 'U'],
                                    num_subpixel_rays=2, rng=rng)
    assert len(args) == 2
    # ensembles differ (randomized sub-pixel rays)
    assert not np.allclose(np.asarray(args[0].coords),
                           np.asarray(args[1].coords))


def test_device_ensemble_single_dispatch_matches_loop():
    """backend='device' ensembles trace all variants in one stacked
    call; same seed must reproduce the per-variant loop exactly."""
    from bhnerf_tpu import alma as alma_lib

    kw = dict(stokes=['I', 'Q', 'U'], num_subpixel_rays=3)
    batched = alma_lib.get_raytracing_args(
        np.deg2rad(30.0), 0.0, MODEL_PARAMS, backend='device',
        rng=np.random.default_rng(3), **kw)
    # force the per-variant loop by monkeypatching the batcher away
    orig = alma_lib._trace_subpixel_ensemble
    alma_lib._trace_subpixel_ensemble = lambda *a, **k: None
    try:
        looped = alma_lib.get_raytracing_args(
            np.deg2rad(30.0), 0.0, MODEL_PARAMS, backend='device',
            rng=np.random.default_rng(3), **kw)
    finally:
        alma_lib._trace_subpixel_ensemble = orig
    assert len(batched) == len(looped) == 3
    for b, l in zip(batched, looped):
        np.testing.assert_allclose(np.asarray(b.coords),
                                   np.asarray(l.coords), rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(b.J), np.asarray(l.J),
                                   rtol=1e-4, atol=1e-5)


def test_device_backend_rt_args_close_to_host():
    """backend='device' (f32 trace) produces RayTracingArgs whose
    transport weights track the host-f64 build — the chi^2-scan fast
    path must not bias the fit inputs."""
    kw = dict(stokes=['I', 'Q', 'U'], num_subpixel_rays=1)
    rt64 = alma.get_raytracing_args(np.deg2rad(60.0), 0.0, MODEL_PARAMS,
                                    **kw)[0]
    rt32 = alma.get_raytracing_args(np.deg2rad(60.0), 0.0, MODEL_PARAMS,
                                    backend='device', **kw)[0]
    scale = np.abs(np.asarray(rt64.J)).max()
    np.testing.assert_allclose(np.asarray(rt32.J), np.asarray(rt64.J),
                               atol=5e-3 * scale)
    # long photon-shell-winding rays accumulate t to O(1000) with f32
    # roundoff scaling relatively — judge them on rtol
    np.testing.assert_allclose(np.asarray(rt32.t_geos_rel),
                               np.asarray(rt64.t_geos_rel), rtol=2e-3,
                               atol=5e-3)


def test_polarized_lc_fit_and_chi2(tmp_path, alma_rt_args):
    """Fit Q,U lightcurves through the TrainStep.image 'lc' path, save a
    checkpoint, then score it with chi2_lightcurves (reference
    alma.py:83-117 flow)."""
    from bhnerf_tpu.train import save_checkpoint
    rt = alma_rt_args[0]

    t_frames = units.Quantity(np.linspace(9.4, 9.9, 12), 'hr')
    predictor = NeRFPredictor(scale=8.0, rmin=6.0, rmax=8.0, z_width=2.0,
                              net_depth=2, net_width=16)
    # synthetic target: small nonzero stokes lightcurves
    target = 0.05 * np.ones((12, 3))
    train_step = TrainStep.image(t_frames, target, predictor,
                                 sigma=np.array([0.15, 1e-2, 1e-2]),
                                 dtype='lc')
    state = TrainState.create(predictor.init_params(seed=0),
                              make_optimizer(60, lr_init=1e-2))
    np.random.seed(0)
    losses = []
    for _ in range(60):
        inds = train_step.args[0].sample(6)
        loss, state, _ = train_step(state, rt, inds)
        losses.append(float(np.asarray(loss)))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    ckpt_dir = tmp_path / 'run0'
    predictor.save_params(ckpt_dir)
    save_checkpoint(ckpt_dir, state, 60)
    chi2 = alma.chi2_lightcurves([rt], str(ckpt_dir), t_frames, target,
                                 sigma=np.array([0.15, 1e-2, 1e-2]),
                                 batchsize=6)
    assert np.isfinite(chi2) and chi2 >= 0


def test_run_config_roundtrip(tmp_path):
    cfg = config_lib.RunConfig.from_yaml(
        'scripts/fit_alma_lp_apr11_sgra_flare.yaml')
    assert cfg.model.fov_M == 40.0
    assert cfg.optimization.hparams.num_iters == 50000
    assert cfg.model.resolved_rmin() == 6.0  # ISCO at spin 0
    cfg.to_yaml(tmp_path / 'cfg.yml')
    cfg2 = config_lib.RunConfig.from_yaml(tmp_path / 'cfg.yml')
    assert cfg2.model.fov_M == cfg.model.fov_M
    # unknown keys rejected (typed config vs reference locals().update)
    with pytest.raises(ValueError):
        config_lib.RunConfig.from_dict({'model': {'spn': 0.5}})


def test_inclination_grid():
    grid = config_lib.inclination_grid([3, 1])
    assert grid[0] == 30.0 and len(grid) == 13
    assert (config_lib.inclination_grid([45]) == [45.0]).all()
    grid = config_lib.inclination_grid([3, 0], start_inc=10)
    assert grid[0] == 10.0


def test_checkpoint_render_averages_subpixel_ensemble(tmp_path):
    """image_plane_checkpoint over a 3-variant sub-pixel-ray ensemble must
    equal the mean of the per-variant renders (reference network.py:905
    passes the full ensemble into total_movie_loss; VERDICT r1 weak #3)."""
    from bhnerf_tpu.train import TrainState, make_optimizer, save_checkpoint

    rng = np.random.default_rng(3)
    rt_list = alma.get_raytracing_args(np.deg2rad(45.0), 0.0, MODEL_PARAMS,
                                       stokes=['I', 'Q', 'U'],
                                       num_subpixel_rays=3, rng=rng)
    t_frames = units.Quantity(np.linspace(9.4, 9.8, 4), 'hr')
    predictor = NeRFPredictor(scale=8.0, rmin=6.0, rmax=8.0, z_width=2.0,
                              net_depth=2, net_width=16)
    state = TrainState.create(predictor.init_params(seed=5),
                              make_optimizer(10))
    ckpt_dir = tmp_path / 'ens'
    predictor.save_params(ckpt_dir)
    save_checkpoint(ckpt_dir, state, 10)

    ensemble = alma.image_plane_checkpoint(rt_list, str(ckpt_dir), t_frames,
                                           batchsize=4)
    singles = [alma.image_plane_checkpoint([rt], str(ckpt_dir), t_frames,
                                           batchsize=4) for rt in rt_list]
    np.testing.assert_allclose(ensemble, np.mean(singles, axis=0),
                               rtol=1e-5, atol=1e-9)
    # variants genuinely differ, so the average is a real constraint
    assert not np.allclose(singles[0], singles[1])


def test_chi2_df_grid_identifies_inclination(tmp_path):
    """End-to-end recovery-analysis workflow (reference 'Synthetic
    lightcurves 2' nb cells 8-9; VERDICT r1 missing #4): train tiny
    checkpoints at the true and a wrong inclination on a synthetic
    polarized lightcurve, score the grid with alma.chi2_df, and require
    chi^2(true) < chi^2(wrong)."""
    from bhnerf_tpu import constants, emission
    from bhnerf_tpu.train import Optimizer

    true_inc, wrong_inc, spin = 60.0, 20.0, 0.0
    num_iters = 250
    params = dict(MODEL_PARAMS)
    nt = 16
    t_frames = units.Quantity(np.linspace(9.4, 10.0, nt), 'hr')

    geos, Omega, J = alma.image_plane_model(np.deg2rad(true_inc), spin,
                                            params)
    t_injection = -float(geos.r_o + params['fov_M'] / 4)
    rmin = float(constants.isco_pro(spin))
    hotspot = emission.generate_hotspot(
        resolution=(24, 24, 24), rot_axis=[0, 0, 1], rot_angle=0.0,
        orbit_radius=1.2 * rmin, std=0.6, r_isco=rmin,
        fov=params['fov_M'])
    movie = np.asarray(emission.image_plane_dynamics(
        hotspot, geos, Omega, t_frames, t_injection, J=J,
        t_start_obs=units.Quantity(params['t_start_obs'], 'hr')))
    target = movie.sum(axis=(-1, -2))
    sigma = np.array([0.05, 0.01, 0.01]) * max(target[:, 0].max(), 1e-12)

    ckpt_fmt = str(tmp_path / 'inc{}' / 'seed{}')
    for inc in (true_inc, wrong_inc):
        from bhnerf_tpu.train.step import compact_raytracing_args
        rt_list = alma.get_raytracing_args(np.deg2rad(inc), spin, params)
        predictor = NeRFPredictor(
            scale=params['fov_M'] / 2, rmin=rmin,
            rmax=params['fov_M'] / 2, z_width=params['z_width'],
            net_depth=2, net_width=16)
        # compacted samples: same lc physics (equality in test_compact)
        # at a fraction of the per-step CPU cost of this 250-iter loop
        rt_list = [compact_raytracing_args(r, predictor, tile=256)
                   for r in rt_list]
        train_step = TrainStep.image(t_frames, target, predictor,
                                     sigma=sigma, dtype='lc')
        optimizer = Optimizer(
            {'num_iters': num_iters, 'lr_init': 5e-3, 'lr_final': 5e-4,
             'seed': 1}, predictor, rt_list,
            checkpoint_dir=ckpt_fmt.format(inc, 1))
        np.random.seed(1)
        optimizer.run(batchsize=6, train_step=train_step,
                      raytracing_args=rt_list, verbose=False)

    df = alma.chi2_df([true_inc, wrong_inc], spin, [1], params, ckpt_fmt,
                      t_frames, target, sigma=sigma,
                      checkpoint_name=f'checkpoint_{num_iters}')
    assert df.shape == (2, 1)
    assert np.isfinite(df.values).all()
    chi_true = df.loc[true_inc].mean()
    chi_wrong = df.loc[wrong_inc].mean()
    assert chi_true < chi_wrong, (chi_true, chi_wrong)
