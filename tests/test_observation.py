"""EHT instrument-model tests: uv geometry, noise, measurement operators,
closure phases, and a Tutorial-4-style visibility-domain recovery.
"""
import numpy as np
import pytest

from bhnerf_tpu import observation as obs_lib
from bhnerf_tpu import units

ARRAY_PATH = 'eht_arrays/EHT2017.txt'


@pytest.fixture(scope='module')
def array():
    return obs_lib.load_txt(ARRAY_PATH)


@pytest.fixture(scope='module')
def obs_empty(array):
    return obs_lib.empty_eht_obs(array, nt=8, tint=60.0, tstart=4.0,
                                 tstop=15.5)


def test_array_parse(array):
    assert 'ALMA' in array.names
    assert array.xyz.shape == (array.nstations, 3)
    # all stations on (roughly) the Earth's surface
    r = np.linalg.norm(array.xyz, axis=1)
    assert (np.abs(r - 6.37e6) < 1e5).all()


def test_uv_coverage_geometry(obs_empty, array):
    lam = obs_lib.C_LIGHT / obs_empty.rf
    uvdist = np.sqrt(obs_empty.u**2 + obs_empty.v**2)
    bl_len = np.linalg.norm(
        array.xyz[obs_empty.baselines[:, 1]]
        - array.xyz[obs_empty.baselines[:, 0]], axis=1)
    # projected baseline never exceeds physical baseline
    assert (uvdist <= bl_len[None, :] / lam * (1 + 1e-9)).all()
    # Earth rotation: uv points move between scans for valid baselines
    valid = obs_empty.mask[0] & obs_empty.mask[-1]
    assert valid.any()
    du = np.abs(obs_empty.u[0, valid] - obs_empty.u[-1, valid])
    assert (du > 1e5).any()
    # some baselines flagged by elevation at some times
    assert obs_empty.mask.any() and not obs_empty.mask.all()


def test_point_source_visibilities(obs_empty):
    """Centered point source: V(u,v) = flux on all baselines; closure
    phases exactly zero."""
    npix = 32
    psize = 1e-10  # rad
    movie = np.zeros((4, npix, npix))
    movie[:, npix // 2, npix // 2] = 1.5  # ehtim center convention
    times = np.linspace(4.0, 15.5, 4)
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False)
    v = obs.vis[obs.mask]
    np.testing.assert_allclose(np.abs(v[:, 0]), 1.5, rtol=1e-6)

    # closure phases of a point source vanish identically
    t_frames = units.Quantity(times, 'hr')
    target, sigma, A = obs.chisqdata(t_frames, 'cphase', psize * npix,
                                     npix)
    finite = np.isfinite(sigma)
    assert finite.any()
    np.testing.assert_allclose(target[finite], 0.0, atol=1e-6)


def test_offset_point_source_closure_still_zero(obs_empty):
    npix = 32
    psize = 1e-10
    movie = np.zeros((2, npix, npix))
    movie[:, npix // 2 + 5, npix // 2 - 3] = 2.0
    times = np.array([6.0, 10.0])
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False)
    # visibility phases are nonzero now...
    v = obs.vis[obs.mask][:, 0]
    assert np.abs(np.angle(v)).max() > 0.1
    # ...but closure phases still vanish (phase errors close)
    target, sigma, A = obs.chisqdata(units.Quantity(times, 'hr'),
                                     'cphase', psize * npix, npix)
    finite = np.isfinite(sigma)
    np.testing.assert_allclose(
        np.sin(target[finite]), 0.0, atol=1e-5)


def test_chisqdata_vis_consistency(obs_empty):
    """target == A @ vec(image) for the same image, noise off."""
    npix = 16
    psize = 1e-10
    rng = np.random.default_rng(0)
    movie = rng.random((2, npix, npix))
    times = np.array([6.0, 10.0])
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False)
    target, sigma, A = obs.chisqdata(units.Quantity(times, 'hr'), 'vis',
                                     psize * npix, npix)
    pred = np.einsum('tvp,tp->tv', A, movie.reshape(2, -1))
    finite = np.isfinite(sigma)
    np.testing.assert_allclose(pred[finite], target[finite], rtol=1e-6)


def test_thermal_noise_statistics(obs_empty):
    npix = 16
    psize = 1e-10
    movie = np.zeros((2, npix, npix))
    times = np.array([6.0, 10.0])
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=True, seed=3)
    v = obs.vis[obs.mask]
    s = obs.sigma[obs.mask]
    z = np.concatenate([v.real[:, 0] / s, v.imag[:, 0] / s])
    # standardized residuals ~ N(0,1)
    assert 0.7 < z.std() < 1.3
    assert np.abs(z.mean()) < 0.3


def test_station_gain_corruption(obs_empty):
    npix = 16
    psize = 1e-10
    movie = np.zeros((2, npix, npix))
    movie[:, npix // 2, npix // 2] = 1.0
    times = np.array([6.0, 10.0])
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False, station_noise=True,
                               seed=1)
    amps = np.abs(obs.vis[obs.mask][:, 0])
    # gains scatter amplitudes away from 1
    assert amps.std() > 0.02
    phases = np.angle(obs.vis[obs.mask][:, 0])
    assert np.abs(phases).max() > 0.5


def test_padded_obs(obs_empty):
    npix = 8
    movie = np.zeros((2, npix, npix))
    obs = obs_lib.observe_same(movie, np.array([6.0, 10.0]), 1e-10,
                               obs_empty, thermal_noise=False)
    padded = obs_lib.padded_obs(obs, 'u')
    assert padded.shape[0] == obs.nscan
    assert np.isnan(padded).any() or padded.shape[1] == obs.mask.sum(1).max()


def test_eht_visibility_recovery(obs_empty):
    """Tutorial-4 analog: recover emission from complex visibilities."""
    import jax.numpy as jnp
    from bhnerf_tpu import constants, emission
    from bhnerf_tpu.geodesics import image_plane_geos
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.train import (TrainStep, TrainState, make_optimizer,
                                  raytracing_args)

    fov_m = 16.0
    npix = 16
    geos = image_plane_geos(spin=0.0, inclination=np.deg2rad(60),
                            alpha_range=(-fov_m / 2, fov_m / 2),
                            beta_range=(-fov_m / 2, fov_m / 2), ngeo=32,
                            num_alpha=npix, num_beta=npix, n_fine=2048)
    hotspot = emission.generate_hotspot(
        resolution=(32, 32, 32), rot_axis=[0, 0, 1], rot_angle=0.0,
        orbit_radius=6.5, std=0.7, r_isco=6.0, fov=fov_m)
    Omega = float(1 / 6.5 ** 1.5)
    GM_hr = constants.GM_c3(constants.sgra_mass).to('hr').value
    t_frames = units.Quantity(np.linspace(4.0, 15.5, 8), 'hr')
    t_injection = -float(geos.r_o + fov_m / 4)
    movie = np.asarray(emission.image_plane_dynamics(
        hotspot, geos, Omega, t_frames, t_injection=t_injection,
        t_start_obs=t_frames[0]))

    # observe with the EHT2017 array (fov in radians: 100 uas)
    fov_rad = 100 * np.pi / 180 / 3600 / 1e6
    psize = fov_rad / npix
    obs = obs_lib.observe_same(movie, np.asarray(t_frames.value), psize,
                               obs_empty, thermal_noise=False)

    rt = raytracing_args(geos, Omega, t_injection, t_frames[0])
    predictor = NeRFPredictor(scale=fov_m / 2, rmax=fov_m / 2, z_width=2.0,
                              net_depth=3, net_width=32)
    params = predictor.init_params(seed=1)
    state = TrainState.create(params, make_optimizer(300, lr_init=5e-3))
    train_step = TrainStep.eht(t_frames, obs, fov_rad, npix, predictor,
                               dtype='vis')

    np.random.seed(0)
    losses = []
    for _ in range(300):
        inds = train_step.args[0].sample(4)
        loss, state, _ = train_step(state, rt, inds)
        losses.append(float(np.asarray(loss)))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) / 10.0, (
        np.mean(losses[:10]), np.mean(losses[-10:]))


def test_sigmat_gain_correlation(array):
    """Gauss-Markov gain wander: scans within the correlation time share
    gains; distant scans decorrelate (reference sigmat semantics)."""
    obs = obs_lib.empty_eht_obs(array, nt=40, tint=60.0, tstart=4.0,
                                tstop=8.0)  # 6-min scan spacing
    rng = np.random.default_rng(0)
    g_R, _, _, _ = obs_lib.station_jones(obs, rng, station_noise=True,
                                         sigmat=10.0)
    amp = np.abs(g_R)
    lag1_long = np.mean([np.corrcoef(amp[:-1, s], amp[1:, s])[0, 1]
                         for s in range(amp.shape[1] - 1)])  # skip SR(=0)
    rng = np.random.default_rng(0)
    g_R, _, _, _ = obs_lib.station_jones(obs, rng, station_noise=True,
                                         sigmat=1e-4)
    amp = np.abs(g_R)
    lag1_short = np.mean([np.corrcoef(amp[:-1, s], amp[1:, s])[0, 1]
                          for s in range(amp.shape[1] - 1)])
    assert lag1_long > 0.9, lag1_long
    assert abs(lag1_short) < 0.5, lag1_short


def test_gain_wander_statistics(array):
    """Per-station gain amplitude std matches the EHT2017 GAINP table and
    the constant offset matches GAIN_OFFSET across realizations."""
    obs = obs_lib.empty_eht_obs(array, nt=6, tint=60.0)
    lmt = obs.array.names.index('LMT')
    alma = obs.array.names.index('ALMA')
    const_spread, wander = [], []
    for seed in range(400):
        rng = np.random.default_rng(seed)
        g_R, _, _, _ = obs_lib.station_jones(obs, rng, station_noise=True,
                                             sigmat=1e-6)
        amp = np.abs(g_R)
        const_spread.append(amp[:, lmt].mean())
        wander.append(amp[:, alma].std() / max(amp[:, alma].mean(), 1e-9))
    # LMT: 0.6 offset std dominates the mean-gain spread
    assert 0.35 < np.std(const_spread) < 0.9, np.std(const_spread)
    # ALMA: within-observation wander ~ GAINP=0.05
    assert 0.02 < np.mean(wander) < 0.1, np.mean(wander)


def test_dterm_leakage_injects_polarization(obs_empty):
    """A pure-Stokes-I source leaks into Q/U at O(d * I) under D-term
    corruption; without dterm_noise Q/U stay exactly zero."""
    npix = 16
    psize = 1e-10
    movie = np.zeros((2, 4, npix, npix))
    movie[:, 0, npix // 2, npix // 2] = 1.0  # I only
    times = np.array([6.0, 10.0])
    clean = obs_lib.observe_same(movie, times, psize, obs_empty,
                                 thermal_noise=False)
    np.testing.assert_allclose(np.abs(clean.vis[clean.mask][:, 1:3]), 0.0,
                               atol=1e-12)
    leaky = obs_lib.observe_same(movie, times, psize, obs_empty,
                                 thermal_noise=False, dterm_noise=True,
                                 seed=7)
    p = np.abs(leaky.vis[leaky.mask][:, 1:3])
    assert p.max() > 0.01, p.max()       # leakage present, O(0.05 * I)
    assert p.max() < 0.5, p.max()        # ...but perturbative
    # Stokes I barely affected (O(d^2))
    np.testing.assert_allclose(np.abs(leaky.vis[leaky.mask][:, 0]), 1.0,
                               rtol=0.05)


def test_dterm_roundtrip_identity():
    """apply_jones_corruption with identity gains and zero D-terms is a
    no-op for full-Stokes visibilities."""
    rng = np.random.default_rng(0)
    nscan, nbl = 3, 5
    vis = rng.standard_normal((nscan, nbl, 4)) \
        + 1j * rng.standard_normal((nscan, nbl, 4))
    baselines = np.array([[0, 1], [0, 2], [1, 2], [1, 3], [2, 3]])
    g = np.ones((nscan, 4), complex)
    d = np.zeros(4, complex)
    out = obs_lib.apply_jones_corruption(vis, baselines, g, g, d, d)
    np.testing.assert_allclose(out, vis, atol=1e-12)


def test_amp_debias_low_snr(obs_empty):
    """|V| of pure noise is Rice-biased; debiasing drives the mean toward
    zero; chisqdata('amp') applies it by default."""
    npix = 16
    psize = 1e-10
    movie = np.zeros((2, npix, npix))  # zero flux: amps are pure noise
    times = np.array([6.0, 10.0])
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=True, seed=11)
    t_frames = units.Quantity(times, 'hr')
    amp_raw, sigma, _ = obs.chisqdata(t_frames, 'amp', psize * npix, npix,
                                      debias=False)
    amp_deb, _, _ = obs.chisqdata(t_frames, 'amp', psize * npix, npix)
    finite = np.isfinite(sigma)
    # Rayleigh noise amplitudes: E[|V|] = sigma*sqrt(pi/2) ~ 1.25 sigma;
    # debiased: E[sqrt(max(|V|^2-s^2,0))] = e^{-1/2} Gamma(3/2) sqrt(2) s
    # ~ 0.76 sigma
    raw = np.mean(amp_raw[finite] / sigma[finite])
    deb = np.mean(amp_deb[finite] / sigma[finite])
    assert 1.0 < raw < 1.5, raw
    assert 0.55 < deb < 0.95, deb
    assert deb < raw - 0.3
    np.testing.assert_allclose(
        amp_deb[finite],
        np.sqrt(np.clip(amp_raw[finite] ** 2 - sigma[finite] ** 2, 0,
                        None)), rtol=1e-10)


def test_from_uvdata_roundtrip():
    """Observation.from_uvdata (ehtim.Obsdata.data migration adapter)
    rebuilds an equivalent observation from flat per-visibility records:
    chisqdata operators must match the original's."""
    from bhnerf_tpu import observation as obs_lib

    array = obs_lib.load_txt('eht_arrays/EHT2017.txt')
    obs0 = obs_lib.empty_eht_obs(array, nt=4, tint=60.0, tstart=4.0,
                                 tstop=8.0)
    rng = np.random.default_rng(0)
    movie = rng.random((4, 3, 16, 16))
    obs = obs_lib.stokes_array_to_ehtim(movie, obs0.times, 1e-10) \
        .observe_same(obs0, thermal_noise=False)

    # flatten exactly like ehtim's obs.data columns
    recs = obs.tlist()
    flat = {k: np.concatenate([r[k] for r in recs])
            for k in ('time', 'u', 'v', 'sigma', 't1', 't2', 'vis',
                      'qvis', 'uvis')}
    # flip the orientation of every other record (t1<->t2, conj(V),
    # (-u,-v)) — an equivalent representation real datasets mix freely;
    # from_uvdata must re-canonicalize it (closure phases would silently
    # break otherwise)
    flip = np.arange(flat['time'].size) % 2 == 1
    t1 = np.where(flip, flat['t2'], flat['t1'])
    t2 = np.where(flip, flat['t1'], flat['t2'])
    sign = np.where(flip, -1.0, 1.0)
    conj = lambda a: np.where(flip, np.conj(a), a)
    obs2 = obs_lib.Observation.from_uvdata(
        time=flat['time'], t1=t1, t2=t2, u=flat['u'] * sign,
        v=flat['v'] * sign, sigma=flat['sigma'], vis=conj(flat['vis']),
        qvis=conj(flat['qvis']), uvis=conj(flat['uvis']), ra=obs.ra,
        dec=obs.dec, rf=obs.rf, mjd=obs.mjd)

    t_frames = obs.times
    for dtype in ('vis', 'amp', 'cphase'):
        a = obs.chisqdata(t_frames, dtype, image_fov_rad(), 16, pol='I')
        b = obs2.chisqdata(t_frames, dtype, image_fov_rad(), 16, pol='I')
        for x, y, name in zip(a, b, ('target', 'sigma', 'A')):
            x, y = np.asarray(x), np.asarray(y)
            assert x.shape == y.shape, (dtype, name, x.shape, y.shape)
            np.testing.assert_allclose(
                np.nan_to_num(x, posinf=0), np.nan_to_num(y, posinf=0),
                atol=1e-8, err_msg=f'{dtype}/{name}')


def image_fov_rad():
    import numpy as _np
    return 160.0 * _np.pi / 180.0 / 3600.0 / 1e6  # 160 uas


def test_from_uvdata_noncontiguous_pols():
    """I+V input keeps its polarization identity (pol_names tracks the
    provided subset instead of mislabeling V as Q)."""
    from bhnerf_tpu import observation as obs_lib
    n = 6
    t1 = np.array(list('ABCDEF'))
    t2 = np.array(list('GHIJKL'))
    obs = obs_lib.Observation.from_uvdata(
        time=np.zeros(n), t1=t1, t2=t2,
        u=np.arange(1.0, n + 1), v=np.ones(n), sigma=np.ones(n),
        vis=np.ones(n, complex), vvis=2j * np.ones(n, complex))
    assert obs.pol_names == ('I', 'V')
    rec = obs.tlist()[0]
    np.testing.assert_allclose(rec['vvis'], 2j * np.ones(n))
    assert 'qvis' not in rec


def test_observe_same_nonsquare_movie():
    """The synthesis DFT handles rectangular movies (ny != nx)."""
    from bhnerf_tpu import observation as obs_lib
    array = obs_lib.load_txt('eht_arrays/EHT2017.txt')
    obs0 = obs_lib.empty_eht_obs(array, nt=2, tint=60.0)
    movie = np.zeros((2, 1, 8, 16))
    movie[:, :, 4, 8] = 1.0
    vis = obs_lib.observe_same(movie, obs0.times, 1e-10, obs0,
                               thermal_noise=False).vis
    assert np.isfinite(vis[obs_lib.np.asarray(obs0.mask)]).all()


def test_empty_eht_obs_rejects_unsupported_modes():
    from bhnerf_tpu import observation as obs_lib
    array = obs_lib.load_txt('eht_arrays/EHT2017.txt')
    with pytest.raises(NotImplementedError):
        obs_lib.empty_eht_obs(array, nt=2, tint=60.0, timetype='GMST')


def test_chi2_df_labels_and_float_grid():
    """chi2_df labels columns by actual seed values and does not
    truncate a fractional scalar against an integer grid."""
    from bhnerf_tpu import alma
    df = alma.chi2_df([45, 60], 0.9, seeds=[3, 7], params=None,
                      checkpoint_fmt='/nonexistent/{}/{}', t=None,
                      data=None)
    assert list(df.columns) == ['seed 3', 'seed 7']
    assert df.index.name == 'inc'


def test_array_parses_fr_and_dterm_columns(array):
    """EHT2017.txt carries FR_PAR/FR_ELEV/FR_OFFSET and D-term columns."""
    assert array.fr_par.shape == (array.nstations,)
    i_alma = array.names.index('ALMA')
    i_sma = array.names.index('SMA')
    assert array.fr_par[i_alma] == 1.0 and array.fr_elev[i_alma] == 0.0
    assert array.fr_elev[i_sma] == -1.0
    np.testing.assert_allclose(array.fr_off[i_sma], np.deg2rad(45.0))
    np.testing.assert_allclose(array.d_R, 0.0)


def test_station_angles_consistent_with_elevation_flags(obs_empty, array):
    """station_angles reproduces the elevation cuts empty_eht_obs used
    to build the mask (same geometry, independent wiring)."""
    elev, par = obs_lib.station_angles(obs_empty)
    assert elev.shape == (obs_empty.nscan, array.nstations)
    el_deg = np.rad2deg(elev)
    ok = (el_deg > 15.0) & (el_deg < 85.0)
    i, j = obs_empty.baselines[:, 0], obs_empty.baselines[:, 1]
    np.testing.assert_array_equal(obs_empty.mask, ok[:, i] & ok[:, j])
    assert np.isfinite(par).all()


def test_field_rotation_rotates_evpa_by_station_angles(obs_empty):
    """frcal=False on a pure-Q source rotates the RL visibility phase by
    exactly -(phi_i + phi_j): elevation/parallactic-dependent EVPA
    corruption (reference observation.py:160-177 frcal toggle)."""
    npix = 8
    psize = 1e-10
    movie = np.zeros((1, 4, npix, npix))
    movie[:, 0, npix // 2, npix // 2] = 1.0
    movie[:, 1, npix // 2, npix // 2] = 0.3   # Q
    times = np.array([10.0])
    clean = obs_lib.observe_same(movie, times, psize, obs_empty,
                                 thermal_noise=False)
    rot = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False, frcal=False, seed=0)
    phi = obs_lib.field_rotation_angles(obs_empty)
    i, j = obs_empty.baselines[:, 0], obs_empty.baselines[:, 1]
    rl_clean = clean.vis[..., 1] + 1j * clean.vis[..., 2]
    rl_rot = rot.vis[..., 1] + 1j * rot.vis[..., 2]
    m = clean.mask
    expected = rl_clean[m] * np.exp(-1j * (phi[:, i] + phi[:, j])[m])
    np.testing.assert_allclose(rl_rot[m], expected, atol=1e-10)
    # the corruption is real: some baselines rotate EVPA by > 5 deg
    shift = np.angle(rl_rot[m] / rl_clean[m]) / 2
    assert np.abs(shift).max() > np.deg2rad(5)


def test_inverse_jones_undoes_known_corruption(obs_empty):
    """Corrupt with field rotation + known D-terms + gains, then
    calibrate with apply_inverse_jones using the known terms: exact
    roundtrip (VERDICT r2 next #5 acceptance)."""
    rng = np.random.default_rng(3)
    ns = obs_empty.array.nstations
    nscan, nbl = obs_empty.nscan, obs_empty.nbl
    vis = (rng.standard_normal((nscan, nbl, 4))
           + 1j * rng.standard_normal((nscan, nbl, 4)))
    g_R = (1 + 0.2 * rng.standard_normal((nscan, ns))) * np.exp(
        1j * rng.standard_normal((nscan, ns)))
    g_L = (1 + 0.2 * rng.standard_normal((nscan, ns))) * np.exp(
        1j * rng.standard_normal((nscan, ns)))
    d_R = 0.05 * (rng.standard_normal(ns) + 1j * rng.standard_normal(ns))
    d_L = 0.05 * (rng.standard_normal(ns) + 1j * rng.standard_normal(ns))
    phi = obs_lib.field_rotation_angles(obs_empty)
    corr = obs_lib.apply_jones_corruption(vis, obs_empty.baselines,
                                          g_R, g_L, d_R, d_L, phi=phi)
    cal = obs_lib.apply_inverse_jones(corr, obs_empty.baselines,
                                      g_R=g_R, g_L=g_L, d_R=d_R, d_L=d_L,
                                      phi=phi)
    np.testing.assert_allclose(cal, vis, atol=1e-10)
    # gain-free corruption (leakage + field rotation only) is exactly
    # undone by the partial inverse with known D-terms and angles
    ones = np.ones((nscan, ns), complex)
    corr_df = obs_lib.apply_jones_corruption(vis, obs_empty.baselines,
                                             ones, ones, d_R, d_L,
                                             phi=phi)
    partial = obs_lib.apply_inverse_jones(corr_df, obs_empty.baselines,
                                          d_R=d_R, d_L=d_L, phi=phi)
    np.testing.assert_allclose(partial, vis, atol=1e-10)


def test_ampcal_phasecal_independent_toggles(obs_empty):
    """ampcal=False/phasecal=True perturbs only amplitudes (ratio to the
    clean vis is real positive); phasecal=False/ampcal=True only phases
    (|vis| unchanged)."""
    npix = 8
    psize = 1e-10
    movie = np.zeros((1, 1, npix, npix))
    movie[:, 0, npix // 2, npix // 2] = 1.0
    times = np.array([10.0])
    clean = obs_lib.observe_same(movie, times, psize, obs_empty,
                                 thermal_noise=False)
    amp_only = obs_lib.observe_same(movie, times, psize, obs_empty,
                                    thermal_noise=False, ampcal=False,
                                    phasecal=True, seed=5)
    m = clean.mask
    ratio = amp_only.vis[..., 0][m] / clean.vis[..., 0][m]
    np.testing.assert_allclose(ratio.imag, 0.0, atol=1e-12)
    assert (ratio.real > 0).all()
    assert np.abs(ratio.real - 1.0).max() > 0.01  # errors present

    # independent R/L phase errors (rlgaincal=False, the reference tier)
    # DECOHERE Stokes I: |I'| = |I| |e^{i thR} + e^{i thL}| / 2 <= |I|,
    # with phase (thR + thL)/2 — amplitudes can only shrink
    ph_only = obs_lib.observe_same(movie, times, psize, obs_empty,
                                   thermal_noise=False, ampcal=True,
                                   phasecal=False, seed=5)
    ratio = ph_only.vis[..., 0][m] / clean.vis[..., 0][m]
    assert (np.abs(ratio) <= 1.0 + 1e-12).all()
    assert np.abs(np.angle(ratio)).max() > 0.1  # phase errors present


# ---------------------------------------------------------------------------
# closure amplitudes (ehtim chisqdata_logcamp/camp counterparts)
# ---------------------------------------------------------------------------
def _complete_scan_obs(nst=5, seed=0, sigma=1e-3):
    """Single fully-connected scan with random visibilities."""
    import itertools
    rng = np.random.default_rng(seed)
    pairs = list(itertools.combinations(range(nst), 2))
    nb = len(pairs)
    vis = (rng.normal(1.0, 0.3, nb)
           + 1j * rng.normal(0.0, 0.3, nb))
    return obs_lib.Observation.from_uvdata(
        time=np.full(nb, 6.0), t1=[p[0] for p in pairs],
        t2=[p[1] for p in pairs], u=rng.normal(0, 1e9, nb),
        v=rng.normal(0, 1e9, nb), sigma=np.full(nb, sigma), vis=vis)


@pytest.mark.parametrize('nst', [4, 5, 6])
def test_logcamp_count_is_maximal_independent_set(nst):
    """A fully-connected n-station scan has n(n-3)/2 independent
    closure amplitudes (TMS; ehtim count='min')."""
    obs = _complete_scan_obs(nst)
    target, sigma, A = obs.chisqdata(
        units.Quantity([6.0], 'hr'), 'logcamp', 1e-9, 8)
    assert np.isfinite(sigma).sum() == nst * (nst - 3) // 2
    assert A.shape[1] == 4


def test_logcamp_station_gain_invariance():
    """Scaling every visibility by station amplitude gains g_i g_j
    leaves every closure amplitude unchanged."""
    import dataclasses
    obs = _complete_scan_obs(6)
    rng = np.random.default_rng(7)
    g = rng.uniform(0.5, 2.0, 6)
    gains = np.array([[g[i] * g[j] for (i, j) in
                       map(tuple, obs.baselines)]])
    corrupted = dataclasses.replace(
        obs, vis=obs.vis * gains[..., None])
    t_hr = units.Quantity([6.0], 'hr')
    t0, s0, _ = obs.chisqdata(t_hr, 'logcamp', 1e-9, 8, debias=False)
    t1, s1, _ = corrupted.chisqdata(t_hr, 'logcamp', 1e-9, 8,
                                    debias=False)
    finite = np.isfinite(s0)
    assert finite.any()
    np.testing.assert_allclose(t1[finite], t0[finite], atol=1e-10)


def test_point_source_logcamp_zero(obs_empty):
    """A centered point source has |V| = const: all log closure
    amplitudes vanish (and camps are 1)."""
    npix = 16
    psize = 1e-10
    movie = np.zeros((2, npix, npix))
    movie[:, npix // 2, npix // 2] = 1.5
    times = np.array([6.0, 10.0])
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False)
    t_hr = units.Quantity(times, 'hr')
    target, sigma, _ = obs.chisqdata(t_hr, 'logcamp', psize * npix,
                                     npix, debias=False)
    finite = np.isfinite(sigma)
    assert finite.any()
    np.testing.assert_allclose(target[finite], 0.0, atol=1e-8)
    camp, csigma, _ = obs.chisqdata(t_hr, 'camp', psize * npix, npix,
                                    debias=False)
    np.testing.assert_allclose(camp[np.isfinite(csigma)], 1.0,
                               atol=1e-8)


def test_chisqdata_logcamp_consistency(obs_empty):
    """target == log closure amplitude of A-leg model visibilities for
    the generating image (noise off, debias off)."""
    npix = 16
    psize = 1e-10
    rng = np.random.default_rng(3)
    movie = rng.random((2, npix, npix))
    times = np.array([6.0, 10.0])
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False)
    target, sigma, A = obs.chisqdata(
        units.Quantity(times, 'hr'), 'logcamp', psize * npix, npix,
        debias=False)
    legs = np.abs(np.einsum('tlvp,tp->tlv', A, movie.reshape(2, -1)))
    legs = np.maximum(legs, 1e-300)    # padded rows: log(0) outside mask
    finite = np.isfinite(sigma)
    model = (np.log(legs[:, 0]) + np.log(legs[:, 1])
             - np.log(legs[:, 2]) - np.log(legs[:, 3]))
    np.testing.assert_allclose(model[finite], target[finite],
                               rtol=1e-6, atol=1e-9)


def test_camp_matches_exp_logcamp(obs_empty):
    npix = 16
    psize = 1e-10
    rng = np.random.default_rng(4)
    movie = rng.random((2, npix, npix))
    times = np.array([6.0, 10.0])
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False)
    t_hr = units.Quantity(times, 'hr')
    lc_t, lc_s, _ = obs.chisqdata(t_hr, 'logcamp', psize * npix, npix)
    c_t, c_s, _ = obs.chisqdata(t_hr, 'camp', psize * npix, npix)
    finite = np.isfinite(lc_s)
    np.testing.assert_allclose(c_t[finite], np.exp(lc_t[finite]),
                               rtol=1e-12)
    np.testing.assert_allclose(c_s[finite],
                               c_t[finite] * lc_s[finite], rtol=1e-12)


def test_eht_logcamp_training_step(obs_empty):
    """TrainStep.eht(dtype='logcamp') produces finite decreasing loss
    and finite gradients through the closure-amplitude chi^2."""
    import jax
    from bhnerf_tpu import constants, emission
    from bhnerf_tpu.geodesics import image_plane_geos
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.train import (TrainStep, TrainState, make_optimizer,
                                  raytracing_args)

    fov_m = 16.0
    npix = 16
    geos = image_plane_geos(spin=0.0, inclination=np.deg2rad(60),
                            alpha_range=(-fov_m / 2, fov_m / 2),
                            beta_range=(-fov_m / 2, fov_m / 2), ngeo=32,
                            num_alpha=npix, num_beta=npix, n_fine=2048)
    hotspot = emission.generate_hotspot(
        resolution=(32, 32, 32), rot_axis=[0, 0, 1], rot_angle=0.0,
        orbit_radius=6.5, std=0.7, r_isco=6.0, fov=fov_m)
    Omega = float(1 / 6.5 ** 1.5)
    t_frames = units.Quantity(np.linspace(4.0, 15.5, 4), 'hr')
    t_injection = -float(geos.r_o + fov_m / 4)
    movie = np.asarray(emission.image_plane_dynamics(
        hotspot, geos, Omega, t_frames, t_injection=t_injection,
        t_start_obs=t_frames[0]))
    fov_rad = 100 * np.pi / 180 / 3600 / 1e6
    obs = obs_lib.observe_same(movie, np.asarray(t_frames.value),
                               fov_rad / npix, obs_empty,
                               thermal_noise=False)
    rt = raytracing_args(geos, Omega, t_injection, t_frames[0])
    predictor = NeRFPredictor(scale=fov_m / 2, rmax=fov_m / 2,
                              z_width=2.0, net_depth=3, net_width=32)
    state = TrainState.create(predictor.init_params(seed=1),
                              make_optimizer(60, lr_init=5e-3))
    train_step = TrainStep.eht(t_frames, obs, fov_rad, npix, predictor,
                               dtype='logcamp')
    np.random.seed(0)
    losses = []
    for _ in range(60):
        inds = train_step.args[0].sample(4)
        loss, state, _ = train_step(state, rt, inds)
        losses.append(float(np.asarray(loss)))
        assert np.isfinite(losses[-1])
    grads = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_chisqdata_bs_consistency(obs_empty):
    """Bispectrum target == triple product of A-leg model visibilities
    for the generating image (noise off), and sigma_bs = |B| sigma_cp."""
    npix = 16
    psize = 1e-10
    rng = np.random.default_rng(5)
    movie = rng.random((2, npix, npix))
    times = np.array([6.0, 10.0])
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False)
    t_hr = units.Quantity(times, 'hr')
    target, sigma, A = obs.chisqdata(t_hr, 'bs', psize * npix, npix)
    legs = np.einsum('tlvp,tp->tlv', A, movie.reshape(2, -1))
    model = legs[:, 0] * legs[:, 1] * legs[:, 2]
    finite = np.isfinite(sigma)
    assert finite.any()
    np.testing.assert_allclose(model[finite], target[finite], rtol=1e-6)
    # sigma relation against the closure-phase rows (same triangles)
    cp_t, cp_s, _ = obs.chisqdata(t_hr, 'cphase', psize * npix, npix)
    np.testing.assert_allclose(sigma[finite],
                               np.abs(target[finite]) * cp_s[finite],
                               rtol=1e-10)
    # and the closure phase is the bispectrum angle
    np.testing.assert_allclose(np.angle(target[finite]), cp_t[finite],
                               rtol=0, atol=1e-12)


def test_bs_loss_zero_at_truth(obs_empty):
    """loss_fn_eht('bs') vanishes when the model movie equals the data
    movie, and is positive otherwise (padding contributes nothing)."""
    import jax.numpy as jnp
    from bhnerf_tpu.train import step as step_lib

    npix = 16
    psize = 1e-10
    rng = np.random.default_rng(6)
    movie = rng.random((2, npix, npix))
    times = np.array([6.0, 10.0])
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False)
    t_hr = units.Quantity(times, 'hr')
    target, sigma, A = obs.chisqdata(t_hr, 'bs', psize * npix, npix)
    target, sigma, A = step_lib.to_real_measurements(
        'bs', target, sigma, A)
    # evaluate the chi^2 on raw images (bypassing the predictor) by
    # reproducing the loss body: legs = A @ vec(image)
    def chisq(images):
        iv = images.reshape(2, 1, 1, -1, 1)
        vis_ri = jnp.squeeze(jnp.asarray(A) @ iv, -1)
        re0, im0 = vis_ri[..., 0, 0, :], vis_ri[..., 0, 1, :]
        re1, im1 = vis_ri[..., 1, 0, :], vis_ri[..., 1, 1, :]
        re2, im2 = vis_ri[..., 2, 0, :], vis_ri[..., 2, 1, :]
        re01 = re0 * re1 - im0 * im1
        im01 = re0 * im1 + im0 * re1
        bs_ri = jnp.stack([re01 * re2 - im01 * im2,
                           re01 * im2 + im01 * re2], axis=-2)
        return float(jnp.sum(((bs_ri - target) / sigma) ** 2))

    assert chisq(jnp.asarray(movie)) < 1e-6
    assert chisq(jnp.asarray(movie * 1.1)) > 1.0


def test_dft_factors_outer_product_matches_dense():
    """dft_factors is an exact separable factorization of dft_matrix."""
    rng = np.random.default_rng(3)
    u = rng.normal(scale=4e9, size=17)
    v = rng.normal(scale=4e9, size=17)
    fov, npix = 1.2e-9, 8
    dense = obs_lib.dft_matrix(u, v, fov, npix)
    f = obs_lib.dft_factors(u, v, fov, npix)
    eu = f[0] - 1j * f[1]                       # (nvis, npix_x)
    ev = f[2] - 1j * f[3]                       # (nvis, npix_y)
    rebuilt = np.einsum('kr,kc->krc', ev, eu).reshape(len(u), -1)
    np.testing.assert_allclose(rebuilt, dense, atol=1e-12)


def test_dft_factors_rectangular():
    """Rectangular images factor with distinct x/y grids (zero-padded to
    the common max, padding never read)."""
    rng = np.random.default_rng(4)
    u = rng.normal(scale=4e9, size=9)
    v = rng.normal(scale=4e9, size=9)
    fov, nx, fov_y, ny = 1.2e-9, 4, 0.9e-9, 6
    dense = obs_lib.dft_matrix(u, v, fov, nx, image_fov_y=fov_y,
                               image_size_y=ny)
    f = obs_lib.dft_factors(u, v, fov, nx, image_fov_y=fov_y,
                            image_size_y=ny)
    eu = (f[0] - 1j * f[1])[:, :nx]
    ev = (f[2] - 1j * f[3])[:, :ny]
    rebuilt = np.einsum('kr,kc->krc', ev, eu).reshape(len(u), -1)
    np.testing.assert_allclose(rebuilt, dense, atol=1e-12)

    # and the training-time consumer contracts the padded stack
    # correctly end-to-end (slices each factor back to nx/ny)
    import jax.numpy as jnp
    from bhnerf_tpu.train.step import apply_measurement_operator
    img = rng.random((ny, nx))
    vis_dense = dense @ img.ravel()
    vis_f = np.asarray(apply_measurement_operator(
        jnp.asarray(img, jnp.float32), jnp.asarray(f, jnp.float32)))
    np.testing.assert_allclose(vis_f[0], vis_dense.real, rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(vis_f[1], vis_dense.imag, rtol=2e-5,
                               atol=1e-5)


@pytest.mark.parametrize('dtype', ['vis', 'amp', 'cphase', 'bs',
                                   'logcamp', 'camp'])
def test_factored_operator_matches_dense(obs_empty, dtype):
    """chisqdata(operator='factored') + apply_measurement_operator
    reproduce the dense-DFT visibility chain for every measurement type,
    with npix-fold less operator memory (VERDICT r3 missing #1;
    reference production path: ehtim NFFT, observation.py:121)."""
    from bhnerf_tpu.train.step import (apply_measurement_operator,
                                       to_real_measurements)

    npix = 12
    psize = 1e-10
    rng = np.random.default_rng(1)
    movie = rng.random((2, npix, npix))
    times = np.array([6.0, 10.0])
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False)
    tq = units.Quantity(times, 'hr')
    td, sd, Ad = obs.chisqdata(tq, dtype, psize * npix, npix)
    tf, sf, Af = obs.chisqdata(tq, dtype, psize * npix, npix,
                               operator='factored')
    np.testing.assert_allclose(tf, td, atol=1e-12)
    np.testing.assert_allclose(sf, sd, atol=1e-12)
    assert Af.nbytes * npix <= Ad.nbytes * 4.1   # complex128 -> float64

    td_ri, sd_ri, Ad_ri = to_real_measurements(dtype, td, sd, Ad)
    tf_ri, sf_ri, Af_ri = to_real_measurements(dtype, tf, sf, Af)
    np.testing.assert_allclose(tf_ri, td_ri, atol=1e-12)

    import jax.numpy as jnp
    imgs = jnp.asarray(movie, jnp.float32)
    vd = np.asarray(apply_measurement_operator(imgs, jnp.asarray(Ad_ri)))
    vf = np.asarray(apply_measurement_operator(imgs, jnp.asarray(Af_ri)))
    np.testing.assert_allclose(vf, vd, rtol=2e-4, atol=2e-5)


def test_factored_training_step(obs_empty):
    """TrainStep.eht(operator='factored') trains: loss finite and equal
    to the dense-operator loss at the same params."""
    import jax
    from bhnerf_tpu import constants
    from bhnerf_tpu.geodesics import image_plane_geos
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.train import TrainStep, Optimizer
    from bhnerf_tpu.train import raytracing_args as rt_args

    fov, npix, nt = 16.0, 12, 4
    geos = image_plane_geos(spin=0.0, inclination=np.deg2rad(60),
                            alpha_range=(-fov / 2, fov / 2),
                            beta_range=(-fov / 2, fov / 2), ngeo=24,
                            num_alpha=npix, num_beta=npix, n_fine=1024)
    rt = rt_args(geos, geos.keplerian_omega(), -float(geos.r_o + 4),
                 units.Quantity(4.0, 'hr'))
    predictor = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                              z_width=2.0, net_depth=2, net_width=16)
    t_frames = units.Quantity(
        np.linspace(4.0, 15.5, nt).astype(np.float32), 'hr')
    rng = np.random.default_rng(0)
    movie = rng.random((nt, npix, npix), dtype=np.float32)
    fov_rad = float(fov * constants.GM_c2(constants.sgra_mass).value
                    / constants.sgra_distance.to('m').value)
    obs = obs_lib.observe_same(movie, np.asarray(t_frames.value),
                               fov_rad / npix, obs_empty,
                               thermal_noise=False)

    losses = {}
    for op in ('dense', 'factored'):
        ts = TrainStep.eht(t_frames, obs, fov_rad, npix, predictor,
                           dtype='vis', operator=op)
        opt = Optimizer({'num_iters': 1, 'lr_init': 1e-3, 'seed': 0},
                        predictor, rt, checkpoint_dir='')
        loss, _, _ = ts(opt.state, rt, np.arange(nt), update_state=False)
        losses[op] = float(np.asarray(loss))
    assert np.isfinite(losses['factored'])
    np.testing.assert_allclose(losses['factored'], losses['dense'],
                               rtol=1e-4)


def test_applied_jones_roundtrip(obs_empty):
    """observe_same records the drawn corruption (caltable analog,
    reference observation.py:121,133): corrupt -> calibrate() with the
    recorded truth tables recovers the uncorrupted visibilities to
    machine precision (VERDICT r3 missing #2)."""
    npix = 8
    psize = 1e-10
    rng = np.random.default_rng(7)
    movie = rng.random((2, 4, npix, npix))      # full-Stokes
    times = np.array([6.0, 10.0])

    clean = obs_lib.observe_same(movie, times, psize, obs_empty,
                                 thermal_noise=False)
    assert clean.applied_jones is None

    corrupted = obs_lib.observe_same(
        movie, times, psize, obs_empty, thermal_noise=False,
        station_noise=True, dterm_noise=True, frcal=False, seed=11)
    aj = corrupted.applied_jones
    assert aj is not None and aj.phi is not None
    assert aj.g_R.shape == (obs_empty.nscan, obs_empty.array.nstations)
    # the corruption actually moved the data
    m = corrupted.mask
    assert np.nanmax(np.abs(corrupted.vis[m] - clean.vis[m])) > 1e-3

    recovered = corrupted.calibrate()
    np.testing.assert_allclose(recovered.vis[m], clean.vis[m],
                               rtol=1e-10, atol=1e-12)

    # a fully-calibrated observation records no remaining corruption:
    # a second calibrate() must raise instead of silently inverting the
    # Jones chain twice
    assert recovered.applied_jones is None
    with pytest.raises(ValueError):
        recovered.calibrate()

    # partial calibration leaves the gain errors in — and records which
    # terms remain (exact completion later is NOT generally possible:
    # the Jones factors G, D, F don't commute, so an out-of-order
    # partial inverse leaves a conjugated — not pure-gain — residual;
    # the record's job is preventing double-inversion and documenting
    # what is still in the data)
    partial = corrupted.calibrate(gains=False)
    assert np.nanmax(np.abs(partial.vis[m] - clean.vis[m])) > 1e-3
    rem = partial.applied_jones
    assert rem is not None and rem.g_R is not None
    assert rem.d_R is None and rem.phi is None

    # explicit tables work too (self-cal against known terms)
    explicit = obs_lib.apply_inverse_jones(
        corrupted.vis, corrupted.baselines, g_R=aj.g_R, g_L=aj.g_L,
        d_R=aj.d_R, d_L=aj.d_L, phi=aj.phi)
    np.testing.assert_allclose(explicit[m], clean.vis[m],
                               rtol=1e-10, atol=1e-12)


def test_factored_operator_production_npix(obs_empty):
    """npix=128 (the ALMA/EHT production image size): the factored
    operator stays small (<50 MB/frame-batch — the dense matrix would
    be ~2.1 GB f32 for this coverage) and reproduces the explicit
    per-visibility DFT sum on random images."""
    npix = 128
    psize = 1e-11
    times = np.array([6.0, 10.0, 12.0, 14.0])
    tq = units.Quantity(times, 'hr')
    rng = np.random.default_rng(5)
    movie = rng.random((len(times), npix, npix)).astype(np.float32)
    obs = obs_lib.observe_same(movie, times, psize, obs_empty,
                               thermal_noise=False)
    target, sigma, Af = obs.chisqdata(tq, 'vis', psize * npix, npix,
                                      operator='factored')
    assert Af.nbytes < 50e6, f'{Af.nbytes / 1e6:.1f} MB'

    from bhnerf_tpu.train.step import (apply_measurement_operator,
                                       to_real_measurements)
    import jax.numpy as jnp
    t_ri, s_ri, Af_ri = to_real_measurements('vis', target, sigma, Af)
    vis = np.asarray(apply_measurement_operator(
        jnp.asarray(movie), jnp.asarray(Af_ri)))     # (nt, 2, nvis)

    # spot-check rows against the observe_same targets (same DFT)
    finite = np.isfinite(sigma)
    pred_c = vis[:, 0] + 1j * vis[:, 1]
    np.testing.assert_allclose(pred_c[finite], target[finite],
                               rtol=5e-4, atol=1e-6 * npix * npix)


def test_rlgaincal_correlates_feeds(array):
    """rlgaincal=True must give R and L feeds IDENTICAL time-dependent
    gains; the default (False, the reference's station-noise setting)
    draws them independently (reference observation.py:171,184)."""
    obs = obs_lib.empty_eht_obs(array, nt=8, tint=60.0)
    rng = np.random.default_rng(3)
    g_R, g_L, _, _ = obs_lib.station_jones(obs, rng, station_noise=True,
                                           rlgaincal=True)
    np.testing.assert_array_equal(g_R, g_L)
    rng = np.random.default_rng(3)
    g_R, g_L, _, _ = obs_lib.station_jones(obs, rng, station_noise=True,
                                           rlgaincal=False)
    assert np.abs(g_R - g_L).max() > 1e-3


def test_neggains_one_sided_losses(array):
    """neggains=True draws loss-only constant offsets (gains biased
    below 1); the symmetric default centers them at 1 (ehtim neggains;
    reference observation.py:167)."""
    obs = obs_lib.empty_eht_obs(array, nt=6, tint=60.0)
    means = {True: [], False: []}
    for seed in range(60):
        for neg in (True, False):
            rng = np.random.default_rng(seed)
            g_R, _, _, _ = obs_lib.station_jones(
                obs, rng, station_noise=True, sigmat=1e-6, neggains=neg)
            means[neg].append(np.abs(g_R).mean())
    assert np.mean(means[True]) < 0.93          # biased down
    assert abs(np.mean(means[False]) - 1.0) < 0.07  # symmetric around 1
    # every realization's mean gain sits at or below the symmetric one
    assert np.mean(np.asarray(means[True]) <= np.asarray(means[False])
                   + 1e-9) > 0.9
