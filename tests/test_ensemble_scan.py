"""Sub-pixel-ray ensembles on the scan-chunked fast path.

The reference draws one random geodesic-table variant per gradient step
(optimization.py:167-169); round 2 left such fits on the slow per-step
loop. These tests pin the in-scan variant sampling: uniform padding via
compact_ensemble_args, exact equality against a per-step emulation of
the same PRNG chain, and the identical-variant degenerate case.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bhnerf_tpu import units
from bhnerf_tpu.geodesics import image_plane_geos
from bhnerf_tpu.models import NeRFPredictor
from bhnerf_tpu.train import TrainState, make_optimizer, raytracing_args
from bhnerf_tpu.train.step import (compact_ensemble_args, make_scan_step,
                                   make_step_fns, stack_ensemble)


@pytest.fixture(scope='module')
def ensemble():
    rng = np.random.default_rng(3)
    rt_list = []
    for k in range(3):
        geos = image_plane_geos(
            spin=0.0, inclination=np.deg2rad(60), alpha_range=(-8, 8),
            beta_range=(-8, 8), ngeo=24, num_alpha=12, num_beta=12,
            n_fine=1024, randomize_subpixel_rays=k > 0, rng=rng)
        rt_list.append(raytracing_args(
            geos, geos.keplerian_omega(), -float(geos.r_o + 4),
            units.Quantity(0.0, 'hr')))
    predictor = NeRFPredictor(scale=8.0, rmin=2.0, rmax=8.0, z_width=2.0,
                              net_depth=2, net_width=16)
    crt_list = compact_ensemble_args(rt_list, predictor, tile=256)
    nt = 8
    t_frames = np.linspace(0.0, 0.5, nt).astype(np.float32)
    target = np.asarray(
        np.random.default_rng(0).random((nt, 12, 12)), np.float32)
    return predictor, crt_list, t_frames, target


def test_ensemble_uniform_shapes_and_stack(ensemble):
    predictor, crt_list, _, _ = ensemble
    shapes = {c.coords.shape for c in crt_list}
    assert len(shapes) == 1
    stacked = stack_ensemble(crt_list)
    assert stacked.coords.shape == (3,) + crt_list[0].coords.shape \
        or stacked.coords.shape[0] == 3  # leading variant axis
    assert stacked.coords.shape == (len(crt_list),
                                    *crt_list[0].coords.shape)


def test_identical_variants_match_single(ensemble):
    """An ensemble of identical variants walks the same PRNG chain as a
    single-variant scan: losses must match exactly."""
    predictor, crt_list, t_frames, target = ensemble
    crt = crt_list[0]
    batch = (jnp.asarray(target), jnp.ones_like(jnp.asarray(target)),
             jnp.zeros_like(jnp.asarray(target)), jnp.asarray(t_frames))
    key = jax.random.PRNGKey(11)

    single = make_scan_step(predictor=predictor, kind='image',
                            dtype='full', batchsize=4, chunk=5)
    state1 = TrainState.create(predictor.init_params(0), make_optimizer(20))
    state1, l1 = single(state1, *batch, key, crt, 1.0)

    double = make_scan_step(predictor=predictor, kind='image',
                            dtype='full', batchsize=4, chunk=5,
                            num_variants=2)
    stacked = stack_ensemble([crt, crt])
    state2 = TrainState.create(predictor.init_params(0), make_optimizer(20))
    state2, l2 = double(state2, *batch, key, stacked, 1.0)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_ensemble_scan_matches_per_step_loop(ensemble):
    """Distinct variants: the scanned chunk is loss-equal, step for
    step, to a per-step loop that replays the same PRNG chain through
    the gather-in-jit step functions (VERDICT r2 next #2)."""
    predictor, crt_list, t_frames, target = ensemble
    stacked = stack_ensemble(crt_list)
    V = len(crt_list)
    chunk, batchsize = 6, 4
    batch = (jnp.asarray(target), jnp.ones_like(jnp.asarray(target)),
             jnp.zeros_like(jnp.asarray(target)), jnp.asarray(t_frames))
    key = jax.random.PRNGKey(5)

    scan_fn = make_scan_step(predictor=predictor, kind='image',
                             dtype='full', batchsize=batchsize,
                             chunk=chunk, num_variants=V)
    state = TrainState.create(predictor.init_params(0), make_optimizer(20))
    state, losses = scan_fn(state, *batch, key, stacked, 1.0)
    losses = np.asarray(losses)

    # per-step emulation of the identical chain
    grad_step, _ = make_step_fns(predictor, kind='image', dtype='full',
                                 gather=True)
    state_e = TrainState.create(predictor.init_params(0),
                                make_optimizer(20))
    keys = jax.random.split(key, chunk)
    emul = []
    for i in range(chunk):
        k_batch, k_var = jax.random.split(keys[i])
        nt = target.shape[0]
        indices = np.asarray(jax.random.choice(k_batch, nt, (batchsize,),
                                               replace=False))
        var = int(jax.random.randint(k_var, (), 0, V))
        loss, state_e, _ = grad_step(state_e, *batch,
                                     np.asarray(indices, np.int32),
                                     crt_list[var], 1.0)
        emul.append(float(np.asarray(loss)))
    np.testing.assert_allclose(losses, np.asarray(emul), rtol=2e-5)


def test_optimizer_runs_ensemble_scan(ensemble):
    """Optimizer.run takes the scan path for an ensemble TrainStep and
    trains to a finite decreasing loss."""
    from bhnerf_tpu.train import Optimizer, TrainStep
    predictor, crt_list, t_frames, target = ensemble
    ts = TrainStep.image(units.Quantity(t_frames, 'hr'), target, predictor,
                         dtype='full')
    opt = Optimizer({'num_iters': 200, 'lr_init': 3e-3, 'seed': 2},
                    predictor, crt_list, checkpoint_dir='')
    first = []

    class Snoop:
        log_period = 50

        def __call__(self, o):
            first.append(float(np.asarray(o.loss)))

    opt.run(batchsize=4, train_step=ts, raytracing_args=crt_list,
            log_fns=[Snoop()], verbose=False, scan_chunk=50)
    assert len(first) == 4 and np.isfinite(first).all()
    assert first[-1] < first[0]


def test_composed_scan_matches_per_step_loop(ensemble):
    """Composed 'full' + 'lc' losses on the scan path are loss-equal,
    step for step, to the sequential per-loss gather-in-jit loop
    replaying the same PRNG chain (VERDICT r2 next #2, composed part)."""
    from bhnerf_tpu.train.step import make_composed_scan_step
    predictor, crt_list, t_frames, target = ensemble
    crt = crt_list[0]
    chunk, batchsize = 5, 4
    tj = jnp.asarray(target)
    full_batch = (tj, jnp.ones_like(tj), jnp.zeros_like(tj),
                  jnp.asarray(t_frames))
    lc = tj.sum(axis=(-1, -2))
    lc_batch = (lc, jnp.ones_like(lc), jnp.zeros_like(lc),
                jnp.asarray(t_frames))
    key = jax.random.PRNGKey(9)
    scales = (1.0, 0.5)

    meta_full = dict(predictor=predictor, kind='image', dtype='full',
                     fused=False)
    meta_lc = dict(predictor=predictor, kind='image', dtype='lc',
                   fused=False)
    scan_fn = make_composed_scan_step(
        batchsize=batchsize, chunk=chunk,
        metas=(tuple(sorted(meta_full.items())),
               tuple(sorted(meta_lc.items()))), scales=scales)
    state = TrainState.create(predictor.init_params(0), make_optimizer(20))
    state, losses = scan_fn(state, *full_batch, *lc_batch, key, crt)
    losses = np.asarray(losses)

    # sequential per-loss emulation of the identical chain
    step_full, _ = make_step_fns(predictor, kind='image', dtype='full',
                                 gather=True)
    step_lc, _ = make_step_fns(predictor, kind='image', dtype='lc',
                               gather=True)
    state_e = TrainState.create(predictor.init_params(0),
                                make_optimizer(20))
    keys = jax.random.split(key, chunk)
    emul = []
    for i in range(chunk):
        k_batch, _ = jax.random.split(keys[i])
        indices = np.asarray(jax.random.choice(
            k_batch, target.shape[0], (batchsize,), replace=False),
            np.int32)
        l1, state_e, _ = step_full(state_e, *full_batch, indices, crt,
                                   scales[0])
        l2, state_e, _ = step_lc(state_e, *lc_batch, indices, crt,
                                 scales[1])
        emul.append(float(np.asarray(l1)) + float(np.asarray(l2)))
    np.testing.assert_allclose(losses, np.asarray(emul), rtol=2e-5)


def test_optimizer_runs_composed_scan(ensemble, monkeypatch):
    """Optimizer.run routes a `+`-composed TrainStep through
    make_composed_scan_step and trains to a decreasing loss."""
    from bhnerf_tpu.train import Optimizer, TrainStep
    from bhnerf_tpu.train import step as step_lib
    predictor, crt_list, t_frames, target = ensemble
    crt = crt_list[0]
    t_hr = units.Quantity(t_frames, 'hr')
    lc = target.sum(axis=(-1, -2))
    ts = (TrainStep.image(t_hr, target, predictor, dtype='full')
          + TrainStep.image(t_hr, lc, predictor, dtype='lc', scale=0.5))
    assert ts.scan_metas is not None and len(ts.scan_metas) == 2
    assert ts.scan_meta is None   # single-loss surface stays single

    calls = []
    orig = step_lib.make_composed_scan_step

    def spy(*a, **k):
        calls.append(k.get('chunk'))
        return orig(*a, **k)

    monkeypatch.setattr(step_lib, 'make_composed_scan_step', spy)
    opt = Optimizer({'num_iters': 100, 'lr_init': 3e-3, 'seed': 4},
                    predictor, crt, checkpoint_dir='')
    first = []

    class Snoop:
        log_period = 25

        def __call__(self, o):
            first.append(float(np.asarray(o.loss)))

    opt.run(batchsize=4, train_step=ts, raytracing_args=crt,
            log_fns=[Snoop()], verbose=False, scan_chunk=25)
    assert calls, 'composed scan path was not taken'
    assert len(first) == 4 and np.isfinite(first).all()
    assert first[-1] < first[0]

def test_composed_ensemble_scan_matches_per_step_loop(ensemble):
    """Composed losses AND a sub-pixel ensemble together (the production
    ALMA shape with an extra prior term): one shared frame batch + one
    shared variant draw per step, sequential per-loss updates."""
    from bhnerf_tpu.train.step import make_composed_scan_step
    predictor, crt_list, t_frames, target = ensemble
    stacked = stack_ensemble(crt_list)
    V = len(crt_list)
    chunk, batchsize = 5, 4
    tj = jnp.asarray(target)
    full_batch = (tj, jnp.ones_like(tj), jnp.zeros_like(tj),
                  jnp.asarray(t_frames))
    lc = tj.sum(axis=(-1, -2))
    lc_batch = (lc, jnp.ones_like(lc), jnp.zeros_like(lc),
                jnp.asarray(t_frames))
    key = jax.random.PRNGKey(13)
    scales = (1.0, 0.25)

    meta_full = dict(predictor=predictor, kind='image', dtype='full',
                     fused=False)
    meta_lc = dict(predictor=predictor, kind='image', dtype='lc',
                   fused=False)
    scan_fn = make_composed_scan_step(
        batchsize=batchsize, chunk=chunk, num_variants=V,
        metas=(tuple(sorted(meta_full.items())),
               tuple(sorted(meta_lc.items()))), scales=scales)
    state = TrainState.create(predictor.init_params(0), make_optimizer(20))
    state, losses = scan_fn(state, *full_batch, *lc_batch, key, stacked)
    losses = np.asarray(losses)

    step_full, _ = make_step_fns(predictor, kind='image', dtype='full',
                                 gather=True)
    step_lc, _ = make_step_fns(predictor, kind='image', dtype='lc',
                               gather=True)
    state_e = TrainState.create(predictor.init_params(0),
                                make_optimizer(20))
    keys = jax.random.split(key, chunk)
    emul = []
    for i in range(chunk):
        k_batch, k_var = jax.random.split(keys[i])
        indices = np.asarray(jax.random.choice(
            k_batch, target.shape[0], (batchsize,), replace=False),
            np.int32)
        var = int(jax.random.randint(k_var, (), 0, V))
        l1, state_e, _ = step_full(state_e, *full_batch, indices,
                                   crt_list[var], scales[0])
        l2, state_e, _ = step_lc(state_e, *lc_batch, indices,
                                 crt_list[var], scales[1])
        emul.append(float(np.asarray(l1)) + float(np.asarray(l2)))
    np.testing.assert_allclose(losses, np.asarray(emul), rtol=2e-5)


def test_composed_mismatched_frame_counts_raises(ensemble):
    """Composed losses with differing frame counts cannot share a frame
    batch (indices are drawn once per step and applied to every loss —
    reference optimization.py:176): composition must refuse loudly
    instead of silently clamping out-of-bounds frame indices."""
    from bhnerf_tpu.train import TrainStep
    predictor, _, t_frames, target = ensemble
    ts_a = TrainStep.image(units.Quantity(t_frames, 'hr'), target,
                           predictor, dtype='full')
    lc_short = target[:4].sum(axis=(-1, -2))
    ts_b = TrainStep.image(units.Quantity(t_frames[:4], 'hr'), lc_short,
                           predictor, dtype='lc', scale=0.5)
    with pytest.raises(ValueError, match='share the frame count'):
        _ = ts_a + ts_b
