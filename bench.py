"""Benchmark: training-step throughput of the flagship recovery workload.

Workload matches the reference's production configuration (SURVEY.md §6):
64x64 image-plane rays x ngeo=100 samples, NeRF 4x128 + posenc deg 3,
batch of 6 frames per step, full-image chi^2 loss — forward + backward +
adam update per step.

Prints ONE JSON line. Headline metric (round-over-round comparable):
  train_ray_samples_per_sec — workload throughput counting every ray
  sample of the 64x64x100 grid (including the ~83% that the static
  domain compaction removes before the MLP).
Extra keys make the number honest (VERDICT r1 weak #2/#7):
  steps_per_sec, mlp_samples_per_sec (samples that actually hit the MLP),
  model_tflops (analytic matmul FLOPs, fwd+bwd, unpadded dims),
  mfu (model_tflops / chip peak), compute_dtype, and
  vs_baseline = speedup over the MEASURED dense pure-XLA path on the same
  chip — i.e. a faithful port of the reference's semantics without the
  domain compaction + fused Pallas kernel (reference network.py:566-682
  evaluates the MLP on every ray sample through stock XLA).
"""
import json
import os
import sys
import time

# the TPU plugin registers under an inconsistent platform name across
# sessions ('axon' or 'tpu'); auto-choose always resolves the real chip
os.environ['JAX_PLATFORMS'] = ''

import numpy as np


def ensure_tpu_reachable(timeout=300, metric='train_ray_samples_per_sec'):
    """Probe the TPU in a SUBPROCESS before touching jax in-process.

    The axon tunnel can go down for stretches; jax.devices() then hangs
    forever and is uninterruptible in-process (observed round 3). A
    hung bench is worse than a loud failure — probe with a timeout and
    emit one parseable JSON error line instead of hanging the driver.
    """
    import subprocess
    code = ("import os; os.environ['JAX_PLATFORMS']=''; "
            "import jax; jax.devices()")
    try:
        ok = subprocess.run([sys.executable, '-c', code], timeout=timeout,
                            capture_output=True).returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        # value null + rc=2: an infra outage must never be parseable as
        # a measured 0 samples/s regression (ADVICE r3)
        print(json.dumps({
            'metric': metric, 'value': None,
            'unit': 'samples/s', 'vs_baseline': None,
            'error': f'TPU unreachable (device init exceeded {timeout}s '
                     '- axon tunnel outage)'}))
        print('# TPU unreachable; see error key', file=sys.stderr)
        sys.exit(2)

# chip peak dense-matmul throughput (bf16, FLOP/s). MFU is conventionally
# reported against the native MXU peak regardless of achieved precision.
PEAK_FLOPS = {
    'TPU v5 lite': 197e12,          # v5e
    'TPU v5': 459e12,               # v5p
    'TPU v4': 275e12,
    'TPU v6 lite': 918e12,          # v6e / Trillium
}


def mlp_flops_per_sample(predictor):
    """Analytic fwd matmul FLOPs per sample (2*K*N per layer, true dims)."""
    from bhnerf_tpu.models.fields import posenc_feature_dim
    in_dim = posenc_feature_dim(3, predictor.posenc_deg)
    skip = predictor.net_depth // 2 if predictor.do_skip else None
    dims, d = [], in_dim
    for i in range(predictor.net_depth):
        dims.append((d, predictor.net_width))
        d = predictor.net_width
        if predictor.do_skip and i > 0 and i % skip == 0:
            d += in_dim
    dims.append((d, predictor.out_channel))
    return 2 * sum(k * n for k, n in dims)


def time_steps(grad_step, state, batch_args, rt, n_steps):
    import jax
    loss, state, _ = grad_step(state, *batch_args, rt, 1.0)
    jax.block_until_ready(loss)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        loss, state, _ = grad_step(state, *batch_args, rt, 1.0)
    jax.block_until_ready(loss)
    return n_steps / (time.perf_counter() - t0), float(np.asarray(loss))


def timed_reps(run_chunk, n_chunks, chunk_steps):
    """Median-of-reps timing methodology (single-sourced; VERDICT r4
    weak #3: run-to-run spread was ~7% and invisible as a point
    estimate). Runs `run_chunk(seq)` n_chunks times per rep — seq is a
    monotone counter for PRNG-key derivation; the callable must return
    the last device value to block on — and times each rep.
    BENCH_REPS (default 5) repeats in one process.
    Returns (median_steps_per_sec, per_rep_rates)."""
    import jax
    reps = max(int(os.environ.get('BENCH_REPS', 5)), 1)
    rates, seq = [], 0
    for _ in range(reps):
        t0 = time.perf_counter()
        last = None
        for _ in range(n_chunks):
            seq += 1
            last = run_chunk(seq)
        jax.block_until_ready(last)
        rates.append(n_chunks * chunk_steps / (time.perf_counter() - t0))
    return float(np.median(rates)), rates


def rand_indices(rng, nt, batch, n_steps):
    return [np.asarray(rng.choice(nt, batch, replace=False), np.int32)
            for _ in range(n_steps + 1)]


def synthetic_polarized_rt(num, ngeo, fov, predictor, seed=0):
    """ALMA-flagship-SHAPED ray constants without the f64 geodesic trace.

    Training-step cost depends on shapes and the in-domain fraction, not
    on the physical values; sampling coords uniformly in the fov ball
    reproduces the production compaction ratio (~20%) at 128x128x100
    with a 3-Stokes J, so the polarized lightcurve throughput measured
    here tracks the real `fit_alma_lp_apr11_sgra_flare` workload
    (reference scripts/Fit_ALMA_LP_Apr11_SgrA_Flare.yaml: 128x128 rays,
    Stokes I/Q/U, lc loss) round-over-round without a ~10-minute
    geodesic precompute inside the bench.
    """
    from bhnerf_tpu.train.step import RayTracingArgs
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    shape = (num, num, ngeo)
    coords = rng.uniform(-fov / 2, fov / 2,
                         size=(3, *shape)).astype(np.float32)
    J = rng.uniform(0.2, 1.0, size=(3, *shape)).astype(np.float32)
    pos = lambda: rng.uniform(0.5, 1.0, size=shape).astype(np.float32)
    return RayTracingArgs(
        coords=jnp.asarray(coords), Omega=jnp.asarray(0.05, jnp.float32),
        J=jnp.asarray(J), g=jnp.asarray(pos()), dtau=jnp.asarray(pos()),
        Sigma=jnp.asarray(pos()),
        t_geos_rel=jnp.asarray(
            rng.uniform(900.0, 1100.0, size=shape).astype(np.float32)),
        t_injection=jnp.zeros((), jnp.float32),
        t_start_obs=0.0, t_to_M=500.0, t_units=None)


def bench_alma_shape(predictor_base, mark, num_variants=10, chunk=100):
    """Polarized flagship workload: 128x128x100 rays, 3 Stokes, lc loss,
    sub-pixel ensemble riding the scan path (in-scan variant draw)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bhnerf_tpu.train import TrainState, make_optimizer
    from bhnerf_tpu.train.step import (compact_ensemble_args,
                                       make_scan_step, stack_ensemble)

    num, ngeo, fov, nt, batch = 128, 100, 16.0, 64, 6
    predictor = dataclasses.replace(predictor_base, rmin=3.0)
    rt_list = [synthetic_polarized_rt(num, ngeo, fov, predictor, seed=s)
               for s in range(num_variants)]
    # lc losses never materialize per-pixel images (train.step routes
    # them through the em @ W^T matmul), so the packed 'gather' layout
    # (no group-slot filler through the MLP) is the fast one here
    crt_list = compact_ensemble_args(rt_list, predictor, layout='gather')
    n_eff = crt_list[0].coords.shape[-1]
    stacked = stack_ensemble(crt_list)

    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.random((nt, 3), dtype=np.float32))
    sigma = jnp.ones_like(target)
    offset = jnp.zeros_like(target)
    t_all = jnp.asarray(np.linspace(0.0, 1.0, nt, dtype=np.float32))

    scan_fn = make_scan_step(predictor=predictor, kind='image',
                             dtype='lc', fused=True, batchsize=batch,
                             chunk=chunk, num_variants=num_variants)
    state = TrainState.create(predictor.init_params(seed=0),
                              make_optimizer(50000))
    state, losses = scan_fn(state, target, sigma, offset, t_all,
                            jax.random.PRNGKey(0), stacked, 1.0)
    jax.block_until_ready(losses)
    n_chunks = max(600 // chunk, 1)

    def run_chunk(seq):
        nonlocal state
        state, losses = scan_fn(state, target, sigma, offset, t_all,
                                jax.random.PRNGKey(seq), stacked, 1.0)
        return losses

    steps_per_sec, rates = timed_reps(run_chunk, n_chunks, chunk)
    mark(f'alma-shape ensemble({num_variants}) path: '
         f'{steps_per_sec:.2f} steps/s median of {len(rates)} '
         f'[{min(rates):.1f}, {max(rates):.1f}]')
    # same convention as the headline mfu: useful matmul FLOPs (fwd +
    # 2x bwd) over the chip's bf16 peak. The structural ceiling for
    # this MLP is ~0.58 (docs/ARCHITECTURE.md MFU section)
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
    alma_flops = (3 * mlp_flops_per_sample(predictor) * n_eff * batch
                  * steps_per_sec)
    return {
        'alma_steps_per_sec': round(steps_per_sec, 2),
        'alma_steps_per_sec_spread': [round(min(rates), 2),
                                      round(max(rates), 2)],
        'alma_ray_samples_per_sec': round(
            steps_per_sec * batch * num * num * ngeo),
        'alma_mlp_samples_per_sec': round(steps_per_sec * batch * n_eff),
        'alma_mfu': round(alma_flops / peak, 4) if peak else None,
        'alma_num_variants': num_variants,
        'alma_shape': [num, num, ngeo, 3],
    }


def bench_eht_step(predictor, geos, rt, crt, t_frames_hr, mark,
                   chunk=250):
    """Visibility-loss (north-star) training-step throughput: ngEHT
    thermal-noise synthesis -> complex-vis chi^2, compact+fused, scanned.
    Same geometry/predictor as the headline image workload so the two
    steps/s are directly comparable."""
    import jax

    from bhnerf_tpu import constants, observation, units
    from bhnerf_tpu.train import TrainState, TrainStep, make_optimizer
    from bhnerf_tpu.train.step import make_scan_step

    nt = len(t_frames_hr)
    num = geos.num_alpha
    rng = np.random.default_rng(0)
    movie = rng.random((nt, num, num), dtype=np.float32)
    array = observation.load_txt(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'eht_arrays',
        'ngEHT.txt'))
    obs_empty = observation.empty_eht_obs(array, nt=nt, tint=30.0)
    fov_M = float(geos.alpha.max() - geos.alpha.min())
    fov_rad = float(fov_M * constants.GM_c2(constants.sgra_mass).value
                    / constants.sgra_distance.to('m').value)
    obs = observation.observe_same(movie, np.asarray(t_frames_hr),
                                   fov_rad / num, obs_empty,
                                   thermal_noise=True, seed=0)
    out = {}
    for op in ('dense', 'factored'):
        train_step = TrainStep.eht(
            units.Quantity(np.asarray(t_frames_hr, np.float32), 'hr'),
            obs, fov_rad, num, predictor, dtype='vis', fused=True,
            operator=op)
        scan_fn = make_scan_step(batchsize=6, chunk=chunk,
                                 **train_step.scan_meta)
        state = TrainState.create(predictor.init_params(seed=0),
                                  make_optimizer(50000))
        dev_args = train_step.args[0].device_args
        state, losses = scan_fn(state, *dev_args, jax.random.PRNGKey(0),
                                crt, 1.0)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        for i in range(2):
            state, losses = scan_fn(state, *dev_args,
                                    jax.random.PRNGKey(1 + i), crt, 1.0)
        jax.block_until_ready(losses)
        steps_per_sec = 2 * chunk / (time.perf_counter() - t0)
        mark(f'eht (vis-loss, {op} operator) path: '
             f'{steps_per_sec:.2f} steps/s')
        key = ('eht_steps_per_sec' if op == 'dense'
               else 'eht_factored_steps_per_sec')
        out[key] = round(steps_per_sec, 2)
        if op == 'dense':
            out['eht_nvis_per_frame'] = int(dev_args[2].shape[-2])
    return out


def bench_device_geos(mark, n=64, ngeo=100):
    """On-chip f32 geodesic trace (warm-executable): the chi^2 grid
    scans re-trace one table per grid point and sub-pixel variant, so
    tables/s is the scan-throughput currency."""
    import time as time_lib

    from bhnerf_tpu.geodesics import image_plane_geos
    kw = dict(spin=0.94, inclination=np.deg2rad(60), alpha_range=(-8, 8),
              beta_range=(-8, 8), ngeo=ngeo, num_alpha=n, num_beta=n,
              backend='device')
    image_plane_geos(**kw)                        # compile
    t0 = time_lib.perf_counter()
    image_plane_geos(**kw)
    dt = time_lib.perf_counter() - t0
    mark(f'device f32 geodesic trace ({n}x{n}x{ngeo}): {dt:.2f} s/table')
    return {'geos_device_trace_s': round(dt, 3)}


def main():
    import dataclasses

    ensure_tpu_reachable()
    import jax
    import jax.numpy as jnp

    from bhnerf_tpu.utils import compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir',
                      compilation_cache_dir())
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)

    def mark(msg):
        print(f'# [{time.strftime("%H:%M:%S")}] {msg}', file=sys.stderr,
              flush=True)

    # Incremental partial-results file: the axon tunnel can drop MID-RUN
    # (device calls then hang until an outer `timeout` kills the
    # process), which would otherwise lose every section already
    # measured. Each section checkpoints its keys here the moment it
    # finishes; a killed run still leaves its numbers on disk.
    partial = {'partial': True, 'started': time.strftime('%FT%TZ')}

    def checkpoint_keys(**keys):
        partial.update(keys)
        try:
            with open(os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), 'BENCH_partial.json'),
                    'w') as f:
                json.dump(partial, f, indent=1)
        except OSError:
            pass

    from bhnerf_tpu import constants, emission, units
    from bhnerf_tpu.geodesics import image_plane_geos
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.train import TrainState, make_optimizer, raytracing_args
    from bhnerf_tpu.train.step import compact_raytracing_args, make_step_fns

    num_alpha = num_beta = 64
    ngeo = 100
    batch = 6
    nt = 64
    fov = 16.0
    compute_dtype = os.environ.get('BENCH_COMPUTE_DTYPE', 'bfloat16')

    mark(f'backend={jax.default_backend()} tracing geodesics')
    # host-precompute cache: the f64 geodesic trace is ~2 min on this
    # box's single core and identical across bench runs
    from bhnerf_tpu.geodesics.dataset import Geodesics
    cache = (f'/tmp/bhnerf_tpu_geos_bench_{num_alpha}x{num_beta}'
             f'x{ngeo}_f{fov}.npz')
    if os.path.exists(cache):
        geos = Geodesics.load(cache)
    else:
        geos = image_plane_geos(
            spin=0.2, inclination=np.deg2rad(60.0),
            alpha_range=(-fov / 2, fov / 2), beta_range=(-fov / 2, fov / 2),
            ngeo=ngeo, num_alpha=num_alpha, num_beta=num_beta, n_fine=4096)
        geos.save(cache)
    Omega = geos.keplerian_omega()
    t_injection = -float(geos.r_o + fov / 4)
    GM_hr = constants.GM_c3(constants.sgra_mass).to('hr').value
    t_frames = np.linspace(0.0, 200.0 * GM_hr, nt).astype(np.float32)
    rt = raytracing_args(geos, Omega, t_injection,
                         units.Quantity(t_frames[0], 'hr'))

    predictor = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                              z_width=2.0, net_depth=4, net_width=128,
                              posenc_deg=3, compute_dtype=compute_dtype)
    # domain compaction + fused Pallas kernel: the optimized TPU path
    crt = compact_raytracing_args(rt, predictor)
    n_eff = int(np.asarray(emission.domain_mask(
        rt.coords, predictor.rmin, predictor.rmax,
        predictor.z_width)).sum())

    # production step path: full frame tensors device-resident, the
    # frame-batch gather inside the jitted step (one dispatch per step —
    # what train.Optimizer runs)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((nt, num_alpha, num_beta),
                                    dtype=np.float32))
    sigma = jnp.ones_like(target)
    offset = jnp.zeros_like(target)
    t_all = jnp.asarray(t_frames)
    inds = np.asarray(rng.choice(nt, batch, replace=False), np.int32)
    batch_args = (target, sigma, offset, t_all, inds)

    mark('geodesics done, compiling fused train step')
    use_fused = True
    try:
        state = TrainState.create(predictor.init_params(seed=0),
                                  make_optimizer(50000))
        grad_step, _ = make_step_fns(predictor, kind='image', dtype='full',
                                     donate_state=True, fused=True,
                                     gather=True)
        steps_per_sec, loss = time_steps(grad_step, state, batch_args, crt,
                                         n_steps=50)
    except Exception as e:  # pragma: no cover - hardware dependent
        mark(f'fused kernel unavailable ({type(e).__name__}: {e}); '
             'XLA-compact fallback')
        use_fused = False
        compute_dtype = 'float32'
        predictor = dataclasses.replace(predictor, compute_dtype='float32')
        state = TrainState.create(predictor.init_params(seed=0),
                                  make_optimizer(50000))
        grad_step, _ = make_step_fns(predictor, kind='image', dtype='full',
                                     donate_state=True, fused=False,
                                     gather=True)
        steps_per_sec, loss = time_steps(grad_step, state, batch_args, crt,
                                         n_steps=50)

    checkpoint_keys(per_dispatch_steps_per_sec=round(steps_per_sec, 2),
                    compute_dtype=compute_dtype)

    # scan-chunked path (Optimizer.run(scan_chunk=N)): 100 steps per
    # dispatch, eliminating the residual per-step dispatch latency
    mark(f'fused path: {steps_per_sec:.2f} steps/s; compiling scan step')
    from bhnerf_tpu.train.step import make_scan_step
    try:
        scan_chunk = int(os.environ.get('BENCH_SCAN_CHUNK', 500))
        scan_fn = make_scan_step(predictor=predictor, kind='image',
                                 dtype='full', fused=use_fused,
                                 batchsize=batch, chunk=scan_chunk)
        sstate = TrainState.create(predictor.init_params(seed=0),
                                   make_optimizer(50000))
        sstate, losses = scan_fn(sstate, target, sigma, offset, t_all,
                                 jax.random.PRNGKey(0), crt, 1.0)
        jax.block_until_ready(losses)
        n_chunks = max(1000 // scan_chunk, 1)

        def run_chunk(seq):
            nonlocal sstate
            sstate, losses = scan_fn(sstate, target, sigma, offset, t_all,
                                     jax.random.PRNGKey(seq), crt, 1.0)
            return losses

        scan_steps_per_sec, scan_rates = timed_reps(run_chunk, n_chunks,
                                                    scan_chunk)
        scan_spread = [round(min(scan_rates), 2), round(max(scan_rates), 2)]
    except Exception as e:  # pragma: no cover - hardware dependent
        mark(f'scan-chunked bench unavailable ({type(e).__name__}: {e}); '
             'headline falls back to the per-dispatch number')
        scan_steps_per_sec = 0.0
        scan_spread = None
    checkpoint_keys(scan_steps_per_sec=round(scan_steps_per_sec, 2),
                    scan_steps_per_sec_spread=scan_spread)

    # polarized flagship shape (ALMA 128x128, 3-Stokes, lc loss) with a
    # 10-variant sub-pixel ensemble riding the scan path
    mark(f'scan path: {scan_steps_per_sec:.2f} steps/s; compiling '
         'alma-shape ensemble step')
    try:
        alma_keys = bench_alma_shape(predictor, mark)
    except Exception as e:  # pragma: no cover - hardware dependent
        mark(f'alma-shape bench unavailable ({type(e).__name__}: {e})')
        alma_keys = {}
    checkpoint_keys(**alma_keys)

    # north-star EHT (visibility-loss) step on the same geometry
    try:
        eht_keys = bench_eht_step(
            predictor, geos, rt, crt,
            np.linspace(4.0, 15.5, nt).astype(np.float32), mark)
    except Exception as e:  # pragma: no cover - hardware dependent
        mark(f'eht bench unavailable ({type(e).__name__}: {e})')
        eht_keys = {}
    checkpoint_keys(**eht_keys)

    # on-chip f32 geodesic tracing (chi^2-scan table generation)
    try:
        geos_keys = bench_device_geos(mark)
    except Exception as e:  # pragma: no cover - hardware dependent
        mark(f'device-geos bench unavailable ({type(e).__name__}: {e})')
        geos_keys = {}
    checkpoint_keys(**geos_keys)

    # measured baseline: dense pure-XLA path, reference semantics (every
    # ray sample through the MLP, stock XLA fusion, f32)
    mark('compiling dense XLA baseline')
    baseline_source = 'measured'
    try:
        base_pred = dataclasses.replace(predictor, compute_dtype='float32')
        base_state = TrainState.create(base_pred.init_params(seed=0),
                                       make_optimizer(50000))
        base_step, _ = make_step_fns(base_pred, kind='image', dtype='full',
                                     donate_state=True, fused=False,
                                     gather=True)
        base_steps_per_sec, _ = time_steps(base_step, base_state,
                                           batch_args, rt, n_steps=10)
    except Exception as e:  # pragma: no cover - hardware dependent
        # the fused numbers above are already in hand — don't lose them
        # to a baseline failure; emit a null ratio rather than a number
        # fabricated from another run's baseline
        mark(f'dense baseline unavailable ({type(e).__name__}: {e}); '
             'vs_baseline will be null')
        base_steps_per_sec = None
        baseline_source = 'unavailable'

    best = max(steps_per_sec, scan_steps_per_sec)
    flops_fwd = mlp_flops_per_sample(predictor)
    model_flops_per_step = 3 * flops_fwd * n_eff * batch  # fwd + bwd(2x)
    model_tflops = model_flops_per_step * best / 1e12
    chip = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(chip)
    mfu = model_tflops * 1e12 / peak if peak else None

    ray_samples_per_sec = best * batch * num_alpha * num_beta * ngeo
    # the one-line JSON below is the complete record; remove the
    # crash-recovery checkpoint so a stale partial can't shadow it
    try:
        os.remove(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'BENCH_partial.json'))
    except OSError:
        pass
    print(json.dumps({
        'metric': 'train_ray_samples_per_sec',
        'value': round(ray_samples_per_sec),
        'unit': 'samples/s',
        'vs_baseline': (round(best / base_steps_per_sec, 3)
                        if base_steps_per_sec else None),
        'steps_per_sec': round(best, 2),
        # median + spread of the winning path's repeated runs (the
        # per-dispatch path is timed once; spread is null if it wins)
        'steps_per_sec_median': round(best, 2),
        'steps_per_sec_spread': (scan_spread
                                 if scan_steps_per_sec >= steps_per_sec
                                 else None),
        'per_dispatch_steps_per_sec': round(steps_per_sec, 2),
        'scan_steps_per_sec': round(scan_steps_per_sec, 2),
        'scan_steps_per_sec_spread': scan_spread,
        'baseline_dense_xla_steps_per_sec': (
            round(base_steps_per_sec, 2) if base_steps_per_sec
            else None),
        'baseline_source': baseline_source,
        'mlp_samples_per_sec': round(best * batch * n_eff),
        'model_tflops': round(model_tflops, 2),
        'mfu': round(mfu, 4) if mfu is not None else None,
        'peak_tflops': peak / 1e12 if peak else None,
        'chip': chip,
        'compute_dtype': compute_dtype,
        **alma_keys,
        **eht_keys,
        **geos_keys,
    }))
    print(f'# steps/sec: {best:.2f} (per-dispatch {steps_per_sec:.2f}, '
          f'dense XLA baseline {base_steps_per_sec})  backend: '
          f'{jax.default_backend()}  loss: {loss:.3f}', file=sys.stderr)


if __name__ == '__main__':
    main()
