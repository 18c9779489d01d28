"""Chip drill: SIGTERM mid-scan-dispatch checkpoints and resumes cleanly.

The CPU test (test_sigterm_preemption_checkpoints_and_stops) covers the
logic; this drill covers the race only observable on hardware — a
SIGTERM arriving while a 500-step scan dispatch is in flight on the TPU
(the handler must set the flag, the dispatch must complete, and the
chunk boundary must checkpoint-and-return). VERDICT r4 item #6.

Run: timeout 1800 python scripts/drive_sigterm_chip.py
Child mode (internal): ... --child <ckpt_dir> <num_iters>
"""
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ['JAX_PLATFORMS'] = ''

import numpy as np

GRID = 32
NGEO = 64
CHUNK = 500


def build_problem():
    import jax
    if os.environ.get('DRIVE_CPU'):       # logic rehearsal on the host
        jax.config.update('jax_platforms', 'cpu')
    from bhnerf_tpu.utils import compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir', compilation_cache_dir())
    from bhnerf_tpu import constants, emission, units
    from bhnerf_tpu.geodesics import image_plane_geos
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.train import TrainStep, raytracing_args
    from bhnerf_tpu.train.step import compact_raytracing_args

    fov = 16.0
    geos = image_plane_geos(spin=0.0, inclination=np.deg2rad(60),
                            alpha_range=(-fov / 2, fov / 2),
                            beta_range=(-fov / 2, fov / 2),
                            ngeo=NGEO, num_alpha=GRID, num_beta=GRID,
                            n_fine=2048)
    hotspot = emission.generate_hotspot(
        resolution=(32, 32, 32), rot_axis=[0, 0, 1], rot_angle=0.0,
        orbit_radius=6.5, std=0.7, r_isco=float(constants.isco_pro(0.0)),
        fov=fov)
    Omega = float(1.0 / 6.5 ** 1.5)
    GM_hr = constants.GM_c3(constants.sgra_mass).to('hr').value
    T_hr = 2 * np.pi / Omega * GM_hr
    t_frames = units.Quantity(np.linspace(0.0, T_hr, 16), 'hr')
    t_injection = -float(geos.r_o + fov / 4)
    movie = np.asarray(emission.image_plane_dynamics(
        hotspot, geos, Omega, t_frames, t_injection=t_injection,
        t_start_obs=t_frames[0]))
    rt = raytracing_args(geos, Omega, t_injection, t_frames[0])
    predictor = NeRFPredictor(scale=fov / 2, rmax=fov / 2, z_width=2.0,
                              net_depth=3, net_width=32, posenc_deg=3)
    crt = compact_raytracing_args(rt, predictor, tile=1024)
    ts = TrainStep.image(t_frames, movie, predictor, dtype='full')
    return predictor, crt, ts


def child(ckpt_dir, num_iters):
    import jax

    from bhnerf_tpu.train import Optimizer
    predictor, crt, ts = build_problem()
    print(f'# jax devices: {jax.devices()}', flush=True)
    opt = Optimizer({'num_iters': num_iters, 'lr_init': 5e-3, 'seed': 1},
                    predictor, crt, save_period=10 ** 9,
                    checkpoint_dir=ckpt_dir)
    print(f'CHILD_START init_step={int(np.asarray(opt.state.step))}',
          flush=True)
    progress = os.path.join(ckpt_dir, 'progress.txt')

    class Progress:
        def __call__(self, o):
            with open(progress, 'w') as f:
                f.write(str(o.step))

    opt.run(batchsize=8, train_step=ts, raytracing_args=crt,
            log_fns=[Progress()], verbose=False, scan_chunk=CHUNK)
    # wall clock at which the (possibly forced) checkpoint is durable —
    # the preemption-relevant instant; interpreter/TPU-plugin teardown
    # afterwards can take minutes behind the tunnel and does not matter
    print(f'CHILD_EXIT step={int(np.asarray(opt.state.step))} '
          f'at={time.time():.3f}', flush=True)


def main():
    if not os.environ.get('DRIVE_CPU'):
        from bench import ensure_tpu_reachable
        ensure_tpu_reachable(metric='sigterm_drill')

    import tempfile
    ckpt = tempfile.mkdtemp(prefix='sigterm_drill_')
    progress = os.path.join(ckpt, 'progress.txt')
    num_iters = 20 * CHUNK

    # PREPEND to PYTHONPATH, never replace: the TPU plugin loads via a
    # sitecustomize on the ambient PYTHONPATH; overwriting it drops the
    # plugin and the child silently runs the drill on CPU (round-5
    # lesson from the ALMA production drive)
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        p for p in (REPO, os.environ.get('PYTHONPATH', '')) if p))
    p = subprocess.Popen([sys.executable, os.path.abspath(__file__),
                          '--child', ckpt, str(num_iters)],
                         stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, env=env)
    # wait for the first chunk (covers geodesics + cold compile), then
    # fire SIGTERM while the next 500-step dispatch is in flight
    t0 = time.time()
    while not os.path.exists(progress):
        if p.poll() is not None:
            print(p.stdout.read())
            raise SystemExit('child died before first chunk')
        if time.time() - t0 > 1500:
            p.kill()
            raise SystemExit('timeout waiting for first chunk')
        time.sleep(1.0)
    time.sleep(0.3)                       # land mid-dispatch
    t_sig = time.time()
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=600)
    t_exit = time.time() - t_sig
    print(out)
    assert p.returncode == 0, f'child rc={p.returncode} (not a clean exit)'
    assert 'CHILD_EXIT step=' in out, 'child did not reach the clean-exit path'
    if not os.environ.get('DRIVE_CPU'):
        dev_line = [l for l in out.splitlines()
                    if l.startswith('# jax devices:')]
        assert dev_line and 'TPU' in dev_line[0], \
            f'drill did NOT run on the TPU: {dev_line}'
    tail_kv = out.rsplit('CHILD_EXIT step=', 1)[1].split()
    stop_step = int(tail_kv[0])
    # signal-to-durable-checkpoint latency (what a preemption grace
    # period actually needs); t_exit additionally includes teardown
    t_ckpt = None
    if len(tail_kv) > 1 and tail_kv[1].startswith('at='):
        t_ckpt = float(tail_kv[1][3:]) - t_sig
    assert 0 < stop_step < num_iters, (stop_step, num_iters)
    cdirs = [d for d in os.listdir(ckpt) if d.startswith('checkpoint_')]
    assert f'checkpoint_{stop_step}' in cdirs, (stop_step, cdirs)
    ck = f'{t_ckpt:.1f}s' if t_ckpt is not None else 'n/a'
    print(f'# SIGTERM -> durable checkpoint {ck}, process exit '
          f'{t_exit:.1f}s (incl. teardown), forced checkpoint at step '
          f'{stop_step}', flush=True)

    # resume: a rerun must restore the forced checkpoint and finish
    extra = 2 * CHUNK
    p2 = subprocess.run([sys.executable, os.path.abspath(__file__),
                         '--child', ckpt, str(extra)],
                        capture_output=True, text=True, env=env,
                        timeout=1500)
    print(p2.stdout)
    assert p2.returncode == 0, p2.stdout + p2.stderr
    assert f'CHILD_START init_step={stop_step}' in p2.stdout, \
        'resume did not restore the forced checkpoint'
    assert f'CHILD_EXIT step={stop_step + extra}' in p2.stdout, \
        'resumed run did not complete'

    print(json.dumps({'metric': 'sigterm_drill', 'interrupt_step': stop_step,
                      'ckpt_latency_s': (round(t_ckpt, 1)
                                         if t_ckpt is not None else None),
                      'clean_exit_s': round(t_exit, 1),
                      'resumed_to': stop_step + extra, 'ok': True}),
          flush=True)


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == '--child':
        child(sys.argv[2], int(sys.argv[3]))
    else:
        main()
