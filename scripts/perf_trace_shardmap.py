"""Profile the shard_map-wrapped fused step on the real chip: device-op
breakdown to find why it is slower than the plain compact step."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ['JAX_PLATFORMS'] = ''

import numpy as np  # noqa: E402

REPS = 20
TRACE_DIR = '/tmp/bhnerf_tpu_trace_sm'


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from bhnerf_tpu.utils import compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir', compilation_cache_dir())

    from bhnerf_tpu import constants, units
    from bhnerf_tpu.geodesics import image_plane_geos
    from bhnerf_tpu.geodesics.dataset import Geodesics
    from bhnerf_tpu.models import NeRFPredictor
    from bhnerf_tpu.train import TrainState, make_optimizer, raytracing_args
    from bhnerf_tpu.train.step import compact_raytracing_args, make_step_fns

    fov = 16.0
    num, ngeo, nt = 64, 100, 64
    cache = f'/tmp/bhnerf_tpu_geos_bench_{num}x{num}x{ngeo}_f{fov}.npz'
    geos = Geodesics.load(cache) if os.path.exists(cache) else None
    if geos is None:
        geos = image_plane_geos(0.2, np.deg2rad(60.0),
                                (-fov / 2, fov / 2), (-fov / 2, fov / 2),
                                ngeo=ngeo, num_alpha=num, num_beta=num,
                                n_fine=4096)
        geos.save(cache)
    Omega = geos.keplerian_omega()
    GM_hr = constants.GM_c3(constants.sgra_mass).to('hr').value
    rt = raytracing_args(geos, Omega, -float(geos.r_o + 4),
                         units.Quantity(0.0, 'hr'))
    predictor = NeRFPredictor(scale=fov / 2, rmin=3.0, rmax=fov / 2,
                              z_width=2.0, compute_dtype='bfloat16')
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 1), ('data', 'ray'))
    crt = compact_raytracing_args(rt, predictor, mesh=mesh)

    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((nt, num, num), dtype=np.float32))
    t_all = jnp.asarray(np.linspace(0.0, 200.0 * GM_hr, nt,
                                    dtype=np.float32))
    batch = (target, jnp.ones_like(target), jnp.zeros_like(target), t_all,
             np.asarray(rng.choice(nt, 6, replace=False), np.int32))
    grad_step, _ = make_step_fns(predictor, kind='image', dtype='full',
                                 donate_state=True, fused=True, gather=True)
    state = TrainState.create(predictor.init_params(seed=0),
                              make_optimizer(50000))
    loss, state, _ = grad_step(state, *batch, crt, 1.0)
    jax.block_until_ready(loss)

    with jax.profiler.trace(TRACE_DIR):
        t0 = time.perf_counter()
        for _ in range(REPS):
            loss, state, _ = grad_step(state, *batch, crt, 1.0)
        jax.block_until_ready(loss)
        wall = time.perf_counter() - t0
    print(f'wall: {1e3 * wall / REPS:.3f} ms/step', flush=True)

    traces = sorted(glob.glob(
        TRACE_DIR + '/**/*.trace.json.gz', recursive=True))
    if not traces:
        print('no trace file found'); return
    with gzip.open(traces[-1], 'rt') as f:
        data = json.load(f)
    events = data['traceEvents']
    pid_names = {e['pid']: e['args'].get('name', '') for e in events
                 if e.get('ph') == 'M' and e.get('name') == 'process_name'
                 and 'args' in e}
    device_pids = {p for p, n in pid_names.items()
                   if 'TPU' in n or 'TensorCore' in n}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get('ph') == 'X' and e.get('pid') in device_pids:
            dur = e.get('dur', 0) / 1e3
            agg[e.get('name', '?')] += dur
            total += dur
    print(f'total device op time: {total:.1f} ms over {REPS} steps '
          f'({total / REPS:.3f} ms/step)')
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f'{dur / REPS:8.4f} ms/step  {dur / max(total, 1e-9):6.1%}  '
              f'{name[:90]}')


if __name__ == '__main__':
    main()
