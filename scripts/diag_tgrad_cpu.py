"""CPU ground-truth for the drive_fused_chip t_injection-grad check.

Builds the EXACT problem drive_fused_chip.py uses (grid=64, ngeo=64,
n_fine=8192, learnable injection) and evaluates the t_injection gradient
on the CPU backend via BOTH the XLA path and the interpret-mode fused
kernel, plus a cancellation scale (sum of |per-frame dt| terms). CPU
trig is correctly rounded f32 and the accumulation is deterministic, so
this arbitrates which on-chip value (XLA 13.7533 vs fused 13.9639 from
chip_queue_logs/fused_chip.log) is the outlier.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
jax.config.update('jax_platforms', 'cpu')

import dataclasses as dc
import numpy as np
import jax.numpy as jnp

from bhnerf_tpu.utils import compilation_cache_dir
jax.config.update('jax_compilation_cache_dir', compilation_cache_dir())

from bhnerf_tpu import units
from bhnerf_tpu.geodesics import image_plane_geos
from bhnerf_tpu.models import NeRFPredictor
from bhnerf_tpu.train import raytracing_args
from bhnerf_tpu.train.step import (compact_raytracing_args,
                                   image_plane_prediction)

grid = int(os.environ.get('DRIVE_GRID', '64'))
fov = 16.0
geos = image_plane_geos(spin=0.2, inclination=np.deg2rad(60),
                        alpha_range=(-fov / 2, fov / 2),
                        beta_range=(-fov / 2, fov / 2),
                        ngeo=64 if grid >= 64 else 24,
                        num_alpha=grid, num_beta=grid,
                        n_fine=8192 if grid >= 64 else 1024)
rt = raytracing_args(geos, geos.keplerian_omega(),
                     -float(geos.r_o + 4), units.Quantity(0.0, 'hr'))
t_frames_M = jnp.asarray(np.linspace(0.0, 90.0, 6), jnp.float32)

base = NeRFPredictor(scale=fov / 2, rmin=2.0, rmax=fov / 2, z_width=2.0)
pred = dc.replace(base, learn_injection=True)
params = pred.init_params(seed=1)
out_key = f'dense_{pred.net_depth}'
params[out_key]['bias'] = params[out_key]['bias'] + 9.0
params['t_injection'] = jnp.float32(3.0)
crt = compact_raytracing_args(rt, pred)


def loss(p, use_fused):
    img = image_plane_prediction(p, pred, t_frames_M, crt, fused=use_fused)
    return jnp.sum(img ** 2)


gfn = jax.jit(jax.value_and_grad(loss), static_argnums=(1,))
l_x, g_x = gfn(params, False)
l_f, g_f = gfn(params, True)
gt_x = float(np.asarray(g_x['t_injection']))
gt_f = float(np.asarray(g_f['t_injection']))
print(f'cpu XLA   t-grad: {gt_x:.6f}  (loss {float(l_x):.4f})')
print(f'cpu fused t-grad: {gt_f:.6f}  (loss {float(l_f):.4f})')
print(f'cpu rel diff: {abs(gt_f - gt_x) / abs(gt_x):.2e}')

# cancellation scale: |d loss/d t_frame| summed per frame, no sign
# cancellation across frames (t_injection enters every frame with -1)
per_frame = jax.jit(jax.grad(
    lambda tf: jnp.sum(image_plane_prediction(
        params, pred, tf, crt, fused=False) ** 2)))(t_frames_M)
pf = np.asarray(per_frame)
print(f'per-frame dt terms: {pf.round(4)}')
print(f'|sum|={abs(pf.sum()):.4f}  sum|.|={np.abs(pf).sum():.4f}  '
      f'cancellation x{np.abs(pf).sum() / max(abs(pf.sum()), 1e-30):.1f}')
