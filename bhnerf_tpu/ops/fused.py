"""Fused Pallas TPU kernel for the NeRF MLP hot path.

The training inner loop evaluates posenc -> MLP -> sigmoid -> mask on
~2.5M ray samples per step (SURVEY.md §3.2 hot loop). XLA fuses the
elementwise work into matmuls but cannot fuse *across* the matmul chain,
so every hidden layer round-trips (N, 128) activations through HBM —
gigabytes per training step at production sizes. This kernel runs the
whole dense chain per tile inside VMEM:

* inputs are the positional-encoded features F (N, feat) and a {0,1}
  validity*domain mask — the velocity warp + posenc stay in XLA (they
  fuse into one pointwise pass and their outputs carry no parameter
  gradients);
* forward: per (TILE_N, feat) tile, the full
  dense -> relu -> [skip concat] -> ... -> sigmoid(x-10) * mask chain;
* backward: a second kernel rematerializes the activations per tile and
  accumulates parameter gradients in-place across the (sequential) TPU
  grid; no gradients w.r.t. F/mask are produced (they are frozen ray
  constants — learnable-t_injection uses the XLA path instead).

Falls back to `interpret=True` off-TPU so the same code path is testable
on the CPU mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 4096


def _interpret():
    return jax.default_backend() != 'tpu'


def pack_params(params, net_depth):
    """Pytree params -> flat list [W0, b0_row, W1, b1_row, ...]."""
    packed = []
    for i in range(net_depth + 1):
        p = params[f'dense_{i}']
        packed.append(p['kernel'])          # (in, out)
        packed.append(p['bias'][None, :])   # (1, out)
    return packed


def unpack_grads(flat_grads, net_depth):
    out = {}
    for i in range(net_depth + 1):
        out[f'dense_{i}'] = {
            'kernel': flat_grads[2 * i],
            'bias': flat_grads[2 * i + 1][0],
        }
    return out


def _forward_chain(F, wb_refs, cfg, dtype):
    """Dense chain in (samples, channels) layout; mirrors
    models.fields.apply_mlp. Returns (post-relu activations, out col)."""
    net_depth, net_width, do_skip = cfg
    skip_layer = net_depth // 2 if do_skip else None
    h = F
    acts = []

    def dense(idx, x):
        W = wb_refs[2 * idx][:]
        b = wb_refs[2 * idx + 1][:]
        y = jnp.dot(x.astype(dtype), W.astype(dtype),
                    preferred_element_type=jnp.float32)
        return y + b

    for i in range(net_depth):
        h = jnp.maximum(dense(i, h), 0.0)
        if do_skip and i > 0 and i % skip_layer == 0:
            h = jnp.concatenate([h, F], axis=-1)
        acts.append(h)
    out = dense(net_depth, h)
    return acts, out


def _fwd_kernel(F_ref, mask_ref, *rest, cfg, dtype):
    wb_refs = rest[:-1]
    out_ref = rest[-1]
    _, out = _forward_chain(F_ref[:], wb_refs, cfg, dtype)
    em = jax.nn.sigmoid(out - 10.0)
    out_ref[:] = em * mask_ref[:]


def _bwd_kernel(F_ref, mask_ref, g_ref, *rest, cfg, dtype):
    net_depth, net_width, do_skip = cfg
    skip_layer = net_depth // 2 if do_skip else None
    n_wb = 2 * (net_depth + 1)
    wb_refs = rest[:n_wb]
    grad_refs = rest[n_wb:]

    F = F_ref[:]
    acts, out = _forward_chain(F, wb_refs, cfg, dtype)
    em = jax.nn.sigmoid(out - 10.0)
    d_out = g_ref[:] * mask_ref[:] * em * (1.0 - em)  # (TILE_N, 1)

    is_first = pl.program_id(0) == 0

    def accum(ref, val):
        @pl.when(is_first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(is_first))
        def _():
            ref[:] = ref[:] + val

    def matmul_T_lhs(a, b):
        """a^T @ b with a (N, m), b (N, n) -> (m, n), contract samples."""
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def matmul_T_rhs(a, b):
        """a @ b^T with a (N, o), b (i, o) -> (N, i), contract out dim."""
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # final layer
    h_prev = acts[-1]
    accum(grad_refs[2 * net_depth], matmul_T_lhs(h_prev, d_out))
    accum(grad_refs[2 * net_depth + 1],
          jnp.sum(d_out, axis=0, keepdims=True))
    d_h = matmul_T_rhs(d_out, wb_refs[2 * net_depth][:])  # (N, in)

    for i in range(net_depth - 1, -1, -1):
        h_i = acts[i]
        if do_skip and i > 0 and i % skip_layer == 0:
            # h_i = concat([relu_out, F], -1); F carries no gradient
            d_h = d_h[:, :net_width]
            relu_out = h_i[:, :net_width]
        else:
            relu_out = h_i
        d_pre = jnp.where(relu_out > 0.0, d_h, 0.0)
        inp = F if i == 0 else acts[i - 1]
        accum(grad_refs[2 * i], matmul_T_lhs(inp, d_pre))
        accum(grad_refs[2 * i + 1], jnp.sum(d_pre, axis=0, keepdims=True))
        if i > 0:
            d_h = matmul_T_rhs(d_pre, wb_refs[2 * i][:])


def _full_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


@functools.partial(jax.jit, static_argnames=('cfg', 'compute_dtype'))
def _fused_mlp_fwd(F, mask, packed, cfg, compute_dtype):
    n = F.shape[0]
    dtype = jnp.bfloat16 if compute_dtype == 'bfloat16' else jnp.float32
    kernel = functools.partial(_fwd_kernel, cfg=cfg, dtype=dtype)
    feat = F.shape[1]
    return pl.pallas_call(
        kernel,
        grid=(n // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, feat), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ] + _full_specs(len(packed)),
        out_specs=pl.BlockSpec((TILE_N, 1), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(F, mask, *packed)


@functools.partial(jax.jit, static_argnames=('cfg', 'compute_dtype'))
def _fused_mlp_bwd(F, mask, g_em, packed, cfg, compute_dtype):
    n = F.shape[0]
    dtype = jnp.bfloat16 if compute_dtype == 'bfloat16' else jnp.float32
    kernel = functools.partial(_bwd_kernel, cfg=cfg, dtype=dtype)
    feat = F.shape[1]
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32)
                   for p in packed]

    def const_spec(p):
        ndim = len(p.shape)
        return pl.BlockSpec(p.shape, lambda j, _nd=ndim: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    grads = pl.pallas_call(
        kernel,
        grid=(n // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, feat), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ] + _full_specs(len(packed)),
        out_specs=[const_spec(p) for p in packed],
        out_shape=grad_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(F, mask, g_em, *packed)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_mlp_emission(params, F, mask, cfg, compute_dtype='float32'):
    """Masked sigmoid-MLP emission via the fused TPU kernel.

    F: (N, feat) posenc features (N divisible by TILE_N); mask: (N, 1).
    Returns (N, 1). Gradients flow to `params` only.
    """
    if F.shape[0] % TILE_N:
        raise ValueError(
            f'sample count {F.shape[0]} must be a multiple of TILE_N '
            f'({TILE_N}); pad the inputs (see predict_emission_fused)')
    packed = pack_params(params, cfg[0])
    return _fused_mlp_fwd(F, mask, packed, cfg, compute_dtype)


def _fe_fwd(params, F, mask, cfg, compute_dtype):
    packed = pack_params(params, cfg[0])
    out = _fused_mlp_fwd(F, mask, packed, cfg, compute_dtype)
    return out, (params, F, mask)


def _fe_bwd(cfg, compute_dtype, residuals, g_em):
    params, F, mask = residuals
    packed = pack_params(params, cfg[0])
    flat = _fused_mlp_bwd(F, mask, g_em, packed, cfg, compute_dtype)
    d_params = unpack_grads(list(flat), cfg[0])
    return (d_params, jnp.zeros_like(F), jnp.zeros_like(mask))


fused_mlp_emission.defvjp(_fe_fwd, _fe_bwd)


# ---------------------------------------------------------------------------
# High-level integration with the training step
# ---------------------------------------------------------------------------
def predict_emission_fused(params, predictor, t_frames_M, rt):
    """Drop-in replacement for train.step.predict_emission using the
    fused kernel. Returns emission shaped (nt, na, nb, ngeo)."""
    from bhnerf_tpu import emission as emission_lib
    from bhnerf_tpu.models.fields import posenc

    warped, valid = emission_lib.velocity_warp_coords(
        rt.coords, rt.Omega, t_frames_M, 0.0, rt.t_geos_rel,
        rt.t_injection, t_units=None, return_mask=True)
    t_shape = jnp.shape(t_frames_M)
    spatial = rt.coords.shape[1:]
    full_shape = (*t_shape, *spatial)
    warped = jnp.broadcast_to(warped, (*full_shape, 3))
    valid = jnp.broadcast_to(valid, full_shape)

    # combined validity + supervision-domain mask (unwarped coords)
    domain = emission_lib.domain_mask(rt.coords, predictor.rmin,
                                      predictor.rmax, predictor.z_width)
    mask = (valid & domain).astype(jnp.float32)

    net_input = jnp.where(valid[..., None], warped, 0.0)
    F = posenc(net_input / predictor.scale, predictor.posenc_deg)
    feat = F.shape[-1]

    n = int(np.prod(full_shape))
    n_pad = (n + TILE_N - 1) // TILE_N * TILE_N
    F = jnp.pad(F.reshape(n, feat), ((0, n_pad - n), (0, 0)))
    mask_col = jnp.pad(mask.reshape(n, 1), ((0, n_pad - n), (0, 0)))

    cfg = (predictor.net_depth, predictor.net_width, predictor.do_skip)
    em = fused_mlp_emission(params, F, mask_col, cfg,
                            getattr(predictor, 'compute_dtype', 'float32'))
    return em[:n, 0].reshape(full_shape)
