"""Fused Pallas TPU kernel for the NeRF render hot path.

The training inner loop evaluates warp -> posenc -> MLP -> sigmoid -> mask
on ~2.5M ray samples per step (SURVEY.md §3.2 hot loop). XLA fuses the
elementwise work into matmuls but cannot fuse *across* the matmul chain,
so every hidden layer round-trips (N, 128) activations through HBM —
gigabytes per training step at production sizes. This kernel runs the
ENTIRE per-sample pipeline per tile inside VMEM:

* inputs are the raw per-sample ray constants — coords (3, N), Omega,
  t_geos_rel, a static domain mask — plus one frame-time scalar per grid
  row (SMEM). The velocity warp (rigid rotation about z by
  -Omega*max(t - t_inj, 0), reference emission.py:143-211) and the NeRF
  positional encoding (reference network.py:98-122) are computed
  in-kernel, so the (nt, N, feat) feature tensor never exists in HBM;
* the whole pipeline runs SAMPLES-IN-LANES (feature-major): activations
  are (channels, TILE_N), h^T = W^T @ F^T on the MXU, and every
  elementwise/transcendental op (warp trig, posenc sin, sigmoid) fills
  all 128 VPU lanes. The samples-in-sublanes layout wastes 127/128 lanes
  on the prologue trig and measures ~2x slower end-to-end;
* backward: a second kernel reads the stashed features/emission,
  rematerializes activations per tile and accumulates parameter
  gradients in-place across the (sequential) TPU grid. When params
  carry a learnable injection offset it also emits the frame-time
  (t_eff) cotangent — the warp-angle chain needs no extra trig because
  the stash holds both sin and cos posenc rows and dw/dtheta =
  (wy, -wx, 0). The frozen ray constants get zero cotangents.

Matmuls run in `compute_dtype` (a real NeRFPredictor field; 'bfloat16'
engages the MXU's native precision) with float32 accumulation; the warp
and trig stay float32.

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
    """Pallas interpret mode off-TPU. The ambient plugin registers the
    real chip under an inconsistent platform name ('tpu' or 'axon' —
    CLAUDE.md); matching 'tpu' alone would silently run the whole hot
    path emulated on the chip, so check the device kind too."""
    dev = jax.devices()[0]
    return not (dev.platform.lower() in ('tpu', 'axon')
                or 'TPU' in str(getattr(dev, 'device_kind', '')))


def pack_params(params, net_depth):
    """Pytree params -> flat list [W0^T, b0_col, W1^T, b1_col, ...].

    Weights are transposed to (out, in) so the kernel's feature-major
    chain is a standard (M, K) @ (K, N) dot (no per-dot relayout);
    biases become (out, 1) columns."""
    packed = []
    for i in range(net_depth + 1):
        p = params[f'dense_{i}']
        packed.append(p['kernel'].T)        # (out, in)
        packed.append(p['bias'][:, None])   # (out, 1)
    return packed


def unpack_grads(flat_grads, net_depth):
    """Kernel grad outputs [dW^T (out, in), db (out, 1), ...] -> pytree."""
    out = {}
    for i in range(net_depth + 1):
        out[f'dense_{i}'] = {
            'kernel': flat_grads[2 * i].T,
            'bias': flat_grads[2 * i + 1][:, 0],
        }
    return out


def _prologue(t, coords, omega, tg, smask, scale, deg):
    """In-kernel velocity warp + posenc, feature-major. All f32; mirrors
    emission.velocity_warp_coords (rot_axis z) + models.fields.posenc.

    t: frame time (M units, t_injection already subtracted); coords
    (3, TILE_N); omega/tg/smask (1, TILE_N).
    Returns (F^T (feat, TILE_N), mask (1, TILE_N))."""
    t_M = t + tg                                   # (1, TILE_N)
    valid = t_M >= 0.0
    theta = jnp.where(valid, t_M, 0.0) * omega
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y, z = coords[0:1], coords[1:2], coords[2:3]
    vf = valid.astype(jnp.float32)
    # R(-theta) about z, then zero invalid slots (matches the XLA path's
    # where(valid, warped, 0) BEFORE the /scale posenc input)
    wx = (c * x + s * y) * vf
    wy = (c * y - s * x) * vf
    wz = z * vf
    w = jnp.concatenate([wx, wy, wz], axis=0) * (1.0 / scale)
    if deg > 0:
        # F rows: [w | sin(2^i w) for i<deg | cos(2^i w) for i<deg] —
        # the XLA path's posenc sin([xb, xb+pi/2]) layout. Only the
        # base sin/cos are transcendental; higher octaves come from the
        # double-angle recursion (2sc, c^2-s^2): 6 instead of 6*deg
        # transcendental rows per (sample, frame) — the prologue is VPU
        # work that competes with the MXU chain. Accuracy: each
        # doubling adds ~2 ulp; the fused-vs-XLA tests bound it. No
        # safe_sin range reduction needed: |w| <= |coords|/scale < pi
        s, c = jnp.sin(w), jnp.cos(w)
        sins, coss = [s], [c]
        for _ in range(1, deg):
            s, c = 2.0 * s * c, c * c - s * s
            sins.append(s)
            coss.append(c)
        F = jnp.concatenate([w] + sins + coss, axis=0)
    else:
        F = w
    return F, vf * smask


def _folded_prologue(t_ref, coords, omega, tg, smask, scale, deg, nt):
    """Prologue for all nt frames, columns stacked frame-major:
    returns (F (feat, nt*TILE_N), [mask (1, TILE_N)] * nt). Folding the
    frame axis into the matmul N-dimension runs ONE dense chain per tile
    (5 dots) instead of nt chains (5*nt dots of N=TILE_N each) — per-dot
    MXU fill/drain overhead amortizes nt-fold."""
    Fs, masks = [], []
    for t in range(nt):
        F, m = _prologue(t_ref[t, 0], coords, omega, tg, smask, scale, deg)
        Fs.append(F)
        masks.append(m)
    return jnp.concatenate(Fs, axis=1), masks


def _forward_chain(F, wb_refs, cfg, dtype):
    """Feature-major dense chain: activations (channels, samples); mirrors
    models.fields.apply_mlp. Returns (post-relu activations, out row).

    Activations are stored in the compute dtype: every consumer (the next
    dense, grad_W, the relu mask) casts to `dtype` anyway, so this is
    numerically identical and halves bwd VMEM in bfloat16."""
    net_depth, net_width, do_skip = cfg
    skip_layer = net_depth // 2 if do_skip else None
    h = F.astype(dtype)
    acts = []

    def dense(idx, x):
        W_T = wb_refs[2 * idx][:]     # (out, in)
        b = wb_refs[2 * idx + 1][:]   # (out, 1)
        # standard (out, in) @ (in, N) matmul
        y = jax.lax.dot_general(
            W_T.astype(dtype), x.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y + b

    for i in range(net_depth):
        h = jnp.maximum(dense(i, h), 0.0).astype(dtype)
        if do_skip and i > 0 and i % skip_layer == 0:
            h = jnp.concatenate([h, F.astype(dtype)], axis=0)
        acts.append(h)
    out = dense(net_depth, h)         # (out_channel, N)
    return acts, out


def _fwd_kernel(t_ref, coords_ref, omega_ref, tg_ref, smask_ref, *rest,
                nt, cfg, scale, deg, dtype, stash):
    """One sample tile, ALL nt frames folded into the matmul N-dimension:
    one 5-dot dense chain over (feat, nt*TILE_N) instead of nt chains of
    N=TILE_N each. The (nt, TILE_N) output block satisfies Mosaic's
    (8, 128)-divisible-or-full block constraint.

    stash=True additionally writes the prologue features F (compute
    dtype) for the backward pass, which then skips the warp/posenc
    rematerialization entirely."""
    if stash:
        wb_refs = rest[:-2]
        out_ref, f_ref = rest[-2:]
    else:
        wb_refs = rest[:-1]
        out_ref = rest[-1]
    tile = coords_ref.shape[1]
    F, masks = _folded_prologue(t_ref, coords_ref[:], omega_ref[:],
                                tg_ref[:], smask_ref[:], scale, deg, nt)
    _, out = _forward_chain(F, wb_refs, cfg, dtype)   # (1, nt*tile)
    em = jax.nn.sigmoid(out - 10.0)
    for t in range(nt):
        out_ref[t:t + 1, :] = em[:, t * tile:(t + 1) * tile] * masks[t]
    if stash:
        # stored verbatim in the kernel's column-folded layout (the bwd
        # kernel runs the same tile, so no reshuffling on either side)
        f_ref[:] = F.astype(dtype)


def _bwd_kernel(g_ref, em_ref, f_ref, omega_ref, *rest, nt, cfg, deg,
                dtype, want_dt):
    """Parameter + frame-time gradients from stashed (em, F): no
    prologue remat, no final dense (the stored em is the masked sigmoid
    output, and the 0/1 mask folds into it: d_out = g * em * (1 - em)).

    The t_eff cotangent (learnable injection time) rides the same pass
    for free: the F cotangent d_F chains to the warp angle with NO trig
    — the stashed features hold both sin(2^i w) and cos(2^i w) rows
    (the posenc's +pi/2 blocks), and the rigid-rotation derivative is
    dw/dtheta = (wy, -wx, 0) — stashed w rows again. Invalid/padded
    samples have w = 0 rows, so their contribution vanishes
    identically."""
    net_depth, net_width, do_skip = cfg
    skip_layer = net_depth // 2 if do_skip else None
    n_wb = 2 * (net_depth + 1)
    wb_refs = rest[:n_wb]
    grad_refs = rest[n_wb:-1]
    dt_ref = rest[-1]

    def grad_W(d_pre, inp):
        """dW^T (out, in) = d_pre (out, N) . inp (in, N), contract N."""
        return jax.lax.dot_general(
            d_pre.astype(dtype), inp.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def back_h(W_T, d_pre):
        """d_h (in, N) = W_T^T @ d_pre: contract the 'out' axis of
        W_T (out, in) and d_pre (out, N)."""
        return jax.lax.dot_general(
            W_T.astype(dtype), d_pre.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # frames are folded into the matmul N-dimension (rematerialized
    # forward, see _fwd_kernel), so each parameter gradient is ONE
    # N-contraction per tile; results flush into the revisited output
    # blocks across the (sequential) grid
    local = [None] * len(grad_refs)

    def add(k, val):
        local[k] = val if local[k] is None else local[k] + val

    F = f_ref[:]                               # (feat, nt*tile)
    acts = _forward_chain(F, wb_refs, cfg, dtype)[0]
    em = jnp.concatenate([em_ref[t:t + 1, :] for t in range(nt)], axis=1)
    g_all = jnp.concatenate([g_ref[t:t + 1, :] for t in range(nt)], axis=1)
    d_out = (g_all * em * (1.0 - em)).astype(dtype)  # (1, nt*tile)

    h_prev = acts[-1]
    add(2 * net_depth, grad_W(d_out, h_prev))
    add(2 * net_depth + 1, jnp.sum(d_out.astype(jnp.float32), axis=1,
                                   keepdims=True))
    d_h = back_h(wb_refs[2 * net_depth][:], d_out)  # (in, nt*tile)

    d_F = None                                      # (feat, nt*tile)
    for i in range(net_depth - 1, -1, -1):
        h_i = acts[i]
        if do_skip and i > 0 and i % skip_layer == 0:
            # h_i = concat([relu_out, F], 0): the F branch's cotangent
            # feeds the warp-angle gradient below
            if want_dt:
                d_F = (d_h[net_width:] if d_F is None
                       else d_F + d_h[net_width:])
            d_h = d_h[:net_width]
            relu_out = h_i[:net_width]
        else:
            relu_out = h_i
        # Mosaic lacks bf16 vector compares: mask in f32
        d_pre = jnp.where(relu_out.astype(jnp.float32) > 0.0, d_h,
                          0.0).astype(dtype)
        inp = F.astype(dtype) if i == 0 else acts[i - 1]
        add(2 * i, grad_W(d_pre, inp))
        add(2 * i + 1, jnp.sum(d_pre.astype(jnp.float32), axis=1,
                               keepdims=True))
        if i > 0:
            d_h = back_h(wb_refs[2 * i][:], d_pre)
        elif want_dt:
            dF0 = back_h(wb_refs[0][:], d_pre)
            d_F = dF0 if d_F is None else d_F + dF0

    # ---- frame-time (t_eff) cotangent: posenc chain + warp derivative
    # F rows: [w (3) | sin(2^i w) (3 per i) | cos(2^i w) (3 per i)].
    # Statically skipped (zeros) when params carry no learnable
    # injection offset — the frozen hot path pays nothing.
    tile = g_ref.shape[1]
    if want_dt:
        dF = d_F.astype(jnp.float32)
        Ff = F.astype(jnp.float32)
        dw = dF[0:3]
        for i in range(deg):
            s_rows = Ff[3 + 3 * i:6 + 3 * i]
            c_rows = Ff[3 + 3 * deg + 3 * i:6 + 3 * deg + 3 * i]
            ds = dF[3 + 3 * i:6 + 3 * i]
            dc = dF[3 + 3 * deg + 3 * i:6 + 3 * deg + 3 * i]
            dw = dw + (2.0 ** i) * (ds * c_rows - dc * s_rows)
        # dtheta = dw . dw/dtheta with dw/dtheta = (wy, -wx, 0)
        dtheta = dw[0:1] * Ff[1:2] - dw[1:2] * Ff[0:1]  # (1, nt*tile)
        om = omega_ref[:].astype(jnp.float32)           # (1, tile)
        dt_local = jnp.concatenate(
            [jnp.sum(dtheta[:, t * tile:(t + 1) * tile] * om, axis=1,
                     keepdims=True) for t in range(nt)], axis=0)
    else:
        dt_local = jnp.zeros((nt, 1), jnp.float32)

    is_first = pl.program_id(0) == 0
    for k, ref in enumerate(list(grad_refs) + [dt_ref]):
        val = local[k] if k < len(grad_refs) else dt_local

        @pl.when(is_first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(is_first))
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


def _full_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


def _sample_specs(nt, tile):
    """BlockSpecs for (t_eff, coords, Omega, t_geos_rel, smask).

    t_eff rides whole in SMEM; per-sample constants are feature-major
    (lanes = samples), grid is over sample tiles only — the kernel
    folds the nt frames into each tile's matmul N-dimension."""
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((3, tile), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
    ]


def _max_folded_cols(dtype):
    """VMEM column budget for the folded (feat, nt*tile) layout — THE
    single definition shared by tile picking, the acceptance check, and
    the auto-batch chunk size (a lone tweak to any copy would make
    render_samples' chunking disagree with the kernel's check).
    f32 activations are 2x bf16, hence the smaller budget."""
    return (6 if dtype == jnp.bfloat16 else 4) * TILE_N


def _pick_tile(nt, dtype):
    """Sample-tile width: folded frames put nt*tile columns (and, in the
    bwd kernel, their activations) in VMEM at once — shrink the tile as
    nt grows. Shared by fwd/bwd so the stashed F layout matches."""
    max_cols = _max_folded_cols(dtype)
    tile = TILE_N
    while nt * tile > max_cols and tile > 512:
        tile //= 2
    return tile


def max_folded_frames(compute_dtype='float32'):
    """Largest frame count one kernel dispatch can fold at the minimum
    (512) sample tile; callers with more frames must batch (see
    render_samples, which does so automatically)."""
    dtype = jnp.bfloat16 if compute_dtype == 'bfloat16' else jnp.float32
    return _max_folded_cols(dtype) // 512


def _check_folded_vmem(nt, tile, dtype):
    """Reject frame counts whose folded columns exceed the VMEM budget
    with an actionable message (both kernels hold (feat, nt*tile)
    features — and the bwd additionally activations — in VMEM; past the
    budget Mosaic surfaces a raw allocation failure)."""
    max_cols = _max_folded_cols(dtype)
    if nt * tile > max_cols:
        raise ValueError(
            f'fused kernel with nt={nt} frames holds {nt * tile} folded '
            f'columns in VMEM (budget {max_cols}); batch the frames '
            f'(e.g. nt <= {max_cols // 512})')


@functools.partial(jax.jit,
                   static_argnames=('cfg', 'scale', 'deg', 'compute_dtype',
                                    'stash'))
def _render_fwd(t_eff, coords, omega, tg, smask, packed, cfg, scale, deg,
                compute_dtype, stash=False):
    n = coords.shape[1]
    nt = t_eff.shape[0]
    dtype = jnp.bfloat16 if compute_dtype == 'bfloat16' else jnp.float32
    tile = _pick_tile(nt, dtype)
    _check_folded_vmem(nt, tile, dtype)
    n_tiles = n // tile
    kernel = functools.partial(_fwd_kernel, nt=nt, cfg=cfg, scale=scale,
                               deg=deg, dtype=dtype, stash=stash)
    feat = 3 * (1 + 2 * deg)
    out_specs = pl.BlockSpec((nt, tile), lambda j: (0, j),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nt, n), jnp.float32)
    if stash:
        # F rides in the kernel's column-folded layout: tile j occupies
        # columns [j*nt*tile, (j+1)*nt*tile), frame-major within
        out_specs = [out_specs,
                     pl.BlockSpec((feat, nt * tile), lambda j: (0, j),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((feat, nt * n), dtype)]
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=_sample_specs(nt, tile) + _full_specs(len(packed)),
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(t_eff, coords, omega, tg, smask, *packed)


@functools.partial(jax.jit,
                   static_argnames=('cfg', 'deg', 'compute_dtype',
                                    'want_dt'))
def _render_bwd(g_em, em, f_store, omega, packed, cfg, deg,
                compute_dtype, want_dt=True):
    nt, n = g_em.shape
    feat = f_store.shape[0]
    dtype = jnp.bfloat16 if compute_dtype == 'bfloat16' else jnp.float32
    tile = _pick_tile(nt, dtype)
    _check_folded_vmem(nt, tile, dtype)
    n_tiles = n // tile
    kernel = functools.partial(_bwd_kernel, nt=nt, cfg=cfg, deg=deg,
                               dtype=dtype, want_dt=want_dt)
    # grads match the packed layout: dW^T (out, in), db (out, 1);
    # the trailing (nt, 1) output is the t_eff cotangent
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32)
                   for p in packed]
    grad_shapes.append(jax.ShapeDtypeStruct((nt, 1), jnp.float32))

    def const_spec(shape):
        ndim = len(shape)
        return pl.BlockSpec(shape, lambda j, _nd=ndim: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    g_spec = pl.BlockSpec((nt, tile), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((feat, nt * tile), lambda j: (0, j),
                          memory_space=pltpu.VMEM)
    om_spec = pl.BlockSpec((1, tile), lambda j: (0, j),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[g_spec, g_spec, f_spec, om_spec]
                 + _full_specs(len(packed)),
        out_specs=[const_spec(s.shape) for s in grad_shapes],
        out_shape=grad_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(g_em, em, f_store, omega, *packed)
    return outs[:-1], outs[-1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_render(params, coords, omega, tg, smask, t_eff, cfg, scale, deg,
                 compute_dtype='float32'):
    """Warp+posenc+MLP emission via the fused TPU kernel.

    coords (3, N), omega/tg/smask (1, N) with N a multiple of TILE_N;
    t_eff (nt, 1) frame times in M units with t_injection subtracted.
    Returns emission (nt, N). Gradients flow to `params` and `t_eff`
    (the latter carries the learnable injection time: subtracting a
    traced offset outside the kernel composes with the kernel's t_eff
    cotangent); the frozen ray constants get zero cotangents.

    smask MUST be a binary 0/1 mask: the backward kernel reconstructs
    the sigmoid derivative from the stored masked emission
    (d_out = g*em*(1-em)), which is exact only when the mask is 0/1.
    Every in-repo caller passes a boolean domain mask; fractional
    weights belong in CompactRayArgs.weights / rt.J instead.
    """
    if coords.shape[1] % TILE_N:
        raise ValueError(
            f'sample count {coords.shape[1]} must be a multiple of TILE_N '
            f'({TILE_N}); pad the inputs (see predict_emission_fused)')
    packed = pack_params(params, cfg[0])
    return _render_fwd(t_eff, coords, omega, tg, smask, packed, cfg, scale,
                       deg, compute_dtype)


def _fr_fwd(params, coords, omega, tg, smask, t_eff, cfg, scale, deg,
            compute_dtype):
    packed = pack_params(params, cfg[0])
    out, f_store = _render_fwd(t_eff, coords, omega, tg, smask, packed,
                               cfg, scale, deg, compute_dtype, stash=True)
    # residuals: the masked emission (a fwd output anyway) + the prologue
    # features in compute dtype — the bwd kernel then skips the
    # warp/posenc remat and the final dense entirely. Memory tradeoff:
    # f_store is feat*nt*N_pad of compute dtype held fwd->bwd (~100 MB
    # for a dense 64x64x100 grid at nt=6, ~18 MB compact); gradient
    # paths with BOTH dense sampling and large nt should batch frames.
    # omega rides along for the t_eff cotangent (dtheta/dt = Omega).
    return out, (params, out, f_store, omega)


def _fr_bwd(cfg, scale, deg, compute_dtype, residuals, g_em):
    params, em, f_store, omega = residuals
    packed = pack_params(params, cfg[0])
    # the warp-time chain only matters when an injection offset is
    # trainable; the frozen hot path statically skips it (zeros)
    from bhnerf_tpu.models.fields import has_learned_injection
    want_dt = has_learned_injection(params)
    flat, d_t = _render_bwd(g_em, em, f_store, omega, packed, cfg, deg,
                            compute_dtype, want_dt=want_dt)
    d_params = unpack_grads(list(flat), cfg[0])
    # the cotangent tree must match the input params tree. The only
    # non-MLP leaf with defined semantics is the learn_injection offset:
    # its gradient flows through the t_eff cotangent OUTSIDE this VJP
    # (t_eff = t_frames - t_injection is traced by the caller), so a
    # zero on the params leaf itself is correct — autodiff adds the
    # -sum(d_t) contribution when composing. Any OTHER unexpected leaf
    # would silently get a wrong zero gradient — refuse instead of
    # corrupting external callers' training.
    for k, v in params.items():
        if k not in d_params:
            if k != 't_injection':
                raise ValueError(
                    f'fused_render VJP covers MLP parameters only; '
                    f'param leaf {k!r} would receive a silent zero '
                    f'gradient — use the XLA path for this predictor')
            d_params[k] = jax.tree_util.tree_map(jnp.zeros_like, v)
    nt, n = em.shape
    zrow = jnp.zeros((1, n), jnp.float32)
    return (d_params, jnp.zeros((3, n), jnp.float32), zrow, zrow, zrow,
            d_t)


fused_render.defvjp(_fr_fwd, _fr_bwd)


# ---------------------------------------------------------------------------
# High-level integration with the training step
# ---------------------------------------------------------------------------
def _flatten_sample_args(coords, omega, tg, smask, n):
    """Flatten/pad per-sample constants into the kernel layout.

    coords: (3, ...) component-major; omega scalar or coords-shaped;
    tg/smask coords[0]-shaped. Padding columns get tg=-1e30 (never
    valid)."""
    n_pad = (n + TILE_N - 1) // TILE_N * TILE_N
    pad = n_pad - n

    def row(x, fill=0.0):
        x = jnp.broadcast_to(jnp.asarray(x, jnp.float32), coords.shape[1:])
        return jnp.pad(x.reshape(1, n), ((0, 0), (0, pad)),
                       constant_values=fill)

    coords_n = jnp.pad(coords.reshape(3, n).astype(jnp.float32),
                       ((0, 0), (0, pad)))
    return coords_n, row(omega), row(tg, fill=-1e30), row(smask), n_pad


def render_samples(params, predictor, t_frames_M, coords, omega, tg,
                   t_injection, smask=1.0):
    """Emission on an arbitrary per-sample set via the fused kernel.

    Returns (nt_flat, n) where nt_flat = prod(shape(t_frames_M)) (>= 1).
    """
    n = int(np.prod(coords.shape[1:]))
    coords_n, omega_n, tg_n, smask_n, n_pad = _flatten_sample_args(
        coords, omega, tg, smask, n)
    # t_injection may be a traced expression of params (learnable
    # injection time): the kernel VJP emits a t_eff cotangent, so the
    # subtraction composes to the correct -sum(d_t) offset gradient
    t_eff = (jnp.asarray(t_frames_M, jnp.float32).reshape(-1, 1)
             - jnp.asarray(t_injection, jnp.float32))
    cfg = (predictor.net_depth, predictor.net_width, predictor.do_skip)
    compute_dtype = getattr(predictor, 'compute_dtype', 'float32')
    # frame counts past the folded-VMEM budget (e.g. full-movie renders
    # at nt=64) are batched over several kernel dispatches; shapes are
    # static so the chunk loop unrolls under jit. Gradients compose: each
    # chunk stashes/backprops independently and param grads sum.
    nt_flat = t_eff.shape[0]
    nt_max = max_folded_frames(compute_dtype)
    ems = [
        fused_render(params, coords_n, omega_n, tg_n, smask_n,
                     t_eff[i:i + nt_max], cfg, float(predictor.scale),
                     int(predictor.posenc_deg), compute_dtype)
        for i in range(0, nt_flat, nt_max)
    ]
    em = ems[0] if len(ems) == 1 else jnp.concatenate(ems, axis=0)
    return em[:, :n]


def predict_emission_fused(params, predictor, t_frames_M, rt):
    """Drop-in replacement for train.step.predict_emission using the
    fused kernel. Returns emission shaped (nt, na, nb, ngeo).

    Sharding note: pallas_call has no GSPMD partitioning rule — under a
    mesh with sharded sample inputs the partitioner all-gathers and
    each device computes the full kernel (correct, replicated). Mesh
    runs that need sample-parallel kernels should shard_map this; the
    measured single-chip path is the production configuration."""
    from bhnerf_tpu import emission as emission_lib
    from bhnerf_tpu.models.fields import learned_t_injection

    # supervision-domain mask on the unwarped coords (static per model)
    domain = emission_lib.domain_mask(rt.coords, predictor.rmin,
                                      predictor.rmax, predictor.z_width)
    em = render_samples(params, predictor, t_frames_M, rt.coords, rt.Omega,
                        rt.t_geos_rel,
                        learned_t_injection(params, rt.t_injection),
                        smask=domain.astype(jnp.float32))
    t_shape = jnp.shape(t_frames_M)
    return em.reshape(*t_shape, *rt.coords.shape[1:])
