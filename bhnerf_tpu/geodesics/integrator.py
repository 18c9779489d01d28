"""JAX-native Kerr null-geodesic integrator.

Replaces the reference's host-side external raytracer
(reference: bhnerf/kgeo.py:6-63 calls `kgeo.raytrace_ana`, an
elliptic-integral CPU package). Here the backward ray trace is a pure JAX
program — jittable on TPU/CPU, vectorized over all image-plane pixels at
once — built on four ideas:

1. **Second-order Mino-time ODEs.** The separated first-order equations
   dr/dtau = ±sqrt(R), dtheta/dtau = ±sqrt(Theta) are non-smooth at turning
   points. Differentiating once gives r'' = R'(r)/2 (and likewise for the
   polar motion) — smooth right-hand sides that sail through turning points
   with fixed-step RK4 and no sign bookkeeping. The momentum signs needed
   for the wave vector fall out of the integrator state exactly.

2. **Inverse-radius coordinate.** In u = 1/r the radial potential
   U(u) = u^4 R(1/u) is a quartic with O(1) values over the whole domain, so
   uniform Mino steps resolve r ~ 1000 (observer) and r ~ r_+ equally well.

3. **cos(theta) polar coordinate.** In c = cos(theta) the angular potential
   is the Gralla-Lupsasca quartic C(c); together with (u, c) rational
   phi/t rates the whole RHS is polynomial — no transcendentals inside the
   integration loop (trig happens once, on host, in exact float64).

4. **Two-pass sampling.** Pass 1 integrates with a fine fixed step to find
   each ray's terminal Mino time (horizon crossing / escape / cap). Pass 2
   re-integrates with ngeo uniform Mino samples per ray. Both passes are
   lax.scan's over a purely vectorized state — ideal XLA control flow.

Coordinate time t grows to O(r_o) while downstream physics needs O(1)
differences, so t is accumulated with Kahan compensation, and the steeply
singular first Mino segment (dt/dtau ~ r_o^2 at the observer) gets extra
RK4 sub-steps.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bhnerf_tpu.geodesics import kerr


class RayState(NamedTuple):
    u: jnp.ndarray        # inverse radius 1/r
    ud: jnp.ndarray       # du/dtau (backward parameterization)
    c: jnp.ndarray        # cos(theta)
    cd: jnp.ndarray       # dc/dtau (backward)
    phi: jnp.ndarray      # azimuth
    t: jnp.ndarray        # coordinate time (<= 0 going backward)
    t_c: jnp.ndarray      # Kahan compensation for t


def _rk4_step(s: RayState, h, spin, lam, eta, u_clip, u_floor):
    """One classic RK4 step of size h (h may be a per-ray array)."""

    def f(u, ud, c, cd):
        # clip u away from the horizon pole of 1/Delta (above) and away
        # from u = 0 (below: escaping rays probing past the observer
        # radius would otherwise see r = 1/u explode) so frozen/terminated
        # rays can't poison the step with infs
        u = jnp.clip(u, u_floor, u_clip)
        return (ud,
                0.5 * kerr.dU_du(u, spin, lam, eta),
                cd,
                0.5 * kerr.dC_dc(c, spin, lam, eta),
                -kerr.phi_rate(u, c, spin, lam),
                -kerr.t_rate(u, c, spin, lam))

    k1 = f(s.u, s.ud, s.c, s.cd)
    k2 = f(s.u + 0.5 * h * k1[0], s.ud + 0.5 * h * k1[1],
           s.c + 0.5 * h * k1[2], s.cd + 0.5 * h * k1[3])
    k3 = f(s.u + 0.5 * h * k2[0], s.ud + 0.5 * h * k2[1],
           s.c + 0.5 * h * k2[2], s.cd + 0.5 * h * k2[3])
    k4 = f(s.u + h * k3[0], s.ud + h * k3[1],
           s.c + h * k3[2], s.cd + h * k3[3])

    def comb(i):
        return (h / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])

    # Kahan-compensated accumulation of t (it reaches O(r_o) while the
    # physics downstream needs O(1) differences — see module docstring)
    dt = comb(5)
    y = dt - s.t_c
    t_new = s.t + y
    t_c = (t_new - s.t) - y

    return RayState(s.u + comb(0), s.ud + comb(1), s.c + comb(2),
                    s.cd + comb(3), s.phi + comb(4), t_new, t_c)


def initial_state(alpha, beta, spin, inc, r_o, dtype):
    """Observer-plane initial conditions for the backward trace.

    Trig of the inclination is evaluated on host in exact float64.
    """
    alpha = np.asarray(alpha, np.float64)
    beta = np.asarray(beta, np.float64)
    sin_i, cos_i = np.sin(inc), np.cos(inc)
    lam = -alpha * sin_i
    eta = (alpha**2 - spin**2) * cos_i**2 + beta**2

    u0 = np.full_like(alpha, 1.0 / r_o)
    U0 = np.asarray(kerr.U_potential(
        jnp.asarray(u0, dtype), spin, jnp.asarray(lam, dtype),
        jnp.asarray(eta, dtype)))
    # backward ray leaves the observer inward: du/dtau = +sqrt(U) > 0
    ud0 = np.sqrt(np.maximum(U0, 0.0))
    c0 = np.full_like(alpha, cos_i)
    # physical arrival has p_theta = beta; dc/dtau_backward = beta sin(inc)
    cd0 = beta * sin_i
    zeros = np.zeros_like(alpha)

    as_dev = lambda x: jnp.asarray(x, dtype)
    state = RayState(as_dev(u0), as_dev(ud0), as_dev(c0), as_dev(cd0),
                     as_dev(zeros), as_dev(zeros), as_dev(zeros))
    return state, as_dev(lam), as_dev(eta)


@functools.partial(jax.jit, static_argnames=('n_fine',))
def terminal_mino_time(state0, spin, lam, eta, r_o, tau_max=4.0, n_fine=8192,
                       r_stop_factor=1.05):
    """Pass 1: fine fixed-step integration to find each ray's terminal Mino
    time (horizon approach or escape past the observer radius)."""
    dtype = state0.u.dtype
    h = jnp.asarray(tau_max / n_fine, dtype)
    u_horizon = 1.0 / (kerr.horizon(spin) * r_stop_factor)
    u_escape = (1.0 / r_o) * (1.0 - 1e-9)
    u_floor = 0.5 / r_o

    def body(carry, i):
        s, terminated, tau_term = carry
        s_next = _rk4_step(s, h, spin, lam, eta, u_horizon, u_floor)
        # freeze rays that have terminated
        s_next = jax.tree_util.tree_map(
            lambda new, old: jnp.where(terminated, old, new), s_next, s)
        hit = (s_next.u >= u_horizon) | (s_next.u <= u_escape)
        newly = hit & ~terminated
        # round DOWN to the last pre-crossing step so pass 2 (whose
        # substeps are coarser) never integrates beyond the stop surfaces
        tau_term = jnp.where(newly, i.astype(dtype) * h, tau_term)
        return (s_next, terminated | hit, tau_term), None

    init = (state0, jnp.zeros_like(state0.u, dtype=bool),
            jnp.full_like(state0.u, tau_max))
    (state, terminated, tau_term), _ = jax.lax.scan(
        body, init, jnp.arange(n_fine))
    return tau_term


@functools.partial(jax.jit,
                   static_argnames=('ngeo', 'substeps', 'first_substeps'))
def sample_rays(state0, tau_final, spin, lam, eta, r_o=1000.0, ngeo=100,
                substeps=8, first_substeps=512, r_stop_factor=1.05):
    """Pass 2: re-integrate and record `ngeo` uniform Mino-time samples.

    The first inter-sample segment is integrated with `first_substeps` RK4
    sub-steps instead of `substeps`: dt/dtau ~ r^2 ~ r_o^2 is steeply
    singular in Mino time right at the observer, and virtually all of the
    coordinate-time quadrature error lives in that one segment.

    Returns dict of per-sample arrays with shape (ngeo, npix...).
    """
    dtype = state0.u.dtype
    tau_seg = (tau_final / (ngeo - 1)).astype(dtype)
    u_clip = 1.0 / (kerr.horizon(spin) * r_stop_factor)
    u_escape = (1.0 / r_o) * (1.0 - 1e-9)
    u_floor = 0.5 / r_o

    def record(s: RayState):
        return {
            'u': s.u, 'c': s.c, 'phi': s.phi, 't': s.t,
            # running Kahan error of t: the corrected time is t - t_c.
            # Carried out of the kernel so the float32 on-device trace
            # recovers ~2x the mantissa on the one quantity that grows
            # to O(r_o) while downstream needs O(1) differences
            't_c': s.t_c,
            # physical (forward photon) momentum signs — see module docstring
            'pm_r': jnp.sign(s.ud),
            'pm_th': jnp.sign(s.cd),   # dtheta/dtau_fwd = +sign(dc/dtau_bwd)
        }

    def advance_segment(s, nsub):
        h = tau_seg / nsub

        def sub(s2, __):
            s3 = _rk4_step(s2, h, spin, lam, eta, u_clip, u_floor)
            # hold rays at the horizon-stop surface / escape radius
            # instead of overshooting (pass 2 substeps are coarser than
            # pass 1, so the final substep could otherwise cross u = 0)
            frozen = (s2.u >= u_clip) | ((s2.u <= u_escape) & (s2.ud < 0))
            s3 = jax.tree_util.tree_map(
                lambda new, old: jnp.where(frozen, old, new), s3, s2)
            # belt-and-suspenders: the state itself never passes u = 0
            s3 = s3._replace(u=jnp.maximum(s3.u, u_floor))
            return s3, None

        s_next, _ = jax.lax.scan(sub, s, None, length=nsub)
        return s_next

    def segment(s, _):
        s_next = advance_segment(s, substeps)
        return s_next, record(s_next)

    state1 = advance_segment(state0, first_substeps)
    _, samples = jax.lax.scan(segment, state1, None, length=ngeo - 2)
    head = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b], axis=0),
        record(state0), record(state1))
    samples = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), head, samples)
    return samples
