"""Polarized-radiation physics validation (Gelles2021-style checks,
SURVEY.md §4 'physics validation against published results').
"""
import numpy as np
import pytest

from bhnerf_tpu import emission, kgeo
from bhnerf_tpu.geodesics import equatorial, trace_geodesics
from bhnerf_tpu.ops import gr


def test_equatorial_crossing_self_consistency():
    """rho_of_req output rays must actually cross the equator at req."""
    req = 6.0
    varphis = np.linspace(-np.pi, np.pi, 8, endpoint=False)
    varphis, rho = equatorial.rho_of_req(0.0, np.deg2rad(20.0), req,
                                         mbar=0, varphis=varphis,
                                         ngeo=300)
    r_cross, _ = equatorial.r_equatorial(
        0.0, np.inf, np.deg2rad(20.0), 0, rho * np.cos(varphis),
        rho * np.sin(varphis), ngeo=300)
    np.testing.assert_allclose(r_cross, req, rtol=5e-3)


def test_face_on_ring_is_circular():
    """Nearly face-on Schwarzschild: the lensed ring must be circular."""
    varphis = np.linspace(-np.pi, np.pi, 8, endpoint=False)
    # inc ~ 0: at finite inclination the ring center shifts by ~2M sin(i),
    # which is real physics, not discretization error
    _, rho = equatorial.rho_of_req(0.0, np.deg2rad(0.01), 6.0, mbar=0,
                                   varphis=varphis, ngeo=300)
    assert rho.std() / rho.mean() < 1e-3
    # weak lensing pushes the image outside the emission radius
    assert (rho > 6.0).all() and (rho < 9.0).all()


def test_first_order_ring_near_critical_curve():
    """mbar=1 image of any equatorial radius hugs the photon ring
    (b_c = sqrt(27) ~ 5.196 for Schwarzschild)."""
    varphis = np.linspace(-np.pi, np.pi, 4, endpoint=False)
    _, rho = equatorial.rho_of_req(0.0, np.deg2rad(0.01), 6.0, mbar=1,
                                   varphis=varphis, ngeo=600)
    assert np.abs(rho - np.sqrt(27.0)).max() < 0.35


def test_equatorial_ring_emission_map():
    """emission.equatorial_ring marks exactly one sample per crossing
    ray and zero elsewhere."""
    b = np.linspace(2.0, 9.0, 12)
    geos = trace_geodesics(b, np.zeros_like(b), spin=0.0,
                           inclination=np.deg2rad(30.0), ngeo=128)
    ring = emission.equatorial_ring(geos, mbar=0)
    per_ray = ring.sum(axis=-1)
    assert set(np.unique(per_ray)) <= {0.0, 1.0}
    assert per_ray.sum() >= 10  # most of these rays cross the equator


def test_zamo_polarization_finite_and_bounded():
    """ZAMO-frame parallel transport (Gelles2021 path): J finite, linear
    polarization bounded by Q_frac."""
    b = np.linspace(4.0, 9.0, 8)
    geos = trace_geodesics(b, np.ones_like(b) * 0.5, spin=0.5,
                           inclination=np.deg2rad(45.0), ngeo=64)
    umu = gr.zamo_frame_velocity(geos, beta=0.3, chi=np.deg2rad(-90.0))
    g = gr.doppler_factor(geos, umu)
    bvec = kgeo.magnetic_field_spherical(geos, 0.0, 0.0, 1.0)
    J = np.asarray(gr.parallel_transport_zamo(
        geos, 0.3, np.deg2rad(-90.0), g, bvec, Q_frac=0.7))
    finite = np.isfinite(J).all(axis=0)
    assert finite.mean() > 0.9
    P = np.sqrt(J[1] ** 2 + J[2] ** 2)[finite]
    assert (P <= 0.7 * J[0][finite] * (1 + 1e-4) + 1e-9).all()


def test_evpa_rotation_preserves_dolp():
    """Screen EVPA rotation chi2 preserves the polarization fraction:
    |J_QU| must equal Q_frac * I everywhere (rotation is orthogonal)."""
    b = np.linspace(4.0, 9.0, 8)
    geos = trace_geodesics(b, np.zeros_like(b) + 1.0, spin=0.0,
                           inclination=np.deg2rad(60.0), ngeo=64)
    Omega = geos.keplerian_omega()
    umu = gr.azimuthal_velocity_vector(geos, Omega)
    g = gr.doppler_factor(geos, umu)
    bf = gr.magnetic_field_fluid_frame(geos, umu, 0.0, 1.0, 0.0)
    J = np.asarray(gr.parallel_transport(geos, umu, g, bf, Q_frac=0.4,
                                         V_frac=0.0))
    finite = np.isfinite(J).all(axis=0) & (np.asarray(J[0]) > 1e-12)
    P = np.sqrt(J[1] ** 2 + J[2] ** 2)
    np.testing.assert_allclose(P[finite] / J[0][finite], 0.4, rtol=1e-4)


def test_kgeo_facade_parity():
    """Reference-named API surface resolves through bhnerf_tpu.kgeo."""
    for name in ('image_plane_geos', 'wave_vector', 'spacetime_metric',
                 'spacetime_inv_metric', 'raise_or_lower_indices',
                 'azimuthal_velocity_vector', 'doppler_factor',
                 'magnetic_field_spherical', 'magnetic_field_fluid_frame',
                 'fluid_frame_tetrad', 'zamo_frame_tetrad',
                 'zamo_frame_velocity', 'parallel_transport',
                 'parallel_transport_zamo', 'radiative_trasfer',
                 'equatorial_lensing'):
        assert hasattr(kgeo, name), name
    import bhnerf_tpu
    for name in ('network', 'optimization', 'emission', 'utils',
                 'constants', 'observation', 'alma', 'visualization'):
        assert hasattr(bhnerf_tpu, name), name
    assert hasattr(bhnerf_tpu.network, 'NeRF_Predictor')
    assert hasattr(bhnerf_tpu.optimization, 'Optimizer')
    assert hasattr(bhnerf_tpu.optimization, 'TrainStep')
