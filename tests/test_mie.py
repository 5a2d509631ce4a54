"""Mie solver + sampler tests (the reference's MieScatter raises;
rays/particle.py:127-163)."""

import numpy as np

from raytracetorch_tpu import MieScatter
from raytracetorch_tpu.rays.mie import (asymmetry_parameter,
                                        mie_coefficients,
                                        mie_phase_function)


def test_rayleigh_limit():
    """x -> 0: phase function -> 1 + mu^2 and Qsca -> (8/3) x^4 K^2."""
    x, m = 0.05, 1.5
    mu = np.linspace(-1, 1, 21)
    p = mie_phase_function(x, m, mu)
    ratio = p / (1 + mu ** 2)
    assert ratio.max() / ratio.min() < 1.01

    a, b = mie_coefficients(x, m)
    n = np.arange(1, len(a) + 1)
    qsca = 2.0 / x ** 2 * np.sum((2 * n + 1) * (np.abs(a) ** 2
                                                + np.abs(b) ** 2))
    ray = (8 / 3) * x ** 4 * abs((m ** 2 - 1) / (m ** 2 + 2)) ** 2
    np.testing.assert_allclose(qsca, ray, rtol=5e-3)


def test_large_sphere_forward_peak():
    """2 um polystyrene in water at 550 nm: strong forward scattering,
    g ~ 0.88 (textbook)."""
    g = asymmetry_parameter(2000, 550, 1.59, 1.33)
    assert 0.8 < g < 0.95


def test_sampler_matches_phase_function(key):
    """Sampled cos(theta) moments match the tabulated phase function."""
    b = MieScatter.make(particle_size_nm=500.0, wavelength_nm=532.0,
                        particle_ior=1.59, environment_ior=1.33)
    rays = b.sample(key, 60000)
    mu_s = np.asarray(rays.dir[:, 2])

    mu = np.linspace(-1, 1, 4096)
    x = np.pi * 500.0 * 1.33 / 532.0
    p = mie_phase_function(x, 1.59 / 1.33, mu)
    g_expect = np.trapezoid(p * mu, mu) / np.trapezoid(p, mu)
    np.testing.assert_allclose(mu_s.mean(), g_expect, atol=0.01)
    mu2_expect = np.trapezoid(p * mu ** 2, mu) / np.trapezoid(p, mu)
    np.testing.assert_allclose((mu_s ** 2).mean(), mu2_expect, atol=0.01)
