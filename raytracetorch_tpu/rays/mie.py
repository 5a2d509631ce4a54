"""Mie scattering: exact series solution and phase-function sampling.

The reference's ``MieScatter`` raises NotImplementedError pending "a solver
library such as miepython" (rays/particle.py:127-163).  This is that solver:
the Bohren & Huffman series for a homogeneous dielectric sphere —
logarithmic-derivative downward recurrence for D_n(mx), upward
Riccati-Bessel recurrences for psi/chi, Mie coefficients a_n/b_n, and the
unpolarized phase function |S1|^2 + |S2|^2 — tabulated once at setup
(host-side, float64) into an inverse-CDF lookup that the jitted sampler
interpolates.
"""

from __future__ import annotations

import numpy as np


def mie_coefficients(x, m, n_max=None):
    """Mie a_n, b_n for size parameter ``x`` and relative index ``m``.

    Standard Wiscombe term count n_max = x + 4 x^(1/3) + 2.
    """
    if n_max is None:
        n_max = int(np.ceil(x + 4.0 * x ** (1.0 / 3.0) + 2.0))
    m = complex(m)
    mx = m * x

    # Logarithmic derivative D_n(mx) by downward recurrence
    nmx = int(np.ceil(max(n_max, abs(mx)) + 16))
    D = np.zeros(nmx + 1, dtype=complex)
    for n in range(nmx, 0, -1):
        D[n - 1] = n / mx - 1.0 / (D[n] + n / mx)

    # Riccati-Bessel psi, chi by upward recurrence
    psi = np.zeros(n_max + 1)
    chi = np.zeros(n_max + 1)
    psi_m1, psi[0] = np.cos(x), np.sin(x)
    chi_m1, chi[0] = -np.sin(x), np.cos(x)
    for n in range(1, n_max + 1):
        psi[n] = (2 * n - 1) / x * psi[n - 1] - (psi_m1 if n == 1 else
                                                 psi[n - 2])
        chi[n] = (2 * n - 1) / x * chi[n - 1] - (chi_m1 if n == 1 else
                                                 chi[n - 2])
    xi = psi - 1j * chi
    xi_m1 = psi_m1 - 1j * chi_m1

    n_arr = np.arange(1, n_max + 1)
    psi_nm1 = psi[:n_max]
    xi_nm1 = xi[:n_max]
    psi_n = psi[1:n_max + 1]
    xi_n = xi[1:n_max + 1]
    Dn = D[1:n_max + 1]

    da = Dn / m + n_arr / x
    db = Dn * m + n_arr / x
    a = (da * psi_n - psi_nm1) / (da * xi_n - xi_nm1)
    b = (db * psi_n - psi_nm1) / (db * xi_n - xi_nm1)
    return a, b


def mie_phase_function(x, m, mu):
    """Unpolarized phase function (unnormalized |S1|^2 + |S2|^2) at the
    cosines ``mu`` for size parameter ``x`` and relative index ``m``."""
    a, b = mie_coefficients(x, m)
    n_max = len(a)
    mu = np.asarray(mu, dtype=np.float64)

    S1 = np.zeros(mu.shape, dtype=complex)
    S2 = np.zeros(mu.shape, dtype=complex)
    # pi_n, tau_n angular function recurrences
    pi_nm1 = np.zeros_like(mu)           # pi_0
    pi_n = np.ones_like(mu)              # pi_1
    for n in range(1, n_max + 1):
        tau_n = n * mu * pi_n - (n + 1) * pi_nm1
        f = (2 * n + 1) / (n * (n + 1))
        S1 += f * (a[n - 1] * pi_n + b[n - 1] * tau_n)
        S2 += f * (a[n - 1] * tau_n + b[n - 1] * pi_n)
        pi_next = ((2 * n + 1) * mu * pi_n - (n + 1) * pi_nm1) / n
        pi_nm1, pi_n = pi_n, pi_next
    return np.abs(S1) ** 2 + np.abs(S2) ** 2


def mie_inverse_cdf(particle_size_nm, wavelength_nm, particle_ior,
                    environment_ior, n_table=2048, n_mu=4096):
    """Inverse CDF table for sampling cos(theta) from the Mie phase function.

    Returns (u_grid [n_table], mu_of_u [n_table]) — float32 arrays ready to
    interpolate in jit.  theta is measured from the +z forward direction.
    """
    x = np.pi * particle_size_nm * environment_ior / wavelength_nm
    m = particle_ior / environment_ior
    mu = np.linspace(-1.0, 1.0, n_mu)
    p = mie_phase_function(x, m, mu)
    cdf = np.cumsum((p[1:] + p[:-1]) * 0.5 * np.diff(mu))
    cdf = np.concatenate([[0.0], cdf])
    cdf /= cdf[-1]
    u_grid = np.linspace(0.0, 1.0, n_table)
    mu_of_u = np.interp(u_grid, cdf, mu)
    return u_grid.astype(np.float32), mu_of_u.astype(np.float32)


def asymmetry_parameter(particle_size_nm, wavelength_nm, particle_ior,
                        environment_ior, n_mu=4096):
    """g = <cos theta> of the phase function (diagnostic)."""
    x = np.pi * particle_size_nm * environment_ior / wavelength_nm
    m = particle_ior / environment_ior
    mu = np.linspace(-1.0, 1.0, n_mu)
    p = mie_phase_function(x, m, mu)
    return float(np.trapezoid(p * mu, mu) / np.trapezoid(p, mu))
