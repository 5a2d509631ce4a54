"""Encircled energy and fiber-coupling efficiency against textbook
closed forms: the Airy EE curve 1 - J0^2 - J1^2 and the ~81% Airy-to-
Gaussian coupling optimum near w = 0.90 lambda F#.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.special import j0, j1

from raytracetorch_tpu.utils.psf import (diffraction_psf,
                                         encircled_energy, fiber_coupling)

LAM, FNUM, N = 0.55e-3, 8.0, 96


def _clear_pupil(n=N):
    u = (np.arange(n) + 0.5) / n * 2 - 1
    X, Y = np.meshgrid(u, u, indexing='xy')
    amp = ((X * X + Y * Y) <= 1.0).astype(np.float32)
    return jnp.zeros((n, n), jnp.float32), jnp.asarray(amp)


def test_airy_encircled_energy():
    opd, amp = _clear_pupil()
    psf, dx = diffraction_psf(opd, amp, LAM, FNUM, pad=8)
    radii = np.array([0.5, 1.0, 1.22, 2.0, 3.0]) * LAM * FNUM
    ee = np.asarray(encircled_energy(psf, dx, jnp.asarray(radii)))
    v = np.pi * radii / (LAM * FNUM)
    analytic = 1.0 - j0(v) ** 2 - j1(v) ** 2
    # pixelized disk pupil + discrete ring boundary: a couple % is the
    # expected agreement at this grid
    np.testing.assert_allclose(ee, analytic, atol=0.025)
    # monotone and ->1
    assert np.all(np.diff(ee) > 0) and ee[-1] > 0.85


def test_airy_gaussian_coupling_optimum():
    opd, amp = _clear_pupil()
    ws = np.linspace(0.5, 1.1, 25) * LAM * FNUM
    eta = np.array([float(fiber_coupling(opd, amp, LAM, FNUM, w))
                    for w in ws])
    k = int(np.argmax(eta))
    # textbook Airy->Gaussian limit: 81.45% at w0 = 0.714 lam F#
    # (back-propagated pupil ratio a/w_p = 1.121)
    assert eta[k] == pytest.approx(0.8145, abs=0.01)
    assert ws[k] / (LAM * FNUM) == pytest.approx(0.714, abs=0.05)
    # decentering the fiber kills coupling (Gaussian overlap falloff)
    eta_off = float(fiber_coupling(opd, amp, LAM, FNUM, ws[k],
                                   offset=(2 * LAM * FNUM, 0.0)))
    assert eta_off < 0.05


def test_defocus_reduces_coupling():
    """A quarter-wave of defocus costs ~20% coupling (Strehl-like)."""
    opd0, amp = _clear_pupil()
    u = (np.arange(N) + 0.5) / N * 2 - 1
    X, Y = np.meshgrid(u, u, indexing='xy')
    r2 = jnp.asarray(X * X + Y * Y, jnp.float32)
    w_opt = 0.714 * LAM * FNUM
    eta0 = float(fiber_coupling(opd0, amp, LAM, FNUM, w_opt))
    eta_q = float(fiber_coupling(0.25 * LAM * r2, amp, LAM, FNUM, w_opt))
    assert eta_q < 0.85 * eta0
    # and it is differentiable: grad of coupling w.r.t. a defocus
    # coefficient is finite and negative at +eps
    import jax

    def cpl(a):
        return fiber_coupling(a * LAM * r2, amp, LAM, FNUM, w_opt)

    g = float(jax.grad(cpl)(jnp.float32(0.1)))
    assert np.isfinite(g) and g < 0
