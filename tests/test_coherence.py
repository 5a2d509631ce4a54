"""Partially coherent light via GSM coherent modes (utils/coherence.py).

Anchors: the Mercer sum reassembles the source intensity exactly
(Starikov-Wolf closed form), the modes are orthonormal on the grid,
the far-field divergence carries the GSM global beam factor
sqrt(1 + (w0/xi)^2) (Friberg & Sudol), and coherence monotonically
widens the far field between the coherent and incoherent limits."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu.utils.coherence import (gsm_mode_count, gsm_modes,
                                               incoherent_mode_sum)
from raytracetorch_tpu.utils.propagation import angular_spectrum

WL = 0.5e-3


def _width(I, ax):
    I = np.asarray(I)
    return 2.0 * np.sqrt(float((I * ax[None, :] ** 2).sum() / I.sum()))


def test_mode_sum_reassembles_source_intensity():
    n, dx, w0, xi = 128, 0.02, 0.5, 0.4
    modes, w = gsm_modes(n, dx, w0, xi, tail=1e-4)
    I = np.tensordot(np.asarray(w), np.asarray(modes) ** 2, axes=1)
    ax = (np.arange(n) - n // 2) * dx
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    # unit-peak GSM source: I = exp(-2 r^2 / w0^2), exactly
    np.testing.assert_allclose(I, np.exp(-2 * r2 / w0 ** 2), atol=1e-4)
    assert abs(I.max() - 1.0) < 1e-3


def test_modes_orthonormal_weights_decreasing():
    n, dx = 128, 0.02
    modes, w = gsm_modes(n, dx, 0.5, 0.4, tail=1e-4)
    G = np.einsum('aij,bij->ab', np.asarray(modes[:6]),
                  np.asarray(modes[:6])) * dx * dx
    np.testing.assert_allclose(G, np.eye(6), atol=1e-5)
    assert np.all(np.diff(np.asarray(w)) <= 1e-12)       # sorted desc
    # nearly coherent source: ONE mode suffices
    assert gsm_mode_count(0.5, 50.0) == 1


def test_far_field_carries_gsm_divergence_factor():
    """Propagate the mode stack far beyond the Rayleigh distance: the
    measured width must follow w0 sqrt(1 + (z/zR)^2) with
    zR = pi w0^2 / (lambda beta), beta = sqrt(1 + (w0/xi)^2) — the
    Friberg-Sudol GSM beam law.  The coherent limit (xi >> w0)
    reproduces the plain Gaussian zR; halving the coherence width
    measurably fattens the far field (the discriminating physics)."""
    n, dx, w0, z = 256, 0.02, 0.2, 500.0
    ax = (np.arange(n) - n // 2) * dx
    widths = {}
    for xi in (10.0, 0.2, 0.1):
        modes, w = gsm_modes(n, dx, w0, xi, tail=1e-4)
        I = incoherent_mode_sum(
            modes, w, lambda r, i: angular_spectrum(r, i, dx, WL, z))
        beta = np.sqrt(1.0 + (w0 / xi) ** 2)
        zR = np.pi * w0 ** 2 / (WL * beta)
        w_true = w0 * np.sqrt(1.0 + (z / zR) ** 2)
        w_meas = _width(I, ax)
        assert abs(w_meas - w_true) / w_true < 0.03, (xi, w_meas, w_true)
        widths[xi] = w_meas
    assert widths[0.1] > 1.4 * widths[0.2] > 1.4 * widths[10.0]


def test_partially_coherent_imaging_through_a_lens():
    """A GSM source imaged by an ideal lens (2f-2f): the coherent
    single-mode limit focuses to the diffraction waist, while a
    low-coherence stack forms a geometric image of the SOURCE size —
    the textbook coherent/incoherent imaging contrast, all through the
    same wave_trace."""
    from raytracetorch_tpu import (IdealThinLens, SensorElement,
                                   SequentialScene)
    from raytracetorch_tpu.utils.beamprop import wave_trace

    n, dx, w0, f = 256, 0.02, 0.3, 50.0
    sc = SequentialScene([
        IdealThinLens(focal=f, translation=[0, 0, 2 * f], name='lens'),
        SensorElement(radius=2.0, translation=[0, 0, 4 * f], name='s')])
    p = sc.init_params()
    ax = (np.arange(n) - n // 2) * dx

    op = lambda r, i: wave_trace(sc, p, r, i, dx, WL, z0=0.0)[:2]

    w_meas = {}
    for xi in (50.0, 0.15):
        modes, w = gsm_modes(n, dx, w0, xi, tail=1e-3)
        I = incoherent_mode_sum(modes, w, op)
        w_meas[xi] = _width(I, ax)
    # unit magnification 2f-2f: the incoherent-ish image reproduces the
    # source width; the coherent mode stays a (re-waisted) Gaussian of
    # the same w0 too — BOTH image at |m|=1, the classic check that the
    # imaging condition is coherence-independent...
    np.testing.assert_allclose(w_meas[50.0], w0, rtol=0.05)
    np.testing.assert_allclose(w_meas[0.15], w0, rtol=0.08)
