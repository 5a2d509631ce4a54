"""Phase-diversity retrieval (utils/phase_retrieval.py).

Anchors: a known Zernike pupil OPD is rendered to a through-focus
stack with the SAME propagator the estimator differentiates through
(the estimation problem is then exactly solvable — the test checks the
optimizer actually solves it), recovery survives detector noise, and
the retrieval cross-checks against zernike_fit on a real ray-traced
pupil (the defocused-singlet pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu.utils.phase_retrieval import (phase_diversity,
                                                     zernike_pupil_basis)
from raytracetorch_tpu.utils.propagation import through_focus_psf

WL = 0.5e-3     # mm
FNO = 8.0
N = 32


def _pupil(n=N):
    ax = (jnp.arange(n) - (n - 1) / 2.0) / (n / 2.0)
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    return (r2 <= 1.0).astype(jnp.float32)


def _truth(n_terms=11):
    c = np.zeros(n_terms, np.float32)
    c[3] = 0.10 * WL       # defocus
    c[5] = -0.07 * WL      # astigmatism 0deg
    c[7] = 0.05 * WL       # coma y
    c[10] = 0.04 * WL      # primary spherical
    return jnp.asarray(c)


def _stack(c, amp, zs):
    Z = zernike_pupil_basis(N, c.shape[0])
    stack, _ = through_focus_psf(Z @ c, amp, WL, FNO, jnp.asarray(zs))
    return stack


# ~1 wave of defocus OPD between the end planes: W020 = z / (8 F#^2)
ZS = (-0.3, 0.0, 0.3)


def test_phase_diversity_recovers_zernikes():
    amp = _pupil()
    c_true = _truth()
    images = _stack(c_true, amp, ZS)
    c, loss, hist = phase_diversity(images, amp, WL, FNO, ZS,
                                    n_terms=11, steps=400)
    # exact forward model: every observable mode comes back to a
    # hundredth of a wave, and the fit residual collapses
    err = np.abs(np.asarray(c - c_true)) / WL
    assert err[3:].max() < 0.01, err
    assert loss < 1e-4 * float(hist[0])
    # piston pinned
    assert float(c[0]) == 0.0


def test_phase_diversity_with_noise():
    amp = _pupil()
    c_true = _truth()
    images = _stack(c_true, amp, ZS)
    key = jax.random.PRNGKey(7)
    noisy = images + 0.005 * float(images.max()) * jax.random.normal(
        key, images.shape)
    c, _, _ = phase_diversity(noisy, amp, WL, FNO, ZS, n_terms=11,
                              steps=400)
    err = np.abs(np.asarray(c - c_true)) / WL
    assert err[3:].max() < 0.03, err


def test_phase_diversity_matches_ray_zernike_fit():
    """End-to-end: defocus a singlet's sensor, ray-trace the pupil,
    render its through-focus images, retrieve — the estimate must agree
    with the direct zernike_fit of the traced OPD (the spherical term
    is the singlet's signature)."""
    from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                                   SequentialScene, SingletLens)
    from raytracetorch_tpu.utils.psf import pupil_from_trace
    from raytracetorch_tpu.utils.wavefront import zernike_basis

    sc = SequentialScene([
        SingletLens(c1=0.02, c2=-0.02, d=12.0, t=2.0, ior_glass=1.5,
                    name='lens'),
        SensorElement(radius=8.0, translation=[0, 0, 49.0], name='s')])
    p = sc.init_params()
    # r = 3.5 keeps the singlet's spherical term ~0.16 waves: cold-start
    # phase diversity is only convex-ish below ~lambda/2 of aberration
    # (at r = 5 the 0.65-wave SA parks adam in a wrapped local optimum —
    # real pipelines warm-start or multi-resolve; out of test scope)
    rays = CollimatedDisk.make(radius=3.5, translation=[0, 0, -5.0]) \
        .sample(jax.random.PRNGKey(0), 20000)
    out, _, aux = sc.simulate(p, rays, jax.random.PRNGKey(1),
                              track_opl=True)
    opd, amp = pupil_from_trace(rays, out, aux['opl'], 3.5, n=N)
    # the traced pupil in Zernike terms (piston/tilt excluded)
    ax = (np.arange(N) - (N - 1) / 2.0) / (N / 2.0)
    X, Y = np.meshgrid(ax, ax, indexing='xy')
    m = np.asarray(amp).ravel() > 0
    Z = np.asarray(zernike_basis(jnp.asarray(X.ravel()[m]),
                                 jnp.asarray(Y.ravel()[m]), 1.0, 22))
    o = np.asarray(opd).ravel()[m]
    c_fit, *_ = np.linalg.lstsq(Z, o, rcond=None)

    # rough working f-number is fine: the SAME value feeds render and
    # retrieval, so it cancels; ~1.5 waves of diversity defocus
    # (W020 = z / (8 F#^2)) keeps the end-plane fringes unaliased
    fno = 49.0 / (2 * 3.5)
    zs = (-0.3, 0.0, 0.3)
    images, _ = through_focus_psf(opd, amp, WL, fno, jnp.asarray(zs))
    c, _, _ = phase_diversity(images, amp, WL, fno, zs, n_terms=22,
                              steps=800)
    err = np.abs(np.asarray(c)[3:] - c_fit[3:]) / WL
    assert err.max() < 0.03, (err, c_fit / WL)


def test_multiscale_converges_beyond_cold_start_bound():
    """The wide-open (r=5) singlet carries ~0.65 waves of primary
    spherical — measured to park a COLD-start retrieval in a wrapped
    local optimum (max error ~0.4 waves; that measurement motivated the
    r=3.5 stop-down in the test above).  multiscale=True (vmapped
    (defocus, spherical) grid seed + coarse-to-fine adam) must crack
    the same problem."""
    from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                                   SequentialScene, SingletLens)
    from raytracetorch_tpu.utils.psf import pupil_from_trace
    from raytracetorch_tpu.utils.wavefront import zernike_basis

    sc = SequentialScene([
        SingletLens(c1=0.02, c2=-0.02, d=12.0, t=2.0, ior_glass=1.5,
                    name='lens'),
        SensorElement(radius=8.0, translation=[0, 0, 49.0], name='s')])
    p = sc.init_params()
    rays = CollimatedDisk.make(radius=5.0, translation=[0, 0, -5.0]) \
        .sample(jax.random.PRNGKey(0), 20000)
    out, _, aux = sc.simulate(p, rays, jax.random.PRNGKey(1),
                              track_opl=True)
    opd, amp = pupil_from_trace(rays, out, aux['opl'], 5.0, n=N)
    ax = (np.arange(N) - (N - 1) / 2.0) / (N / 2.0)
    X, Y = np.meshgrid(ax, ax, indexing='xy')
    m = np.asarray(amp).ravel() > 0
    Z = np.asarray(zernike_basis(jnp.asarray(X.ravel()[m]),
                                 jnp.asarray(Y.ravel()[m]), 1.0, 22))
    c_fit, *_ = np.linalg.lstsq(Z, np.asarray(opd).ravel()[m],
                                rcond=None)
    assert abs(c_fit[10]) > 0.5 * WL          # genuinely beyond the bound

    fno = 49.0 / (2 * 5.0)
    zs = (-0.1, 0.0, 0.1)                     # ~1.6 waves of diversity
    images, _ = through_focus_psf(opd, amp, WL, fno, jnp.asarray(zs))
    c, _, _ = phase_diversity(images, amp, WL, fno, zs, n_terms=22,
                              steps=800, multiscale=True)
    err = np.abs(np.asarray(c)[3:] - c_fit[3:]) / WL
    assert err.max() < 0.05, (err, c_fit / WL)
