"""Differentiable wave-domain design (round-4 VERDICT ask #4): the
optim/wave_goals.py merits — encircled energy / peak — with jax.grad
flowing end-to-end through wave_trace into lens curvatures and phase-
plate pixel maps, a grad-vs-FD agreement sweep (documenting the safe
eps window), and a convergence test that LEARNS an optic against a wave
metric.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (PhaseGridPlate, SensorElement,
                               SequentialScene, SingletLens, fit,
                               wave_encircled_energy, wave_encircled_loss,
                               wave_peak_loss)

WL = 0.5876e-3


def _gauss(n, dx, w0):
    ax = (jnp.arange(n) - n // 2) * dx
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    return jnp.exp(-r2 / w0 ** 2), jnp.zeros((n, n), jnp.float32)


def test_wave_encircled_energy_gaussian_analytic():
    """Hard-edge bucket on a Gaussian: EE(r) = 1 - exp(-2 r^2 / w0^2)
    (intensity waist w0/sqrt(2) for an amplitude waist w0)."""
    n, dx, w0 = 512, 4e-3, 0.3
    re, im = _gauss(n, dx, w0)
    for r in (0.15, 0.3, 0.6):
        ee = float(wave_encircled_energy(re, im, dx, r, soft=0.0))
        ana = 1.0 - np.exp(-2.0 * r ** 2 / w0 ** 2)
        np.testing.assert_allclose(ee, ana, atol=0.01)
    # soft edge converges to the hard value well inside/outside
    ee_s = float(wave_encircled_energy(re, im, dx, 0.6, soft=2.0))
    np.testing.assert_allclose(ee_s, 1.0 - np.exp(-2.0 * 0.36 / w0 ** 2),
                               atol=0.02)
    # annulus == disk(out) - disk(in)
    eo = float(wave_encircled_energy(re, im, dx, 0.3, soft=0.0))
    ei = float(wave_encircled_energy(re, im, dx, 0.15, soft=0.0))
    ea = float(wave_encircled_energy(re, im, dx, 0.0, soft=0.0,
                                annulus=(0.15, 0.3)))
    np.testing.assert_allclose(ea, eo - ei, atol=1e-6)


def _singlet(c1):
    return SequentialScene([
        SingletLens(c1=c1, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    c1_grad=True, name='lens'),
        SensorElement(radius=6.0, translation=[0, 0, 20.5], name='s')])


def test_wave_loss_grad_vs_fd_sweep():
    """grad-vs-FD on d(encircled loss)/d(c1) of a singlet near focus.

    The VERDICT-requested eps sweep: the encircled-energy merit (bucket
    ~4 Airy radii, soft edge) is smooth enough that central differences
    agree to ~1e-2 relative over eps in [1e-5, 1e-4] — far tamer than
    single-pixel functionals (which need eps ~5e-6, see the GRIN
    near-focus notes).  We assert the BEST agreement in the window and
    that at least two eps values agree, guarding against a lucky hit.
    """
    n, dx = 128, 0.012
    re, im = _gauss(n, dx, 0.5)

    def loss_of(c1):
        sc = _singlet(0.05)
        p = sc.init_params()
        p = jax.tree_util.tree_map(lambda x: x, p)
        p['lens']['c1'] = jnp.asarray(c1)
        return wave_encircled_loss(sc, p, re, im, dx, WL, z0=-1.0,
                                   radius=0.08, soft=2.0)

    c0 = 0.05
    g = float(jax.grad(loss_of)(jnp.asarray(c0)))
    assert np.isfinite(g) and abs(g) > 1e-3
    rels = []
    for eps in (1e-4, 3e-5, 1e-5):
        fd = (float(loss_of(c0 + eps)) - float(loss_of(c0 - eps))) \
            / (2 * eps)
        rels.append(abs(fd - g) / max(abs(g), 1e-12))
    assert min(rels) < 2e-2, (g, rels)
    assert sorted(rels)[1] < 5e-2, (g, rels)


def test_peak_loss_grad_finite():
    """The sharper peak merit also differentiates (finite, nonzero)."""
    n, dx = 128, 0.012
    re, im = _gauss(n, dx, 0.5)

    def loss_of(p):
        sc = _singlet(0.05)
        return wave_peak_loss(sc, p, re, im, dx, WL, z0=-1.0)

    sc = _singlet(0.05)
    g = jax.grad(loss_of)(sc.init_params())
    v = float(g['lens']['c1'])
    assert np.isfinite(v) and v != 0.0


def test_reoptimize_plate_against_wave_metric():
    """Convergence (the VERDICT done-criterion): RE-optimize a pixelated
    phase plate — example 28's design surface — against the WAVE
    encircled-energy merit.  Start from an aberrated design (the ideal
    f = 200 Fresnel-lens map plus 1.0 r^2 defocus + 0.5 astigmatism
    cycles of error); 200 adam steps recover the ideal map's merit
    exactly and the map itself up to the mod-1 phase equivalence.

    The wave screen sees the cycle map only MOD 1 (e^{i 2 pi m phi}),
    so (a) a cold start converges to a wrapped ZONE-PLATE local optimum
    — measured 0.237 vs the ideal map's 0.125, which is why this test
    polishes an existing design like the VERDICT ask says (the example
    does the cold start with the ray proxy first), and (b) map recovery
    is asserted by the launch-power-weighted PHASOR correlation
    |<e^{i 2 pi (phi - phi_ideal)}>| — piston-free and wrap-aware — not
    by an unwrapped least-squares fit."""
    L = 200.0
    n, dx = 128, 0.04
    re, im = _gauss(n, dx, 0.55)
    H = 24
    axp = -1.2 + 2.4 * np.arange(H) / (H - 1)     # corner-anchored grid
    r2p = axp[None, :] ** 2 + axp[:, None] ** 2
    ideal_map = (-1.0 / (2.0 * L * WL)) * r2p
    pert = (ideal_map + 1.0 * r2p
            + 0.5 * (axp[None, :] ** 2 - axp[:, None] ** 2))

    def mkscene(init):
        return SequentialScene([
            PhaseGridPlate(half_x=1.2, half_y=1.2, shape=(H, H),
                           init=np.asarray(init, np.float32),
                           name='plate'),
            SensorElement(radius=2.0, translation=[0, 0, L], name='det')])

    def mkloss(sc):
        return lambda p: wave_encircled_loss(sc, p, re, im, dx, WL,
                                             z0=-1.0, radius=0.2,
                                             soft=2.0)

    sci = mkscene(ideal_map)
    l_ideal = float(mkloss(sci)(sci.init_params()))
    scp = mkscene(pert)
    loss = mkloss(scp)
    p0 = scp.init_params()
    l0 = float(loss(p0))
    assert l0 > l_ideal + 0.08         # the perturbation really hurts
    p1, hist = fit(loss, p0, trainable=scp.trainable(), steps=200,
                   lr=0.02)
    l1 = float(hist[-1])
    assert l1 < l_ideal + 0.005, (l_ideal, l0, l1)

    wgt = np.exp(-2.0 * r2p / 0.55 ** 2)
    def corr(m):
        ph = np.exp(2j * np.pi * (np.asarray(m) - ideal_map))
        return abs((ph * wgt).sum()) / wgt.sum()
    assert corr(pert) < 0.8            # started genuinely far
    assert corr(p1['plate']['grid']) > 0.99
