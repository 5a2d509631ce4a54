"""Default merit function (optim/merit.py): multi-field, polychromatic
RMS-spot residuals over an aimed pupil grid, feeding fit_lm / fit_lbfgs.

The torch reference's closest machinery is the per-bundle SpotSizeLoss
re-simulated in a Python loop (reference optim/goals.py:99-187); these
tests validate the generalization against this framework's own
independently-tested design loops (best-form singlet, achromat).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CircularAperture, DoubletLens,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.optim.fit import fit_lm
from raytracetorch_tpu.optim.merit import default_merit, spot_residuals

F_LINE, D_LINE, C_LINE = 0.48613, 0.5876, 0.65627


def _singlet_scene():
    """The reference's optimization lens (tests/test_optimize_singlet.py:
    29-49) plus a stop at its rear vertex."""
    return SequentialScene([
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, c1_grad=True, c2_grad=True,
                    name='lens'),
        CircularAperture(radius=8.0, translation=(0, 0, 2.5), name='stop'),
    ])


def test_residual_shape_and_weights():
    scene = _singlet_scene()
    p = scene.init_params()
    r = spot_residuals(scene, p, fields=[0.0, 0.05], n_pupil=16)
    assert r.shape == (2 * 1 * 16, 2)
    r2 = spot_residuals(scene, p, fields=[0.0, 0.05], n_pupil=16,
                        wavelengths=[F_LINE, C_LINE])
    assert r2.shape == (2 * 2 * 16, 2)
    # zero field weight silences that field's residual rows
    rz = spot_residuals(scene, p, fields=[0.0, 0.05], n_pupil=16,
                        field_weights=[1.0, 0.0]).reshape(2, 16, 2)
    assert float(jnp.max(jnp.abs(rz[1]))) == 0.0
    assert float(jnp.max(jnp.abs(rz[0]))) > 0.0


def test_centroid_reference_never_exceeds_chief():
    # mean-square about the centroid is the quadratic minimum, so the
    # centroid-referenced merit is <= the chief-referenced one.
    scene = _singlet_scene()
    p = scene.init_params()
    loss_cen, _ = default_merit(scene, fields=[0.0, 0.08], n_pupil=24,
                                reference='centroid')
    loss_chf, _ = default_merit(scene, fields=[0.0, 0.08], n_pupil=24,
                                reference='chief')
    a, b = float(loss_cen(p)), float(loss_chf(p))
    assert a <= b * (1 + 1e-6), (a, b)
    assert b > 0


def test_lm_reaches_best_form_singlet():
    # fit_lm on the on-axis default merit must find the best-form bend
    # (C1/C2 ~ -6 for n ~ 1.52) starting from a WRONGLY-bent lens (the
    # merit refocuses paraxially every call, so defocus is not a free
    # variable — only the bending carries signal).  Companion to the
    # hand-rolled loop in tests/test_optimize_singlet.py.
    scene = SequentialScene([
        SingletLens(c1=0.004, c2=-0.0155, d=25.4, t=4.0,
                    ior_glass=1.5168, c1_grad=True, c2_grad=True,
                    name='lens'),   # rear-heavy bend, same ~f
        CircularAperture(radius=8.0, translation=(0, 0, 2.5), name='stop'),
    ])
    p = scene.init_params()
    # design against a FIXED detector (image_z=): with the default
    # auto-refocus the cheapest descent direction is shrinking the
    # power, not bending — exactly why real merit functions pin the
    # image distance (or add an EFL operand).
    loss, resid = default_merit(scene, fields=[0.0], n_pupil=32,
                                image_z=101.5)
    l0 = float(loss(p))
    p2, hist = fit_lm(resid, p, trainable=scene.trainable(), steps=25)
    lf = float(loss(p2))
    assert lf < l0 * 0.05, f"LM failed: {l0} -> {lf}"
    ratio = float(p2['lens']['c1']) / float(p2['lens']['c2'])
    assert -7.5 < ratio < -4.5, f"ratio {ratio}"


def test_polychromatic_merit_designs_achromat():
    # Two-line merit on a crown/flint doublet: LM must cut the
    # polychromatic spot drastically (the achromat), and the result must
    # beat the best SINGLE-line-optimized design evaluated polychromatically.
    scene = SequentialScene([
        DoubletLens(c1=0.02, c2=-0.025, c3=-0.004, d=20.0, t1=4.0, t2=2.0,
                    ior_glass1=1.5168, ior_glass2=1.6727,
                    abbe_vd1=64.17, abbe_vd2=32.25,
                    c1_grad=True, c2_grad=True, c3_grad=True,
                    name='achromat'),
        CircularAperture(radius=6.0, translation=(0, 0, 4.0), name='stop'),
    ])
    p = scene.init_params()
    loss_poly, resid_poly = default_merit(
        scene, fields=[0.0], n_pupil=24, wavelengths=[F_LINE, C_LINE])
    _, resid_mono = default_merit(scene, fields=[0.0], n_pupil=24,
                                  wavelengths=[D_LINE])

    l0 = float(loss_poly(p))
    p_poly, _ = fit_lm(resid_poly, p, trainable=scene.trainable(),
                       steps=20)
    p_mono, _ = fit_lm(resid_mono, p, trainable=scene.trainable(),
                       steps=20)
    l_poly = float(loss_poly(p_poly))
    l_mono = float(loss_poly(p_mono))
    assert l_poly < l0 * 0.05, f"poly LM failed: {l0} -> {l_poly}"
    # chromatic correction: the two-line design must beat the one-line
    # design ON the two-line merit by a clear margin
    assert l_poly < l_mono * 0.8, (l_poly, l_mono)


def test_merit_gradient_finite():
    scene = _singlet_scene()
    p = scene.init_params()
    loss, _ = default_merit(scene, fields=[0.0, 0.06], n_pupil=16,
                            wavelengths=[F_LINE, C_LINE])
    g = jax.grad(loss)(p)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_real_aiming_passthrough():
    scene = _singlet_scene()
    p = scene.init_params()
    loss_p, _ = default_merit(scene, fields=[0.1], n_pupil=16)
    loss_r, _ = default_merit(scene, fields=[0.1], n_pupil=16,
                              aiming='real')
    a, b = float(loss_p(p)), float(loss_r(p))
    assert np.isfinite(a) and np.isfinite(b)
    # same system, slightly different pupil sampling — same scale
    assert 0.2 < a / b < 5.0


def test_bad_reference_raises():
    scene = _singlet_scene()
    p = scene.init_params()
    with pytest.raises(ValueError):
        spot_residuals(scene, p, fields=[0.0], reference='median')


# ---------------------------------------------------------------------------
# Wavefront (RMS OPD) metric
# ---------------------------------------------------------------------------

def test_opd_tilted_plane_wave_is_zero():
    # A tilted plane wave through a flat window reaches ANY reference
    # point with constant total OPL (parallel rays cross a plane plate
    # on identical paths): total = d.p0 + opl + t_close = const exactly.
    # Regression for the launch-phase sign — without the +d.p0
    # incoming-wavefront term the apparent OPD would be
    # ~tan(field) * pupil_diameter / lambda ~ thousands of waves.
    from raytracetorch_tpu.optim.merit import opd_residuals
    scene = SequentialScene([
        SingletLens(c1=0.0, c2=0.0, d=25.4, t=3.0, ior_glass=1.5168,
                    name='window'),
        CircularAperture(radius=8.0, translation=(0, 0, 5.0), name='stop'),
    ])
    p = scene.init_params()
    r = opd_residuals(scene, p, fields=[0.0, 0.3], n_pupil=32, image_z=20.0)
    rms_waves = float(jnp.sqrt(jnp.sum(r * r)))
    # f32 floor: ~ulp(25 lens units)/lambda ~ 0.01 waves; a sign error in
    # the launch-phase term would read ~8000 waves here.
    assert rms_waves < 0.05, rms_waves


def test_opd_matches_seidel_spherical():
    # On-axis singlet at the paraxial image plane: the wavefront error is
    # primary spherical W(rho) = W040 rho^4 (+ higher orders, small at
    # this aperture), and piston-removed RMS over the uniform pupil is
    # W040 * sqrt(E[rho^8] - E[rho^4]^2) = W040 * sqrt(4/45).
    from raytracetorch_tpu.optim.merit import opd_residuals
    from raytracetorch_tpu.utils.seidel import seidel
    scene = _singlet_scene()
    p = scene.init_params()
    ap = 5.0
    rep = seidel(scene, p, aperture=ap, field=0.0)
    w040_waves = float(rep.S_I) / 8.0 / (0.5876e-3)
    expect = abs(w040_waves) * np.sqrt(4.0 / 45.0)
    r = opd_residuals(scene, p, fields=[0.0], n_pupil=256, aperture=ap)
    rms = float(jnp.sqrt(jnp.sum(r * r)))
    assert expect > 0.05            # the check must not be vacuous
    assert abs(rms - expect) < 0.15 * expect, (rms, expect)


def test_opd_defocus_quadratic():
    # Shifting the evaluation plane off paraxial focus adds defocus
    # W020 rho^2, RMS = W020 * sqrt(1/12); W020 = dz * u_marginal^2 / 2.
    from raytracetorch_tpu.optim.merit import opd_residuals
    scene = _singlet_scene()
    p = scene.init_params()
    # paraxial image plane and marginal slope from the first-order report
    fo = scene.first_order(p) if hasattr(scene, 'first_order') else None
    base = opd_residuals(scene, p, fields=[0.0], n_pupil=128, aperture=3.0)
    rms0 = float(jnp.sqrt(jnp.sum(base * base)))
    out = {}
    for dz in (1.0, 2.0):
        # image_z = paraxial + dz: recompute paraxial z via seidel
        from raytracetorch_tpu.utils.seidel import seidel
        rep = seidel(scene, p, aperture=3.0, field=0.0)
        r = opd_residuals(scene, p, fields=[0.0], n_pupil=128,
                          aperture=3.0, image_z=float(rep.z_image) + dz)
        out[dz] = float(jnp.sqrt(jnp.sum(r * r)))
        u = abs(float(rep.u_img))
        w020_waves = dz * u * u / 2.0 / 0.5876e-3
        expect = w020_waves * np.sqrt(1.0 / 12.0)
        # defocus dominates the residual spherical at these dz
        assert abs(out[dz] - expect) < 0.25 * expect + rms0, (dz, out[dz],
                                                              expect)
    assert out[2.0] > 1.5 * out[1.0]


def test_wavefront_merit_designs_best_form():
    # LM on the wavefront merit finds the same best-form bending the
    # spot merit does (minimum-spherical bend ~ minimum-W040 bend).
    scene = SequentialScene([
        SingletLens(c1=0.004, c2=-0.0155, d=25.4, t=4.0,
                    ior_glass=1.5168, c1_grad=True, c2_grad=True,
                    name='lens'),
        CircularAperture(radius=8.0, translation=(0, 0, 2.5), name='stop'),
    ])
    p = scene.init_params()
    loss, resid = default_merit(scene, fields=[0.0], n_pupil=32,
                                metric='wavefront', image_z=101.5)
    l0 = float(loss(p))
    p2, _ = fit_lm(resid, p, trainable=scene.trainable(), steps=25)
    lf = float(loss(p2))
    assert lf < l0 * 0.05, f"LM failed: {l0} -> {lf}"
    ratio = float(p2['lens']['c1']) / float(p2['lens']['c2'])
    assert -7.5 < ratio < -4.5, f"ratio {ratio}"


def test_wavefront_merit_gradient_finite():
    scene = _singlet_scene()
    p = scene.init_params()
    loss, _ = default_merit(scene, fields=[0.0, 0.06], n_pupil=16,
                            metric='wavefront',
                            wavelengths=[F_LINE, C_LINE])
    g = jax.grad(loss)(p)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_bad_metric_raises():
    scene = _singlet_scene()
    with pytest.raises(ValueError):
        default_merit(scene, fields=[0.0], metric='strehl')
