"""Tolerance sensitivity / allocation / yield (utils/sensitivity.py).

The torch reference's tolerancing machinery is per-ray pose noise only
(reference geom/transform.py:141-242); the sensitivity table, inverse
allocation and yield analysis are beyond-reference.  These tests pin
the batched (vmapped-stack) evaluation against direct per-axis merit
calls and the physics (symmetry of decenter sensitivities, despace =
defocus) against the merit's own validated behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CircularAperture, SequentialScene,
                               SingletLens, default_merit)
from raytracetorch_tpu.utils.sensitivity import (allocate_tolerances,
                                                 axis_labels,
                                                 perturbation_axes,
                                                 tolerance_sensitivity,
                                                 tolerance_yield)


def _scene():
    return SequentialScene([
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, name='lens'),
        CircularAperture(radius=6.0, translation=(0, 0, 2.5), name='stop'),
    ])


TOLS = {'lens': {'trans': [0.1, 0.1, 0.25],
                 'rot_vec': [5e-3, 5e-3, 0.0],
                 'c1': 2e-4}}


def _merit(scene, nominal):
    # fixed detector (despace/defocus must show up) and the ray grid
    # FROZEN at the nominal design (aim_params) — the tolerancing
    # configuration: perturbed as-built system, nominal aim, and the
    # only way the centered-only paraxial machinery accepts decentered
    # parameter sets
    loss, _ = default_merit(scene, fields=[0.0, 0.05], n_pupil=16,
                            image_z=101.5, aim_params=nominal)
    return loss


def test_axes_flattening():
    axes = perturbation_axes(TOLS)
    assert len(axes) == 6        # 3 trans + 2 tilt + c1 (rz = 0 skipped)
    labels = axis_labels(axes)
    assert 'lens.c1' in labels and 'lens.trans.z' in labels
    assert 'lens.rot_vec.z' not in labels
    with pytest.raises(ValueError):
        perturbation_axes({'lens': {'trans': [0.0, 0.0, 0.0]}})


def test_sensitivity_matches_direct_eval():
    # the 2K+1 stacked-vmap evaluation must equal direct loss() calls on
    # individually perturbed parameter pytrees
    scene = _scene()
    p = scene.init_params()
    loss = _merit(scene, p)
    rep = tolerance_sensitivity(loss, p, TOLS)
    axes = perturbation_axes(TOLS)
    assert np.isclose(rep.rms0, float(jnp.sqrt(loss(p))), rtol=1e-5)
    for k in (0, 2, 5):          # trans.x, trans.z, c1
        name, leaf, idx, lim = axes[k]
        p2 = {n: dict(v) for n, v in p.items()}
        if idx is None:
            p2[name][leaf] = p2[name][leaf] + lim
        else:
            p2[name][leaf] = p2[name][leaf].at[idx].add(lim)
        direct = float(jnp.sqrt(loss(p2)))
        assert np.isclose(rep.rms_plus[k], direct, rtol=1e-4), \
            (axis_labels(axes)[k], rep.rms_plus[k], direct)


def test_decenter_symmetry_and_despace():
    scene = _scene()
    p = scene.init_params()
    loss = _merit(scene, p)
    rep = tolerance_sensitivity(loss, p, TOLS)
    lab = rep.labels
    ix = lab.index('lens.trans.x')
    iz = lab.index('lens.trans.z')
    # rotationally-symmetric nominal: +x and -x decenters are identical
    assert np.isclose(rep.rms_plus[ix], rep.rms_minus[ix], rtol=1e-3)
    # symmetry-protected axes (decenter/tilt) can only DEGRADE a centered
    # nominal; c1/despace may improve it (the fixed detector is not at
    # the aberrated best focus) — that asymmetry is real physics
    for axis in ('lens.trans.x', 'lens.trans.y', 'lens.rot_vec.x',
                 'lens.rot_vec.y'):
        k = lab.index(axis)
        assert rep.rms_plus[k] >= rep.rms0 * (1 - 1e-3), axis
    # despace against a FIXED detector must defocus measurably (one sign
    # may refocus INTO the aberration-balanced sweet spot, so check the
    # worse sign)
    assert max(rep.rms_plus[iz], rep.rms_minus[iz]) > rep.rms0 * 1.05
    # the table renders
    assert 'RSS estimate' in rep.table()


def test_allocation_hits_budget():
    scene = _scene()
    p = scene.init_params()
    loss = _merit(scene, p)
    rep0 = tolerance_sensitivity(loss, p, TOLS)
    # tight budget (5% merit growth): shares small enough that most axes
    # stay below the grow-cap and must be genuinely solved for
    budget = rep0.rms0 * 1.05
    new_tols, rep = allocate_tolerances(loss, p, TOLS, budget, n_iter=4)
    target = (budget ** 2 - rep.rms0 ** 2) / len(rep.labels)
    contrib = rep.contribution
    t0 = np.array([a[3] for a in perturbation_axes(TOLS)])
    t_new = np.array([a[3] for a in perturbation_axes(new_tols)])
    capped = t_new >= t0 * 10.0 * 0.999   # hit grow_cap: share unreachable
    uncapped = ~capped
    assert np.sum(uncapped) >= 2
    # every un-capped axis lands within ~3x of the equal share
    for k, lab in enumerate(rep.labels):
        if uncapped[k]:
            assert 0.3 * target < contrib[k] < 3.0 * target, \
                (lab, contrib[k], target)
    # capped axes loosened by exactly the cap (insensitive axes relax)
    assert np.all(t_new[capped] > t0[capped] * 5.0)
    # structure preserved
    assert set(new_tols['lens']) == set(TOLS['lens'])
    assert np.asarray(new_tols['lens']['rot_vec'])[2] == 0.0


def test_yield_monotone_in_tolerance():
    scene = _scene()
    p = scene.init_params()
    loss = _merit(scene, p)
    rep = tolerance_sensitivity(loss, p, TOLS)
    budget = rep.rss * 1.1
    key = jax.random.PRNGKey(3)
    rms1, y1 = tolerance_yield(loss, p, TOLS, key, n_trials=64,
                               budget=budget)
    big = {'lens': {k: list(np.asarray(v) * 4.0) if np.ndim(v) else v * 4.0
                    for k, v in TOLS['lens'].items()}}
    rms4, y4 = tolerance_yield(loss, p, big, key, n_trials=64,
                               budget=budget)
    assert rms1.shape == (64,)
    assert np.all(np.isfinite(np.asarray(rms1)))
    assert y4 <= y1
    assert y1 > 0.5              # the RSS-estimate budget passes most builds
    with pytest.raises(ValueError):
        tolerance_yield(loss, p, TOLS, key, distribution='cauchy')


def test_focus_compensator_kills_despace():
    # COMPENSATED tolerancing: with a focus compensator (image plane
    # re-optimized per build), despace sensitivity must collapse -- a
    # z-shifted lens against an adjustable detector is the same system.
    scene = _scene()
    p = scene.init_params()

    def loss_c(params, c):
        loss, _ = default_merit(scene, fields=[0.0, 0.05], n_pupil=16,
                                image_z=101.5 + c[0], aim_params=p)
        return loss(params)

    tols_z = {'lens': {'trans': [0.0, 0.0, 0.25]}}
    loss0 = _merit(scene, p)
    rep_fix = tolerance_sensitivity(loss0, p, tols_z)
    rep_cmp = tolerance_sensitivity(loss_c, p, tols_z,
                                    comp0=jnp.zeros((1,)))
    dz_fix = max(rep_fix.rms_plus[0], rep_fix.rms_minus[0]) - rep_fix.rms0
    dz_cmp = max(rep_cmp.rms_plus[0], rep_cmp.rms_minus[0]) - rep_cmp.rms0
    assert dz_fix > 0.005                 # uncompensated: real defocus
    assert abs(dz_cmp) < dz_fix * 0.05    # compensated: ~gone
    # refocusing also improves the NOMINAL (the fixed plane was not the
    # aberrated best focus)
    assert rep_cmp.rms0 < rep_fix.rms0 * (1 + 1e-6)


def test_compensated_yield_not_worse():
    scene = _scene()
    p = scene.init_params()
    loss0 = _merit(scene, p)

    def loss_c(params, c):
        loss, _ = default_merit(scene, fields=[0.0, 0.05], n_pupil=16,
                                image_z=101.5 + c[0], aim_params=p)
        return loss(params)

    rep = tolerance_sensitivity(loss0, p, TOLS)
    budget = rep.rss
    key = jax.random.PRNGKey(7)
    _, y_fix = tolerance_yield(loss0, p, TOLS, key, n_trials=48,
                               budget=budget)
    _, y_cmp = tolerance_yield(loss_c, p, TOLS, key, n_trials=48,
                               budget=budget, comp0=jnp.zeros((1,)))
    assert y_cmp >= y_fix
