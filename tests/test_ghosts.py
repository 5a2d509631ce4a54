"""Ghost (two-reflection stray light) analysis: utils/ghosts.py and the
REFLECT_W weighted-Fresnel-reflection physics kind.

The torch reference has no ghost analysis; the physics being composed is
its Fresnel functor (reference phys/std.py:148-203).  Energy checks are
closed-form: at normal incidence on an n=1.5 window, R = 0.04 exactly,
and a two-reflection ghost through the plane-parallel window carries
T * R * R * T with NO approximation (all incidences are normal).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CircularAperture, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.rays.ray import Rays
from raytracetorch_tpu.utils.ghosts import (ghost_pairs, ghost_report,
                                            ghost_trace)

R15 = ((1.0 - 1.5) / 2.5) ** 2          # 0.04
T15 = 1.0 - R15


def _axial_rays(n, z0=-5.0, r=0.0, key=None):
    if r > 0:
        k = jax.random.PRNGKey(0) if key is None else key
        xy = jax.random.uniform(k, (2, n), minval=-r, maxval=r)
        x, y = xy[0], xy[1]
    else:
        x = y = jnp.zeros((n,))
    z = jnp.full((n,), z0)
    zero = jnp.zeros((n,))
    return Rays.from_components(
        (x, y, z), (zero, zero, jnp.ones((n,))), jnp.ones((n,)),
        jnp.zeros((n,), jnp.int32), zero)


def _window():
    return SequentialScene([
        SingletLens(c1=0.0, c2=0.0, d=10., t=3., ior_glass=1.5,
                    name='win'),
        SensorElement(radius=8.0, translation=[0, 0, 10.0], name='sensor'),
    ])


def test_window_ghost_energy_exact():
    scene = _window()
    p = scene.init_params()
    rays = _axial_rays(500, r=2.0)
    out, sensors, _ = ghost_trace(scene, p, rays, jax.random.PRNGKey(0),
                                  (0, 1))
    flux = float(jnp.mean(out.intensity))
    assert np.isclose(flux, T15 * R15 * R15 * T15, rtol=1e-5)
    # the ghost propagates forward again and lands on the sensor
    assert float(jnp.min(out.dz)) > 0.99
    total = float(jnp.sum(sensors.total_weight(0)))
    assert np.isclose(total, flux * rays.n, rtol=1e-5)


def test_ghost_ideal_transmission():
    scene = _window()
    p = scene.init_params()
    rays = _axial_rays(100)
    out, _, _ = ghost_trace(scene, p, rays, jax.random.PRNGKey(0), (0, 1),
                            transmission='ideal')
    assert np.isclose(float(jnp.mean(out.intensity)), R15 * R15, rtol=1e-5)
    with pytest.raises(ValueError):
        ghost_trace(scene, p, rays, jax.random.PRNGKey(0), (0, 1),
                    transmission='lossless')


def test_miss_kills_ghost_path():
    # rays OUTSIDE the reflection surface's bound leave the ghost path
    # (they belong to the primary beam) — intensity must go to zero, not
    # sail on to the sensor
    scene = _window()
    p = scene.init_params()
    n = 64
    x = jnp.linspace(-9.0, 9.0, n)        # half outside the d=10 window
    zero = jnp.zeros((n,))
    rays = Rays.from_components(
        (x, zero, zero - 5.0), (zero, zero, jnp.ones((n,))),
        jnp.ones((n,)), jnp.zeros((n,), jnp.int32), zero)
    out, _, _ = ghost_trace(scene, p, rays, jax.random.PRNGKey(0), (0, 1))
    inside = np.abs(np.asarray(x)) <= 5.0   # the DISK bound is inclusive
    i_out = np.asarray(out.intensity)
    assert np.all(i_out[~inside] == 0.0)
    assert np.all(i_out[inside] > 0.0)


def _singlet():
    return SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10., t=3., ior_glass=1.5,
                    c1_grad=True, name='lens'),
        CircularAperture(radius=5.0, name='stop'),
        SensorElement(radius=8.0, translation=[0, 0, 19.322],
                      name='sensor'),
    ])


def test_report_ranks_and_masks():
    scene = _singlet()
    p = scene.init_params()
    rep = ghost_report(scene, p, aperture=3.0)
    assert rep.pairs == ghost_pairs(scene)
    # primary: two curved-face transmissions, near-normal incidence
    assert abs(rep.primary_flux - T15 * T15) < 0.002
    # the face-pair ghost is real; edge-row pairs never get hit and must
    # carry ZERO flux (the miss-kill semantics), not primary-beam flux
    k01 = rep.pairs.index((0, 1))
    assert rep.flux[k01] > 1e-4
    for k, pr in enumerate(rep.pairs):
        if k != k01:
            assert rep.flux[k] == 0.0, pr
    assert rep.ranked()[0] == k01
    assert 'primary' in rep.table()


def test_report_matches_static_trace():
    # the batched dense-path report flux must equal a direct static-path
    # ghost_trace of the same pair (bare Fresnel both ways)
    from raytracetorch_tpu.utils.ghosts import _probe_pencil
    scene = _singlet()
    p = scene.init_params()
    rep = ghost_report(scene, p, aperture=3.0, n_probe=16)
    px, py, pz = _probe_pencil(jnp.asarray(3.0), rep.z_det
                               - abs(rep.z_det) - 1.0, 16,
                               jnp.result_type(float))
    # reproduce the report's launch plane exactly
    z_start = min(0.0, rep.z_det) - max(abs(rep.z_det - 0.0), 1.0)
    pz = jnp.full((16,), z_start)
    zero = jnp.zeros((16,))
    rays = Rays.from_components(
        (px, py, pz), (zero, zero, jnp.ones((16,))), jnp.ones((16,)),
        jnp.zeros((16,), jnp.int32), zero)
    out, _, _ = ghost_trace(scene, p, rays, jax.random.PRNGKey(0), (0, 1))
    direct = float(jnp.sum(out.intensity)) / 16
    k01 = rep.pairs.index((0, 1))
    assert np.isclose(rep.flux[k01], direct, rtol=1e-5), \
        (rep.flux[k01], direct)


def test_ghost_flux_differentiable():
    scene = _singlet()

    def ghost_flux(p):
        rays = _axial_rays(32, r=2.0)
        out, _, _ = ghost_trace(scene, p, rays, jax.random.PRNGKey(0),
                                (0, 1))
        return jnp.mean(out.intensity)

    p = scene.init_params()
    g = jax.grad(ghost_flux)(p)
    gc = float(g['lens']['c1'])
    assert np.isfinite(gc) and gc != 0.0


def test_ghost_track_field_renormalized():
    # REFLECT_W under track_field: the field takes the reflection
    # amplitudes but is renormalized (power in the intensity, counted
    # once) — |E|^2 stays 1 through the whole ghost path
    scene = _window()
    p = scene.init_params()
    rays = _axial_rays(16)
    out, _, aux = ghost_trace(scene, p, rays, jax.random.PRNGKey(0),
                              (0, 1), track_field=True)
    assert np.allclose(np.asarray(aux['field_power']), 1.0, atol=1e-5)
    assert np.isclose(float(jnp.mean(out.intensity)),
                      T15 * R15 * R15 * T15, rtol=1e-5)


def test_report_mixed_scene_degrades_gracefully():
    """A telescope with a baffle (SCATTER) and a DOE still ghost-ranks
    its refractive subset (round-3 VERDICT weak #5): the incompatible
    rows are excluded with a warning + report.excluded metadata, pairs
    are reported in ORIGINAL row indices, and the refractive pair's
    metrics match the pure-scene report exactly."""
    import warnings

    from raytracetorch_tpu import DiffractiveLens, LambertianScatterer

    def scenes():
        win = SingletLens(c1=0.0, c2=0.0, d=10., t=3., ior_glass=1.5,
                          name='win')
        sens = SensorElement(radius=8.0, translation=[0, 0, 10.0],
                             name='sensor')
        pure = SequentialScene([win, sens])
        mixed = SequentialScene([
            LambertianScatterer(radius=12.0, albedo=0.3,
                                translation=[0, 0, -3.0], name='baffle'),
            win,
            DiffractiveLens(radius=8.0, f=200.0,
                            translation=[0, 0, 5.0], name='doe'),
            sens])
        return pure, mixed

    pure, mixed = scenes()
    rep_pure = ghost_report(pure, pure.init_params(), aperture=2.0)
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter('always')
        rep = ghost_report(mixed, mixed.init_params(), aperture=2.0)
    assert any('specular/refractive subset' in str(w.message)
               for w in wlist)
    # excluded metadata names the baffle (SCATTER) and DOE rows at their
    # ORIGINAL scene row indices
    from raytracetorch_tpu.constants import PhysKind
    metas = mixed.static_meta()
    expect_excl = [(k, PhysKind(m.ph).name) for k, m in enumerate(metas)
                   if m.ph in (PhysKind.SCATTER, PhysKind.DOE)]
    assert [(e[0], e[1]) for e in rep.excluded] == expect_excl
    assert len(expect_excl) == 2
    # pairs in ORIGINAL indices: all pairs over the refracting rows
    refr = [k for k, m in enumerate(metas)
            if m.ph in (PhysKind.SNELL, PhysKind.FRESNEL,
                        PhysKind.FRESNEL_W)]
    expect_pairs = [(i, j) for a, j in enumerate(refr) for i in refr[:a]]
    assert sorted(rep.pairs) == sorted(expect_pairs)
    np.testing.assert_allclose(rep.flux, rep_pure.flux, rtol=1e-6)
    np.testing.assert_allclose(rep.irradiance, rep_pure.irradiance,
                               rtol=1e-6)
    assert rep_pure.excluded == []
    # the reported pair feeds ghost_trace directly (full fidelity path)
    out, _, _ = ghost_trace(mixed, mixed.init_params(),
                            _axial_rays(64, r=2.0), jax.random.PRNGKey(0),
                            rep.pairs[0])
    assert np.isfinite(np.asarray(out.intensity)).all()
