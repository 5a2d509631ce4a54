"""Zernike-sag surfaces: geom/zernike.py expansion + ZernikeLens.

No reference counterpart (the reference's most general surface is the
STUBBED even asphere, reference geom/complex.py:6-10).  Correctness
anchors: the exact monomial expansion must match direct polar
evaluation (and utils/wavefront's basis); a ZernikeLens must trace
bitwise-identically to the FreeformLens built from the same monomials;
defocus z4 must act as the sphere it is.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (FreeformLens, SensorElement, SequentialScene,
                               ZernikeLens)
from raytracetorch_tpu.config import element_config, instantiate_element
from raytracetorch_tpu.geom.zernike import (noll_nm, zernike_monomial_map,
                                            zernike_xy_poly)
from raytracetorch_tpu.rays.ray import Rays
from raytracetorch_tpu.utils.wavefront import _NOLL_NM, zernike_basis

N_GLASS = 1.5168


def test_noll_table_matches_wavefront():
    for j, nm in enumerate(_NOLL_NM, start=1):
        assert noll_nm(j) == nm


def test_monomial_expansion_matches_zernike_basis():
    # the cartesian expansion and the polar-form analysis basis are the
    # SAME functions — float-exact to accumulation order (through j=28:
    # zernike_basis follows noll_nm beyond its literal 15-term table)
    k = jax.random.PRNGKey(0)
    xy = jax.random.uniform(k, (2, 300), minval=-0.9, maxval=0.9)
    Z = np.asarray(zernike_basis(xy[0], xy[1], 1.0, n_terms=28))
    u, v = np.asarray(xy[0], np.float64), np.asarray(xy[1], np.float64)
    for j in range(2, 29):
        poly = zernike_xy_poly(*noll_nm(j))
        zm = sum(float(c) * u ** i * v ** kk for (i, kk), c in poly.items())
        assert np.abs(zm - Z[:, j - 1]).max() < 1e-5, j


def test_monomial_map_radius_scaling():
    # a coefficient is rim sag: Z4 at the rim of the norm radius = +1
    powers, M = zernike_monomial_map((4,), 5.0)
    sag_rim = sum(M[r][0] * 5.0 ** i * (1.0 if k == 0 else 0.0)
                  for r, (i, k) in enumerate(powers))
    assert abs(sag_rim - 1.0) < 1e-12


def _sensor(z=60.0, r=30.0):
    return SensorElement(radius=r, translation=[0, 0, z], name='s')


def _rand_rays(n, span, key=2, z0=-5.0):
    xy = jax.random.uniform(jax.random.PRNGKey(key), (2, n),
                            minval=-span, maxval=span)
    zero = jnp.zeros((n,))
    return Rays.from_components(
        (xy[0], xy[1], zero + z0), (zero, zero, jnp.ones((n,))),
        jnp.ones((n,)), jnp.zeros((n,), jnp.int32), zero)


def test_zernike_equals_equivalent_freeform():
    # same monomials through the same machinery -> identical trace
    # (terms chosen with no constant monomial: FreeformLens rightly
    # rejects piston, which z4/z11 expansions carry as their -1 term —
    # ZernikeLens keeps it, that's the vertex-referenced sag convention)
    terms = [(5, 2e-2), (6, -1.5e-2), (8, 3e-3), (9, -1e-3)]
    rn = 7.0
    zl = SequentialScene([
        ZernikeLens(c1=0.01, c2=-0.01, d=14.0, t=2.0, ior_glass=N_GLASS,
                    z1=terms, norm_radius=rn, name='l'), _sensor()])
    powers, M = zernike_monomial_map(tuple(j for j, _ in terms), rn)
    z = np.array([v for _, v in terms])
    xy = [(i, k, float(np.dot(M[r], z)))
          for r, (i, k) in enumerate(powers)]
    fl = SequentialScene([
        FreeformLens(c1=0.01, c2=-0.01, d=14.0, t=2.0, ior_glass=N_GLASS,
                     xy1=xy, name='l'), _sensor()])
    rays = _rand_rays(400, 5.0)
    k = jax.random.PRNGKey(0)
    oz, sz, _ = zl.simulate(zl.init_params(), rays, k)
    of, sf, _ = fl.simulate(fl.init_params(), rays, k)
    np.testing.assert_allclose(np.asarray(oz.px), np.asarray(of.px),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(oz.dy), np.asarray(of.dy),
                               atol=1e-7)


def test_defocus_term_is_a_sphere():
    # z4 = 2 rho^2 - 1: curvature-like sag c_eff = 4 z4 / R^2 at the
    # vertex -> thin-lens focal length 1 / (c_eff (n - 1)) for a plate
    # with one zernike face (paraxial regime, small rays)
    z4 = 0.05
    rn = 7.0
    c_eff = 4.0 * z4 / rn ** 2
    f_expect = 1.0 / (c_eff * (N_GLASS - 1.0))
    scene = SequentialScene([
        ZernikeLens(c1=0.0, c2=0.0, d=14.0, t=2.0, ior_glass=N_GLASS,
                    z1=[(4, z4)], norm_radius=rn, name='l'),
        _sensor(z=40.0)])
    rays = _rand_rays(64, 1.0)
    out, _, _ = scene.simulate(scene.init_params(), rays,
                               jax.random.PRNGKey(0))
    x, dx, dz, zp = (np.asarray(a) for a in (out.px, out.dx, out.dz,
                                             out.pz))
    sel = np.abs(x) > 0.2
    zc = zp + (-x / (dx / dz))
    assert np.allclose(zc[sel], f_expect, rtol=0.03), (
        zc[sel].mean(), f_expect)


def test_astig_term_splits_foci():
    # sag = z4 (2 rho^2 - 1) + z6 rho^2 cos 2t
    #     = (2 z4 + z6) x^2/R^2 + (2 z4 - z6) y^2/R^2 - z4
    # so an x-fan sees the x^2 coefficient only and vice versa
    z6 = 0.03
    rn = 7.0
    base = 0.008                     # 2 z4 / rn^2 target
    z4 = base * rn * rn / 2.0
    scene = SequentialScene([
        ZernikeLens(c1=0.0, c2=0.0, d=14.0, t=2.0, ior_glass=N_GLASS,
                    z1=[(4, z4), (6, z6)],
                    norm_radius=rn, name='l'), _sensor(z=300.0, r=100.0)])
    p = scene.init_params()
    k = jax.random.PRNGKey(0)

    def fan(axis):
        s = jnp.linspace(-1.0, 1.0, 9)
        zero = jnp.zeros((9,))
        x = s if axis == 'x' else zero
        y = s if axis == 'y' else zero
        return Rays.from_components(
            (x, y, zero - 5.0), (zero, zero, jnp.ones((9,))),
            jnp.ones((9,)), jnp.zeros((9,), jnp.int32), zero)

    ox, _, _ = scene.simulate(p, fan('x'), k)
    oy, _, _ = scene.simulate(p, fan('y'), k)
    fx = np.asarray(ox.pz - ox.px / (ox.dx / ox.dz))[[0, -1]].mean()
    fy = np.asarray(oy.pz - oy.py / (oy.dy / oy.dz))[[0, -1]].mean()
    cx = base + z6 / rn ** 2                    # x^2 sag coefficient
    cy = base - z6 / rn ** 2
    f_ex = 1.0 / (2.0 * cx * (N_GLASS - 1.0))
    f_ey = 1.0 / (2.0 * cy * (N_GLASS - 1.0))
    assert np.isclose(fx, f_ex, rtol=0.05), (fx, f_ex)
    assert np.isclose(fy, f_ey, rtol=0.05), (fy, f_ey)


def test_zernike_design_by_grad():
    # recover a known astigmatism: a cylinder-lens plate upstream, a
    # trainable z6 on the corrector — grad descent must find the value
    # that re-equalizes the x/y foci
    from raytracetorch_tpu import fit
    scene = SequentialScene([
        ZernikeLens(c1=0.0, c2=0.0, d=14.0, t=2.0, ior_glass=N_GLASS,
                    z1=[(4, 0.3), (6, 0.0)], z1_grad=True,
                    norm_radius=7.0, name='corr'),
        _sensor(z=80.0)])
    p = scene.init_params()
    key = jax.random.PRNGKey(0)
    rays = _rand_rays(512, 5.0)

    def loss(p):
        _, sens, _ = scene.simulate(p, rays, key)
        return sens.spot_rms(0)[0] ** 2

    l0 = float(loss(p))
    p2, _ = fit(loss, p, trainable=scene.trainable(), steps=250, lr=3e-3)
    assert float(loss(p2)) < l0 * 0.2, (l0, float(loss(p2)))
    g = jax.grad(loss)(p)['corr']['z1']
    assert bool(jnp.all(jnp.isfinite(g)))


def test_zernike_in_fused_kernel():
    scene = SequentialScene([
        ZernikeLens(c1=0.01, c2=-0.005, d=14.0, t=2.0, ior_glass=N_GLASS,
                    z1=[(4, 1e-2), (6, -8e-3), (8, 2e-3), (11, -5e-4)],
                    norm_radius=7.0, name='l'), _sensor()])
    p = scene.init_params()
    k = jax.random.PRNGKey(1)
    rays = _rand_rays(256, 3.0, key=5)
    o1, _, _ = scene.simulate(p, rays, k)
    o2, _, _ = scene.simulate_fused(p, rays, k, block_rows=4)
    np.testing.assert_allclose(np.asarray(o1.px), np.asarray(o2.px),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1.intensity),
                               np.asarray(o2.intensity), atol=1e-6)


def test_config_roundtrip_and_validation():
    el = ZernikeLens(c1=0.01, c2=-0.01, d=14.0, t=2.0, ior_glass=N_GLASS,
                     z1=[(4, 1e-3), (11, -2e-4)], z1_grad=True,
                     norm_radius=6.0, name='z')
    cfg = json.loads(json.dumps(element_config(el)))
    el2 = instantiate_element(cfg)
    assert type(el2) is ZernikeLens
    p2 = el2.init_params()
    assert list(np.asarray(p2['z1'])) == [1e-3, -2e-4]

    with pytest.raises(ValueError):
        ZernikeLens(c1=0.0, c2=0.0, d=10.0, t=2.0, ior_glass=1.5,
                    z1=[(1, 1e-3)])                 # piston
    with pytest.raises(ValueError):
        ZernikeLens(c1=0.0, c2=0.0, d=10.0, t=2.0, ior_glass=1.5,
                    z1=[(4, 1e-3), (4, 2e-3)])      # duplicate j
    with pytest.raises(ValueError):
        ZernikeLens(c1=0.0, c2=0.0, d=10.0, t=2.0, ior_glass=1.5,
                    z1=[(4, 1e-3)], norm_radius=-1.0)
