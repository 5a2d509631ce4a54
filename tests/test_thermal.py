"""Thermal modeling: each mechanism against its thin-lens closed form,
the combined opto-thermal coefficient, housing athermalization, and
differentiability in dT.

Thin-lens anchors (P = (n-1)(c1-c2)):
  index shift:   dP/dT = P * (dn/dT)/(n-1)
  part growth:   dP/dT = -P * a_g          (c -> c/(1+a dT))
  focus:         df/dT = -f * [(dn/dT)/(n-1) - a_g]
  housing:       the sensor gap grows f * a_h dT; athermal when
                 a_h = -[(dn/dT)/(n-1) - a_g].
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import SensorElement, SequentialScene, SingletLens
from raytracetorch_tpu.rays.ray import Rays
from raytracetorch_tpu.utils.glass import CATALOG
from raytracetorch_tpu.utils.thermal import (THERMAL,
                                             opto_thermal_coefficient,
                                             thermal_perturb)

N_D, F0 = 1.5168, 80.0
C0 = 1.0 / (2 * (N_D - 1) * F0)


def _scene():
    # nearly-thin singlet so the thin-lens thermal anchors hold to ~1%
    return SequentialScene([
        SingletLens(c1=C0, c2=-C0, d=8.0, t=0.3, ior_glass=N_D,
                    name='lens'),
        SensorElement(radius=10.0, translation=[0, 0, F0], name='s')])


def _crossing(sc, p, key, h=1.0):
    r = Rays.create(jnp.array([[h, 0.0, -10.0]]),
                    jnp.array([[0.0, 0.0, 1.0]]))
    out, _, _ = sc.simulate(p, r, key)
    return float(out.pz[0] - out.px[0] / out.dx[0] * out.dz[0])


def test_mechanisms_match_thin_lens(key):
    sc = _scene()
    p0 = sc.init_params()
    z0 = _crossing(sc, p0, key)
    dT = 50.0
    # pure index shift
    dndt = 5e-6
    p = thermal_perturb(p0, dT, glass_map={'lens': (dndt, 0.0)},
                        housing=(0.0, 0.0))
    df = _crossing(sc, p, key) - z0
    assert df == pytest.approx(-F0 * dndt / (N_D - 1) * dT, rel=2e-2)
    # pure part expansion
    a_g = 8e-6
    p = thermal_perturb(p0, dT, glass_map={'lens': (0.0, a_g)},
                        housing=(0.0, 0.0))
    df = _crossing(sc, p, key) - z0
    assert df == pytest.approx(F0 * a_g * dT, rel=2e-2)
    # combined = opto-thermal coefficient
    p = thermal_perturb(p0, dT, glass_map={'lens': (dndt, a_g)},
                        housing=(0.0, 0.0))
    df = _crossing(sc, p, key) - z0
    nu = dndt / (N_D - 1) - a_g
    assert df == pytest.approx(-F0 * nu * dT, rel=2e-2)


def test_housing_athermalization(key):
    """With a_h = -nu_glass the focus tracks the expanding sensor gap:
    the defocus at +60 K collapses ~100x vs an aluminum housing."""
    sc = _scene()
    p0 = sc.init_params()
    gm = {'lens': 'N-BK7'}
    nu = opto_thermal_coefficient('N-BK7', n_d=N_D)
    dT = 60.0

    def defocus(housing, dT_):
        p = thermal_perturb(p0, dT_, glass_map=gm, housing=housing)
        z_cross = _crossing(sc, p, key)
        z_sensor = float(p['s']['trans'][2])
        return z_cross - z_sensor

    # subtract the dT=0 baseline (thick-lens crossing != paraxial f)
    bad = defocus('AL-6061', dT) - defocus('AL-6061', 0.0)
    good = defocus((0.0, -nu), dT) - defocus((0.0, -nu), 0.0)
    # aluminum mismatch: gap grows 23.6e-6*f*dT while focus moves -nu*f*dT
    expect_bad = -(nu + 23.6e-6) * F0 * dT
    assert bad == pytest.approx(expect_bad, rel=0.05)
    assert abs(good) < abs(bad) / 100.0


def test_thermal_gradient(key):
    """jax.grad of the traced crossing w.r.t. dT equals -f*nu - the
    athermalization derivative, differentiable end-to-end."""
    sc = _scene()
    p0 = sc.init_params()
    dndt, a_g = 4e-6, 7e-6

    def cross(dT):
        p = thermal_perturb(p0, dT, glass_map={'lens': (dndt, a_g)},
                            housing=(0.0, 0.0))
        r = Rays.create(jnp.array([[1.0, 0.0, -10.0]]),
                        jnp.array([[0.0, 0.0, 1.0]]))
        out, _, _ = sc.simulate(p, r, key)
        return (out.pz[0] - out.px[0] / out.dx[0] * out.dz[0])

    g = float(jax.grad(cross)(jnp.float32(0.0)))
    nu = dndt / (N_D - 1) - a_g
    assert g == pytest.approx(-F0 * nu, rel=2e-2)


def test_catalog_consistency():
    for name in THERMAL:
        if name in ('AL-6061', 'TI-6AL4V', 'INVAR36', 'STEEL-304'):
            continue
        assert name in CATALOG, name
    # BK7's textbook value: nu ~ -5e-6 / K (slightly negative)
    nu = opto_thermal_coefficient('N-BK7')
    assert -7e-6 < nu < -3e-6
    with pytest.raises(KeyError):
        opto_thermal_coefficient('UNOBTANIUM')
