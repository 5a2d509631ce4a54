"""Thermal analysis: thermo-optic (dn/dT) + expansion (CTE) modeling.

Beyond the reference (no thermal modeling of any kind): a uniform
temperature change dT perturbs a design three ways —

  1. glass index shifts:     n -> n + (dn/dT) dT
  2. glass parts expand:     radii R -> R (1 + a_g dT)  (c -> c/(1+..)),
                             center thicknesses t -> t (1 + a_g dT)
  3. the housing expands:    air gaps / element z positions scale by
                             (1 + a_h dT) about the datum z = 0

:func:`thermal_perturb` applies all three to a params pytree and is
DIFFERENTIABLE IN dT, so ``jax.grad(focus_metric)(dT)`` is the
athermalization derivative and a housing CTE (or a glass choice) can
be solved for directly (tests/test_thermal.py drives the traced focus
shift onto the thin-lens opto-thermal coefficient

    dP/dT = P * ( (dn/dT)/(n-1) - a_g )

and athermalizes a singlet against its housing).

``THERMAL`` holds nominal room-temperature catalog constants
(absolute dn/dT around the d line and CTE -30/+70C, both 1/K) for
common glasses — representative Schott/vendor datasheet values, good
for system-level athermal design studies.
"""

from __future__ import annotations

import jax.numpy as jnp

# name: (dn/dT absolute ~d-line [1/K], CTE -30/+70C [1/K])
THERMAL = {
    'N-BK7': (1.1e-6, 7.1e-6),
    'N-K5': (1.5e-6, 8.2e-6),
    'N-FK5': (-1.4e-6, 9.2e-6),
    'N-FK51A': (-6.5e-6, 12.7e-6),
    'N-PK52A': (-6.9e-6, 12.9e-6),
    'N-BAK4': (2.3e-6, 7.0e-6),
    'N-SK16': (1.5e-6, 6.3e-6),
    'N-BAF10': (3.5e-6, 6.2e-6),
    'N-LAK8': (3.1e-6, 5.6e-6),
    'N-LASF9': (5.0e-6, 7.4e-6),
    'N-F2': (2.5e-6, 7.8e-6),
    'F2': (4.4e-6, 8.2e-6),
    'SF6': (7.4e-6, 8.1e-6),
    'SF11': (8.8e-6, 6.1e-6),
    'N-SF6': (2.5e-6, 9.0e-6),
    'N-SF57': (3.7e-6, 8.5e-6),
    'FUSED-SILICA': (9.6e-6, 0.55e-6),
    'CAF2': (-10.4e-6, 18.7e-6),
    'MGF2': (1.1e-6, 13.7e-6),
    'SAPPHIRE': (13.0e-6, 5.3e-6),
    # housings
    'AL-6061': (0.0, 23.6e-6),
    'TI-6AL4V': (0.0, 8.6e-6),
    'INVAR36': (0.0, 1.3e-6),
    'STEEL-304': (0.0, 17.3e-6),
}

_CURV_KEYS = tuple(f'c{i}' for i in range(1, 7))
_THICK_KEYS = ('t', 't1', 't2', 't3')


def _coeffs(material):
    if isinstance(material, str):
        return THERMAL[material.upper()]
    dndt, cte = material
    return float(dndt), float(cte)


def thermal_perturb(params, dT, glass_map=None, housing='AL-6061',
                    ior_key='ior_glass'):
    """Params pytree at temperature T0 + dT.

    ``glass_map``: {element_name: glass-name | (dn/dT, CTE)} — elements
    listed get index + part-expansion perturbation on their curvature
    (c1..c6), thickness (t, t1..t3) and ``ior_glass`` leaves; mirrors
    can be listed with a substrate-only entry like ('', CTE) or a
    glass name (dn/dT then simply unused if they carry no ior).
    ``housing``: name or (dndt, CTE) — scales every element's
    translation about the z = 0 datum (spacer stack).  ``dT`` may be a
    traced scalar: everything is differentiable in it.
    """
    dT = jnp.asarray(dT)
    _, a_h = _coeffs(housing)
    grow_h = 1.0 + a_h * dT
    out = {}
    for name, p in params.items():
        q = dict(p)
        if 'trans' in q:
            q['trans'] = q['trans'] * grow_h
        gm = (glass_map or {}).get(name)
        if gm is not None:
            dndt, a_g = _coeffs(gm)
            grow_g = 1.0 + a_g * dT
            for k in _CURV_KEYS:
                if k in q:
                    q[k] = q[k] / grow_g
            for k in _THICK_KEYS:
                if k in q:
                    q[k] = q[k] * grow_g
            if ior_key in q:
                q[ior_key] = q[ior_key] + dndt * dT
        out[name] = q
    return out


def opto_thermal_coefficient(glass, n_d=None):
    """Thin-lens normalized power drift (1/P) dP/dT =
    (dn/dT)/(n-1) - a_g for a named glass (n_d from the catalog unless
    given) — the textbook athermal-design constant."""
    dndt, a_g = _coeffs(glass)
    if n_d is None:
        from .glass import CATALOG
        n_d = CATALOG[glass.upper()][0]
    return dndt / (n_d - 1.0) - a_g
