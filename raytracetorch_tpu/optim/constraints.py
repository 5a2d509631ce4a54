"""Log-barrier manufacturability constraints (reference
``optim/constraints.py``): differentiable penalties on surface spacings,
inter-element gaps, and total system length, expressed on each element's
``optical_zs(params)`` list."""

from __future__ import annotations

import jax.numpy as jnp


def log_barrier_lb(x, lb):
    """-log(x - lb): penalises x -> lb from above (constraints.py:10-12)."""
    return -jnp.log(x - lb)


def log_barrier_ub(x, ub):
    """-log(ub - x): penalises x -> ub from below (constraints.py:15-17)."""
    return -jnp.log(ub - x)


def log_barrier(x, lb, ub):
    """Two-sided barrier for lb < x < ub (constraints.py:20-22)."""
    return -jnp.log(x - lb) - jnp.log(ub - x)


def _zs(scene, params):
    return [el.optical_zs(params[el.name]) for el in scene.elements]


def thickness_constraint(scene, params, t_min, t_max=None, weight=1.0):
    """Barrier on consecutive intra-element surface spacings (reference
    constraints.py:62-106)."""
    terms = []
    for z_list in _zs(scene, params):
        for i in range(len(z_list) - 1):
            t = z_list[i + 1] - z_list[i]
            if t_max is not None:
                terms.append(log_barrier(t, t_min, t_max))
            else:
                terms.append(log_barrier_lb(t, t_min))
    if not terms:
        return jnp.zeros(())
    return weight * sum(terms)


def spacing_constraint(scene, params, d_min, weight=1.0):
    """Barrier on inter-element air gaps (reference constraints.py:109-140)."""
    z_lists = _zs(scene, params)
    terms = []
    for i in range(len(z_lists) - 1):
        gap = z_lists[i + 1][0] - z_lists[i][-1]
        terms.append(log_barrier_lb(gap, d_min))
    if not terms:
        return jnp.zeros(())
    return weight * sum(terms)


def system_length_constraint(scene, params, l_max, weight=1.0):
    """Barrier on total first-to-last optical length (reference
    constraints.py:143-168)."""
    z_lists = _zs(scene, params)
    length = z_lists[-1][-1] - z_lists[0][0]
    return weight * log_barrier_ub(length, l_max)
