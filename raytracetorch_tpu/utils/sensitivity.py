"""Tolerance sensitivity analysis, inverse tolerancing and yield.

The classic tolerancing workflow on top of ANY scalar merit (typically
``optim.merit.default_merit``'s loss — sum of squared residuals, so
``sqrt(loss)`` is an RMS in lens units or waves).  Build the merit with
``aim_params=<nominal params>`` so the pupil grid is FROZEN at the
nominal design: that is the tolerancing configuration (the as-built
perturbed system is probed by the nominal rays, with no implicit
re-aiming compensation), and it is what lets the centered-only paraxial
aim accept decentered/tilted parameter sets at all::

    params = scene.init_params()
    loss, _ = default_merit(scene, fields=[0.0, 0.07], image_z=101.5,
                            aim_params=params)

- :func:`tolerance_sensitivity` — perturb each tolerance axis to its
  limit (both signs) and report the merit change per axis: the
  sensitivity table a tolerancing run starts from.
- :func:`allocate_tolerances` — INVERSE tolerancing: scale each axis's
  limit so the axes contribute equally to an as-built merit budget
  (equal-contribution RSS allocation, secant-refined on real traces).
- :func:`tolerance_yield` — Monte-Carlo as-built merit distribution and
  the fraction of builds meeting the budget.

TPU-first: there is never a Python loop of traces.  All K axes (or all
T Monte-Carlo trials) are evaluated in ONE vmapped merit call — the
parameter pytree gains a leading batch axis and the whole family of
perturbed systems traces as one program (the same stacked-leaf
technique as optim/multiconfig.py).  The torch reference's closest
machinery is ``RayTransformNoisy`` (reference geom/transform.py:
141-242), which jitters poses per ray but has no sensitivity table,
no allocation, and no yield analysis.

Tolerance specs mirror the parameter pytree::

    tols = {
        'lens':   {'trans': [0.05, 0.05, 0.02],      # decenter / despace
                   'rot_vec': [2e-3, 2e-3, 0.0],     # tilt (rad)
                   'c1': 1e-4},                      # curvature error
        'sensor': {'trans': [0.0, 0.0, 0.1]},
    }

Vector leaves give per-component limits; 0 entries are skipped.  Any
scalar leaf of the element's params (curvature, thickness, index, ...)
can carry a tolerance.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_COMP = 'xyz'


def perturbation_axes(tols):
    """Flatten a tolerance spec into [(element, leaf, component-index or
    None, limit)] axes (one per nonzero entry), with stable ordering."""
    axes = []
    for name in sorted(tols):
        for leaf in sorted(tols[name]):
            spec = tols[name][leaf]
            arr = np.atleast_1d(np.asarray(spec, np.float64))
            if arr.shape == (1,) and np.ndim(spec) == 0:
                if arr[0] != 0.0:
                    axes.append((name, leaf, None, float(arr[0])))
            else:
                for i, v in enumerate(arr):
                    if v != 0.0:
                        axes.append((name, leaf, i, float(v)))
    if not axes:
        raise ValueError("tolerance spec has no nonzero entries")
    return axes


def axis_labels(axes):
    """Human-readable axis names: 'lens.trans.x', 'lens.c1', ..."""
    return [f"{n}.{leaf}" + ('' if i is None else f".{_COMP[i] if i < 3 else i}")
            for n, leaf, i, _ in axes]


def _stacked_perturbed(params, axes, deltas):
    """Parameter pytree with a leading [B] batch axis; row b applies
    ``deltas[b, k]`` to axis k.  ``deltas`` is [B, K] (one-hot rows give
    single-axis perturbations; dense rows give Monte-Carlo trials)."""
    deltas = jnp.asarray(deltas)
    B = deltas.shape[0]

    def broad(leaf):
        leaf = jnp.asarray(leaf)
        return jnp.broadcast_to(leaf, (B,) + leaf.shape)

    stacked = jax.tree_util.tree_map(broad, params)
    # group axes by (element, leaf) so each leaf is updated once
    by_leaf = {}
    for k, (name, leaf, idx, _) in enumerate(axes):
        by_leaf.setdefault((name, leaf), []).append((k, idx))
    out = {n: dict(v) for n, v in stacked.items()}
    for (name, leaf), ks in by_leaf.items():
        arr = out[name][leaf]
        for k, idx in ks:
            if idx is None:
                arr = arr + deltas[:, k].reshape((B,) + (1,) * (arr.ndim - 1))
            else:
                arr = arr.at[:, idx].add(deltas[:, k])
        out[name][leaf] = arr
    return out


@dataclasses.dataclass
class SensitivityReport:
    """Per-axis merit sensitivities (host-side table).

    ``rms0`` is the nominal sqrt(merit); ``rms_plus``/``rms_minus`` the
    as-perturbed values at +limit/-limit; ``contribution`` the worst-sign
    quadrature contribution max(rms±² - rms0², 0) each axis adds to the
    as-built merit square; ``rss`` the equal-probability estimate
    sqrt(rms0² + Σ contribution/3) for uniform tolerances (E[t²] = L²/3).
    """

    labels: list
    limits: np.ndarray
    rms0: float
    rms_plus: np.ndarray
    rms_minus: np.ndarray

    @property
    def contribution(self):
        worst = np.maximum(self.rms_plus, self.rms_minus)
        return np.maximum(worst ** 2 - self.rms0 ** 2, 0.0)

    @property
    def rss(self):
        return float(np.sqrt(self.rms0 ** 2 + np.sum(self.contribution) / 3.0))

    def table(self):
        rows = [f"{'axis':<22}{'limit':>12}{'rms(+)':>12}{'rms(-)':>12}"
                f"{'dM^2':>12}"]
        rows.append('-' * len(rows[0]))
        for i, lab in enumerate(self.labels):
            rows.append(f"{lab:<22}{self.limits[i]:>12.4g}"
                        f"{self.rms_plus[i]:>12.5g}"
                        f"{self.rms_minus[i]:>12.5g}"
                        f"{self.contribution[i]:>12.4g}")
        rows.append(f"nominal rms {self.rms0:.5g}   RSS estimate "
                    f"{self.rss:.5g}")
        return '\n'.join(rows)


def _batched_rms(loss_fn, params, axes, deltas, jit=True, comp0=None,
                 comp_iters=2, comp_scale=1.0):
    """sqrt(loss) for every row of ``deltas`` [B, K] in one vmapped call.

    With ``comp0`` (a [C] vector of initial compensator values),
    ``loss_fn(params, c)`` is minimized over ``c`` PER ROW before the
    rms is read — the as-built system is evaluated AFTER its
    compensators (focus, image distance, a spacing) are re-optimized,
    which is how real tolerancing is run.  The minimizer is a
    DERIVATIVE-FREE coordinate parabolic search (probe ±comp_scale per
    axis, jump to the fitted vertex): the classic focus compensator is
    exactly quadratic in the plane position (ray landing points are
    linear in z) so the first vertex IS the minimum; ``comp_iters``
    (default 2) halves the probe each pass for mildly non-quadratic
    compensators.  No AD through the compensator loop — second
    derivatives of a full trace trip XLA:CPU's jvp-fusion pathology
    (CLAUDE.md), and a quadratic fit needs none.  Non-convex probes
    (concave parabola) keep the previous value."""
    if comp0 is None:
        def batch(d):
            p = _stacked_perturbed(params, axes, d)
            return jnp.sqrt(jax.vmap(loss_fn)(p))
    else:
        c0 = jnp.asarray(comp0, jnp.result_type(float)).reshape(-1)
        C = c0.shape[0]
        h0 = jnp.broadcast_to(
            jnp.asarray(comp_scale, c0.dtype).reshape(-1), (C,))

        def one(p):
            def f(c):
                return loss_fn(p, c)

            def step(carry, _):
                c, h = carry
                f0 = f(c)
                for j in range(C):          # static unroll, C is tiny
                    fp = f(c.at[j].add(h[j]))
                    fm = f(c.at[j].add(-h[j]))
                    denom = fp - 2.0 * f0 + fm
                    ok = denom > 1e-30
                    dcj = jnp.where(
                        ok, 0.5 * h[j] * (fm - fp)
                        / jnp.where(ok, denom, 1.0), 0.0)
                    # bound the extrapolation: a nearly-flat parabola
                    # must not fling the compensator away
                    dcj = jnp.clip(dcj, -8.0 * h[j], 8.0 * h[j])
                    c = c.at[j].add(dcj)
                    f0 = f(c)
                return (c, h * 0.5), None

            (c, _), _ = jax.lax.scan(step, (c0, h0), None,
                                     length=comp_iters)
            return jnp.sqrt(f(c))

        def batch(d):
            p = _stacked_perturbed(params, axes, d)
            return jax.vmap(one)(p)
    if jit:
        batch = jax.jit(batch)
    return batch(jnp.asarray(deltas))


def tolerance_sensitivity(loss_fn, params, tols, jit=True, comp0=None,
                          comp_iters=2, comp_scale=1.0):
    """Per-axis merit change at each tolerance limit (both signs).

    ``loss_fn(params) -> scalar`` (e.g. from ``default_merit``).  All
    2K+1 perturbed systems — +limit and -limit per axis plus the nominal
    — trace in ONE vmapped call.  Returns a :class:`SensitivityReport`.

    ``comp0`` switches on COMPENSATED tolerancing: ``loss_fn(params, c)``
    is then re-minimized over the compensator vector ``c`` (starting at
    ``comp0``) for every perturbed system before its sensitivity is
    read — e.g. ``lambda p, c: spot_loss(p, image_z=z0 + c[0])`` models
    a focus adjustment at test.  Sensitivities of compensatable
    perturbations (despace, curvature error) drop accordingly.
    """
    axes = perturbation_axes(tols)
    K = len(axes)
    limits = np.array([a[3] for a in axes])
    deltas = np.zeros((2 * K + 1, K))
    deltas[np.arange(K), np.arange(K)] = limits
    deltas[K + np.arange(K), np.arange(K)] = -limits
    rms = np.asarray(_batched_rms(loss_fn, params, axes, deltas, jit,
                                  comp0, comp_iters, comp_scale))
    return SensitivityReport(labels=axis_labels(axes), limits=limits,
                             rms0=float(rms[-1]),
                             rms_plus=rms[:K], rms_minus=rms[K:2 * K])


def allocate_tolerances(loss_fn, params, tols, budget, n_iter=4,
                        grow_cap=10.0, jit=True, comp0=None,
                        comp_iters=2, comp_scale=1.0):
    """Inverse tolerancing: rescale every axis limit so each contributes
    equally to the as-built budget (equal-contribution RSS).

    Solves ``rms(t_k)² - rms0² = (budget² - rms0²) / K`` per axis with a
    secant iteration in log-space — each iteration is ONE vmapped batch
    of K real perturbed traces, so the whole allocation is ``n_iter + 2``
    trace programs regardless of axis count.  ``budget`` is in sqrt(loss)
    units (RMS spot in lens units / RMS wavefront in waves).  Axis limits
    never grow beyond ``grow_cap`` times their input (sensitivities that
    are ~zero would otherwise blow up the allocation).

    Returns ``(new_tols, report)`` — the rescaled spec (same structure)
    and the sensitivity report AT the new limits.
    """
    axes = perturbation_axes(tols)
    K = len(axes)
    t0 = np.array([a[3] for a in axes])

    rms0 = float(np.asarray(
        _batched_rms(loss_fn, params, axes, np.zeros((1, K)), jit,
                     comp0, comp_iters, comp_scale))[0])
    if budget <= rms0:
        raise ValueError(
            f"budget {budget} must exceed the nominal merit {rms0}")
    target = (budget ** 2 - rms0 ** 2) / K

    def contributions(t):
        # probe BOTH signs and take the worst per axis: one sign of an
        # asymmetric axis (despace, curvature error) can IMPROVE the
        # merit — allocating on that sign alone would blow its limit
        # out to the cap while the other sign wrecks the build.
        d = np.zeros((2 * K, K))
        d[np.arange(K), np.arange(K)] = t
        d[K + np.arange(K), np.arange(K)] = -t
        rms = np.asarray(_batched_rms(loss_fn, params, axes, d, jit,
                                      comp0, comp_iters, comp_scale))
        c = rms ** 2 - rms0 ** 2
        return np.maximum(np.maximum(c[:K], c[K:]), 1e-30)

    # power-law secant in log space: c(t) ~ a t^p locally (p = 1 for
    # first-order-coupled axes, 2 for symmetry-protected decenters)
    t_a = t0.copy()
    c_a = contributions(t_a)
    # first guess assumes quadratic (the common decenter/tilt case)
    t_b = np.minimum(t_a * np.sqrt(target / c_a), t_a * grow_cap)
    for _ in range(n_iter):
        c_b = contributions(t_b)
        with np.errstate(divide='ignore', invalid='ignore'):
            p = (np.log(c_b) - np.log(c_a)) / (np.log(t_b) - np.log(t_a))
        p = np.clip(np.nan_to_num(p, nan=2.0, posinf=2.0, neginf=2.0),
                    0.25, 4.0)
        t_new = t_b * (target / c_b) ** (1.0 / p)
        t_new = np.clip(t_new, t0 * 1e-3, t0 * grow_cap)
        t_a, c_a, t_b = t_b, c_b, t_new

    new_tols = _rebuild_spec(tols, axes, t_b)
    report = tolerance_sensitivity(loss_fn, params, new_tols, jit,
                                   comp0, comp_iters, comp_scale)
    return new_tols, report


def _rebuild_spec(tols, axes, t_new):
    out = {}
    for name in tols:
        out[name] = {}
        for leaf in tols[name]:
            spec = np.array(np.atleast_1d(
                np.asarray(tols[name][leaf], np.float64)))
            out[name][leaf] = (spec.copy() if np.ndim(tols[name][leaf])
                               else float(spec[0]))
    for k, (name, leaf, idx, _) in enumerate(axes):
        if idx is None:
            out[name][leaf] = float(t_new[k])
        else:
            out[name][leaf][idx] = t_new[k]
    for name in out:
        for leaf in out[name]:
            if isinstance(out[name][leaf], np.ndarray):
                out[name][leaf] = out[name][leaf].tolist()
    return out


def tolerance_yield(loss_fn, params, tols, key, n_trials=256, budget=None,
                    distribution='uniform', jit=True, comp0=None,
                    comp_iters=2, comp_scale=1.0):
    """Monte-Carlo as-built merit distribution under the tolerance spec.

    Every trial draws ALL axes at once (uniform over ±limit, or normal
    with sigma = limit/2 — the ISO 2-sigma convention) and the whole
    [n_trials] family traces in ONE vmapped call.  Returns
    ``(rms [n_trials], yield_fraction or None)`` — the as-built
    sqrt(merit) samples and, when ``budget`` is given, the fraction of
    builds meeting it.
    """
    axes = perturbation_axes(tols)
    K = len(axes)
    limits = jnp.asarray([a[3] for a in axes])
    if distribution == 'uniform':
        draws = jax.random.uniform(key, (n_trials, K), minval=-1.0,
                                   maxval=1.0) * limits
    elif distribution == 'normal':
        draws = jax.random.normal(key, (n_trials, K)) * (limits / 2.0)
    else:
        raise ValueError(
            f"distribution must be 'uniform' or 'normal': {distribution!r}")
    rms = _batched_rms(loss_fn, params, axes, draws, jit, comp0,
                       comp_iters, comp_scale)
    frac = (None if budget is None
            else float(jnp.mean((rms <= budget).astype(jnp.float32))))
    return rms, frac
