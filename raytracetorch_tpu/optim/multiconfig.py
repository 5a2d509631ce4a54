"""Multi-configuration (zoom) design: one parameter pytree, C system states.

Beyond-reference capability (the reference has no zoom support — its
Scene holds exactly one parameter state per element, scene/base.py:25-33).
A zoom lens, a refocusable camera, or a scan system is ONE optical design
whose prescription is shared except for a few leaves (an air gap, an
element z-position, a sensor distance) that take per-configuration values.
The classic design task couples them: find shared curvatures plus
per-config spacings such that EVERY configuration meets its goal.

TPU-first formulation: stack the per-config leaves on a leading [C] axis
and ``jax.vmap`` the loss over configurations (shared leaves broadcast via
``in_axes=None``).  All C configurations trace in one compiled program —
XLA batches the table builds and the trace maps over the config axis, so a
3-config merit costs ~one 3x-wider trace, not three dispatches.  Gradients
flow to shared leaves as the SUM over configurations (the coupling that
makes it a zoom design rather than C independent designs) and to stacked
leaves per-config.

Usage::

    mc_params, axes = stack_configs(scene.init_params(), [
        {'moving': {'trans': [0., 0., 10.]}},     # config 0
        {'moving': {'trans': [0., 0., 14.]}},     # config 1
    ])
    loss = multiconfig_loss(per_config_loss, axes)  # fn(mc_params) scalar
    mc_params, hist = fit(loss, mc_params, trainable=scene.trainable())

``per_config_loss(params, cfg)`` receives a plain single-config parameter
pytree plus the config index (an [ ] int32 tracer — use it to select
per-config targets with ``jnp.take`` or to fold PRNG keys).  The scene's
``trainable()`` mask applies unchanged: a bool/float mask on a stacked
leaf broadcasts over the [C] axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_is_none = lambda x: x is None

# Parameter pytrees are dicts-of-dicts with array leaves; overrides write
# leaves as plain lists/scalars.  Flatten with "anything not a dict is a
# leaf" so an override's ``[0, 0, 5.]`` stays ONE leaf matching the base
# array, not three indexed scalars.
_is_param_leaf = lambda x: not isinstance(x, dict)


def _path_map(tree):
    return {tuple(path): leaf for path, leaf
            in jax.tree_util.tree_flatten_with_path(
                tree, is_leaf=_is_param_leaf)[0]}


def stack_configs(base_params, overrides):
    """Build a multi-config parameter pytree from per-config overrides.

    ``overrides`` is a list of C partial pytrees structured like
    ``base_params`` (e.g. ``{'lens': {'trans': [0, 0, 12.]}}``).  Any leaf
    named by AT LEAST one override becomes a stacked ``[C, ...]`` array
    (configs that omit it keep the base value); untouched leaves stay
    shared.  Returns ``(mc_params, axes)`` where ``axes`` mirrors the
    parameter structure with leaves ``0`` (stacked) / ``None`` (shared) —
    exactly the ``jax.vmap`` ``in_axes`` convention, consumed by
    :func:`config_params` / :func:`multiconfig_loss`.

    Raises ``KeyError`` if an override names a leaf absent from
    ``base_params`` (typo guard: a silently-ignored override would
    optimize the wrong system)."""
    if not overrides:
        raise ValueError("need at least one configuration override")
    base_map = _path_map(base_params)
    ov_maps = [_path_map(ov) for ov in overrides]
    for i, m in enumerate(ov_maps):
        unknown = set(m) - set(base_map)
        if unknown:
            raise KeyError(
                f"override {i} names parameter leaves not in the base "
                f"pytree: {sorted('/'.join(str(p) for p in u) for u in unknown)}")
    touched = set().union(*ov_maps)

    leaves, treedef = jax.tree_util.tree_flatten_with_path(
        base_params, is_leaf=_is_param_leaf)
    mc, axes = [], []
    for path, v in leaves:
        v = jnp.asarray(v)
        if tuple(path) in touched:
            rows = [jnp.broadcast_to(
                        jnp.asarray(m.get(tuple(path), v), v.dtype), v.shape)
                    for m in ov_maps]
            mc.append(jnp.stack(rows))
            axes.append(0)
        else:
            mc.append(v)
            axes.append(None)
    unflat = lambda ls: jax.tree_util.tree_unflatten(treedef, ls)
    # axes uses None leaves, which tree_unflatten would treat as empty
    # subtrees — unflatten a sentinel and substitute after.
    ax_tree = jax.tree_util.tree_map(
        lambda a: None if a == -1 else a,
        unflat([-1 if a is None else a for a in axes]))
    return unflat(mc), ax_tree


def n_configs(mc_params, axes):
    """Number of configurations C encoded in a stacked pytree."""
    leaves = jax.tree_util.tree_leaves(mc_params)
    ax = jax.tree_util.tree_leaves(axes, is_leaf=_is_none)
    for v, a in zip(leaves, ax):
        if a is not None:
            return jnp.shape(v)[0]
    raise ValueError("no stacked leaves: not a multi-config pytree")


def config_params(mc_params, axes, cfg):
    """Extract the plain single-config parameter pytree for config ``cfg``
    (python int or traced scalar).  Shared leaves pass through; stacked
    leaves are indexed on their leading axis."""
    leaves, treedef = jax.tree_util.tree_flatten(mc_params)
    ax = jax.tree_util.tree_leaves(axes, is_leaf=_is_none)
    out = [v if a is None else v[cfg] for v, a in zip(leaves, ax)]
    return jax.tree_util.tree_unflatten(treedef, out)


def multiconfig_loss(per_config_loss, axes, weights=None):
    """Lift ``per_config_loss(params, cfg) -> scalar`` to a multi-config
    merit ``fn(mc_params, *args, **kw) -> scalar``: the weighted mean of
    the per-config losses, evaluated for all configs in ONE vmapped trace.

    Extra ``*args``/``**kw`` are forwarded to every config's loss call
    (closed over, not vmapped).  ``weights`` ([C]) defaults to uniform."""

    def merit(mc_params, *args, **kw):
        c = n_configs(mc_params, axes)
        per = jax.vmap(
            lambda p, i: per_config_loss(p, i, *args, **kw),
            in_axes=(axes, 0))(mc_params, jnp.arange(c))
        w = (jnp.ones(c, per.dtype) if weights is None
             else jnp.asarray(weights, per.dtype))
        return jnp.sum(per * w) / jnp.sum(w)

    return merit


def config_sweep(fn, mc_params, axes):
    """Evaluate ``fn(params, cfg) -> pytree`` for every configuration,
    vmapped (analysis helper: per-config spot tables, focal lengths...).
    Returns the result pytree with a leading [C] axis on every leaf."""
    c = n_configs(mc_params, axes)
    return jax.vmap(fn, in_axes=(axes, 0))(mc_params, jnp.arange(c))
