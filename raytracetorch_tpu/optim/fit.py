"""Gradient-descent design loops: optax optimizers + trainability masks.

Replaces the reference's torch Adam/LBFGS usage
(``tests/test_optimization.py:129``, ``tests/test_optimize_singlet.py:52``)
and its per-Parameter ``requires_grad``/hook machinery with a masked optax
transform over the scene's parameter pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def grad_mask_fn(trainable):
    """Build ``mask(grads) -> grads`` from a scene ``trainable()`` pytree of
    True/False/float-mask leaves (the reference's requires_grad + trans_mask
    semantics, geom/transform.py:29-46)."""

    def apply(grads):
        def one(g, m):
            if isinstance(m, bool):
                return g if m else jnp.zeros_like(g)
            return g * jnp.asarray(m, g.dtype)
        return jax.tree_util.tree_map(
            one, grads, trainable,
            is_leaf=lambda x: isinstance(x, bool) or not isinstance(x, dict))
    return apply


def _apply_scales(params, scales):
    """Reparameterize p = s * y: optimizers see O(1)-scaled variables.
    ``scales`` is a (possibly partial) pytree matching ``params``; missing
    leaves default to 1.  The classic fix for parameters spanning many
    orders of magnitude (e.g. asphere polynomial coefficients, whose useful
    a10 is ~1e-12 while curvatures are ~1e-2: Adam's uniform absolute step
    otherwise destroys them)."""
    def expand(p):
        out = {}
        for el, d in p.items():
            out[el] = {k: jnp.asarray(
                scales.get(el, {}).get(k, 1.0) if scales else 1.0,
                jnp.float32) for k in d}
        return out
    s = expand(params)
    to_y = jax.tree_util.tree_map(lambda p_, s_: p_ / s_, params, s)
    def to_p(y):
        return jax.tree_util.tree_map(lambda y_, s_: y_ * s_, y, s)
    return to_y, to_p


def fit(loss_fn, params, trainable=None, optimizer=None, steps=100,
        lr=1e-3, jit=True, scales=None):
    """Minimize ``loss_fn(params) -> scalar``.

    Returns ``(params, losses [steps])``.  Non-trainable leaves (per
    ``trainable``) receive zero gradient, so any optax optimizer leaves them
    untouched (sgd/adam; for adam the zero-grad moments stay zero).
    ``scales``: optional partial pytree of per-parameter magnitudes — the
    optimizer works on p/scale (see _apply_scales).
    """
    if optimizer is None:
        optimizer = optax.adam(lr)
    mask = grad_mask_fn(trainable) if trainable is not None else (lambda g: g)

    y0, to_p = _apply_scales(params, scales)
    scaled_loss = (loss_fn if scales is None
                   else (lambda y: loss_fn(to_p(y))))
    opt_state = optimizer.init(y0)

    def step(carry, _):
        y, opt_state = carry
        loss, grads = jax.value_and_grad(scaled_loss)(y)
        grads = mask(grads)
        updates, opt_state = optimizer.update(grads, opt_state, y)
        y = optax.apply_updates(y, updates)
        return (y, opt_state), loss

    def run(y, opt_state):
        (y, opt_state), losses = jax.lax.scan(
            step, (y, opt_state), None, length=steps)
        return y, losses

    if jit:
        run = jax.jit(run)
    y, losses = run(y0, opt_state)
    return (to_p(y) if scales is not None else y), losses


def fit_lbfgs(loss_fn, params, trainable=None, steps=50, jit=True, **lbfgs_kw):
    """L-BFGS design loop (the reference's singlet workhorse,
    tests/test_optimize_singlet.py:52).  Uses optax.lbfgs with a zoom
    linesearch; masked like :func:`fit`."""
    optimizer = optax.lbfgs(**lbfgs_kw)
    mask = grad_mask_fn(trainable) if trainable is not None else (lambda g: g)
    opt_state = optimizer.init(params)
    value_and_grad = jax.value_and_grad(loss_fn)

    def masked_loss(p):
        return loss_fn(p)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = value_and_grad(params)
        grads = mask(grads)
        updates, opt_state = optimizer.update(
            grads, opt_state, params, value=loss, grad=grads,
            value_fn=masked_loss)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def run(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), None, length=steps)
        return params, losses

    if jit:
        run = jax.jit(run)
    return run(params, opt_state)
