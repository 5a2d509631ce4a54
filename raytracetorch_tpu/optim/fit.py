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


def fit_lm(residual_fn, params, trainable=None, steps=30, lam0=1e-3,
           lam_up=4.0, lam_down=0.5, scales=None, jit=True, mode='eager'):
    """Levenberg–Marquardt (damped least squares) over a residual vector —
    THE classic lens-design optimizer (Zemax/CodeV-style DLS), beyond the
    reference's Adam/LBFGS (tests/test_optimize_singlet.py:52): merit
    functions in optical design are naturally sums of squared residuals
    (per-field spot radii, centroid targets, focal-length errors), and a
    Gauss–Newton model of that structure converges in a handful of
    iterations where first-order methods need hundreds.

    ``residual_fn(params) -> [m]`` returns the residual vector; the merit
    is ``0.5 * sum(r^2)``.  Per-step: J = jacfwd(residuals) (parameters are
    dozens of scalars — forward mode gives the whole Jacobian in one pass
    per input dim), solve ``(JᵀJ + λ·diag(JᵀJ)) dp = Jᵀ r`` (Marquardt
    diagonal scaling, so parameters spanning many orders of magnitude —
    curvatures ~1e-2 vs asphere a10 ~1e-12 — damp in their own units), and
    accept/reject with adaptive λ.  Rejected steps keep the parameters and
    raise λ.

    ``mode='eager'`` (default) drives the λ loop in Python over two
    jitted programs (residuals; their Jacobian) and solves the tiny
    normal equations on the host in float64.  This compiles each traced
    program ONCE: the alternative ``mode='scan'`` (one fixed-length
    lax.scan = one jitted program, no host round-trips) embeds THREE
    copies of the residual graph in the scan body, and XLA:CPU's fusion
    pass turned that into ~19 duplicated 50 MB kernels (~300 s compile)
    for a 3-element design — eager compiles the same design in tens of
    seconds and costs only ~3 dispatches/step, noise for a design loop
    even over the axon tunnel.

    Non-trainable leaves (per ``trainable``) are held at their initial
    values and EXCLUDED from the differentiated subspace (the Jacobian
    has only trainable columns — smaller tangent batch, smaller solve).
    Returns ``(params, costs [steps])``."""
    from jax import lax
    from jax.flatten_util import ravel_pytree

    y0_tree, to_p = _apply_scales(params, scales)
    res_of_y = (residual_fn if scales is None
                else (lambda y: residual_fn(to_p(y))))
    y0, unravel = ravel_pytree(y0_tree)

    # Differentiate ONLY the trainable subspace: frozen entries are held
    # at their initial values and never see a tangent.  This is not just
    # the algebraic equivalent of zeroing Jacobian columns — it shrinks
    # the jacfwd tangent batch (and the XLA graph) from len(y) to
    # n_trainable, which cut a 4-element design-loop compile from ~300 s
    # to tens of seconds and makes the normal-equations solve
    # n_t x n_t instead of n x n.  The mask is static structure (which
    # parameters train is a design-time fact), so the gather indices are
    # concrete at trace time.
    import numpy as np
    if trainable is not None:
        mask_tree = jax.tree_util.tree_map(
            lambda p_, m: np.broadcast_to(
                np.asarray(m, np.float32), jnp.shape(p_)),
            params, trainable,
            is_leaf=lambda x: isinstance(x, bool)
            or not isinstance(x, dict))
        mask_flat, _ = ravel_pytree(
            jax.tree_util.tree_map(jnp.asarray, mask_tree))
        mask_np = np.asarray(mask_flat)
    else:
        mask_np = np.ones((y0.shape[0],), np.float32)
    (t_idx,) = np.nonzero(mask_np > 0)
    t_idx = jnp.asarray(t_idx, jnp.int32)
    yt0 = y0[t_idx]

    def embed(yt):
        return y0.at[t_idx].set(yt)

    def res_flat(yt):
        return jnp.ravel(res_of_y(unravel(embed(yt))))

    hi = lax.Precision.HIGHEST       # small matmuls: never bf16 (CLAUDE.md)

    if mode == 'scan':
        def step(carry, _):
            y, lam, cost = carry
            r = res_flat(y)
            jac = jax.jacfwd(res_flat)(y)
            jtj = lax.dot_general(jac, jac, (((0,), (0,)), ((), ())),
                                  precision=hi)
            jtr = lax.dot_general(jac, r, (((0,), (0,)), ((), ())),
                                  precision=hi)
            diag = jnp.diag(jtj)
            a = jtj + lam * jnp.diag(jnp.maximum(diag, 1e-12))
            dp = jnp.linalg.solve(a, jtr)
            y_new = y - dp
            r_new = res_flat(y_new)
            cost_new = 0.5 * jnp.sum(r_new * r_new)
            accept = cost_new < cost
            y = jnp.where(accept, y_new, y)
            lam = jnp.where(accept, lam * lam_down, lam * lam_up)
            cost = jnp.where(accept, cost_new, cost)
            return (y, lam, cost), cost

        def run(yt):
            r0 = res_flat(yt)
            cost0 = 0.5 * jnp.sum(r0 * r0)
            (yt, _, _), costs = lax.scan(
                step, (yt, jnp.asarray(lam0, y0.dtype), cost0), None,
                length=steps)
            return yt, costs

        if jit:
            run = jax.jit(run)
        yt, costs = run(yt0)
        out = unravel(embed(yt))
        return (to_p(out) if scales is not None else out), costs

    if mode != 'eager':
        raise ValueError(f"mode must be 'eager' or 'scan': {mode!r}")

    rfn = jax.jit(res_flat) if jit else res_flat
    jfn = jax.jit(jax.jacfwd(res_flat)) if jit else jax.jacfwd(res_flat)
    yt = yt0
    lam = float(lam0)
    r = np.asarray(rfn(yt), np.float64)
    cost = 0.5 * float(r @ r)
    costs = []
    for _ in range(steps):
        jac = np.asarray(jfn(yt), np.float64)
        jtj = jac.T @ jac
        jtr = jac.T @ r
        diag = np.maximum(np.diag(jtj), 1e-12)
        dp = np.linalg.solve(jtj + lam * np.diag(diag), jtr)
        y_new = yt - jnp.asarray(dp, yt.dtype)
        r_new = np.asarray(rfn(y_new), np.float64)
        cost_new = 0.5 * float(r_new @ r_new)
        if cost_new < cost:
            yt, r, cost = y_new, r_new, cost_new
            lam *= lam_down
        else:
            lam *= lam_up
        costs.append(cost)
    out = unravel(embed(yt))
    costs = jnp.asarray(costs, y0.dtype)
    return (to_p(out) if scales is not None else out), costs
