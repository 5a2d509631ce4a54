"""Optimization goals (losses) for lens design.

Pure-function re-design of the reference ``optim/goals.py``: each goal is a
function of ``(scene, params, ...)`` returning a differentiable scalar.  The
spot goals consume the trace's streaming sensor moments (core/sensor.py)
instead of re-simulating per bundle in a Python loop (the reference
re-simulates once *per bundle* per loss call, optim/goals.py:147-156 — here
one trace covers all bundles because moments are keyed by ray_id).

Spot statistics are true intensity-weighted RMS radii (see PARITY.md §10:
the reference's SpotSizeLoss sums square roots per-ray, diverging from its
own docstring and from its Sensor's moment math).
"""

from __future__ import annotations

import jax.numpy as jnp


def focal_length_loss(scene, params, f_target):
    """MSE on system paraxial power vs 1/f_target (reference
    optim/goals.py:16-39: power space avoids the 1/f singularity)."""
    M = scene.paraxial(params)
    p_actual = -M[1, 0]
    return (p_actual - 1.0 / f_target) ** 2


def spot_size_loss(sensors, slot=0, target_xy=None, weights=None):
    """Mean intensity-weighted RMS spot radius across bundles (reference
    optim/goals.py:99-187).  ``sensors`` is the SensorState returned by a
    trace; bundles with no recorded hits are excluded from the mean."""
    rms = sensors.spot_rms(slot, target_xy)          # [B]
    w = sensors.total_weight(slot)                   # [B]
    present = (w > 0).astype(rms.dtype)
    if weights is not None:
        present = present * weights
    denom = jnp.maximum(jnp.sum(present), 1e-12)
    return jnp.sum(rms * present) / denom


def spot_target_loss(sensors, target_xy, slot=0):
    """Mean squared distance of each bundle's centroid to its target
    (reference optim/goals.py:42-96).  ``target_xy`` is [B, 2] or [2]."""
    target_xy = jnp.atleast_2d(jnp.asarray(target_xy))
    c = sensors.centroid(slot)                       # [B, 2]
    b = c.shape[0]
    t = jnp.broadcast_to(target_xy, (b, 2))
    w = sensors.total_weight(slot)
    present = (w > 0).astype(c.dtype)
    d2 = jnp.sum((c - t) ** 2, axis=-1)
    denom = jnp.maximum(jnp.sum(present), 1e-12)
    return jnp.sum(d2 * present) / denom
