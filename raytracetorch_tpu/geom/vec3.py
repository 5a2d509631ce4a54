"""Component-planar 3-vector math: the TPU-native data layout.

An ``[N, 3]`` array wastes 125 of 128 vector lanes on TPU (the minor dim
tiles to 128), and small einsums against ``[3, 3]`` matrices lower to padded
MXU matmuls.  Measured on v5e, the same 5-surface trace runs ~20x faster
when every 3-vector is three separate ``[N]`` arrays — so the entire compute
core (solver, bounds, physics, trace) operates on component tuples
``(x, y, z)``, and the public ``Rays`` API converts at the trace boundary.

Rotation convention matches geom/transform.py (row-vector form):
``rot(v, R) = v @ R`` and ``rot_t(v, R) = v @ R.T``; ``R`` may carry leading
batch dims (e.g. gathered per-ray matrices ``[N, 3, 3]``).
"""

from __future__ import annotations

import jax.numpy as jnp


def from_array(a):
    """[..., 3] -> (x, y, z)."""
    return a[..., 0], a[..., 1], a[..., 2]


def to_array(v):
    """(x, y, z) -> [..., 3]."""
    return jnp.stack(v, axis=-1)


def dot(u, v):
    return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]


def add(u, v):
    return u[0] + v[0], u[1] + v[1], u[2] + v[2]


def sub(u, v):
    return u[0] - v[0], u[1] - v[1], u[2] - v[2]


def scale(v, s):
    return v[0] * s, v[1] * s, v[2] * s


def fma(u, s, v):
    """u + s * v."""
    return u[0] + s * v[0], u[1] + s * v[1], u[2] + s * v[2]


def where(mask, u, v):
    return (jnp.where(mask, u[0], v[0]), jnp.where(mask, u[1], v[1]),
            jnp.where(mask, u[2], v[2]))


def norm2(v):
    return v[0] * v[0] + v[1] * v[1] + v[2] * v[2]


def cross(u, v):
    return (u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0])


def rotate_between(a, b, v):
    """Apply the minimal rotation taking unit vector ``a`` to unit
    vector ``b`` to ``v`` (Rodrigues, normalize-free form):

        R(v) = c v + w x v + w (w . v) / (1 + c),   c = a.b, w = a x b

    This is the parallel-transport rotation of polarization frames along
    a bending ray (core/field.py GRIN transport): it preserves norms and
    maps a-transverse vectors to b-transverse vectors exactly.  Guarded
    at c -> -1 (a 180-degree flip has no minimal axis; such lanes are
    dead in every caller — a ray cannot reverse within one transport
    step)."""
    c = dot(a, b)
    w = cross(a, b)
    s = dot(w, v) / jnp.maximum(1.0 + c, 1e-6)
    return (c * v[0] + (w[1] * v[2] - w[2] * v[1]) + w[0] * s,
            c * v[1] + (w[2] * v[0] - w[0] * v[2]) + w[1] * s,
            c * v[2] + (w[0] * v[1] - w[1] * v[0]) + w[2] * s)


def rot(v, R):
    """v @ R — nine scalar FMAs, fully lane-packed and fusion-friendly."""
    x, y, z = v
    return (x * R[..., 0, 0] + y * R[..., 1, 0] + z * R[..., 2, 0],
            x * R[..., 0, 1] + y * R[..., 1, 1] + z * R[..., 2, 1],
            x * R[..., 0, 2] + y * R[..., 1, 2] + z * R[..., 2, 2])


def rot_t(v, R):
    """v @ R.T."""
    x, y, z = v
    return (x * R[..., 0, 0] + y * R[..., 0, 1] + z * R[..., 0, 2],
            x * R[..., 1, 0] + y * R[..., 1, 1] + z * R[..., 1, 2],
            x * R[..., 2, 0] + y * R[..., 2, 1] + z * R[..., 2, 2])
