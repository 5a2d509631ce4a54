"""Branchless bound checks: surface-local (per candidate root) and
element-volume (per chosen hit).

Mirrors the reference's two-level clipping protocol:

- surface-local bounds = ``SurfaceBounded._check_t`` masking each root's hit
  point (``geom/bounded.py:20-36``) — Disk/Rectangle/Ellipse apertures,
  hemisphere clips of HalfSphere/HalfCyl, the single-cone nappe filter, plus
  the ``invert`` flag;
- volume bounds = ``Shape.inBounds`` applied once to the winning hit in the
  *element* frame (``geom/shape.py:52``) — Spheric radial apertures and edge
  z-ranges (``geom/spherics.py:27-46``), Cylindric rectangular apertures and
  y-dependent sag ranges (``geom/cylindrics.py:23-55``), and convex-polyhedron
  half-spaces (``geom/shape.py:122-132``).

Every kind is evaluated densely and selected by integer tag — on TPU the
handful of extra FMAs is free compared to branching, and the code stays a
single fused elementwise kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import (
    CVX_EPS,
    CYL_EDGE_EPS,
    CYL_RECT_EPS,
    INTERSECT_EPS,
    SBKind,
    VBKind,
)
from .surfaces import sag_z


def sb_check(sb_kind, sb, hit_local):
    """Raw (non-inverted) surface-local bound check.

    ``sb_kind [...]`` int32, ``sb [..., 4]`` params, ``hit_local`` a
    component tuple (x, y, z).  Returns a bool mask; see
    :class:`~raytracetorch_tpu.constants.SBKind` for parameter layouts.
    """
    x, y, z = hit_local
    p0, p1, p2 = sb[..., 0], sb[..., 1], sb[..., 2]
    r2 = x * x + y * y

    # DISK params: [radius^2, center_x, center_y] — offset center supports
    # off-axis segments (cx = cy = 0 reproduces the reference Disk)
    dx_ = x - p1
    dy_ = y - p2
    disk = dx_ * dx_ + dy_ * dy_ <= p0                         # bounded.py:60
    rect = (jnp.abs(x) <= p0) & (jnp.abs(y) <= p1)             # bounded.py:77
    cos_r, sin_r = jnp.cos(p2), jnp.sin(p2)                    # bounded.py:98
    u = x * cos_r - y * sin_r
    v = x * sin_r + y * cos_r
    ellipse = (u / p0) ** 2 + (v / p1) ** 2 <= 1.0
    hemi = jnp.abs(z * p0) < 1.0 + INTERSECT_EPS               # bounded.py:123
    hemi_aper = hemi & (r2 <= p1)                              # bounded.py:151
    nappe = z * p0 >= -INTERSECT_EPS                           # bounded.py:208

    res = jnp.full(jnp.broadcast_shapes(sb_kind.shape, x.shape), True)
    res = jnp.where(sb_kind == SBKind.DISK, disk, res)
    res = jnp.where(sb_kind == SBKind.RECT, rect, res)
    res = jnp.where(sb_kind == SBKind.ELLIPSE, ellipse, res)
    res = jnp.where(sb_kind == SBKind.HEMI, hemi, res)
    res = jnp.where(sb_kind == SBKind.HEMI_APER, hemi_aper, res)
    res = jnp.where(sb_kind == SBKind.CONE_NAPPE, nappe, res)
    return res


def sb_check_inverted(sb_kind, sb, sb_invert, hit_local):
    """Surface-local bound with the ``invert`` flag applied (bounded.py:29-30).
    This is what root selection uses; aperture *physics* uses the raw check
    (phys/filter.py:27 calls the shape's plain ``inBounds``)."""
    keep = sb_check(sb_kind, sb, hit_local)
    return keep ^ sb_invert


def vb_check(vb_kind, vb, hp_n, hp_d, hp_mask, hit_elem):
    """Element-volume bound check on the chosen hit in the element frame.

    ``vb [..., 8]`` params, ``hp_n [..., P, 3]`` / ``hp_d [..., P]`` /
    ``hp_mask [..., P]`` padded half-space data (convex polyhedra only).
    ``hit_elem`` is a component tuple.
    """
    x, y, z = hit_elem
    p = [vb[..., i] for i in range(8)]

    aper_r2 = (x * x + y * y) <= p[0]                          # spherics.py:43-46

    z_between = (z >= p[0]) & (z <= p[1])                      # spherics.py:36-39

    rect = (                                                   # cylindrics.py:36-37
        (x <= p[1] + CYL_RECT_EPS)
        & (x >= p[0] - CYL_RECT_EPS)
        & (y <= p[3] + CYL_RECT_EPS)
        & (y >= p[2] - CYL_RECT_EPS)
    )

    # Edge of a cylindrical lens: inside the rectangular aperture AND between
    # the y-dependent sag surfaces of the two optical faces
    # (cylindrics.py:44-55).  params [c1, z1, c2, z2, xmin, xmax, ymin, ymax]
    z_front = sag_z(p[0], y) + p[1]
    z_back = sag_z(p[2], y) + p[3]
    edge_rect = (
        (x <= p[5] + CYL_RECT_EPS)
        & (x >= p[4] - CYL_RECT_EPS)
        & (y <= p[7] + CYL_RECT_EPS)
        & (y >= p[6] - CYL_RECT_EPS)
    )
    cyl_edge = edge_rect & (z >= z_front + CYL_EDGE_EPS) & (z <= z_back - CYL_EDGE_EPS)

    # Convex polyhedron: hit must be on the inner side of every (valid)
    # bounding plane except the surface's own (shape.py:122-132; the self-
    # exemption is baked into hp_mask at table build time).
    signed = (hp_n[..., 0] * x[..., None] + hp_n[..., 1] * y[..., None]
              + hp_n[..., 2] * z[..., None]) - hp_d
    half = jnp.all((signed < CVX_EPS) | ~hp_mask, axis=-1)

    res = jnp.full(jnp.broadcast_shapes(vb_kind.shape, x.shape), True)
    res = jnp.where(vb_kind == VBKind.APER_R2, aper_r2, res)
    res = jnp.where(vb_kind == VBKind.Z_BETWEEN, z_between, res)
    res = jnp.where(vb_kind == VBKind.RECT, rect, res)
    res = jnp.where(vb_kind == VBKind.CYL_EDGE, cyl_edge, res)
    res = jnp.where(vb_kind == VBKind.HALFSPACES, half, res)
    return res
