"""Convex-polyhedron solids: Box, Box4Side, general half-space volumes
(reference ``geom/shape.py:104-277``).

Each face is an infinite plane clipped by the volume's half-space bound set
(every other face's plane, self-exempted — shape.py:122-132).  Unlike the
reference (whose plane normals point inward while its inBounds uses the
outward rows, shape.py:116 vs :125), faces here carry outward normals and
the half-space data is stated in outward form — behaviorally identical for
the bound check and orientation-agnostic for Reflect/Block physics.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..constants import PhysKind, VBKind
from ..core.table import SurfaceRec
from ..geom.surfaces import q_plane
from ..geom.transform import rodrigues
from .base import Element, compose_world, frame_params

# rot_vec mapping the canonical +z plane normal to each outward axis
_FACE_ROTS = {
    '+z': (0.0, 0.0, 0.0),
    '-z': (0.0, math.pi, 0.0),
    '+x': (0.0, math.pi / 2.0, 0.0),
    '-x': (0.0, -math.pi / 2.0, 0.0),
    '+y': (-math.pi / 2.0, 0.0, 0.0),
    '-y': (math.pi / 2.0, 0.0, 0.0),
}
_FACE_NORMALS = {
    '+z': (0.0, 0.0, 1.0), '-z': (0.0, 0.0, -1.0),
    '+x': (1.0, 0.0, 0.0), '-x': (-1.0, 0.0, 0.0),
    '+y': (0.0, 1.0, 0.0), '-y': (0.0, -1.0, 0.0),
}


def box_face_recs(faces, ph_kind=PhysKind.BLOCK, ph=(), dtype=jnp.float32):
    """Build plane SurfaceRecs (element-frame geometry only) for the given
    ``faces``: a list of (axis_key, offset_scalar).  Each face's half-space
    bound set contains every *other* face (the self-exemption of
    shape.py:130)."""
    recs = []
    for i, (axis, off) in enumerate(faces):
        n = jnp.asarray(_FACE_NORMALS[axis], dtype)
        halfspaces = []
        for j, (axis_j, off_j) in enumerate(faces):
            if j == i:
                continue
            nj = jnp.asarray(_FACE_NORMALS[axis_j], dtype)
            halfspaces.append((nj, jnp.asarray(off_j, dtype)))
        Rp = rodrigues(jnp.asarray(_FACE_ROTS[axis], dtype))
        ts = n * jnp.asarray(off, dtype)
        recs.append(SurfaceRec(
            q=q_plane()[0], n_sign=q_plane()[1], Rw=None, tw=None,
            Rs=Rp, ts=ts, vb_kind=VBKind.HALFSPACES, halfspaces=halfspaces,
            is_plane=True, ph_kind=ph_kind, ph=ph))
    return recs


class _BoxBase(Element):
    _face_axes: tuple = ()

    def __init__(self, ph_kind=PhysKind.BLOCK, ph=(), name='box', **kw):
        super().__init__(name=name, **kw)
        self.ph_kind = ph_kind
        self.ph = tuple(ph)

    @property
    def n_surfaces(self):
        return len(self._face_axes)

    def _face_offsets(self, p):
        raise NotImplementedError

    def build(self, p):
        Re, te = frame_params(p)
        faces = list(zip(self._face_axes, self._face_offsets(p)))
        recs = box_face_recs(faces, self.ph_kind, self.ph, dtype=te.dtype)
        for r in recs:
            Rw, tw, _, _ = compose_world(Re, te, r.Rs, r.ts)
            r.Rw, r.tw = Rw, tw
        return recs


class BoxElement(_BoxBase):
    """Six-plane rectangular prism (reference geom/shape.py:135-210 ``Box``;
    faces ordered +z, -z, +x, -x, +y, -y to match ``_build_surfaces``)."""

    _face_axes = ('+z', '-z', '+x', '-x', '+y', '-y')

    def __init__(self, length, width, height, l_grad=False, w_grad=False,
                 h_grad=False, **kw):
        super().__init__(**kw)
        self._init = dict(length=float(length), width=float(width),
                          height=float(height))
        self._grads = dict(length=l_grad, width=w_grad, height=h_grad)

    def extra_params(self):
        return dict(self._init)

    def extra_trainable(self):
        return dict(self._grads)

    def _face_offsets(self, p):
        l2, w2, h2 = p['length'] / 2, p['width'] / 2, p['height'] / 2
        return (l2, l2, w2, w2, h2, h2)


class Box4SideElement(_BoxBase):
    """Four side planes without caps — the lens-barrel solid (reference
    geom/shape.py:213-277 ``Box4Side``)."""

    _face_axes = ('+x', '-x', '+y', '-y')

    def __init__(self, width, height, w_grad=False, h_grad=False, **kw):
        super().__init__(**kw)
        self._init = dict(width=float(width), height=float(height))
        self._grads = dict(width=w_grad, height=h_grad)

    def extra_params(self):
        return dict(self._init)

    def extra_trainable(self):
        return dict(self._grads)

    def _face_offsets(self, p):
        w2, h2 = p['width'] / 2, p['height'] / 2
        return (w2, w2, h2, h2)
