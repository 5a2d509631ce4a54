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
import numpy as np

from ..constants import MAX_HALFSPACES, PhysKind, VBKind
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


def _rot_vec_to_normal(n):
    """Axis-angle (host-side, static) rotating the canonical +z plane normal
    onto ``n`` — generalizes the _FACE_ROTS table to arbitrary normals."""
    z = np.array([0.0, 0.0, 1.0])
    axis = np.cross(z, n)
    s = float(np.linalg.norm(axis))
    c = float(np.dot(z, n))
    if s < 1e-12:
        return (math.pi, 0.0, 0.0) if c < 0.0 else (0.0, 0.0, 0.0)
    return tuple(axis / s * math.atan2(s, c))


class CvxPolyhedronElement(Element):
    """General convex polyhedron: the intersection of arbitrary outward
    half-spaces ``{x : n_i . x <= d_i}`` (reference ``CvxPolyhedron``,
    geom/shape.py:104-132, including the self-exempt inBounds at :130 —
    here each face's half-space bound set omits its own plane).

    By default an absorber like the reference's Block-faced solids; pass
    ``ior_glass`` to make a refracting glass solid (e.g. a prism) traced
    with Snell or Monte-Carlo Fresnel physics.  Normals need not be unit
    (normalized at construction, statically); offsets are differentiable
    parameters.  Face count is capped at MAX_HALFSPACES + 1 by the padded
    bound storage.
    """

    def __init__(self, normals, offsets, ior_glass=None, ior_media=1.0,
                 fresnel=False, offsets_grad=False, ior_glass_grad=False,
                 name='polyhedron', **kw):
        super().__init__(name=name, **kw)
        norms = np.asarray(normals, np.float64)
        if norms.ndim != 2 or norms.shape[1] != 3:
            raise ValueError("normals must be [K, 3]")
        k = norms.shape[0]
        if k < 3:
            raise ValueError("a polyhedron needs at least 3 half-spaces")
        if k - 1 > MAX_HALFSPACES:
            raise ValueError(
                f"at most {MAX_HALFSPACES + 1} faces supported "
                f"(padded half-space capacity), got {k}")
        if len(offsets) != k:
            raise ValueError("offsets must match normals")
        lengths = np.linalg.norm(norms, axis=1)
        if np.any(lengths < 1e-12):
            raise ValueError("zero-length normal")
        norms = norms / lengths[:, None]
        # offsets are stated for the *normalized* normals
        self._normals = [tuple(float(x) for x in row) for row in norms]
        self._rot_vecs = [_rot_vec_to_normal(row) for row in norms]
        self._offsets_init = [float(o) / float(l)
                              for o, l in zip(offsets, lengths)]
        self._offsets_grad = offsets_grad
        self.ior_glass = ior_glass
        self.ior_media = ior_media
        self.fresnel = fresnel
        self._ior_grad = ior_glass_grad

    @property
    def n_surfaces(self):
        return len(self._normals)

    def extra_params(self):
        p = {'offsets': self._offsets_init}
        if self.ior_glass is not None:
            p['ior_glass'] = self.ior_glass
            p['ior_media'] = self.ior_media
        return p

    def extra_trainable(self):
        t = {'offsets': self._offsets_grad}
        if self.ior_glass is not None:
            t['ior_glass'] = self._ior_grad
            t['ior_media'] = False
        return t

    def build(self, p):
        Re, te = frame_params(p)
        offs = p['offsets']
        if self.ior_glass is not None:
            kind = PhysKind.FRESNEL if self.fresnel else PhysKind.SNELL
            # faces carry OUTWARD normals; ior_in is the normal-side medium
            # (refract_components: "arrives from the ior_in side")
            ph = (p['ior_media'], p['ior_glass'])
        else:
            kind, ph = PhysKind.BLOCK, ()
        recs = []
        for i, n in enumerate(self._normals):
            halfspaces = [(jnp.asarray(self._normals[j], te.dtype), offs[j])
                          for j in range(self.n_surfaces) if j != i]
            Rp = rodrigues(jnp.asarray(self._rot_vecs[i], te.dtype))
            ts = jnp.asarray(n, te.dtype) * offs[i]
            Rw, tw, _, _ = compose_world(Re, te, Rp, ts)
            recs.append(SurfaceRec(
                q=q_plane()[0], n_sign=q_plane()[1], Rw=Rw, tw=tw,
                Rs=Rp, ts=ts, vb_kind=VBKind.HALFSPACES,
                halfspaces=halfspaces, is_plane=True,
                ph_kind=kind, ph=ph))
        return recs
