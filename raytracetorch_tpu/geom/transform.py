"""Coordinate frames: axis-angle rotations, world<->local maps, paraxial shifts.

TPU-native re-design of the reference's ``RayTransform`` family
(``geom/transform.py:10,141,245``):

- Rotation matrices come from a closed-form, branchless Rodrigues formula —
  mathematically identical to the reference's ``matrix_exp`` of the skew
  matrix (``geom/transform.py:48-61``) but cheap and ``vmap``-able for the
  per-ray noisy-transform (tolerancing) path.
- Frames are immutable pytrees (``Frame``); the trainability flags from the
  reference's ``requires_grad``/gradient-mask machinery
  (``geom/transform.py:29-46``) live in the element *spec* layer and become
  optax gradient masks — parameters themselves are plain arrays.
- Convention matches the reference exactly (row-vector form):
  world->local: ``(p - t) @ R`` ; local->world: ``p @ R.T + t``
  (``geom/transform.py:75-95,101-119``).  Bundle placement uses the inverse
  pairing (``to_world`` on sampled local rays), matching
  ``RayTransformBundle.transform_`` (``geom/transform.py:245-264``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

# All geometry matmuls are tiny (3x3 / 5x5): pin full f32 precision so the
# TPU MXU's default bf16 inputs can't degrade ray geometry (a bf16 rotation
# is only good to ~3e-3 — catastrophic for optical path lengths).
PREC = jax.lax.Precision.HIGHEST


def mm(a, b):
    return jnp.matmul(a, b, precision=PREC)


def vec_mat(v, m):
    """v [..., 3] @ m [..., 3, 3] as explicit FMAs — avoids the padded MXU
    dot_general a small-dim einsum lowers to (see core/intersect.py)."""
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([
        vx * m[..., 0, 0] + vy * m[..., 1, 0] + vz * m[..., 2, 0],
        vx * m[..., 0, 1] + vy * m[..., 1, 1] + vz * m[..., 2, 1],
        vx * m[..., 0, 2] + vy * m[..., 1, 2] + vz * m[..., 2, 2],
    ], axis=-1)


def skew(r):
    """Skew matrix K(r) with the reference's sign layout
    (``geom/transform.py:52-56``): K = [[0,-z,y],[z,0,-x],[-y,x,0]]."""
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(rot_vec):
    """exp(K(r)) via the Rodrigues formula, safe and differentiable at r=0.

    Equals ``torch.linalg.matrix_exp`` of the skew matrix used by the
    reference (``geom/transform.py:57``).  Supports arbitrary batch dims.
    """
    theta2 = jnp.sum(rot_vec * rot_vec, axis=-1)
    small = theta2 < 1e-12
    # Double-where: keep sqrt/div gradients finite in the small-angle branch.
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks near zero
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    K = skew(rot_vec)
    KK = mm(K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rot_vec.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


class Frame(struct.PyTreeNode):
    """A rigid transform parameterized by axis-angle ``rot_vec`` and ``trans``.

    ``R = rodrigues(rot_vec)`` is the local->world rotation in row-vector
    convention: world points map to local via ``(p - trans) @ R``.
    """

    rot_vec: jnp.ndarray  # [..., 3]
    trans: jnp.ndarray    # [..., 3]

    @classmethod
    def identity(cls, dtype=jnp.float32):
        return cls(rot_vec=jnp.zeros(3, dtype), trans=jnp.zeros(3, dtype))

    @classmethod
    def create(cls, rotation=None, translation=None, dtype=jnp.float32):
        r = jnp.zeros(3, dtype) if rotation is None else jnp.asarray(rotation, dtype)
        t = jnp.zeros(3, dtype) if translation is None else jnp.asarray(translation, dtype)
        return cls(rot_vec=r, trans=t)

    @property
    def rot(self):
        return rodrigues(self.rot_vec)

    # -- element/surface semantics (reference RayTransform) ---------------
    def to_local(self, pos, direction):
        """World -> local (reference ``transform_``, geom/transform.py:75)."""
        R = self.rot
        return vec_mat(pos - self.trans, R), vec_mat(direction, R)

    def to_world(self, pos, direction):
        """Local -> world (reference ``invTransform_``, geom/transform.py:101)."""
        R = self.rot
        return vec_mat(pos, R.T) + self.trans, vec_mat(direction, R.T)

    # -- bundle semantics (reference RayTransformBundle) -------------------
    def place(self, pos, direction):
        """Bundle placement: rotate then translate sampled local rays into the
        world (reference ``RayTransformBundle.transform_``,
        geom/transform.py:247-264)."""
        R = self.rot
        return vec_mat(pos, R.T) + self.trans, vec_mat(direction, R.T)

    # -- paraxial 5x5 decenter matrices ------------------------------------
    def paraxial(self):
        """5x5 shift into the element frame for the paraxial state
        [x, theta_x, y, theta_y, 1] (reference geom/transform.py:121-129)."""
        dtype = self.trans.dtype
        one = jnp.ones((), dtype)
        affine = -jnp.stack(
            [self.trans[0], self.rot_vec[0], self.trans[1], self.rot_vec[1], -one]
        )[:, None]
        left = jnp.eye(5, dtype=dtype)[:, :4]
        return jnp.concatenate([left, affine], axis=1)

    def paraxial_inv(self):
        """Inverse paraxial shift (reference geom/transform.py:131-139)."""
        dtype = self.trans.dtype
        one = jnp.ones((), dtype)
        affine = jnp.stack(
            [self.trans[0], self.rot_vec[0], self.trans[1], self.rot_vec[1], one]
        )[:, None]
        left = jnp.eye(5, dtype=dtype)[:, :4]
        return jnp.concatenate([left, affine], axis=1)


def compose(R_outer, t_outer, R_inner, t_inner):
    """Compose nested frames into a single world->inner map.

    With world->outer ``(p - t_o) @ R_o`` and outer->inner ``(e - t_i) @ R_i``
    the composition is ``(p - t_c) @ R_c`` with ``R_c = R_o @ R_i`` and
    ``t_c = t_o + t_i @ R_o.T``.  This folds the reference's two-level
    element/surface frame nesting (``geom/shape.py:37`` + ``primitives.py:50``)
    into one rotate+translate per surface.
    """
    R_c = mm(R_outer, R_inner)
    t_c = t_outer + mm(t_inner, jnp.swapaxes(R_outer, -1, -2))
    return R_c, t_c
