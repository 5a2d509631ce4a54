"""Ray-surface intersection against SurfaceTable rows.

One code path serves both trace drivers:

- the sequential trace calls it per row (scalars broadcast over [N] rays),
- the non-sequential trace calls it for all rows at once ([K] broadcast over
  [N, K]) and again for the gathered winners ([N] vs [N]).

Semantics replicate the reference protocol exactly (SURVEY.md §1 "dual
protocol"): per-root surface-local bounds (geom/bounded.py:20-36), min
positive root (geom/primitives.py:28-36), then the element-volume bound on
the chosen hit (geom/shape.py:25-59).  The t value for an accepted hit is
identical between cheap test and differentiable recompute, so we compute it
once, differentiably, and take stop-gradient only of the discrete masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom.bounds import sb_check_inverted, vb_check
from ..geom.surfaces import min_positive, solve_roots, surface_normal


def intersect(row, pos, direction):
    """Intersect rays with table row(s).

    Args:
      row: SurfaceTable (or a row view) whose leading dims broadcast with the
        ray batch: scalars for one surface, [K] against [N, K] rays, or [N]
        gathered winners.
      pos, direction: [..., 3] world-frame ray state.

    Returns dict with:
      t        [...]   ray parameter (0 where invalid — sanitized)
      valid    [...]   bool hit mask (bounds + positivity)
      hit_s    [..., 3] hit point, surface frame
      hit_e    [..., 3] hit point, element frame
      o_s, d_s [..., 3] ray in the surface frame (for normals / reuse)
    """
    o_s = _mul_vec_mat(pos - row.tw, row.Rw)
    d_s = _mul_vec_mat(direction, row.Rw)

    (t1, v1), (t2, v2) = solve_roots(row.q, o_s, d_s)

    # Per-root surface-local bounds (SurfaceBounded._check_t)
    hit1 = o_s + t1[..., None] * d_s
    hit2 = o_s + t2[..., None] * d_s
    v1 = v1 & sb_check_inverted(row.sb_kind, row.sb, row.sb_invert, hit1)
    v2 = v2 & sb_check_inverted(row.sb_kind, row.sb, row.sb_invert, hit2)

    scale = jnp.sqrt(jnp.sum(o_s * o_s, axis=-1) + 1e-12)
    t, valid = min_positive([(t1, v1), (t2, v2)],
                            scale=jax.lax.stop_gradient(scale))

    hit_s = o_s + t[..., None] * d_s
    hit_e = _mul_vec_mat(hit_s, _transpose(row.Rs)) + row.ts

    # Element-volume bound on the chosen hit (Shape.inBounds)
    valid = valid & vb_check(row.vb_kind, row.vb, row.hp_n, row.hp_d,
                             row.hp_mask, hit_e)
    return dict(t=t, valid=valid, hit_s=hit_s, hit_e=hit_e, o_s=o_s, d_s=d_s)


def normal_world(row, hit_s):
    """World-frame unit normal at a surface-frame hit point.

    n_world = n_local @ Rw.T — the composed form of the reference's two
    rotations (primitives.py:94, shape.py:85)."""
    n_sign = jnp.asarray(row.n_sign)
    n_local = surface_normal(row.q, jnp.broadcast_to(n_sign, hit_s.shape[:-1]),
                             hit_s)
    return _mul_vec_mat(n_local, _transpose(row.Rw))


def _transpose(m):
    return jnp.swapaxes(m, -1, -2)


def _mul_vec_mat(v, m):
    """Row-vector times matrix with broadcasting: v [..., 3] @ m [..., 3, 3]."""
    return jnp.einsum('...i,...ij->...j', v, m,
                      precision=jax.lax.Precision.HIGHEST)
