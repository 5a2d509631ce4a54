"""Ray-surface intersection against SurfaceTable rows (component-planar).

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

All ray/hit/normal vectors are component tuples (x, y, z) — geom/vec3.py
explains why this layout is ~20x faster than [N, 3] arrays on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom import vec3 as v3
from ..geom.bounds import sb_check_inverted, vb_check
from ..geom.surfaces import (asph_normal, asph_refine, ff_normal,
                             ff_refine, min_positive,
                             solve_roots, surface_normal)


def intersect(row, pos, direction, static_meta=None):
    """Intersect rays with table row(s).

    Args:
      row: SurfaceTable (or a row view) whose leading dims broadcast with the
        ray batch: scalars for one surface, [K] against [N, K] rays, or [N]
        gathered winners.
      pos, direction: component tuples of [...] world-frame ray state.
      static_meta: optional StaticRowMeta — when the row's kinds are
        compile-time constants (sequential trace), evaluate only the one
        bound formula each instead of the dense compute-all-select.

    Returns dict with:
      t        [...]  ray parameter (0 where invalid — sanitized)
      valid    [...]  bool hit mask (bounds + positivity)
      hit_s    tuple  hit point, surface frame
      hit_e    tuple  hit point, element frame
      o_s, d_s tuple  ray in the surface frame (for normals / reuse)
    """
    o_s = v3.rot(v3.sub(pos, v3.from_array(row.tw)), row.Rw)
    d_s = v3.rot(direction, row.Rw)

    if static_meta is not None and static_meta.plane:
        # Static plane specialization: q = (0,0,0,-2,0) always takes
        # solve_roots' linear branch, so inline exactly that branch
        # (B = -2 dz, C = -2 oz -> t = -C/B_safe) and skip the quadric
        # solver, discriminant sqrt, and second root entirely.  Bitwise
        # identical to the general path for plane rows.
        from ..constants import SOLVER_EPS
        B = -2.0 * d_s[2]
        B_safe = jnp.where(jnp.abs(B) < SOLVER_EPS, SOLVER_EPS, B)
        t1 = (2.0 * o_s[2]) / B_safe
        v1 = jnp.abs(B) >= SOLVER_EPS
        t2, v2 = t1, v1
    else:
        (t1, v1), (t2, v2) = solve_roots(row.q, o_s, d_s)

    if static_meta is not None and getattr(static_meta, 'ff', None):
        # Freeform XY-polynomial surface: Newton-refine the base-conic
        # roots onto S(x, y) (geom/surfaces.py::ff_refine); exponent
        # pairs are static, coefficients traced table entries
        c = row.q[..., 0]
        kc2 = row.q[..., 2] * c
        acoef = [row.asph[..., i] for i in range(4)]
        fcoef = [row.ff[..., m] for m in range(len(static_meta.ff))]
        t1, v1 = ff_refine(c, kc2, acoef, static_meta.ff, fcoef,
                           o_s, d_s, t1, v1)
        t2, v2 = ff_refine(c, kc2, acoef, static_meta.ff, fcoef,
                           o_s, d_s, t2, v2)
    elif static_meta is not None and static_meta.asph:
        # Even asphere: Newton-refine the base-conic roots onto the aspheric
        # surface (reference geom/complex.py stubs this; see
        # geom/surfaces.py::asph_refine)
        c = row.q[..., 0]
        kc2 = row.q[..., 2] * c
        coeffs = [row.asph[..., i] for i in range(4)]
        t1, v1 = asph_refine(c, kc2, coeffs, o_s, d_s, t1, v1)
        t2, v2 = asph_refine(c, kc2, coeffs, o_s, d_s, t2, v2)

    if static_meta is not None:
        from ..constants import SBKind, VBKind
        from .static_dispatch import sb_check_one, vb_check_one

        if static_meta.sb == SBKind.NONE:
            sb = None      # statically no bound — skip entirely
        else:
            def sb(hit):
                keep = sb_check_one(static_meta.sb, row.sb, hit)
                # the invert flag is static scene structure
                return ~keep if static_meta.invert else keep

        if static_meta.vb == VBKind.NONE:
            vb = None
        else:
            def vb(hit):
                return vb_check_one(static_meta.vb, row.vb, row.hp_n,
                                    row.hp_d, row.hp_mask, hit)
    else:
        def sb(hit):
            return sb_check_inverted(row.sb_kind, row.sb, row.sb_invert, hit)

        def vb(hit):
            return vb_check(row.vb_kind, row.vb, row.hp_n, row.hp_d,
                            row.hp_mask, hit)

    # Per-root surface-local bounds (SurfaceBounded._check_t)
    if sb is not None:
        v1 = v1 & sb(v3.fma(o_s, t1, d_s))
        v2 = v2 & sb(v3.fma(o_s, t2, d_s))

    # Self-intersection guard scale: the f32 error of a landed hit point
    # scales with the WORLD coordinate magnitude (pos ~ tw + o_s — the
    # subtraction above cancels catastrophically), not just the local
    # offset.  With |o_s| alone, near-axis rays landing on a far plane
    # (|o_s| ~ 0.1 at z ~ 19) re-hit it at t ~ 5e-6 > eps and re-apply
    # physics — observed as >1% phantom sensor re-crossings whose count
    # depended on how XLA fused the previous bounce's FMA.
    scale = jnp.sqrt(v3.norm2(o_s) + v3.norm2(pos) + 1e-12)
    roots = ([(t1, v1)] if static_meta is not None and static_meta.plane
             else [(t1, v1), (t2, v2)])
    t, valid = min_positive(roots, scale=jax.lax.stop_gradient(scale))

    hit_s = v3.fma(o_s, t, d_s)
    # element frame: e = s @ Rs.T + ts
    hit_e = v3.add(v3.rot_t(hit_s, row.Rs), v3.from_array(row.ts))

    # Element-volume bound on the chosen hit (Shape.inBounds)
    if vb is not None:
        valid = valid & vb(hit_e)
    return dict(t=t, valid=valid, hit_s=hit_s, hit_e=hit_e, o_s=o_s, d_s=d_s)


def normal_world(row, hit_s, static_meta=None):
    """World-frame unit normal (component tuple) at a surface-frame hit.

    n_world = n_local @ Rw.T — the composed form of the reference's two
    rotations (primitives.py:94, shape.py:85)."""
    if static_meta is not None and getattr(static_meta, 'ff', None):
        c = row.q[..., 0]
        kc2 = row.q[..., 2] * c
        acoef = [row.asph[..., i] for i in range(4)]
        fcoef = [row.ff[..., m] for m in range(len(static_meta.ff))]
        n_local = ff_normal(c, kc2, acoef, static_meta.ff, fcoef, hit_s)
    elif static_meta is not None and static_meta.asph:
        c = row.q[..., 0]
        kc2 = row.q[..., 2] * c
        coeffs = [row.asph[..., i] for i in range(4)]
        n_local = asph_normal(c, kc2, coeffs, hit_s)
    elif static_meta is not None and static_meta.plane:
        # plane normal is +z in the surface frame (the general formula's
        # 2/(2+NORMAL_EPS) rounds to exactly 1.0f); n @ Rw.T = Rw[:, 2]
        return (row.Rw[..., 0, 2] + 0.0 * hit_s[0],
                row.Rw[..., 1, 2] + 0.0 * hit_s[1],
                row.Rw[..., 2, 2] + 0.0 * hit_s[2])
    else:
        n_sign = jnp.asarray(row.n_sign)
        n_local = surface_normal(row.q, n_sign, hit_s)
    return v3.rot_t(n_local, row.Rw)
