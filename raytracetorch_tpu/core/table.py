"""SurfaceTable: the compiled scene — a struct-of-arrays over all K surfaces.

This is the TPU-native inversion of the reference's object graph: where the
reference walks ``Scene.elements[k].shape.surfaces[j]`` nn.Modules in Python
(``scene/base.py:96-123`` builds index maps over them), we flatten every
surface of every element into dense ``[K, ...]`` arrays once per trace, inside
jit, from the differentiable parameter pytree.  Each row fully describes one
surface: unified quadric coefficients, composed world->surface frame, bound
specs, physics spec, and sensor bookkeeping.

The table is rebuilt from ``params`` on every jitted call — it is tiny
(K is tens of surfaces) and the rebuild keeps gradients flowing from traced
rays back to curvatures/thicknesses/poses, replacing the reference's
parameter-aliasing trick (shared nn.Parameter objects, elements/lens.py:41-57)
with a single source of truth.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..constants import (MAX_FF_TERMS, MAX_HALFSPACES, PhysKind, SBKind,
                         VBKind)


class SurfaceTable(struct.PyTreeNode):
    """All per-surface data, stacked along the leading K axis."""

    q: jnp.ndarray          # [K, 5] implicit quadric coefficients
    n_sign: jnp.ndarray     # [K] normal orientation sign
    Rw: jnp.ndarray         # [K, 3, 3] world->surface rotation
    tw: jnp.ndarray         # [K, 3] world->surface translation
    Rs: jnp.ndarray         # [K, 3, 3] element->surface rotation
    ts: jnp.ndarray         # [K, 3] element->surface translation
    sb_kind: jnp.ndarray    # [K] int32 surface-local bound kind
    sb: jnp.ndarray         # [K, 4] surface-local bound params
    sb_invert: jnp.ndarray  # [K] bool
    vb_kind: jnp.ndarray    # [K] int32 volume bound kind
    vb: jnp.ndarray         # [K, 8] volume bound params
    hp_n: jnp.ndarray       # [K, P, 3] half-space normals (element frame)
    hp_d: jnp.ndarray       # [K, P] half-space offsets
    hp_mask: jnp.ndarray    # [K, P] bool valid half-spaces
    ph_kind: jnp.ndarray    # [K] int32 physics kind
    ph: jnp.ndarray         # [K, 6] physics params
    asph: jnp.ndarray       # [K, 4] even-asphere coefficients a4..a10
    ff: jnp.ndarray         # [K, MAX_FF_TERMS] freeform XY-poly coefficients
                            # (matching STATIC exponent pairs live on
                            # StaticRowMeta.ff)
    disp: jnp.ndarray       # [K, 12] dispersion coefficients: [in 6 | out 6]
                            # (Cauchy B in the side's slot 0; Sellmeier
                            # B1 B2 B3 C1 C2 C3 — see DispModel)
    coat: jnp.ndarray       # [K, 16] thin-film stack: (n, d_um) x 8 layers
    is_sensor: jnp.ndarray  # [K] bool
    sensor_slot: jnp.ndarray  # [K] int32 (0 if not a sensor)
    elem_id: jnp.ndarray    # [K] int32
    surf_id: jnp.ndarray    # [K] int32 (index within the element)

    @property
    def n_surfaces(self):
        return self.q.shape[0]

    def row(self, k):
        """Row view (scalars / small vectors) for the unrolled sequential
        trace."""
        return jax.tree_util.tree_map(lambda a: a[k], self)

    def gather(self, idx):
        """Per-ray gather of winning rows ([N] index -> [N, ...] table)."""
        return jax.tree_util.tree_map(lambda a: a[idx], self)


@dataclasses.dataclass
class SurfaceRec:
    """One surface row under construction (plain Python, traced leaves).

    Element specs emit these; ``stack_records`` packs them into a
    SurfaceTable.  All numeric fields may be traced jnp scalars so gradients
    flow from table entries back to element parameters.
    """

    q: Any                       # [5]
    n_sign: float
    Rw: Any                      # [3, 3]
    tw: Any                      # [3]
    Rs: Any = None               # [3, 3] (defaults to identity)
    ts: Any = None               # [3]
    sb_kind: int = SBKind.NONE
    sb: Sequence = ()
    sb_invert: bool = False
    vb_kind: int = VBKind.NONE
    vb: Sequence = ()
    halfspaces: Sequence = ()    # sequence of (normal [3], offset scalar)
    ph_kind: int = PhysKind.TRANSMIT
    ph: Sequence = ()            # up to 6 entries: ior_in, ior_out, Cx, Cy, Dx, Dy
    asph: Sequence = ()          # even-asphere a4..a10 (is_asphere marks use)
    is_asphere: bool = False
    ff: Sequence = ()            # freeform XY-poly coefficients (traced)
    ff_powers: tuple = ()        # STATIC (i, j) exponent pairs per coeff
                                 # (carried on StaticRowMeta, not a column)
    disp: Sequence = ()          # 12-wide [in 6 | out 6] per DispModel layout
    disp_model: tuple = (0, 0)   # (DispModel of ior_in side, of ior_out side)
    is_dispersive: bool = False
    coat: Sequence = ()          # interleaved (n, d_um) pairs, outermost 1st
    n_coat: int = 0              # static layer count (0 = bare interface)
    coat_k: Any = None           # STATIC per-layer extinction coefficients
                                 # (absorbing films; None/zeros = dielectric).
                                 # Plain float tuple — carried on
                                 # StaticRowMeta, not a table column.
    is_metal: bool = False       # REFLECT row with an absorbing (n, -ik)
                                 # substrate in ph[0:2] (coated-mirror physics)
    metal_nk: Any = None         # STATIC ((n knots), (k knots)) on
                                 # coatings.METAL_GRID_UM: metal dispersion
                                 # (None = fixed ph[0:2] index at all
                                 # wavelengths).  Plain float tuples — not a
                                 # table column; carried on StaticRowMeta.
    is_sensor: bool = False
    sensor_slot: int = 0
    is_plane: bool = False       # static: row is a z=0 plane (fast path)
    scatter_model: Any = None    # STATIC 'lambert'|'gauss_r'|'gauss_t'
                                 # for PhysKind.SCATTER rows (albedo and
                                 # sigma ride ph[2]/ph[3]); carried on
                                 # StaticRowMeta, not a table column
    scatter_depol: bool = False  # STATIC: under track_field, reset the
                                 # E-state at this scatter surface
                                 # instead of raising (depolarization
                                 # proxy — core/field.py SCATTER case)
    jones_chrom: bool = False    # STATIC: JONES retardance scales as
                                 # lam0/lam (ph[4] = design wavelength)
    jones_bire: Any = None       # STATIC waveplate crystal name
                                 # ('QUARTZ'|'MGF2'|'CALCITE'): retardance
                                 # additionally scales as dn(lam)/dn(lam0)
                                 # (utils/birefringence.py Sellmeiers)
    grin_steps: int = 0          # STATIC RK4 step count for GRIN rows
    doe: Any = None              # STATIC (n_radial_terms, efficiency)
                                 # for PhysKind.DOE rows; the traced
                                 # phase coefficients ride ``ff``


def _pad_vec(values, width, dtype=jnp.float32):
    vals = [jnp.asarray(v, dtype) for v in values]
    vals += [jnp.zeros((), dtype)] * (width - len(vals))
    return jnp.stack(vals[:width])


def stack_records(recs, elem_ids, surf_ids, dtype=jnp.float32):
    """Pack SurfaceRecs into a SurfaceTable (runs inside jit; K static)."""
    eye = jnp.eye(3, dtype=dtype)
    zero3 = jnp.zeros(3, dtype=dtype)

    def hp_arrays(rec):
        n = jnp.zeros((MAX_HALFSPACES, 3), dtype)
        d = jnp.zeros((MAX_HALFSPACES,), dtype)
        m = np.zeros((MAX_HALFSPACES,), bool)
        for i, (nrm, off) in enumerate(rec.halfspaces):
            n = n.at[i].set(jnp.asarray(nrm, dtype))
            d = d.at[i].set(jnp.asarray(off, dtype))
            m[i] = True
        return n, d, jnp.asarray(m)

    hp = [hp_arrays(r) for r in recs]
    return SurfaceTable(
        q=jnp.stack([jnp.asarray(r.q, dtype) for r in recs]),
        n_sign=jnp.asarray([r.n_sign for r in recs], dtype),
        Rw=jnp.stack([jnp.asarray(r.Rw, dtype) for r in recs]),
        tw=jnp.stack([jnp.asarray(r.tw, dtype) for r in recs]),
        Rs=jnp.stack([eye if r.Rs is None else jnp.asarray(r.Rs, dtype)
                      for r in recs]),
        ts=jnp.stack([zero3 if r.ts is None else jnp.asarray(r.ts, dtype)
                      for r in recs]),
        sb_kind=jnp.asarray([int(r.sb_kind) for r in recs], jnp.int32),
        sb=jnp.stack([_pad_vec(r.sb, 4, dtype) for r in recs]),
        sb_invert=jnp.asarray([bool(r.sb_invert) for r in recs]),
        vb_kind=jnp.asarray([int(r.vb_kind) for r in recs], jnp.int32),
        vb=jnp.stack([_pad_vec(r.vb, 8, dtype) for r in recs]),
        hp_n=jnp.stack([h[0] for h in hp]),
        hp_d=jnp.stack([h[1] for h in hp]),
        hp_mask=jnp.stack([h[2] for h in hp]),
        ph_kind=jnp.asarray([int(r.ph_kind) for r in recs], jnp.int32),
        ph=jnp.stack([_pad_vec(r.ph, 6, dtype) for r in recs]),
        asph=jnp.stack([_pad_vec(r.asph, 4, dtype) for r in recs]),
        ff=jnp.stack([_pad_vec(r.ff, MAX_FF_TERMS, dtype) for r in recs]),
        disp=jnp.stack([_pad_vec(r.disp, 12, dtype) for r in recs]),
        coat=jnp.stack([_pad_vec(r.coat, 16, dtype) for r in recs]),
        is_sensor=jnp.asarray([bool(r.is_sensor) for r in recs]),
        sensor_slot=jnp.asarray([int(r.sensor_slot) for r in recs], jnp.int32),
        elem_id=jnp.asarray(elem_ids, jnp.int32),
        surf_id=jnp.asarray(surf_ids, jnp.int32),
    )
