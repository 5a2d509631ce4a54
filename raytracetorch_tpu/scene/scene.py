"""Scene assembly: element specs + bundles -> jitted trace programs.

TPU-native equivalent of the reference's ``Scene`` / ``SequentialScene``
(``scene/base.py:8``, ``scene/sequential.py:6``): the scene holds *static*
structure (element specs, bundle list, bounce budget) and compiles pure
functions of the differentiable parameter pytree.  The reference's
index-map flattening (``scene/base.py:96-123``) becomes the SurfaceTable
build; its Python bounce/step loops become the drivers in core/trace.py.

Unified simulate signature (the reference's diverging ``simulate()`` vs
``simulate(rays)`` wart — SURVEY.md §2.8 — is resolved: both scene types
take ``(params, rays, key)`` and return ``(rays, sensors, aux)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.sensor import SensorConfig
from ..core.table import stack_records
from ..core.trace import trace_nonsequential, trace_sequential
from ..elements.ideal import paraxial_dist_mat
from ..geom.transform import mm
from ..rays.sources import sample_bundles


class Scene:
    """Non-sequential scene: nearest-hit bounce simulation."""

    sequential = False

    def __init__(self, elements=None, n_bounces=100):
        self.elements = list(elements or [])
        self.bundles = []          # list of (Bundle pytree, n_rays)
        self.n_bounces = n_bounces
        self.grid_shape = ()
        self.grid_half_extent = 1.0

    # -- population (reference scene/base.py:25-33) ------------------------

    def add_element(self, element):
        self.elements.append(element)
        self._static_meta = None
        return element

    def add_bundle(self, bundle, n_rays=200):
        self.bundles.append((bundle, n_rays))
        return bundle

    def clear_elements(self):
        """Drop all elements (reference scene/base.py:38-41)."""
        self.elements = []
        self._static_meta = None

    def clear_bundles(self):
        """Drop all bundles (reference scene/base.py:43-47)."""
        self.bundles = []

    def ray_cast(self, params, rays):
        """Nearest-hit query: (winner_surface_idx, hit_mask) plus the
        (element, surface) decomposition via the table's index maps
        (reference Scene.ray_cast, scene/base.py:144-178)."""
        from ..core.trace import nearest_hit
        table = self.build_table(params)
        win, hit = nearest_hit(table, rays.pos_c, rays.dir_c,
                               self.static_meta())
        return dict(surface=win, element=table.elem_id[win],
                    surf_in_element=table.surf_id[win], hit=hit)

    def find_element(self, name):
        for el in self.elements:
            if el.name == name:
                return el
        raise KeyError(f"No element named {name!r}")

    # -- parameters --------------------------------------------------------

    def init_params(self, dtype=jnp.float32):
        # params are keyed by element NAME: a duplicate would silently
        # alias two elements onto one slot (same pose, same curvatures —
        # or a KeyError deep in build when the schemas differ).  Shared
        # parameters are expressed by tying values in the pytree, not by
        # name collisions, so reject them with an actionable message.
        seen = {}
        for el in self.elements:
            if el.name in seen:
                raise ValueError(
                    f"duplicate element name '{el.name}' "
                    f"({type(seen[el.name]).__name__} and "
                    f"{type(el).__name__}): give each element a unique "
                    f"name= (params are keyed by name)")
            seen[el.name] = el
        return {el.name: el.init_params(dtype) for el in self.elements}

    def trainable(self):
        return {el.name: el.trainable() for el in self.elements}

    # -- compilation -------------------------------------------------------

    @property
    def n_sensors(self):
        return sum(1 for el in self.elements if el.is_sensor)

    @property
    def n_bundles(self):
        return max(len(self.bundles), 1)

    def sensor_config(self, n_bundles=None):
        return SensorConfig(
            n_sensors=self.n_sensors,
            n_bundles=n_bundles if n_bundles is not None else self.n_bundles,
            grid_shape=self.grid_shape,
            grid_half_extent=self.grid_half_extent,
        )

    def build_table(self, params):
        """Flatten all elements into the SurfaceTable (runs inside jit).

        The table dtype follows the parameter pytree, so
        ``init_params(jnp.float64)`` under ``jax.experimental.enable_x64``
        gives a full float64 trace (the dtype-policy option of reference
        config.py:197; used by wavefront analysis to beat the f32 OPL
        quantization floor)."""
        leaves = [l for l in jax.tree_util.tree_leaves(params)
                  if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
        dtype = jnp.asarray(leaves[0]).dtype if leaves else jnp.float32
        recs, elem_ids, surf_ids = [], [], []
        slot = 0
        for k, el in enumerate(self.elements):
            el_recs = el.build(params[el.name])
            if el.is_sensor:
                for r in el_recs:
                    r.sensor_slot = slot
                slot += 1
            recs.extend(el_recs)
            elem_ids.extend([k] * len(el_recs))
            surf_ids.extend(range(len(el_recs)))
        return stack_records(recs, elem_ids, surf_ids, dtype=dtype)

    # -- simulation --------------------------------------------------------

    def sample_rays(self, key, bundles=None, dtype=None):
        """Sample and merge all registered bundles.  ``bundles`` may override
        the stored pytrees (e.g. reparameterized under grad); ``dtype``
        sets the ray precision (pass jnp.float64 under jax.enable_x64 to
        match f64 params — see tests/test_x64.py)."""
        spec = bundles if bundles is not None else self.bundles
        return sample_bundles(key, spec,
                              jnp.float32 if dtype is None else dtype)

    def static_meta(self):
        """Per-surface compile-time kinds for the specialized sequential
        path (core/static_dispatch.py).  Kinds are structural (they do not
        depend on parameter values), so they are read off a throwaway build
        with the initial params, once, outside jit."""
        if getattr(self, '_static_meta', None) is None:
            from ..core.static_dispatch import StaticRowMeta
            meta, slot = [], 0
            for el in self.elements:
                for r in el.build(el.init_params()):
                    meta.append(StaticRowMeta(r.ph_kind, r.sb_kind,
                                              r.vb_kind, r.is_sensor,
                                              r.sb_invert, r.is_asphere,
                                              r.is_dispersive,
                                              plane=r.is_plane,
                                              slot=slot if el.is_sensor
                                              else 0,
                                              n_coat=r.n_coat,
                                              dispm=r.disp_model,
                                              metal=r.is_metal,
                                              metal_nk=r.metal_nk,
                                              coat_k=r.coat_k,
                                              ff=r.ff_powers or None,
                                              scatter=r.scatter_model,
                                              jones_chrom=r.jones_chrom,
                                              jones_bire=r.jones_bire,
                                              grin_steps=r.grin_steps,
                                              doe=r.doe,
                                              depol=r.scatter_depol))
                if el.is_sensor:    # mirrors build_table's slot assignment
                    slot += 1
            self._static_meta = meta
        return self._static_meta

    def fuzzy_fns(self):
        """Static {flat_surface_index: callable} map of Fuzzy apodization
        surfaces (reference phys/filter.py:36-50)."""
        out, k = {}, 0
        for el in self.elements:
            fn = getattr(el, 'intensity_fn', None)
            if fn is not None:
                for j in range(el.n_surfaces):
                    out[k + j] = fn
            k += el.n_surfaces
        return out

    def side_grids(self, params):
        """Traced {flat_surface_index: [H, W] array} side channel for
        PHASE_GRID rows (pixelated phase plates — the grid does not fit
        the fixed-width table row).  Built from params INSIDE jit, so
        jax.grad flows into every pixel."""
        out, k = {}, 0
        for el in self.elements:
            hook = getattr(el, 'phase_grid', None)
            if hook is not None:
                out[k] = hook(params[el.name])
            k += el.n_surfaces
        return out

    def simulate(self, params, rays, key, n_bundles=None, **kw):
        table = self.build_table(params)
        cfg = self.sensor_config(n_bundles)
        kw.setdefault('fuzzy_fns', self.fuzzy_fns())
        kw.setdefault('static_meta', self.static_meta())
        kw.setdefault('grids', self.side_grids(params))
        return trace_nonsequential(table, rays, key, self.n_bounces, cfg, **kw)

    def simulate_fused(self, params, rays, key, n_bundles=None,
                       interpret=None, block_rows=16, track_field=False,
                       E0=None, track_opl=False, record_paths=False,
                       record_hits=False):
        """Fused non-sequential trace: the ENTIRE bounce loop runs per
        VMEM tile (ops/pallas_trace.py::trace_nonseq_pallas) — at large N
        the XLA loop round-trips the ray state through HBM once per
        bounce, this kernel once total (16M x 8 bounces: 49 vs 171 ms on
        v5e).  Early-exits per tile once all rays settle, so the default
        100-bounce budget is safe.  Box/polyhedron volumes, — on real
        TPU — stochastic Fresnel (in-kernel PRNG, statistical parity,
        PARITY.md §15), in-kernel irradiance grids, polarization
        transport (``track_field``/``E0``), component-style fuzzy
        apodization (``FuzzyAperture(fn, components=True)``; legacy
        [N,3]-style callables assert with a pointer back to
        ``simulate``) and per-bounce recording
        (``record_paths``/``record_hits``, same aux format as
        ``simulate``) are supported, as are pixelated phase plates
        (``PhaseGridPlate`` — the traced [H, W] maps from
        ``side_grids(params)`` ride VMEM-resident with one-hot MXU
        corner reads, cond-guarded per bounce, maps <= 256², with
        differentiable per-pixel gradients).  ``jax.grad`` works via
        the fused checkpointed-scan backward (XLA-recompute for
        interpret/recording runs); stochastic Fresnel/scatter
        gradients work on real TPU via per-(tile, bounce) PRNG
        replay."""
        import jax as _jax

        from ..ops.pallas_trace import fused_nonseq_grad
        if interpret is None:
            interpret = _jax.devices()[0].platform != 'tpu'
        table = self.build_table(params)
        cfg = self.sensor_config(n_bundles)
        fuzzy = tuple(sorted(self.fuzzy_fns().items()))
        grids = self.side_grids(params) or None
        return fused_nonseq_grad(cfg, tuple(self.static_meta()),
                                 (interpret, block_rows, self.n_bounces,
                                  track_field, track_opl, fuzzy,
                                  record_paths, record_hits),
                                 table, rays, key, E0, grids)

    def simulate_fused_sharded(self, params, rays, key, mesh,
                               n_bundles=None, interpret=None,
                               block_rows=16, track_opl=False,
                               track_field=False, E0=None):
        """``simulate_fused`` across a device mesh (see the sequential
        variant's docstring): shard_map runs the bounce-loop kernel on
        each ray shard and psums the sensor moments and irradiance grid.
        The PRNG key is folded with the shard index (Fresnel draws
        decorrelate).  Per-ray aux streams (``track_opl`` /
        ``track_field``; ``E0`` is a replicated launch vector) come back
        sharded along N like the rays; differentiable like
        ``simulate_fused``."""
        import jax as _jax

        from ..ops.pallas_trace import fused_nonseq_grad
        from ..parallel.sharding import (mesh_ray_axes, shard_index,
                                         shard_map_trace)

        if interpret is None:
            interpret = _jax.devices()[0].platform != 'tpu'
        table = self.build_table(params)
        cfg = self.sensor_config(n_bundles)
        meta_t = tuple(self.static_meta())
        fuzzy = tuple(sorted(self.fuzzy_fns().items()))
        opts = (interpret, block_rows, self.n_bounces, track_field,
                track_opl, fuzzy)
        axes = mesh_ray_axes(mesh)
        grids = self.side_grids(params) or None
        has_e0, has_grids = E0 is not None, grids is not None

        def local(table, rays_shard, key, *extra):
            e0_ = extra[0] if has_e0 else None
            grids_ = extra[-1] if has_grids else None
            k_local = jax.random.fold_in(key, shard_index(mesh, axes))
            out, sens, aux = fused_nonseq_grad(
                cfg, meta_t, opts, table, rays_shard, k_local, e0_,
                grids_)
            sens = sens.replace(
                moments=_jax.lax.psum(sens.moments, axes),
                grid=(_jax.lax.psum(sens.grid, axes)
                      if cfg.grid_shape else sens.grid))
            return out, sens, aux

        extras = (() if E0 is None else (jnp.asarray(E0),)) \
            + ((grids,) if has_grids else ())
        f, _ = shard_map_trace(local, mesh, n_extra=len(extras), aux=True)
        return f(table, rays, key, *extras)

    # -- conversions (reference scene/base.py:261-289, sequential.py:80-105)

    def to_sequential(self, params=None):
        params = params or self.init_params()
        order = sorted(self.elements,
                       key=lambda el: float(params[el.name]['trans'][2]))
        seq = SequentialScene(order, n_bounces=self.n_bounces)
        seq.bundles = list(self.bundles)
        seq.grid_shape = self.grid_shape
        seq.grid_half_extent = self.grid_half_extent
        return seq


class SequentialScene(Scene):
    """Ordered surface-by-surface propagation (reference
    scene/sequential.py:6-36) — the lens-design workhorse and the benchmark
    configuration."""

    sequential = True

    def simulate(self, params, rays, key, n_bundles=None, **kw):
        table = self.build_table(params)
        cfg = self.sensor_config(n_bundles)
        kw.setdefault('fuzzy_fns', self.fuzzy_fns())
        kw.setdefault('static_meta', self.static_meta())
        kw.setdefault('grids', self.side_grids(params))
        return trace_sequential(table, rays, key, cfg, **kw)

    # Measured v5e crossover of the fused sequential kernel vs the XLA
    # driver (BASELINE.md): below ~2M rays XLA keeps the ray state in
    # VMEM anyway and wins (0.34 vs 0.49 ms @1M), above it the kernel's
    # single HBM round trip wins 2.4-2.9x.  simulate_fused auto-routes
    # below this so one entry point is never slower than simulate()
    # (results are bitwise-identical either way — same key schedule).
    FUSED_CROSSOVER_N = 2_000_000

    def simulate_fused(self, params, rays, key, n_bundles=None,
                       interpret=None, block_rows=16, track_opl=False,
                       track_field=False, E0=None, record_paths=False,
                       record_hits=False, auto_dispatch=True):
        """Fused Pallas trace: the whole surface chain runs in VMEM tiles —
        ONE HBM round trip for the ray state, vs one per surface for the
        XLA path.  Measured on v5e at the tuned block_rows=16: 2.4x
        faster at 64M rays (31.7 vs 77.4 ms), 2.7-2.9x at 4-16M; below
        ~2M rays XLA keeps the state in VMEM anyway and wins — so below
        ``FUSED_CROSSOVER_N`` this call routes to the (bitwise-identical)
        ``simulate`` automatically; ``auto_dispatch=False`` forces the
        kernel (benchmarking).
        Stochastic Fresnel, multi-sensor scenes, irradiance grids
        (accumulated in VMEM via one-hot MXU matmuls), ``track_opl``,
        ``track_field``/``E0``, component-style fuzzy apodization
        (``FuzzyAperture(fn, components=True)``; legacy [N,3]-style
        callables assert with a pointer back to ``simulate``),
        per-surface recording (``record_paths``/``record_hits``, same
        aux format as ``simulate``) and pixelated phase plates
        (PhaseGridPlate — the traced [H, W] side grids from
        ``side_grids(params)`` ride VMEM-resident with differentiable
        per-pixel maps up to 256x256; larger maps assert with a pointer
        back to ``simulate``) are supported with bitwise/parity-exact
        results vs ``simulate``.
        ``jax.grad`` works and also wins at large N: the backward pass is
        a fused Pallas reverse kernel (16M-ray grad step 20.6 vs 47.1 ms
        XLA on v5e; ops/pallas_trace.py::fused_trace_grad), including the
        opl and field streams (16M opl grad step: 4.6 vs 10.3 ms); grid
        configs ride it too; recording runs fall back to XLA-recompute
        backward (the record streams' cotangents then flow exactly)."""
        import jax as _jax

        from ..ops.pallas_trace import fused_trace_grad
        if interpret is None:
            interpret = _jax.devices()[0].platform != 'tpu'
        if auto_dispatch and not interpret \
                and rays.px.shape[0] < self.FUSED_CROSSOVER_N:
            return self.simulate(params, rays, key, n_bundles=n_bundles,
                                 track_opl=track_opl,
                                 track_field=track_field, E0=E0,
                                 record_paths=record_paths,
                                 record_hits=record_hits)
        table = self.build_table(params)
        cfg = self.sensor_config(n_bundles)
        fuzzy = tuple(sorted(self.fuzzy_fns().items()))
        grids = self.side_grids(params)
        return fused_trace_grad(cfg, tuple(self.static_meta()),
                                (interpret, block_rows, track_opl,
                                 track_field, fuzzy, record_paths,
                                 record_hits), table, rays, key, E0,
                                grids or None)

    def simulate_fused_sharded(self, params, rays, key, mesh,
                               n_bundles=None, interpret=None,
                               block_rows=16, track_opl=False,
                               track_field=False, E0=None):
        """``simulate_fused`` across a device mesh: shard_map runs the
        Pallas kernel per-shard on the local ray slice (pallas_call does
        not auto-shard like the XLA trace does), then psums the sensor
        moments/grids over the mesh — the production path for >>10M-ray
        batches on multi-chip slices.  Differentiable like simulate_fused.

        Per-ray aux streams (``track_opl`` / ``track_field``; ``E0`` is
        a replicated launch-polarization vector) come back sharded along
        N like the rays.  The PRNG key is folded with the shard index so
        stochastic Fresnel draws decorrelate across shards (results
        therefore match an unsharded trace statistically, not bitwise,
        for Fresnel scenes).  Pixelated phase plates ride like
        ``simulate_fused``: the traced side grids replicate over the
        mesh and shard_map's transpose psums their per-shard cotangents.
        """
        import jax as _jax

        from ..ops.pallas_trace import fused_trace_grad
        from ..parallel.sharding import (mesh_ray_axes, shard_index,
                                         shard_map_trace)

        if interpret is None:
            interpret = _jax.devices()[0].platform != 'tpu'
        table = self.build_table(params)
        cfg = self.sensor_config(n_bundles)
        meta_t = tuple(self.static_meta())
        fuzzy = tuple(sorted(self.fuzzy_fns().items()))
        opts = (interpret, block_rows, track_opl, track_field, fuzzy)
        axes = mesh_ray_axes(mesh)
        grids = self.side_grids(params) or None
        has_e0, has_grids = E0 is not None, grids is not None

        def local(table, rays_shard, key, *extra):
            e0_ = extra[0] if has_e0 else None
            grids_ = extra[-1] if has_grids else None
            k_local = jax.random.fold_in(key, shard_index(mesh, axes))
            out, sens, aux = fused_trace_grad(
                cfg, meta_t, opts, table, rays_shard, k_local, e0_,
                grids_)
            sens = sens.replace(
                moments=_jax.lax.psum(sens.moments, axes),
                grid=(_jax.lax.psum(sens.grid, axes)
                      if cfg.grid_shape else sens.grid))
            return out, sens, aux

        extras = (() if E0 is None else (jnp.asarray(E0),)) \
            + ((grids,) if has_grids else ())
        f, _ = shard_map_trace(local, mesh, n_extra=len(extras), aux=True)
        return f(table, rays, key, *extras)

    def paraxial(self, params):
        """Full-system 5x5 paraxial matrix: chain every element's surface
        matrices with free-space gap matrices (reference
        scene/sequential.py:38-62)."""
        all_z, all_m = [], []
        for el in self.elements:
            zs, mats = el.paraxial(params[el.name])
            all_z.extend(zs)
            all_m.extend(mats)
        m_sys = all_m[0]
        for i in range(len(all_m) - 1):
            dz = all_z[i + 1] - all_z[i]
            m_sys = mm(paraxial_dist_mat(dz), m_sys)
            m_sys = mm(all_m[i + 1], m_sys)
        return m_sys

    def seidel(self, params, aperture, field, **kw):
        """Third-order aberration report (utils/seidel.py): marginal+chief
        paraxial trace -> S_I..S_V, C_I/C_II, per-surface breakdown.
        Differentiable w.r.t. ``params`` — Seidel sums work as design
        targets.  See :func:`raytracetorch_tpu.utils.seidel.seidel`."""
        from ..utils.seidel import seidel as _seidel
        return _seidel(self, params, aperture, field, **kw)

    def first_order(self, params, **kw):
        """Gaussian system report (utils/firstorder.py): EFL/BFL/FFL,
        principal planes, entrance/exit pupils, F-number, NA, Lagrange
        invariant — differentiable scalars.  See
        :func:`raytracetorch_tpu.utils.firstorder.first_order`."""
        from ..utils.firstorder import first_order as _fo
        return _fo(self, params, **kw)

    def ray_fan(self, params, **kw):
        """Transverse ray-fan analysis (utils/firstorder.py): tangential
        + sagittal aberration fans vs relative pupil height at a field.
        See :func:`raytracetorch_tpu.utils.firstorder.ray_fan`."""
        from ..utils.firstorder import ray_fan as _rf
        return _rf(self, params, **kw)

    def field_scan(self, params, fields, **kw):
        """Real-ray field analysis (utils/fieldscan.py): astigmatic field
        curves z_T/z_S, distortion and relative illumination across a fan
        of field angles, in one batched trace.  Differentiable focus /
        distortion outputs.  See
        :func:`raytracetorch_tpu.utils.fieldscan.field_scan`."""
        from ..utils.fieldscan import field_scan as _fs
        return _fs(self, params, fields, **kw)

    def to_base(self):
        base = Scene(self.elements, n_bounces=self.n_bounces)
        base.bundles = list(self.bundles)
        base.grid_shape = self.grid_shape
        base.grid_half_extent = self.grid_half_extent
        return base


def describe(scene, params=None):
    """Human-readable surface table of a scene (the lens-design 'prescription'
    view).  Returns a string; print it."""
    import numpy as np
    from ..constants import PhysKind, SBKind, VBKind
    params = params or scene.init_params()
    meta = scene.static_meta()
    lines = [f"{'#':>3} {'element':<14} {'phys':<9} {'z':>9} "
             f"{'R':>10} {'notes'}"]
    k = 0
    for el in scene.elements:
        recs = el.build(params[el.name])
        for j, r in enumerate(recs):
            q = np.asarray(r.q)
            if abs(q[3]) < 1e-12 and abs(q[0]) > 1e-12:
                # pure quadratic (sphere/cylinder/cone): show sqrt(-q0)
                r0 = -q[4] / q[0]
                radius = (f"{np.sqrt(r0):8.3f}*" if r0 > 0 else "     cone")
            else:
                c = q[0] if abs(q[0]) > 1e-12 else q[1]
                radius = (f"{1.0 / c:9.3f}" if abs(c) > 1e-12
                          else "     flat")
            z = float(np.asarray(r.tw)[2])
            ph = PhysKind(meta[k].ph).name.lower()
            notes = []
            if meta[k].asph:
                notes.append('asphere')
            if meta[k].disp:
                from ..constants import DispModel
                kinds = {DispModel.CAUCHY: 'cauchy',
                         DispModel.SELLMEIER: 'sellmeier'}
                tags = sorted({kinds[m] for m in meta[k].dispm
                               if m in kinds})
                notes.append('dispersive[' + '+'.join(tags) + ']')
            if meta[k].n_coat:
                notes.append(f'coated[{meta[k].n_coat}]')
            if meta[k].metal:
                ph_row = np.asarray(r.ph, dtype=np.float64) \
                    if len(r.ph) >= 2 else None
                if ph_row is not None:
                    notes.append(f'metal[n={ph_row[0]:.2f},'
                                 f'k={ph_row[1]:.2f}]')
                else:
                    notes.append('metal')
            if meta[k].sensor:
                notes.append('sensor')
            if meta[k].sb != SBKind.NONE:
                notes.append(SBKind(meta[k].sb).name.lower())
            if meta[k].vb != VBKind.NONE:
                notes.append(VBKind(meta[k].vb).name.lower())
            name = el.name if j == 0 else ''
            lines.append(f"{k:>3} {name:<14} {ph:<9} {z:>9.3f} "
                         f"{radius} {' '.join(notes)}")
            k += 1
    return "\n".join(lines)
