"""Trace drivers: sequential (ordered) and non-sequential (nearest-hit) loops.

Replaces the reference's two simulation drivers with host-sync-free jitted
programs (the four ``.any()`` host round-trips per step in
``scene/base.py:140-218`` are the reference's main performance sin; here dead
rays are masked no-ops and the whole trace is one XLA program):

- ``trace_sequential`` — the lens-design workhorse
  (``scene/sequential.py:12-36``): visit each surface once in table order.
  K is static, so the loop is *unrolled at trace time* with per-surface
  statically-specialized bound/physics formulas (core/static_dispatch.py);
  XLA fuses the whole surface chain into one pass over the ray arrays.

- ``trace_nonsequential`` — the bounce loop (``scene/base.py:129-235``):
  ``lax.scan`` over bounces; per bounce, a stop-gradient nearest-hit argmin
  over all [N, K] candidates (cf. the no-grad ``ray_cast``,
  scene/base.py:144-178) followed by a differentiable recompute for each
  ray's winning surface (the detach-argmin / recompute-winner pattern,
  SURVEY.md §3.1).

Ray state (Rays) is natively component-planar — see geom/vec3.py for why.
Both drivers accumulate sensor statistics on the fly (core/sensor.py) and
thread an explicit PRNG key (one fold per surface / bounce) for the
stochastic Fresnel branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import BIG
from ..geom import vec3 as v3
from ..rays.ray import Rays
from .intersect import intersect, normal_world
from .physics import apply_physics
from .sensor import SensorConfig, SensorState


def _surface_step(row, rays: Rays, key, cfg: SensorConfig,
                  sensors: SensorState, fuzzy_fn=None, static_meta=None):
    """Apply one surface interaction to the full ray batch (masked).

    With ``static_meta`` (sequential path) the bound and physics formulas
    are specialized to the row's compile-time kinds (core/static_dispatch.py).
    """
    res = intersect(row, rays.pos_c, rays.dir_c, static_meta=static_meta)
    active = res['valid'] & (rays.intensity > 0)

    n_w = normal_world(row, res['hit_s'])
    needs_u = static_meta is None or static_meta.ph == 4   # FRESNEL
    u = (jax.random.uniform(key, rays.intensity.shape) if needs_u
         else jnp.zeros_like(rays.intensity))
    if static_meta is not None:
        from .static_dispatch import apply_physics_one
        new_dir, imod = apply_physics_one(static_meta, row, res['hit_s'],
                                          rays.dir_c, n_w, u)
    else:
        new_dir, imod = apply_physics(
            row.ph_kind, row.ph, row.Rw, row.sb_kind, row.sb,
            res['hit_s'], rays.dir_c, n_w, u)
    if fuzzy_fn is not None:
        # Custom apodization of a Fuzzy surface (reference phys/filter.py:36-50)
        imod = imod * fuzzy_fn(v3.to_array(res['hit_s']))

    # Differentiable global hit recompute (reference shape.py:81): the t used
    # here is the same differentiable scalar chosen by the bound-masked
    # min-positive selection.
    new_pos = v3.fma(rays.pos_c, res['t'], rays.dir_c)

    # Sensor accumulation uses the surface-local hit and the *incoming*
    # intensity (reference elements/sensor.py:36 records rays.intensity).
    w = jnp.where(active & row.is_sensor, rays.intensity, 0.0)
    sensors = sensors.record(cfg, row.sensor_slot, rays.ray_id,
                             res['hit_s'], w)

    rays = rays.masked_update(active, new_pos, new_dir, imod)
    return rays, sensors, active, res


def trace_sequential(table, rays: Rays, key,
                     cfg: SensorConfig = SensorConfig(),
                     record_paths: bool = False,
                     record_hits: bool = False,
                     fuzzy_fns=None,
                     static_meta=None):
    """Ordered pass over every surface row (reference SequentialScene).

    Returns ``(rays, sensors, aux)`` where ``aux`` optionally carries
    ``paths [K+1, N, 3]`` (the Paths proxy equivalent, rays/ray.py:100) and/or
    per-surface hit records ``(hits [K, N, 3], weights [K, N])``.
    """
    k_surf = table.n_surfaces
    keys = jax.random.split(key, max(k_surf, 1))
    sensors = SensorState.init(cfg, dtype=rays.px.dtype)
    pr = rays

    paths = [v3.to_array(pr.pos_c)] if record_paths else None
    hits, hit_w = ([], []) if record_hits else (None, None)

    fuzzy_fns = fuzzy_fns or {}
    for k in range(k_surf):
        row = table.row(k)
        meta = static_meta[k] if static_meta is not None else None
        pr, sensors, active, res = _surface_step(row, pr, keys[k], cfg,
                                                 sensors,
                                                 fuzzy_fn=fuzzy_fns.get(k),
                                                 static_meta=meta)
        if record_paths:
            paths.append(v3.to_array(pr.pos_c))
        if record_hits:
            hits.append(v3.to_array(res['hit_s']))
            hit_w.append(jnp.where(active, pr.intensity, 0.0))

    aux = {}
    if record_paths:
        aux['paths'] = jnp.stack(paths)
    if record_hits:
        aux['hits'] = jnp.stack(hits)
        aux['hit_weights'] = jnp.stack(hit_w)
    return pr, sensors, aux


def nearest_hit(table, pos, direction):
    """All-surface nearest-hit query (reference ``Scene.ray_cast``,
    scene/base.py:144-178), under stop_gradient like the reference's
    ``torch.no_grad``.  ``pos``/``direction`` are component tuples of [N].

    Returns (winner_idx [N], hit_mask [N]).
    """
    def t_of():
        p = tuple(c[:, None] for c in pos)
        d = tuple(c[:, None] for c in direction)
        res = intersect(table, p, d)
        return jnp.where(res['valid'], res['t'], BIG)   # [N, K]

    t_all = lax.stop_gradient(t_of())
    win = jnp.argmin(t_all, axis=1)
    t_min = jnp.take_along_axis(t_all, win[:, None], axis=1)[:, 0]
    return win, t_min < BIG * 0.5


def bounce_step(table, rays: Rays, key, cfg: SensorConfig,
                sensors: SensorState, fuzzy_fns=None):
    """One non-sequential physics bounce (reference ``Scene.step``,
    scene/base.py:180-235) — fully batched, no per-(element,surface) Python
    dispatch: gather each ray's winning row and recompute differentiably."""
    win, hit = nearest_hit(table, rays.pos_c, rays.dir_c)
    rows = table.gather(win)    # [N, ...] — index is stop-gradient
    res = intersect(rows, rays.pos_c, rays.dir_c)
    active = hit & res['valid'] & (rays.intensity > 0)

    n_w = normal_world(rows, res['hit_s'])
    u = jax.random.uniform(key, rays.intensity.shape)
    new_dir, imod = apply_physics(
        rows.ph_kind, rows.ph, rows.Rw, rows.sb_kind, rows.sb,
        res['hit_s'], rays.dir_c, n_w, u)
    for idx, fn in (fuzzy_fns or {}).items():
        imod = jnp.where(win == idx, imod * fn(v3.to_array(res['hit_s'])),
                         imod)
    new_pos = v3.fma(rays.pos_c, res['t'], rays.dir_c)

    w = jnp.where(active & rows.is_sensor, rays.intensity, 0.0)
    sensors = sensors.record(cfg, rows.sensor_slot, rays.ray_id,
                             res['hit_s'], w)
    rays = rays.masked_update(active, new_pos, new_dir, imod)
    return rays, sensors, active


def trace_nonsequential(table, rays: Rays, key, n_bounces: int,
                        cfg: SensorConfig = SensorConfig(),
                        record_paths: bool = False,
                        remat: bool = False,
                        fuzzy_fns=None,
                        static_meta=None):
    """Bounce loop until the static bounce budget (reference
    ``Scene.simulate``, scene/base.py:129-142; the early-exit host sync
    becomes masked no-op bounces — wrong-free and jit-clean)."""
    del static_meta   # kinds are traced per ray here; dense dispatch applies
    sensors = SensorState.init(cfg, dtype=rays.px.dtype)
    pr = rays

    def body(carry, k_key):
        pr, sensors = carry
        pr, sensors, _ = bounce_step(table, pr, k_key, cfg, sensors,
                                     fuzzy_fns=fuzzy_fns)
        ys = v3.to_array(pr.pos_c) if record_paths else None
        return (pr, sensors), ys

    if remat:
        body = jax.checkpoint(body)

    keys = jax.random.split(key, n_bounces)
    (pr, sensors), ys = lax.scan(body, (pr, sensors), keys)
    aux = {'paths': ys} if record_paths else {}
    return pr, sensors, aux
