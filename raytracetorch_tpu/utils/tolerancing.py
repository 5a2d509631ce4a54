"""Monte-Carlo tolerancing: element-pose perturbation analysis.

TPU-native re-design of the reference's ``RayTransformNoisy``
(``geom/transform.py:141-242``), which jitters an element's pose per ray
with freeze/unfreeze caching.  Here perturbation is explicit and functional:

- :func:`monte_carlo_tolerance` — vmap over M *trials*: each trial perturbs
  the selected elements' poses once (a physical as-built system) and runs a
  full trace, returning per-trial sensor statistics.  This is the
  build-variation study lens designers actually run, and it vectorizes
  perfectly (trials x rays on the MXU-free VPU path).
- :func:`per_ray_perturbed_trace` — the reference's exact semantics (every
  ray sees an independently perturbed pose, equivalent to its frozen
  ``addNoise(N)``, transform.py:195-200), via vmap over rays.

``noise`` maps element name -> (std_translation[3], std_rotation[3]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def _sample_deltas(key, noise, n=None):
    """Per-element pose deltas: {name: {'trans': d, 'rot_vec': d}}."""
    deltas = {}
    for i, (name, (std_t, std_r)) in enumerate(sorted(noise.items())):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        shape = (3,) if n is None else (n, 3)
        deltas[name] = {
            'trans': jax.random.normal(k1, shape) * jnp.asarray(std_t),
            'rot_vec': jax.random.normal(k2, shape) * jnp.asarray(std_r),
        }
    return deltas


def _apply_deltas(params, deltas):
    out = {k: dict(v) for k, v in params.items()}
    for name, d in deltas.items():
        out[name]['trans'] = out[name]['trans'] + d['trans']
        out[name]['rot_vec'] = out[name]['rot_vec'] + d['rot_vec']
    return out


class _Planar:
    """Indexable facade over component-planar data (nested tuples of [N]
    arrays) serving the trace core's ``R[..., i, j]`` / ``t[..., i]``
    access pattern: trailing static indices walk the nesting, returning a
    contiguous [N] component (the planar rule, geom/vec3.py)."""

    __slots__ = ('v',)

    def __init__(self, v):
        self.v = v

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        if idx and idx[0] is Ellipsis:
            idx = idx[1:]
        out = self.v
        for i in idx:
            out = out[i]
        return out


def _rodrigues_planar(rx, ry, rz):
    """Rodrigues rotation as a 3x3 nested tuple of [N] components.

    Identical math to geom.transform.rodrigues (R = I + aK + bK^2) but with
    K^2 expanded analytically (K^2 = r r^T - theta^2 I) into pure planar
    FMAs — no [N, 3, 3] arrays, no batched 3x3 matmuls, fully fusable."""
    r = (rx, ry, rz)
    theta2 = rx * rx + ry * ry + rz * rz
    small = theta2 < 1e-12
    t2s = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / t2s)
    zero = jnp.zeros_like(rx)
    K = ((zero, -rz, ry), (rz, zero, -rx), (-ry, rx, zero))
    return tuple(
        tuple((1.0 if i == j else 0.0) + a * K[i][j]
              + b * (r[i] * r[j] - (theta2 if i == j else 0.0))
              for j in range(3))
        for i in range(3))


class _PerRayFrameTable:
    """SurfaceTable facade whose world frames are built lazily per row from
    per-ray perturbed element frames: Rw = Re @ Rs and tw = te + ts @ Re.T
    (the compose_world convention, elements/base.py:33-42) expanded into
    planar FMAs over [N] components so XLA fuses the whole frame
    construction into the trace — nothing [K, N, 3, 3]-shaped is ever
    materialized.  Rows of unperturbed elements keep the base scalars."""

    def __init__(self, base, pert, row_elem):
        self._base = base
        self._pert = pert          # {elem name: (Re 3x3 planar, te 3 planar)}
        self._row_elem = row_elem  # static row -> element-name list

    @property
    def n_surfaces(self):
        return self._base.n_surfaces

    def row(self, k):
        import dataclasses
        import types
        r = self._base.row(k)
        name = self._row_elem[k]
        if name not in self._pert:
            return r
        ns = types.SimpleNamespace(
            **{f.name: getattr(r, f.name) for f in dataclasses.fields(r)})
        Re, te = self._pert[name]
        Rs, ts = r.Rs, r.ts        # [3, 3] / [3] traced scalars
        ns.Rw = _Planar(tuple(
            tuple(sum(Re[i][m] * Rs[m, j] for m in range(3))
                  for j in range(3))
            for i in range(3)))
        ns.tw = _Planar(tuple(
            te[j] + sum(ts[m] * Re[j][m] for m in range(3))
            for j in range(3)))
        return ns


def monte_carlo_tolerance(scene, params, rays, key, noise, n_trials,
                          **sim_kw):
    """Run ``n_trials`` perturbed traces; returns the stacked SensorStates
    (leaves have a leading [n_trials] axis).  Derive yield statistics from
    e.g. ``states.spot_rms(...)`` distributions."""
    keys = jax.random.split(key, n_trials)

    def one(trial_key):
        kn, kt = jax.random.split(trial_key)
        deltas = _sample_deltas(kn, noise)
        p = _apply_deltas(params, deltas)
        _, sensors, _ = scene.simulate(p, rays, kt, **sim_kw)
        return sensors

    return jax.vmap(one)(keys)


def per_ray_perturbed_trace(scene, params, rays, key, noise, **sim_kw):
    """Reference-equivalent per-ray pose noise: ray i traces through a scene
    whose noisy elements are displaced by that ray's own draw (frozen across
    the whole pass, like ``freeze_noise``, transform.py:195-200).

    Scales to million-ray batches: pose perturbation only changes each
    surface row's world frame (Rw, tw) — every other table leaf is
    parameter-identical across rays — so we build ONE SurfaceTable whose
    frame leaves carry a per-ray axis ([K, N, 3, 3] / [K, N, 3]) and run the
    ordinary trace once (the component-planar core indexes frames as
    ``row.Rw[..., i, j]``, which broadcasts [N] frame entries against [N]
    ray components elementwise — no per-ray gathers, no N scene rebuilds).
    The batched frames come from vmapping the table build over the deltas
    and keeping only Rw/tw (XLA dead-code-eliminates the rest).

    Returns (rays_out, sensors) with the usual trace contract (each ray
    contributed its own as-built trial to the sensor statistics)."""
    from ..core.trace import trace_nonsequential, trace_sequential

    n = rays.n
    kn, kt = jax.random.split(key)
    deltas = _sample_deltas(kn, noise, n=n)

    base = scene.build_table(params)

    # per-element planar perturbed frames (Re components are [N] arrays)
    pert = {}
    for name, d in deltas.items():
        rv = jnp.asarray(params[name]['rot_vec'])[None, :] + d['rot_vec']
        tr = jnp.asarray(params[name]['trans'])[None, :] + d['trans']
        Re = _rodrigues_planar(rv[:, 0], rv[:, 1], rv[:, 2])
        pert[name] = (Re, (tr[:, 0], tr[:, 1], tr[:, 2]))

    row_elem = []
    for el in scene.elements:
        row_elem.extend([el.name] * el.n_surfaces)
    table = _PerRayFrameTable(base, pert, row_elem)

    cfg = scene.sensor_config()
    sim_kw.setdefault('fuzzy_fns', scene.fuzzy_fns())
    sim_kw.setdefault('static_meta', scene.static_meta())
    if scene.sequential:
        out, sensors, _ = trace_sequential(table, rays, kt, cfg, **sim_kw)
    else:
        out, sensors, _ = trace_nonsequential(table, rays, kt,
                                              scene.n_bounces, cfg, **sim_kw)
    return out, sensors
