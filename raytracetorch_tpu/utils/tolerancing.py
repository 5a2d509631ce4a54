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


class _PlanarView:
    """Indexable view presenting a planar array ``[d0, d1, N]`` through the
    trace core's ``R[..., i, j]`` / ``t[..., i]`` access pattern: trailing
    static indices select the leading dims, returning a contiguous [N]
    slice (the component-planar rule, geom/vec3.py)."""

    __slots__ = ('a',)

    def __init__(self, a):
        self.a = a

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        if idx and idx[0] is Ellipsis:
            idx = idx[1:]
        return self.a[idx]


class _PerRayFrameTable:
    """SurfaceTable facade whose world frames carry a per-ray minor axis
    (Rw [K, 3, 3, N], tw [K, 3, N]); all other fields come from the base
    table.  Quacks like SurfaceTable for the trace drivers (n_surfaces +
    row)."""

    def __init__(self, base, Rw, tw):
        self._base, self._Rw, self._tw = base, Rw, tw

    @property
    def n_surfaces(self):
        return self._base.n_surfaces

    def row(self, k):
        import dataclasses
        import types
        r = self._base.row(k)
        ns = types.SimpleNamespace(
            **{f.name: getattr(r, f.name) for f in dataclasses.fields(r)})
        ns.Rw = _PlanarView(self._Rw[k])
        ns.tw = _PlanarView(self._tw[k])
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

    def frames(delta_row):
        t = scene.build_table(_apply_deltas(params, delta_row))
        return t.Rw, t.tw

    # out_axes=-1: frames come out PLANAR ([K, 3, 3, N] / [K, 3, N], ray
    # axis minor) — a [N, 3, 3] layout would stride every R[..., i, j]
    # access across 9-element records and waste 8/9 of each vector load
    # (measured 126x slower than the clean trace; planar is ~2x).
    Rw, tw = jax.vmap(frames, out_axes=-1)(deltas)
    table = _PerRayFrameTable(base, Rw, tw)

    cfg = scene.sensor_config()
    sim_kw.setdefault('fuzzy_fns', scene.fuzzy_fns())
    sim_kw.setdefault('static_meta', scene.static_meta())
    if scene.sequential:
        out, sensors, _ = trace_sequential(table, rays, kt, cfg, **sim_kw)
    else:
        out, sensors, _ = trace_nonsequential(table, rays, kt,
                                              scene.n_bounces, cfg, **sim_kw)
    return out, sensors
