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

    Rw, tw = jax.vmap(frames)(deltas)          # [N, K, 3, 3], [N, K, 3]
    table = base.replace(Rw=jnp.moveaxis(Rw, 0, 1),
                         tw=jnp.moveaxis(tw, 0, 1))

    cfg = scene.sensor_config()
    sim_kw.setdefault('fuzzy_fns', scene.fuzzy_fns())
    sim_kw.setdefault('static_meta', scene.static_meta())
    if scene.sequential:
        out, sensors, _ = trace_sequential(table, rays, kt, cfg, **sim_kw)
    else:
        out, sensors, _ = trace_nonsequential(table, rays, kt,
                                              scene.n_bounces, cfg, **sim_kw)
    return out, sensors
