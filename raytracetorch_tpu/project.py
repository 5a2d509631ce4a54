"""Project file I/O: declarative scene persistence (.rtt-compatible JSON).

Mirrors the reference's versioned project format (``project.py:45-89``):
``{"version", "settings", "elements": [...], "bundles": [...]}`` with a
``migrate_project`` gate, plus the high-level ``load_scene`` returning a
ready-to-simulate scene with name-lookup helpers (``project.py:96-187``).

Parameter checkpoints (optimized designs, optimizer state) are a separate
concern: use ``save_params`` / ``load_params`` — the scene file stores the
*design*, the param file stores the *state* (the reference has no training
checkpoints at all, SURVEY.md §5)."""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .config import (bundle_config, element_config, instantiate_bundle,
                     instantiate_element)
from .scene.scene import Scene, SequentialScene

PROJECT_VERSION = "1.0"


def save_project(path, scene, settings=None):
    """Serialize a scene (elements + bundles + settings) to JSON."""
    data = {
        "version": PROJECT_VERSION,
        "settings": {
            "n_bounces": scene.n_bounces,
            "sequential": scene.sequential,
            **(settings or {}),
        },
        "elements": [{"config": element_config(el)} for el in scene.elements],
        "bundles": [{"N_rays": n, "config": bundle_config(b)}
                    for b, n in scene.bundles],
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2)


def load_project(path) -> dict:
    """Deserialize + migrate (reference project.py:66-89)."""
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)
    if "version" not in data:
        raise ValueError(
            f"Not a valid project file: {os.path.basename(path)}")
    return migrate_project(data)


def migrate_project(data: dict) -> dict:
    version = data.get("version", "0.0")
    if version == PROJECT_VERSION:
        return data
    raise ValueError(f"Unsupported project version: {version}")


def load_scene(path, *, n_bounces=None):
    """File -> ready scene (reference project.py:96-187).  The scene type
    (sequential or not) comes from the stored settings."""
    data = load_project(path)
    settings = data.get("settings", {})
    cls = SequentialScene if settings.get("sequential") else Scene
    scene = cls([])
    for item in data.get("elements", []):
        cfg = item.get("config", item)
        scene.add_element(instantiate_element(cfg))
    for item in data.get("bundles", []):
        cfg = item.get("config", item)
        scene.add_bundle(instantiate_bundle(cfg),
                         int(item.get("N_rays", 200)))
    scene.n_bounces = int(n_bounces if n_bounces is not None
                          else settings.get("n_bounces", 100))
    return scene


# ---------------------------------------------------------------------------
# Parameter checkpoints
# ---------------------------------------------------------------------------

def save_params(path, params):
    """Save a scene parameter pytree (flat npz keyed by element/param)."""
    flat = {}
    for el_name, d in params.items():
        for k, v in d.items():
            flat[f"{el_name}/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_params(path, dtype=jnp.float32):
    """Load a parameter pytree saved by :func:`save_params`."""
    data = np.load(path if str(path).endswith('.npz') else f"{path}.npz"
                   if not os.path.exists(path) else path)
    params = {}
    for key in data.files:
        el_name, k = key.split('/', 1)
        params.setdefault(el_name, {})[k] = jnp.asarray(data[key], dtype)
    return params


def save_checkpoint(path, params, opt_state=None, step=0, extra=None):
    """Orbax checkpoint of a design-in-progress (SURVEY §5
    checkpoint/resume: "orbax for param/opt-state checkpoints" — the
    reference has no training checkpoints at all, project.py:38-89 is
    scene structure only).

    Saves the live parameter pytree TOGETHER with the optimizer state
    (optax pytree — adam moments, lbfgs memory, ...) and a step
    counter, so a long design run resumes exactly where it stopped —
    not just with the same params but with the same optimizer
    trajectory.  ``extra`` may carry any additional pytree (e.g. loss
    history).  ``path`` is a directory (orbax layout).
    """
    import orbax.checkpoint as ocp

    payload = {'params': params, 'step': int(step)}
    if opt_state is not None:
        payload['opt_state'] = opt_state
    if extra is not None:
        payload['extra'] = extra
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(str(path)), payload, force=True)


def load_checkpoint(path, like=None):
    """Restore a :func:`save_checkpoint` directory.

    ``like``: optional payload TEMPLATE (same structure as what was
    saved, e.g. ``{'params': p0, 'opt_state': optimizer.init(p0),
    'step': 0}``) — required to restore custom pytree node types like
    optax states exactly; without it the raw nested dict/arrays come
    back (fine for params-only checkpoints).
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(str(path)), item=like)
    return ckptr.restore(os.path.abspath(str(path)))
