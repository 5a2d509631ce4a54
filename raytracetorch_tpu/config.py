"""Config <-> object instantiation: the class registry behind scene files.

Re-design of the reference's reflective config layer (``config.py:63-235``):
element specs auto-capture their constructor arguments at init time (via
``Element.__init_subclass__`` wrapping), so any element serializes to a
``{'name', 'class', 'params'}`` dict without per-class code; bundles are
flax dataclasses and serialize from their fields.  Lookup walks the subclass
trees of the known bases exactly like the reference's ``get_subclasses`` BFS
(``config.py:63-74``).
"""

from __future__ import annotations

import dataclasses
import inspect

import jax.numpy as jnp
import numpy as np

from .elements.base import Element
from .rays import sources


def get_subclasses(cls):
    """BFS over the subclass tree (reference config.py:63-74)."""
    out, queue = set(), [cls]
    while queue:
        parent = queue.pop(0)
        for child in parent.__subclasses__():
            if child not in out:
                out.add(child)
                queue.append(child)
    return out


def find_class(name):
    """Name -> class over the known bases (reference config.py:138-149)."""
    for base in (Element, sources.Bundle):
        if base.__name__ == name:
            return base
        for sub in get_subclasses(base):
            if sub.__name__ == name:
                return sub
    raise ValueError(f"Cannot find class {name!r} in the registry")


def _jsonable(v):
    if isinstance(v, (jnp.ndarray, np.ndarray)):
        return np.asarray(v).tolist()
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return v


def element_config(el: Element) -> dict:
    """Serialize an element spec to {'name', 'class', 'params'}."""
    cfg = getattr(el, '_ctor_config', None)
    if cfg is None:
        raise ValueError(
            f"{type(el).__name__} did not capture its constructor args "
            "(constructed before registry import, or programmatically)")
    params = {}
    for k, v in cfg.items():
        if callable(v) and not isinstance(v, type):
            raise ValueError(
                f"{type(el).__name__}.{k} is a callable — not serializable")
        params[k] = _jsonable(v)
    return {'name': el.name, 'class': type(el).__name__, 'params': params}


def _pytree_config(v) -> dict:
    """Recursively serialize a nested dataclass pytree (emission models etc.)
    to ``{'class', 'params'}`` — the reference's recursive CLASS config
    (config.py:156-235).  Fields named in the class's ``_derived_fields``
    (precomputed tables rebuilt by ``make``) are skipped."""
    skip = set(getattr(type(v), '_derived_fields', ()))
    params = {}
    for f in dataclasses.fields(v):
        if f.name in skip:
            continue
        x = getattr(v, f.name)
        params[f.name] = (_pytree_config(x) if dataclasses.is_dataclass(x)
                          else _jsonable(x))
    return {'class': type(v).__name__, 'params': params}


def bundle_config(b) -> dict:
    """Serialize a bundle pytree from its dataclass fields.  Nested
    dataclass fields (e.g. RectangularPanel.emission) serialize recursively
    with their full parameterization."""
    skip = set(getattr(type(b), '_derived_fields', ()))
    params = {}
    for f in dataclasses.fields(b):
        if f.name in skip:
            continue
        v = getattr(b, f.name)
        if f.name == 'frame':
            params['rotation'] = _jsonable(v.rot_vec)
            params['translation'] = _jsonable(v.trans)
        elif dataclasses.is_dataclass(v):
            params[f.name] = _pytree_config(v)
        else:
            params[f.name] = _jsonable(v)
    return {'class': type(b).__name__, 'params': params}


def instantiate_element(config: dict) -> Element:
    """{'name','class','params'} -> live element spec (reference
    config.py:156-235)."""
    cls = find_class(config['class'])
    params = dict(config.get('params', {}))
    params.setdefault('name', config.get('name', 'element'))
    sig = inspect.signature(cls.__init__)
    accepts_kw = any(p.kind is inspect.Parameter.VAR_KEYWORD
                     for p in sig.parameters.values())
    if not accepts_kw:
        params = {k: v for k, v in params.items() if k in sig.parameters}
    return cls(**params)


def _instantiate_nested(d: dict):
    """{'class','params'} -> live nested pytree (bottom-up, like the
    reference's recursive CLASS instantiation, config.py:175-235)."""
    cls = getattr(sources, d['class'])
    kw = {}
    for k, v in d.get('params', {}).items():
        # Plain Python numbers stay plain: weak-typed floats trace
        # identically to jnp.float32 in the f32 sampling math, and host-side
        # table builders (MieScatter.make) need the exact float64 value.
        kw[k] = _instantiate_nested(v) if isinstance(v, dict) and 'class' in v else v
    return cls(**kw)


def instantiate_bundle(config: dict):
    cls = find_class(config['class'])
    params = dict(config.get('params', {}))
    rotation = params.pop('rotation', None)
    translation = params.pop('translation', None)
    params.pop('frame', None)
    ray_id = params.pop('ray_id', 0)
    kw = {k: (_instantiate_nested(v) if isinstance(v, dict) and 'class' in v
              else v)
          for k, v in params.items()}
    return cls.make(ray_id=ray_id, rotation=rotation,
                    translation=translation, **kw)
