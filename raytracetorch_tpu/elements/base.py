"""Element specs: static structure + differentiable parameter pytrees.

TPU-native inversion of the reference's nn.Module element hierarchy
(``elements/parent.py:8``): an Element here is a *plain Python* description
object.  It owns no tensors; instead it

- declares an initial parameter dict (``init_params``) and matching
  trainability mask (``trainable``) — replacing the reference's per-Parameter
  ``requires_grad`` flags and gradient-mask hooks (geom/transform.py:29-46)
  with an optax-style mask pytree;
- compiles itself into SurfaceTable rows from a given params dict
  (``build``), *inside jit*, so gradients flow from traced rays back to every
  scalar (curvature, thickness, pose, IOR) — the functional replacement for
  the reference's shared-nn.Parameter aliasing (elements/lens.py:41-57,
  geom/spherics.py:92-93);
- exposes the paraxial surface decomposition (``paraxial``) and the optical
  surface z-list used by constraints (``optical_zs``, cf.
  optim/constraints.py:29-50).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geom.transform import Frame, mm, rodrigues


def frame_params(p):
    """(R_e, t_e) of the element frame from its params."""
    return rodrigues(p['rot_vec']), p['trans']


def compose_world(Re, te, Rs=None, ts=None):
    """Compose the element frame with an optional surface sub-frame into the
    world->surface map stored in the table (see geom.transform.compose)."""
    if Rs is None:
        Rs = jnp.eye(3, dtype=te.dtype)
    if ts is None:
        ts = jnp.zeros(3, dtype=te.dtype)
    Rw = mm(Re, Rs)
    tw = te + mm(ts, Re.T)
    return Rw, tw, Rs, ts


def zvec(z, dtype=jnp.float32):
    """(0, 0, z) with a traced z."""
    z = jnp.asarray(z, dtype)
    zero = jnp.zeros_like(z)
    return jnp.stack([zero, zero, z])


class Element:
    """Base element spec.  Subclasses add parameters via ``extra_params`` /
    ``extra_trainable`` and implement ``build``.

    Every subclass's ``__init__`` is wrapped to capture its bound arguments
    into ``self._ctor_config`` — the zero-boilerplate serialization hook
    behind the project-file registry (see config.py; the reference instead
    reverse-engineers constructors via GUI form introspection,
    config.py:30-60)."""

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        import functools
        import inspect
        orig = cls.__dict__.get('__init__')
        if orig is None or getattr(orig, '_captures_config', False):
            return

        @functools.wraps(orig)
        def wrapped(self, *args, **kwargs):
            if not hasattr(self, '_ctor_config'):
                try:
                    bound = inspect.signature(orig).bind(self, *args, **kwargs)
                    bound.apply_defaults()
                    cfg = dict(bound.arguments)
                    cfg.pop('self', None)
                    extra = cfg.pop('kw', None)
                    if isinstance(extra, dict):
                        cfg.update(extra)
                    self._ctor_config = cfg
                except TypeError:
                    self._ctor_config = {}
            orig(self, *args, **kwargs)

        wrapped._captures_config = True
        cls.__init__ = wrapped

    def __init__(self, name='element', rotation=None, translation=None,
                 rot_grad=False, trans_grad=False, rot_mask=None,
                 trans_mask=None):
        self.name = name
        self._rot_init = [0.0, 0.0, 0.0] if rotation is None else list(rotation)
        self._trans_init = ([0.0, 0.0, 0.0] if translation is None
                            else list(translation))
        self.rot_grad, self.trans_grad = rot_grad, trans_grad
        self.rot_mask = rot_mask
        self.trans_mask = trans_mask

    # -- parameters --------------------------------------------------------

    def init_params(self, dtype=jnp.float32):
        p = {
            'rot_vec': jnp.asarray(self._rot_init, dtype),
            'trans': jnp.asarray(self._trans_init, dtype),
        }
        for k, v in self.extra_params().items():
            # dict-valued params (e.g. per-face coat_d stacks) keep their
            # structure; leaves become arrays
            p[k] = ({kk: jnp.asarray(vv, dtype) for kk, vv in v.items()}
                    if isinstance(v, dict) else jnp.asarray(v, dtype))
        return p

    def trainable(self):
        """Gradient mask pytree: True / False / per-component float masks
        (the reference's trans_mask/rot_mask hook semantics,
        geom/transform.py:29-46)."""
        def _mask(flag, mask3):
            if not flag:
                return False
            if mask3 is None:
                return True
            return jnp.asarray(mask3, jnp.float32)

        t = {
            'rot_vec': _mask(self.rot_grad, self.rot_mask),
            'trans': _mask(self.trans_grad, self.trans_mask),
        }
        t.update(self.extra_trainable())
        return t

    def extra_params(self):
        return {}

    def extra_trainable(self):
        return {}

    # -- structure ---------------------------------------------------------

    @property
    def n_surfaces(self):
        raise NotImplementedError

    @property
    def is_sensor(self):
        return False

    @property
    def is_aperture(self):
        """True for pure aperture/filter elements — excluded from the 3D
        renderer's occlusion table (reference render/camera.py:203-211)."""
        return False

    def frame(self, p):
        return Frame(rot_vec=p['rot_vec'], trans=p['trans'])

    def build(self, p):
        """-> list[SurfaceRec] (length == n_surfaces)."""
        raise NotImplementedError

    # -- paraxial ----------------------------------------------------------

    def paraxial(self, p):
        """-> ([z...], [5x5 matrix...]) (reference elements/parent.py:65-70:
        identity matrix wrapped in the frame's decenter shifts)."""
        f = self.frame(p)
        t, t_inv = f.paraxial(), f.paraxial_inv()
        eye = jnp.eye(5, dtype=p['trans'].dtype)
        return [p['trans'][2]], [mm(t_inv, mm(eye, t))]

    def optical_zs(self, p):
        """Global z of each *optical* surface, differentiable — the
        constraint hook (reference optim/constraints.py:29-50)."""
        return [p['trans'][2]]


class ElementCustom(Element):
    """Arbitrary shape parts + one physics spec replicated across surfaces
    (reference elements/parent.py:73-81)."""

    def __init__(self, shape_fn, n_surfaces, ph_kind, ph=(), name='custom',
                 extra=None, extra_grad=None, coating=None,
                 coating_grad=False, **kw):
        """``shape_fn(p, Re, te) -> list[SurfaceRec]`` supplies geometry;
        physics fields are overwritten uniformly.  ``coating`` puts one
        thin-film stack ``[(n, d_um), ...]`` (outermost first, trainable
        thicknesses via 'coat_d') on EVERY face — acts through FRESNEL /
        FRESNEL_W physics and track_field amplitude transport, like lens
        coatings (core/static_dispatch.py::coated_reflectance)."""
        super().__init__(name=name, **kw)
        self._shape_fn = shape_fn
        self._n = n_surfaces
        self._ph_kind = ph_kind
        self._ph = tuple(ph)
        self._extra = dict(extra or {})
        self._extra_grad = dict(extra_grad or {})
        if coating:
            from ..constants import MAX_COAT_LAYERS
            if len(coating) > MAX_COAT_LAYERS:
                raise ValueError(
                    f"at most {MAX_COAT_LAYERS} coating layers per surface")
            from ..utils.coatings import parse_coating_entries
            ns, ks, ds = parse_coating_entries(coating)
            self.coating_n = ns
            self.coating_k = ks if any(k != 0.0 for k in ks) else None
            self._extra['coat_d'] = ds
            self._extra_grad['coat_d'] = coating_grad

    @property
    def n_surfaces(self):
        return self._n

    def extra_params(self):
        return dict(self._extra)

    def extra_trainable(self):
        return {k: self._extra_grad.get(k, False) for k in self._extra}

    def build(self, p):
        Re, te = frame_params(p)
        recs = self._shape_fn(p, Re, te)
        coat_ns = getattr(self, 'coating_n', None)
        for r in recs:
            r.ph_kind = self._ph_kind
            r.ph = self._ph
            if coat_ns:
                coat = []
                for li, nl in enumerate(coat_ns):
                    coat += [nl, p['coat_d'][li]]
                r.coat = coat
                r.n_coat = len(coat_ns)
                r.coat_k = getattr(self, 'coating_k', None)
        return recs
