"""Surface interaction physics, evaluated densely and selected by tag.

TPU-native re-design of the reference's ``SurfaceFunction`` functor hierarchy
(``phys/std.py``, ``phys/filter.py``): instead of Python dispatch to one
nn.Module per surface, every interaction model is computed for every ray in a
handful of fused elementwise ops and the per-surface ``ph_kind`` tag selects
the result.  Physics parameter layout (``ph [..., 6]``):

    ph[0] = ior_in    (medium on the side the geometric normal points toward)
    ph[1] = ior_out   (medium on the far side)
    ph[2] = Cx   ph[3] = Cy   ph[4] = Dx   ph[5] = Dy   (Linear / ABCD optics)

IOR-assignment convention matches the reference's element constructors
(``elements/lens.py:41-57``).  NOTE on Snell (see PARITY.md): the reference's
``RefractSnell`` selects the IOR ratio inverted w.r.t. its own paraxial
analytics (``phys/std.py:132`` — ``entering`` picks ``ior_out/ior_in`` when
the ray comes FROM the ``ior_out`` side), which makes traced rays diverge
through a converging lens.  We implement physical Snell:  n1 = medium of
incidence, mu = n1/n2, so traced focal lengths agree with the thick-lens
formulas in ``elements/lens.py:60-92`` and with ``getParaxial``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import PhysKind
from ..geom.bounds import sb_check
from ..geom.transform import PREC


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def reflect_dir(d, n):
    """Specular reflection R = I - 2 (I.N) N (phys/std.py:97-108)."""
    return d - 2.0 * _dot(d, n) * n


def refract_components(d, n, ior_in, ior_out):
    """Shared Snell/Fresnel geometry.

    Returns (cos_i, n1, n2, mu, sin2_t, tir, cos_t, n_eff) where ``n_eff`` is
    the normal flipped to point against the incident ray.  ``from_in`` is true
    when the ray arrives from the ``ior_in`` (normal) side, i.e. d.n < 0.
    """
    dot = _dot(d, n)
    from_in = dot < 0
    n_eff = jnp.where(from_in, n, -n)
    cos_i = jnp.abs(dot)
    ior_in = ior_in[..., None] if ior_in.ndim == d.ndim - 1 else ior_in
    ior_out = ior_out[..., None] if ior_out.ndim == d.ndim - 1 else ior_out
    n1 = jnp.where(from_in, ior_in, ior_out)
    n2 = jnp.where(from_in, ior_out, ior_in)
    mu = n1 / jnp.where(jnp.abs(n2) < 1e-12, 1e-12, n2)
    sin2_t = mu * mu * (1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(1.0 - sin2_t, 0.0)))
    cos_t = jnp.where(tir, 0.0, cos_t)
    return dot, cos_i, n1, n2, mu, tir, cos_t, n_eff


def snell_dir(d, n, ior_in, ior_out):
    """Vector Snell with TIR -> reflection (phys/std.py:111-145, mu corrected).
    """
    dot, cos_i, _, _, mu, tir, cos_t, n_eff = refract_components(
        d, n, ior_in, ior_out)
    v_refract = mu * d + (mu * cos_i - cos_t) * n_eff
    v_reflect = d - 2.0 * dot * n
    return jnp.where(tir, v_reflect, v_refract)


def fresnel_reflectance(cos_i, cos_t, n1, n2):
    """Unpolarized Fresnel R = (Rs + Rp) / 2 (phys/std.py:165-175)."""
    rs = ((n1 * cos_i - n2 * cos_t) / (n1 * cos_i + n2 * cos_t + 1e-8)) ** 2
    rp = ((n1 * cos_t - n2 * cos_i) / (n1 * cos_t + n2 * cos_i + 1e-8)) ** 2
    return 0.5 * (rs + rp)


def fresnel_dir(d, n, ior_in, ior_out, u):
    """Monte-Carlo Fresnel: stochastically reflect with probability R else
    refract (phys/std.py:148-219).  ``u`` is a per-ray uniform draw — the
    *choice* is non-differentiable by construction (the reference detaches it
    implicitly via torch.rand)."""
    dot, cos_i, n1, n2, mu, tir, cos_t, n_eff = refract_components(
        d, n, ior_in, ior_out)
    R = fresnel_reflectance(cos_i, cos_t, n1, n2)
    R = jnp.where(tir, 1.0, R)
    reflect_mask = u[..., None] < R
    v_reflect = d - 2.0 * dot * n
    v_refract = mu * d + (mu * cos_i - cos_t) * n_eff
    return jnp.where(reflect_mask, v_reflect, v_refract)


def linear_dir(d, hit_local, Rw, Cx, Cy, Dx, Dy):
    """Ideal ABCD optic (phys/std.py:35-88): rotate the direction into the
    surface frame, normalize to dz=1, apply the per-axis linear map on
    (position, slope), renormalize, rotate back."""
    d_local = jnp.einsum('...i,...ij->...j', d, Rw, precision=PREC)
    dz = d_local[..., 2:3]
    dz_safe = jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)
    d_norm = d_local / dz_safe
    new_x = Cx * hit_local[..., 0] + Dx * d_norm[..., 0]
    new_y = Cy * hit_local[..., 1] + Dy * d_norm[..., 1]
    new_local = jnp.stack([new_x, new_y, jnp.ones_like(new_x)], axis=-1)
    norm = jnp.sqrt(jnp.sum(new_local * new_local, axis=-1, keepdims=True))
    new_local = new_local / jnp.maximum(norm, 1e-12)
    return jnp.einsum('...i,...ij->...j', new_local,
                      jnp.swapaxes(Rw, -1, -2), precision=PREC)


def apply_physics(ph_kind, ph, Rw, sb_kind, sb, hit_local, d, n, u):
    """Dense physics application.

    Args:
      ph_kind: [...] int32 tag (PhysKind).
      ph:      [..., 6] params.
      Rw:      [..., 3, 3] world->surface rotation (Linear only).
      sb_kind/sb: surface-local bound spec (Aperture filter re-check,
        phys/filter.py:24-33 — note the filter uses the RAW bound, not the
        inverted one; inversion only affects which rays geometrically hit).
      hit_local: [..., 3] hit in the surface frame.
      d:       [..., 3] incident unit direction (world frame).
      n:       [..., 3] unit surface normal (world frame).
      u:       [...] uniform randoms for the Fresnel branch choice.

    Returns (new_dir [..., 3], intensity_mod [...]).
    """
    ior_in, ior_out = ph[..., 0], ph[..., 1]
    Cx, Cy, Dx, Dy = ph[..., 2], ph[..., 3], ph[..., 4], ph[..., 5]

    refl = reflect_dir(d, n)
    snell = snell_dir(d, n, ior_in, ior_out)
    fresnel = fresnel_dir(d, n, ior_in, ior_out, u)
    linear = linear_dir(d, hit_local, Rw, Cx, Cy, Dx, Dy)
    aper_pass = sb_check(sb_kind, sb, hit_local)
    aper_mod = aper_pass.astype(d.dtype)

    kind = ph_kind[..., None]
    out = d
    out = jnp.where(kind == PhysKind.BLOCK, jnp.zeros_like(d), out)
    out = jnp.where(kind == PhysKind.REFLECT, refl, out)
    out = jnp.where(kind == PhysKind.SNELL, snell, out)
    out = jnp.where(kind == PhysKind.FRESNEL, fresnel, out)
    out = jnp.where(kind == PhysKind.LINEAR, linear, out)
    out = jnp.where(kind == PhysKind.APERTURE, d * aper_mod[..., None], out)

    ones = jnp.ones(jnp.broadcast_shapes(ph_kind.shape, d.shape[:-1]),
                    dtype=d.dtype)
    imod = ones
    imod = jnp.where(ph_kind == PhysKind.BLOCK, 0.0, imod)
    imod = jnp.where(ph_kind == PhysKind.APERTURE, aper_mod, imod)
    return out, imod
