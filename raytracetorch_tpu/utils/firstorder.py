"""First-order (Gaussian) system report and transverse ray-fan analysis.

``first_order`` reduces a centered SequentialScene to the numbers on the
front page of a lens datasheet: effective/back/front focal lengths,
principal planes, entrance/exit pupil location and size, F-number,
image-space NA and the Lagrange invariant — all as jnp scalars traced
from ``params`` (differentiable: "hold EFL while bending" is a
constraint you can jax.grad).  Built on the same two-basis paraxial ray
trace as the Seidel module (utils/seidel.py); the system ABCD between
the first and last vertex planes is assembled from the basis rays P =
(1, 0), Q = (0, 1), so mirrors (signed n -> -n) are handled uniformly —
unlike the reference's per-element 5x5 matrices (reference
``elements/lens.py:129-147``), which have no pupil or aggregate-system
story.

``ray_fan`` is the matching real-ray view: tangential and sagittal fans
through the stop at a given field, returning transverse aberrations
relative to the chief ray at the paraxial image plane — the classic
"ray fan plot" whose cubic component is the Seidel spherical term
(regression-tested against it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .seidel import _resolve_stop, _y_at, paraxial_prescription, paraxial_ray


class FirstOrder(struct.PyTreeNode):
    """Gaussian system summary (all jnp scalars; z's in world units).

    Signs follow the prescription frame (light toward +z at the input):
    ``efl`` > 0 for a converging system; ``bfl`` / ``ffl`` are the focal
    point distances from the last / first vertex; pupils carry an axial
    position and a semi-diameter.  ``fno`` = efl / (2 * enp_semi) (the
    infinite-conjugate F-number), ``na_image`` = |n' u'| of the marginal
    ray through the entrance-pupil edge."""

    efl: jnp.ndarray
    bfl: jnp.ndarray
    ffl: jnp.ndarray
    z_front_focal: jnp.ndarray
    z_back_focal: jnp.ndarray
    z_principal_front: jnp.ndarray
    z_principal_back: jnp.ndarray
    stop_z: jnp.ndarray
    stop_semi: jnp.ndarray
    enp_z: jnp.ndarray
    enp_semi: jnp.ndarray
    exp_z: jnp.ndarray
    exp_semi: jnp.ndarray
    fno: jnp.ndarray
    na_image: jnp.ndarray
    lagrange_H: jnp.ndarray
    z_image: jnp.ndarray
    n_image: jnp.ndarray


def _safe(x, eps=1e-30):
    return jnp.where(jnp.abs(x) < eps, eps, x)


def first_order(scene, params, aperture=None, field=0.01, stop_z=None,
                stop_after=None, axis_direction=1.0):
    """Gaussian report of a centered SequentialScene.

    ``aperture`` (stop semi-diameter) defaults to the scene's first
    CircularAperture radius, falling back to 1 (sizes scale linearly).
    ``field`` is the object-space chief slope used for the Lagrange
    invariant.  Stop overrides as in :func:`seidel`.
    """
    surfs, ap_stop_z, stop_r, _ = paraxial_prescription(
        scene, params, axis_direction=axis_direction)
    stop_zv, seg = _resolve_stop(surfs, ap_stop_z, stop_z, stop_after)
    if aperture is None:
        aperture = stop_r if stop_r is not None else 1.0
    a = jnp.asarray(aperture, jnp.result_type(float))

    yP, uP_in, uP_out, _ = paraxial_ray(surfs, 1.0, 0.0)
    yQ, uQ_in, uQ_out, _ = paraxial_ray(surfs, 0.0, 1.0)
    z1, z_last = surfs[0].z, surfs[-1].z
    n_img = surfs[-1].n2
    # vertex-to-vertex ABCD from the basis rays (real slopes, indices
    # folded in: det = n_obj / n_img)
    A, B = yP[-1], yQ[-1]
    C, D = uP_out[-1], uQ_out[-1]

    Cs = _safe(C)
    efl = -1.0 / Cs
    bfl = -A / Cs
    ffl = D / Cs
    z_bf = z_last + bfl
    z_ff = z1 + ffl
    # principal planes: f' from P', f from P (air-to-air: f = -f')
    z_pb = z_bf - efl
    z_pf = z_ff + efl

    # stop heights of the basis rays -> pupils
    YsP = _y_at(surfs, yP, uP_out, 0.0, stop_zv, seg)
    YsQ = _y_at(surfs, yQ, uQ_out, 1.0, stop_zv, seg)
    YsP_s = _safe(YsP)
    # entrance pupil: object-space image of the stop.  Any object ray
    # through (z_enp, h) has stop height h * YsP -> magnification YsP.
    enp_z = z1 + YsQ / YsP_s
    enp_semi = jnp.abs(a / YsP_s)
    # exit pupil: the image-space line of the pencil through the stop
    # center is the basis combo r0 = YsQ * P - YsP * Q
    y0e = YsQ * yP[-1] - YsP * yQ[-1]
    u0e = YsQ * uP_out[-1] - YsP * uQ_out[-1]
    exp_z = z_last - y0e / _safe(u0e)
    # conjugate size: a ray with stop height `a` (P scaled) lands at the
    # exit-pupil plane at the pupil edge
    exp_semi = jnp.abs((a / YsP_s) * (yP[-1] + (exp_z - z_last) * uP_out[-1]))

    # marginal ray through the entrance-pupil edge (collimated input)
    my0 = a / YsP_s
    u_marg = my0 * C
    z_image = z_bf  # infinite conjugates
    fno = efl / _safe(2.0 * enp_semi)
    na_image = jnp.abs(n_img * u_marg)
    # Lagrange invariant with the chief at `field` and this marginal
    f = jnp.asarray(field, jnp.result_type(float))
    cy0 = -f * YsQ / YsP_s
    H = surfs[0].n1 * (f * my0 - 0.0 * cy0)   # n (u_c y_m - u_m y_c), u_m=0

    return FirstOrder(
        efl=efl, bfl=bfl, ffl=ffl, z_front_focal=z_ff, z_back_focal=z_bf,
        z_principal_front=z_pf, z_principal_back=z_pb,
        stop_z=jnp.asarray(stop_zv), stop_semi=a,
        enp_z=enp_z, enp_semi=enp_semi, exp_z=exp_z, exp_semi=exp_semi,
        fno=fno, na_image=na_image, lagrange_H=H,
        z_image=z_image, n_image=n_img)


class RayFan(struct.PyTreeNode):
    """Transverse ray-fan data at the paraxial image plane.

    ``pupil`` in [-1, 1] (relative stop height); ``ey_t`` the tangential
    (meridional) fan's y-error and ``ex_s``/``ey_s`` the sagittal fan's
    x/y-errors, all relative to the chief ray's landing point.  Dead
    (vignetted) probes carry ``alive = 0`` — mask before plotting."""

    pupil: jnp.ndarray
    ey_t: jnp.ndarray
    ex_s: jnp.ndarray
    ey_s: jnp.ndarray
    alive_t: jnp.ndarray
    alive_s: jnp.ndarray
    chief_xy: jnp.ndarray
    z_image: jnp.ndarray


def ray_fan(scene, params, field=0.0, aperture=None, n=33, wavelength=None,
            z_image=None, stop_z=None, stop_after=None, key=None,
            dtype=None):
    """Tangential + sagittal transverse-aberration fans (one trace).

    Probes are paraxially aimed through the stop like
    :func:`~raytracetorch_tpu.utils.fieldscan.field_scan`; errors are
    measured at the paraxial image plane (or ``z_image=``) against the
    chief ray.  Differentiable w.r.t. ``params``.
    """
    surfs, ap_stop_z, stop_r, _ = paraxial_prescription(scene, params)
    stop_zv, seg = _resolve_stop(surfs, ap_stop_z, stop_z, stop_after)
    if aperture is None:
        aperture = stop_r
    if aperture is None:
        raise ValueError("no CircularAperture in the scene: pass aperture=")
    if dtype is None:
        dtype = jnp.result_type(float)

    yP, _, uP_out, _ = paraxial_ray(surfs, 1.0, 0.0)
    yQ, _, uQ_out, _ = paraxial_ray(surfs, 0.0, 1.0)
    YsP = _safe(_y_at(surfs, yP, uP_out, 0.0, stop_zv, seg))
    YsQ = _y_at(surfs, yQ, uQ_out, 1.0, stop_zv, seg)
    z1, z_last = surfs[0].z, surfs[-1].z
    u_img = _safe(uP_out[-1])
    if z_image is None:
        z_image = z_last - yP[-1] / u_img
    z_image = jnp.asarray(z_image, dtype)

    track = jnp.abs(z_image - z1)
    z_start = z1 - jnp.maximum(track, 1.0)
    u = jnp.asarray(field, dtype)
    norm = 1.0 / jnp.sqrt(1.0 + u * u)

    pup = jnp.linspace(-1.0, 1.0, n, dtype=dtype)
    h = pup * aperture                                   # stop heights
    y1 = (h - u * YsQ) / YsP                             # tangential aim
    y_start = y1 - (z1 - z_start) * u
    y_chief0 = (-u * YsQ / YsP) - (z1 - z_start) * u
    # tangential fan [n], sagittal fan [n], chief [1]
    pos = jnp.concatenate([
        jnp.stack([jnp.zeros_like(h), y_start,
                   jnp.broadcast_to(z_start, h.shape)], -1),
        jnp.stack([h / YsP, jnp.broadcast_to(y_chief0, h.shape),
                   jnp.broadcast_to(z_start, h.shape)], -1),
        jnp.asarray([[0.0, y_chief0, z_start]], dtype)])
    d_row = jnp.asarray([0.0, u * norm, norm], dtype)
    dirs = jnp.broadcast_to(d_row, pos.shape)

    from ..rays.ray import Rays
    lam = (None if wavelength is None
           else jnp.full((pos.shape[0],), wavelength, dtype))
    rays = Rays.create(pos, dirs, wavelength=lam, dtype=dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    out, _, _ = scene.simulate(params, rays, key)

    x_img = out.px + (z_image - out.pz) * out.dx / _safe(out.dz)
    y_img = out.py + (z_image - out.pz) * out.dy / _safe(out.dz)
    cx, cy = x_img[-1], y_img[-1]
    return RayFan(pupil=pup,
                  ey_t=y_img[:n] - cy,
                  ex_s=x_img[n:2 * n] - cx,
                  ey_s=y_img[n:2 * n] - cy,
                  alive_t=out.intensity[:n] > 0,
                  alive_s=out.intensity[n:2 * n] > 0,
                  chief_xy=jnp.stack([cx, cy]),
                  z_image=z_image)
