"""Real-ray field scans: astigmatic field curves, distortion and
relative illumination (vignetting) across the field of view.

The classic lens-design "Field Curvature / Distortion" analysis: for a
fan of field angles, paraxially aim probe rays through the stop (a chief
ray, a close tangential pair about it, and a close sagittal skew ray),
trace them all in ONE batched simulate call, and extrapolate the
astigmatic line foci the way an optical bench would — z_T from where the
meridional pair crosses, z_S from where the skew ray re-crosses the
meridional plane.  A pupil-filling disk of rays per field measures the
transmitted fraction (relative illumination / vignetting).

The torch reference has no field analysis at all — its closest machinery
is the 5x5 paraxial matrices (reference ``elements/lens.py:129-147``),
which give first-order image location only.  Here the whole scan is a
single [F * (4 + n_pupil)]-ray trace: TPU-shaped (one big batch, no
per-field Python loop over device calls) and differentiable — z_T / z_S
/ distortion are smooth functions of ``params``, so "flatten the
tangential field" is a jax.grad-able design target
(tests/test_fieldscan.py).

Aiming uses the same paraxial two-basis-ray solve as the Seidel module
(utils/seidel.py) and therefore shares its restrictions: a centered
system made of spherical/aspheric lens stacks, rotationally-symmetric
mirrors, apertures and sensors.  Fields are object-space chief-ray
slopes (u = tan of the field angle for the distortion convention:
``distortion_pct`` is f-tan-theta distortion at infinite conjugates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .seidel import _resolve_stop, _y_at, paraxial_prescription, paraxial_ray

_GOLDEN = 2.399963229728653  # radians


class FieldScan(struct.PyTreeNode):
    """Per-field real-ray analysis results (all [F] unless noted).

    ``z_tangential`` / ``z_sagittal`` are the astigmatic line-focus
    planes; ``field_t`` / ``field_s`` the same relative to the paraxial
    image plane ``z_image`` (the curves a designer plots);
    ``distortion_pct`` is 100 * (y_chief - y_ref) / y_ref against the
    linear paraxial reference ``y_ref``; ``rel_illumination`` is the
    pupil-disk transmitted fraction normalized to the first field point.
    """

    fields: jnp.ndarray
    z_tangential: jnp.ndarray
    z_sagittal: jnp.ndarray
    chief_y: jnp.ndarray
    y_ref: jnp.ndarray
    distortion_pct: jnp.ndarray
    transmission: jnp.ndarray
    rel_illumination: jnp.ndarray
    z_image: jnp.ndarray

    @property
    def field_t(self):
        return self.z_tangential - self.z_image

    @property
    def field_s(self):
        return self.z_sagittal - self.z_image

    @property
    def astigmatism(self):
        return self.z_tangential - self.z_sagittal


def _stop_crossing(paths, stop_z):
    """(x, y) where each recorded ray path crosses the plane z = stop_z,
    by monotone-z polyline interpolation over ``paths`` [S+1, R, 3].

    Returns ``(xy [R, 2], found [R] bool)``.  Valid for centered unfolded
    systems (the same restriction as locating a stop by z,
    :func:`seidel._stop_segment`): path z is non-decreasing, so the
    crossing segment is unique.  Rays blocked before the stop never cross
    (``found`` False) — callers keep their paraxial aim."""
    a, b = paths[:-1], paths[1:]                        # [S, R, 3]
    az, bz = a[..., 2], b[..., 2]
    # inclusive at both ends (the stop's own aperture row may be the LAST
    # recorded point); first-hit mask de-duplicates a crossing landing
    # exactly on a shared path vertex
    hit = (az <= stop_z) & (bz >= stop_z)               # [S, R]
    first = hit & (jnp.cumsum(hit.astype(jnp.int32), 0) == 1)
    dz = jnp.where(jnp.abs(bz - az) < 1e-30, 1e-30, bz - az)
    frac = ((stop_z - az) / dz)[..., None]
    xy = a[..., :2] + frac * (b[..., :2] - a[..., :2])  # [S, R, 2]
    w = first.astype(xy.dtype)[..., None]
    return jnp.sum(xy * w, 0), jnp.any(hit, 0)


def _aim(scene, params, pos, dirs, targets, ys_p, stop_z, key, lam,
         n_iter, dtype):
    """Real-ray pupil aiming: Newton-refine launch (x, y) so each traced
    ray crosses the stop plane at ``targets`` [R, 2].

    The first step uses the paraxial Jacobian — a zero-slope launch shift
    of d moves the stop crossing by ``ys_p * d`` (the P basis ray's stop
    height for unit height at the first vertex).  Subsequent steps secant-
    update the Jacobian per ray and coordinate from the last two traces
    (the paraxial slope can be off by >10% on fast lenses at wide field,
    where a fixed-Jacobian iteration contracts slowly).  Differentiable
    (fixed unrolled iterations of pure traced functions)."""
    from ..rays.ray import Rays
    inv_j0 = 1.0 / jnp.where(jnp.abs(ys_p) < 1e-12, 1e-12, ys_p)
    stop_z = jnp.asarray(stop_z, dtype)

    def trace_xy(pos_):
        rays = Rays.create(pos_, dirs, wavelength=lam, dtype=dtype)
        _, _, aux = scene.simulate(params, rays, key, record_paths=True)
        return _stop_crossing(aux['paths'], stop_z)

    xy, found = trace_xy(pos)
    err = xy - targets
    pos_next = pos.at[:, :2].add(
        jnp.where(found[:, None], -err * inv_j0, 0.0))
    for _ in range(n_iter - 1):
        xy1, found1 = trace_xy(pos_next)
        err1 = xy1 - targets
        d_pos = pos_next[:, :2] - pos[:, :2]
        d_err = err1 - err
        # per-ray, per-coordinate secant slope; fall back to the paraxial
        # slope where the coordinate didn't move (e.g. a centered x)
        ok = (jnp.abs(d_pos) > 1e-14) & (jnp.abs(d_err) > 1e-14)
        inv_j = jnp.where(ok, d_pos / jnp.where(ok, d_err, 1.0), inv_j0)
        pos, err = pos_next, err1
        pos_next = pos_next.at[:, :2].add(
            jnp.where(found1[:, None], -err1 * inv_j, 0.0))
    return pos_next


def field_scan(scene, params, fields, aperture=None, wavelength=None,
               n_pupil=64, rel_probe=0.02, z_start=None, stop_z=None,
               stop_after=None, key=None, dtype=None, aiming='paraxial',
               n_aim_iter=3):
    """Scan a centered SequentialScene across field angles with real rays.

    Parameters
    ----------
    fields : [F] object-space chief-ray slopes (first entry should be the
        smallest — relative illumination normalizes to it; avoid exactly
        0 only if the scene blocks on-axis rays).
    aperture : stop semi-aperture for the pupil-filling illumination
        disk; defaults to the scene's first CircularAperture radius.
    wavelength : optional scalar wavelength (um) stamped on every probe.
    n_pupil : rays in the per-field vignetting disk (sunflower layout,
        deterministic).  0 disables the illumination scan.
    rel_probe : astigmatic probe offset at the stop, as a fraction of
        ``aperture`` — small enough to stay third-order, large enough to
        stay above float noise.
    z_start : launch plane; defaults to one system length before the
        first vertex.
    stop_z / stop_after : stop override, as in :func:`seidel`.
    key : PRNG key for stochastic physics (Fresnel MC); default 0.
    aiming : 'paraxial' (default) launches every probe from the linear
        two-basis-ray solve; 'real' Newton-refines each launch with
        ``n_aim_iter`` extra traced iterations until the REAL ray crosses
        the stop at its target height — the classic "ray aiming" that
        keeps wide-angle scans honest when pupil aberration makes the
        paraxial aim miss the stop (chief rays then sample the wrong
        pupil zone, skewing distortion and vignetting).  Differentiable
        either way.

    Returns a :class:`FieldScan`.  Focus/distortion outputs are
    differentiable w.r.t. ``params``; the illumination fraction is a
    discrete count (piecewise-constant gradients).
    """
    surfs, ap_stop_z, stop_r, _ = paraxial_prescription(scene, params)
    stop_z, seg = _resolve_stop(surfs, ap_stop_z, stop_z, stop_after)
    if aperture is None:
        aperture = stop_r
    if aperture is None:
        raise ValueError("no CircularAperture in the scene: pass aperture=")
    aperture = float(aperture)
    if dtype is None:
        dtype = jnp.result_type(float)

    fields = jnp.asarray(fields, dtype)
    F = int(fields.shape[0])

    # -- paraxial aiming: basis rays P=(1,0), Q=(0,1) at the first vertex
    yP, _, uP_out, _ = paraxial_ray(surfs, 1.0, 0.0)
    yQ, _, uQ_out, _ = paraxial_ray(surfs, 0.0, 1.0)
    YsP = _y_at(surfs, yP, uP_out, 0.0, stop_z, seg)
    YsQ = _y_at(surfs, yQ, uQ_out, 1.0, stop_z, seg)
    # paraxial image plane from the axial marginal (u0 = 0, unit height)
    z_last = surfs[-1].z
    u_img = uP_out[-1]
    z_image = z_last - yP[-1] / jnp.where(jnp.abs(u_img) < 1e-30,
                                          1e-30, u_img)
    # linear chief reference per unit field slope, extrapolated to z_image
    cy0u = -YsQ / YsP                       # chief: stop height 0, u = 1
    y_par = (cy0u * (yP[-1] + (z_image - z_last) * uP_out[-1])
             + 1.0 * (yQ[-1] + (z_image - z_last) * uQ_out[-1]))

    z1 = surfs[0].z
    if z_start is None:
        track = jnp.abs(z_image - z1)
        z_start = z1 - jnp.maximum(track, 1.0)
    z_start = jnp.asarray(z_start, dtype)

    def launch_y(h_stop, u):
        """Start height at z_start for slope u and stop height h_stop."""
        y1 = (h_stop - u * YsQ) / YsP       # height at the first vertex
        return y1 - (z1 - z_start) * u

    dh = rel_probe * aperture
    u = fields                                           # [F]
    norm = 1.0 / jnp.sqrt(1.0 + u * u)
    # meridional probes: chief, T+dh, T-dh  (x = 0)
    probe_h = jnp.stack([jnp.zeros_like(u), jnp.full_like(u, dh),
                         jnp.full_like(u, -dh)])         # [3, F]
    ym = launch_y(probe_h, u[None, :])                   # [3, F]
    pos_m = jnp.stack([jnp.zeros_like(ym), ym,
                       jnp.broadcast_to(z_start, ym.shape)], -1)
    dir_m = jnp.stack([jnp.zeros_like(ym),
                       jnp.broadcast_to(u * norm, ym.shape),
                       jnp.broadcast_to(norm, ym.shape)], -1)
    # sagittal probe: x offset dh at the stop, x-slope 0 (skew ray);
    # rotational symmetry -> the x aim uses the same YsP basis
    x0 = dh / YsP
    pos_s = jnp.stack([jnp.full_like(u, x0 - 0.0), launch_y(0.0, u),
                       jnp.broadcast_to(z_start, u.shape)], -1)[None]
    dir_s = dir_m[:1]
    pos = jnp.concatenate([pos_m, pos_s]).reshape(-1, 3)     # [4F, 3]
    dirs = jnp.concatenate([dir_m, dir_s]).reshape(-1, 3)

    # vignetting disk: sunflower layout over the stop (deterministic)
    if n_pupil:
        j = jnp.arange(n_pupil, dtype=dtype)
        r = aperture * jnp.sqrt((j + 0.5) / n_pupil)
        hx, hy = r * jnp.cos(j * _GOLDEN), r * jnp.sin(j * _GOLDEN)
        yv = launch_y(hy[None, :], u[:, None])               # [F, P]
        xv = jnp.broadcast_to((hx / YsP)[None, :], yv.shape)
        pos_v = jnp.stack([xv, yv, jnp.broadcast_to(z_start, yv.shape)],
                          -1).reshape(-1, 3)
        dir_v = jnp.broadcast_to(
            jnp.stack([jnp.zeros_like(u), u * norm, norm], -1)[:, None, :],
            (F, n_pupil, 3)).reshape(-1, 3)
        pos = jnp.concatenate([pos, pos_v])
        dirs = jnp.concatenate([dirs, dir_v])

    from ..rays.ray import Rays
    lam = (None if wavelength is None
           else jnp.full((pos.shape[0],), wavelength, dtype))
    if key is None:
        key = jax.random.PRNGKey(0)

    if aiming == 'real':
        # stop-plane target (x, y) per probe, in pos/dirs row order:
        # [chief xF, T+dh xF, T-dh xF, sagittal xF, disk xF*P]
        zF = jnp.zeros((F,), dtype)
        tx = [zF, zF, zF, jnp.full((F,), dh, dtype)]
        ty = [zF, jnp.full((F,), dh, dtype), jnp.full((F,), -dh, dtype), zF]
        if n_pupil:
            tx.append(jnp.broadcast_to(hx[None], (F, n_pupil)).reshape(-1))
            ty.append(jnp.broadcast_to(hy[None], (F, n_pupil)).reshape(-1))
        targets = jnp.stack([jnp.concatenate(tx), jnp.concatenate(ty)], -1)
        pos = _aim(scene, params, pos, dirs, targets, YsP, stop_z, key,
                   lam, n_aim_iter, dtype)
    elif aiming != 'paraxial':
        raise ValueError(f"aiming must be 'paraxial' or 'real': {aiming!r}")

    rays = Rays.create(pos, dirs, wavelength=lam, dtype=dtype)
    out, _, _ = scene.simulate(params, rays, key)

    px, py, pz = out.px, out.py, out.pz
    ux = out.dx / out.dz
    uy = out.dy / out.dz
    mer = lambda a: a[:3 * F].reshape(3, F)
    y_c, y_a, y_b = mer(py)
    z_c, z_a, z_b = mer(pz)
    u_c, u_a, u_b = mer(uy)
    # tangential focus: crossing of the close meridional pair
    du = u_a - u_b
    du = jnp.where(jnp.abs(du) < 1e-30, 1e-30, du)
    z_t = (y_b - y_a + z_a * u_a - z_b * u_b) / du
    # sagittal focus: skew ray re-crosses the meridional (x = 0) plane
    x_s = px[3 * F:4 * F]
    z_sf = pz[3 * F:4 * F]
    ux_s = ux[3 * F:4 * F]
    ux_s = jnp.where(jnp.abs(ux_s) < 1e-30, 1e-30, ux_s)
    z_s = z_sf - x_s / ux_s
    # chief height at the paraxial image plane; linear reference
    chief_y = y_c + (z_image - z_c) * u_c
    y_ref = y_par * fields
    y_ref_safe = jnp.where(jnp.abs(y_ref) < 1e-30, 1e-30, y_ref)
    dist = jnp.where(jnp.abs(y_ref) < 1e-30, 0.0,
                     100.0 * (chief_y - y_ref) / y_ref_safe)

    if n_pupil:
        w = out.intensity[4 * F:].reshape(F, n_pupil)
        trans = jnp.sum(w, -1) / n_pupil
    else:
        trans = jnp.ones((F,), dtype)
    rel = trans / jnp.where(trans[0] < 1e-30, 1e-30, trans[0])

    return FieldScan(fields=fields, z_tangential=z_t, z_sagittal=z_s,
                     chief_y=chief_y, y_ref=y_ref, distortion_pct=dist,
                     transmission=trans, rel_illumination=rel,
                     z_image=z_image)
