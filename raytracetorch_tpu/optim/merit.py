"""Default merit function: RMS spot over a field x wavelength x pupil grid.

The classic lens-design merit (the Zemax/CodeV "default merit function",
RMS-spot flavor): for every field angle and wavelength, fill the stop with
a deterministic pupil grid of rays, trace them all to the image plane, and
measure each ray's transverse deviation from its cell's reference point
(centroid or chief ray).  The residual VECTOR feeds ``fit_lm`` (damped
least squares — the optimizer this merit was born for); its sum of
squares is a scalar loss for ``fit`` / ``fit_lbfgs``.

The torch reference has only single-bundle spot losses re-simulated per
bundle in a Python loop (reference ``optim/goals.py:99-187``); this is
the multi-field, polychromatic generalization.  TPU-first: the ENTIRE
grid — all fields, all wavelengths, all pupil rays — is ONE batched
trace per merit evaluation (an [F*W*P]-ray SoA batch; no Python loop
over device calls), and everything (aim solve, trace, reference,
residuals) differentiates.

Restrictions are inherited from the paraxial aiming machinery
(utils/seidel.py): centered systems of spherical/aspheric lens stacks,
rotationally-symmetric mirrors, apertures, sensors.  Pass
``stop_after=<element name>`` for folded systems (z-ordering is not
assumed then), and note that differentiating through element POSITIONS
requires the structural stop route too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.seidel import (LINE_D, _resolve_stop, _y_at,
                            paraxial_prescription, paraxial_ray)

_GOLDEN = 2.399963229728653  # radians (sunflower pupil layout)


def _structural_stop(scene, surfs, ap_stop_z, stop_z, stop_after):
    """``_resolve_stop`` that stays jit-safe: locating the stop GAP needs
    concrete z ordering, which dies when the merit is jitted over the
    full parameter pytree (fit / fit_lm always jit).  The gap is
    structural, so on a tracer error re-locate it on the scene's initial
    parameters and keep the LIVE (possibly traced) stop plane for the
    math.  Assumes optimization does not reorder surfaces across the
    stop — the same static-structure assumption the trace itself makes."""
    traced = any(isinstance(v, jax.core.Tracer)
                 for s in surfs for v in (s.z,)) or \
        isinstance(ap_stop_z, jax.core.Tracer) or \
        isinstance(stop_z, jax.core.Tracer)
    if not traced:
        return _resolve_stop(surfs, ap_stop_z, stop_z, stop_after)
    # ensure_compile_time_eval escapes the ambient trace so the
    # re-derivation on init_params really is concrete (inside a jit
    # trace, jnp ops stage even on constant operands).  An isinstance
    # check, NOT try/except ConcretizationTypeError: building that
    # error's provenance message walks the whole traced graph, which
    # inside fit_lm's jacfwd-of-scan took minutes per trace.
    with jax.ensure_compile_time_eval():
        surfs0, apz0, _, _ = paraxial_prescription(scene,
                                                   scene.init_params())
        stop_z0 = (None if stop_z is None
                   or isinstance(stop_z, jax.core.Tracer)
                   else float(stop_z))
        _, seg = _resolve_stop(surfs0, apz0, stop_z0, stop_after)
    live = stop_z if stop_z is not None else ap_stop_z
    return (live if live is not None else surfs[0].z), seg


def spot_residuals(scene, params, fields, wavelengths=None, n_pupil=32,
                   aperture=None, stop_z=None, stop_after=None,
                   reference='centroid', field_weights=None,
                   wavelength_weights=None, aiming='paraxial',
                   n_aim_iter=3, image_z=None, key=None, dtype=None):
    """Weighted transverse ray errors on the image plane, [F*W*P, 2].

    Parameters
    ----------
    fields : [F] object-space chief-ray slopes (tan of field angles).
    wavelengths : [W] wavelengths in um, or None for one monochromatic
        pass at the catalog base line (0.5876 um stamped only if the
        scene is dispersive — an unstamped trace uses base indices).
    n_pupil : rays per (field, wavelength) cell, sunflower layout over
        the stop (deterministic — the merit is smooth in ``params``).
    reference : 'centroid' measures RMS about each cell's weighted
        centroid (pure blur, distortion-free); 'chief' measures about the
        cell's chief-ray landing point (penalizes asymmetric blur the way
        a centered detector sees it).
    field_weights / wavelength_weights : [F] / [W] relative weights
        (uniform default).  Residuals are scaled so the merit's sum of
        squares is the weighted mean-square transverse error in lens
        units.
    aiming : 'paraxial' or 'real' (see utils/fieldscan.field_scan).
    image_z : override the evaluation plane; default is the paraxial
        image plane recomputed from ``params`` every call (so refocus by
        curvature change is followed automatically).  Pass the sensor's
        z to design against a FIXED detector instead.
    key : PRNG key for stochastic physics; default 0.

    Vignetted/blocked rays contribute zero residual and zero centroid
    weight (their disappearance is a step — like every spot optimizer,
    treat vignetting as structure, not gradient signal).
    """
    from ..rays.ray import Rays
    from ..utils.fieldscan import _aim

    if dtype is None:
        dtype = jnp.result_type(float)
    surfs, ap_stop_z, stop_r, _ = paraxial_prescription(scene, params)
    stop_z, seg = _structural_stop(scene, surfs, ap_stop_z, stop_z,
                                   stop_after)
    if aperture is None:
        aperture = stop_r
    if aperture is None:
        raise ValueError("no CircularAperture in the scene: pass aperture=")
    # stop_r comes from the live params pytree — may be a tracer when the
    # merit is jitted/differentiated, so never force it concrete.
    aperture = jnp.asarray(aperture, dtype)

    fields = jnp.asarray(fields, dtype)
    F = int(fields.shape[0])
    lams = (None if wavelengths is None
            else jnp.asarray(wavelengths, dtype).reshape(-1))
    W = 1 if lams is None else int(lams.shape[0])
    P = int(n_pupil)

    # paraxial two-basis aim (as in utils/fieldscan.field_scan)
    yP, _, uP_out, _ = paraxial_ray(surfs, 1.0, 0.0)
    yQ, _, uQ_out, _ = paraxial_ray(surfs, 0.0, 1.0)
    YsP = _y_at(surfs, yP, uP_out, 0.0, stop_z, seg)
    YsQ = _y_at(surfs, yQ, uQ_out, 1.0, stop_z, seg)
    z_last = surfs[-1].z
    u_img = uP_out[-1]
    z_img = z_last - yP[-1] / jnp.where(jnp.abs(u_img) < 1e-30, 1e-30,
                                        u_img)
    if image_z is not None:
        z_img = jnp.asarray(image_z, dtype)
    z1 = surfs[0].z
    z_start = z1 - jnp.maximum(jnp.abs(z_img - z1), 1.0)

    # pupil targets per cell: chief first, then the sunflower disk.
    # Built WITHOUT concatenate (where over the iota instead) and the
    # rays assembled as planar COMPONENTS, never a [N, 3] stack: a
    # stack/slice of param-dependent blocks in the jvp'd program is the
    # XLA:CPU fusion-emitter bomb (CLAUDE.md) — and component tuples are
    # the fast layout for the TPU trace core anyway (geom/vec3.py).
    jj = jnp.arange(P, dtype=dtype)
    rr = aperture * jnp.sqrt(jnp.maximum(jj - 0.5, 0.0) / (P - 1))
    on_disk = jj > 0.5
    hx = jnp.where(on_disk, rr * jnp.cos((jj - 1.0) * _GOLDEN), 0.0)
    hy = jnp.where(on_disk, rr * jnp.sin((jj - 1.0) * _GOLDEN), 0.0)

    u = fields[:, None]                                  # [F, 1]
    norm = 1.0 / jnp.sqrt(1.0 + u * u)
    y1 = (hy[None, :] - u * YsQ) / YsP                   # [F, P]
    y0 = y1 - (z1 - z_start) * u
    x0 = jnp.broadcast_to((hx / YsP)[None, :], y0.shape)

    def tile(a):                                         # [F, P] -> [F*W*P]
        a = jnp.broadcast_to(a, (F, P))
        return jnp.broadcast_to(a[:, None], (F, W, P)).reshape(-1)

    px, py = tile(x0), tile(y0)
    pz = jnp.broadcast_to(jnp.asarray(z_start, dtype), px.shape)
    dxc = jnp.zeros_like(px)
    dyc, dzc = tile(u * norm), tile(jnp.broadcast_to(norm, (F, P)))
    lam = (None if lams is None else jnp.broadcast_to(
        lams[None, :, None], (F, W, P)).reshape(-1))
    if key is None:
        key = jax.random.PRNGKey(0)

    if aiming == 'real':
        # the aiming boundary wants [N, 3]; the Newton traces dominate
        # its cost anyway
        pos = jnp.stack([px, py, pz], -1)
        dirs = jnp.stack([dxc, dyc, dzc], -1)
        targets = jnp.stack(
            [jnp.broadcast_to(hx[None, None], (F, W, P)).reshape(-1),
             jnp.broadcast_to(hy[None, None], (F, W, P)).reshape(-1)], -1)
        pos = _aim(scene, params, pos, dirs, targets, YsP, stop_z, key,
                   lam, n_aim_iter, dtype)
        px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    elif aiming != 'paraxial':
        raise ValueError(f"aiming must be 'paraxial' or 'real': {aiming!r}")

    n = px.shape[0]
    rays = Rays.from_components(
        (px, py, pz), (dxc, dyc, dzc), jnp.ones((n,), dtype),
        jnp.zeros((n,), jnp.int32),
        lam if lam is not None else jnp.zeros((n,), dtype))
    out, _, _ = scene.simulate(params, rays, key)

    # transverse landing point on the image plane
    dz = jnp.where(jnp.abs(out.dz) < 1e-30, 1e-30, out.dz)
    t = (z_img - out.pz) / dz
    x = (out.px + t * out.dx).reshape(F, W, P)
    y = (out.py + t * out.dy).reshape(F, W, P)
    w = out.intensity.reshape(F, W, P)

    if reference == 'centroid':
        wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12)
        rx = jnp.sum(w * x, -1, keepdims=True) / wsum
        ry = jnp.sum(w * y, -1, keepdims=True) / wsum
    elif reference == 'chief':
        rx, ry = x[..., :1], y[..., :1]
    else:
        raise ValueError(
            f"reference must be 'centroid' or 'chief': {reference!r}")

    wf = (jnp.ones((F,), dtype) if field_weights is None
          else jnp.asarray(field_weights, dtype))
    wl = (jnp.ones((W,), dtype) if wavelength_weights is None
          else jnp.asarray(wavelength_weights, dtype))
    cell_w = wf[:, None] * wl[None, :]                   # [F, W]
    scale = jnp.sqrt(w * cell_w[..., None]
                     / (jnp.sum(cell_w) * P))            # [F, W, P]
    # Pack the (x, y) residual pair with a broadcast where, NOT
    # jnp.stack: a concatenate of two deep computed blocks inside a
    # jvp'd program trips a pathological XLA:CPU fusion-emitter blowup
    # (the root kLoop fusion swallows the whole ~2000-op chain and the
    # jacobian kernel ran 34 s instead of 1 ms — measured, round 3).
    # The where-select fuses elementwise and compiles sanely; reduces of
    # the stacked form never hit this because reduce-of-concat is
    # algebraically split before fusion.
    res_x = ((x - rx) * scale).reshape(-1)
    res_y = ((y - ry) * scale).reshape(-1)
    sel = (jax.lax.iota(jnp.int32, 2) == 0)[:, None]     # [2, 1]
    res2 = jnp.where(sel, res_x[None, :], res_y[None, :])
    return jnp.transpose(res2)                           # [F*W*P, 2]


def default_merit(scene, fields, **kw):
    """Build ``(loss_fn, residual_fn)`` closures over :func:`spot_residuals`.

    ``residual_fn(params) -> [m]`` (flattened) feeds ``fit_lm``;
    ``loss_fn(params) -> scalar`` is its sum of squares (the weighted
    mean-square transverse spot error) for ``fit`` / ``fit_lbfgs``.
    All :func:`spot_residuals` keywords pass through::

        loss, resid = default_merit(scene, fields=[0., 0.05, 0.1],
                                    wavelengths=[0.486, 0.588, 0.656])
        params, hist = fit_lm(resid, params, trainable=scene.trainable())
    """
    def residual_fn(params):
        return spot_residuals(scene, params, fields, **kw).reshape(-1)

    def loss_fn(params):
        r = residual_fn(params)
        return jnp.sum(r * r)

    return loss_fn, residual_fn
