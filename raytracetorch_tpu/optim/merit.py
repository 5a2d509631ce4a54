"""Default merit functions: RMS spot / RMS wavefront over a field x
wavelength x pupil grid.

The classic lens-design merits (the Zemax/CodeV "default merit
function", RMS-spot and RMS-wavefront flavors): for every field angle
and wavelength, fill the stop with a deterministic pupil grid of rays,
trace them all to the image plane, and measure each ray's deviation
from its cell's reference — transverse landing error about the
centroid/chief ray (:func:`spot_residuals`) or optical path difference
about the reference sphere in waves (:func:`opd_residuals`).  The
residual VECTOR feeds ``fit_lm`` (damped least squares — the optimizer
these merits were born for); its sum of squares is a scalar loss for
``fit`` / ``fit_lbfgs``.

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


def _grid_trace(scene, params, fields, wavelengths, n_pupil, aperture,
                stop_z, stop_after, aiming, n_aim_iter, image_z, key,
                dtype, track_opl=False, aim_params=None):
    """Shared engine of the merit functions: build the aimed field x
    wavelength x pupil ray grid, trace it once, and land it on the image
    plane.  Returns a dict with the traced rays (``out``/``aux``), the
    LAUNCH components (for incoming-wavefront phase), landing ``x``/
    ``y``/``w`` reshaped [F, W, P], the pupil-grid wavelengths ``lam``
    (or None), ``z_img`` and the (F, W, P) shape.

    ``aim_params`` freezes the paraxial prescription, pupil aim and
    default image plane at a reference parameter set while the TRACE
    runs on ``params`` — the tolerancing configuration (perturbed
    as-built system, nominal ray grid, no implicit re-aim
    compensation), and the only way to evaluate the merit on a
    decentered/tilted parameter set (the centered-system paraxial
    machinery rejects those)."""
    from ..rays.ray import Rays
    from ..utils.fieldscan import _aim

    if dtype is None:
        dtype = jnp.result_type(float)
    ap_src = params if aim_params is None else aim_params
    surfs, ap_stop_z, stop_r, _ = paraxial_prescription(scene, ap_src)
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
        pos = _aim(scene, ap_src, pos, dirs, targets, YsP, stop_z, key,
                   lam, n_aim_iter, dtype)
        px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    elif aiming != 'paraxial':
        raise ValueError(f"aiming must be 'paraxial' or 'real': {aiming!r}")

    n = px.shape[0]
    rays = Rays.from_components(
        (px, py, pz), (dxc, dyc, dzc), jnp.ones((n,), dtype),
        jnp.zeros((n,), jnp.int32),
        lam if lam is not None else jnp.zeros((n,), dtype))
    kw = {'track_opl': True} if track_opl else {}
    out, _, aux = scene.simulate(params, rays, key, **kw)

    # transverse landing point on the image plane
    dz = jnp.where(jnp.abs(out.dz) < 1e-30, 1e-30, out.dz)
    t = (z_img - out.pz) / dz
    x = (out.px + t * out.dx).reshape(F, W, P)
    y = (out.py + t * out.dy).reshape(F, W, P)
    w = out.intensity.reshape(F, W, P)

    return dict(out=out, aux=aux, x=x, y=y, w=w, z_img=z_img,
                lam=lam, shape=(F, W, P), dtype=dtype,
                launch=(px, py, pz), dirs=(dxc, dyc, dzc))


def _cell_reference(g, reference):
    """Per-cell reference point [F, W, 1] on the image plane: the
    weighted landing centroid or the chief ray's landing point."""
    x, y, w = g['x'], g['y'], g['w']
    if reference == 'centroid':
        wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12)
        rx = jnp.sum(w * x, -1, keepdims=True) / wsum
        ry = jnp.sum(w * y, -1, keepdims=True) / wsum
    elif reference == 'chief':
        rx, ry = x[..., :1], y[..., :1]
    else:
        raise ValueError(
            f"reference must be 'centroid' or 'chief': {reference!r}")
    return rx, ry


def _cell_scale(g, field_weights, wavelength_weights):
    """sqrt weighting [F, W, P] making the merit's sum of squares the
    weighted mean-square residual (per-ray intensity times normalized
    cell weight over P rays)."""
    F, W, P = g['shape']
    dtype = g['dtype']
    wf = (jnp.ones((F,), dtype) if field_weights is None
          else jnp.asarray(field_weights, dtype))
    wl = (jnp.ones((W,), dtype) if wavelength_weights is None
          else jnp.asarray(wavelength_weights, dtype))
    cell_w = wf[:, None] * wl[None, :]                   # [F, W]
    return jnp.sqrt(g['w'] * cell_w[..., None]
                    / (jnp.sum(cell_w) * P))             # [F, W, P]


def spot_residuals(scene, params, fields, wavelengths=None, n_pupil=32,
                   aperture=None, stop_z=None, stop_after=None,
                   reference='centroid', field_weights=None,
                   wavelength_weights=None, aiming='paraxial',
                   n_aim_iter=3, image_z=None, key=None, dtype=None,
                   aim_params=None):
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

    aim_params : reference parameter pytree that FREEZES the pupil aim,
        paraxial prescription and default image plane (the trace still
        runs on ``params``).  Required to evaluate the merit on
        decentered/tilted parameter sets — pass the nominal design when
        tolerancing (utils/sensitivity.py does this in its docs).

    Vignetted/blocked rays contribute zero residual and zero centroid
    weight (their disappearance is a step — like every spot optimizer,
    treat vignetting as structure, not gradient signal).
    """
    g = _grid_trace(scene, params, fields, wavelengths, n_pupil, aperture,
                    stop_z, stop_after, aiming, n_aim_iter, image_z, key,
                    dtype, aim_params=aim_params)
    rx, ry = _cell_reference(g, reference)
    scale = _cell_scale(g, field_weights, wavelength_weights)
    # Pack the (x, y) residual pair with a broadcast where, NOT
    # jnp.stack: a concatenate of two deep computed blocks inside a
    # jvp'd program trips a pathological XLA:CPU fusion-emitter blowup
    # (the root kLoop fusion swallows the whole ~2000-op chain and the
    # jacobian kernel ran 34 s instead of 1 ms — measured, round 3).
    # The where-select fuses elementwise and compiles sanely; reduces of
    # the stacked form never hit this because reduce-of-concat is
    # algebraically split before fusion.
    res_x = ((g['x'] - rx) * scale).reshape(-1)
    res_y = ((g['y'] - ry) * scale).reshape(-1)
    sel = (jax.lax.iota(jnp.int32, 2) == 0)[:, None]     # [2, 1]
    res2 = jnp.where(sel, res_x[None, :], res_y[None, :])
    return jnp.transpose(res2)                           # [F*W*P, 2]


def opd_residuals(scene, params, fields, wavelengths=None, n_pupil=32,
                  aperture=None, stop_z=None, stop_after=None,
                  reference='centroid', field_weights=None,
                  wavelength_weights=None, aiming='paraxial',
                  n_aim_iter=3, image_z=None, key=None, dtype=None,
                  wave_scale=1e-3, aim_params=None):
    """Weighted wavefront errors in WAVES over the pupil grid, [F*W*P].

    The RMS-wavefront flavor of the default merit: each ray's optical
    path is accumulated through the trace (``track_opl``), continued to
    its closest approach to the cell's image reference point (the
    reference sphere's center — the same 'centroid'/'chief' choice as
    :func:`spot_residuals`), corrected for the INCOMING plane wave's
    phase across the launch plane (off-axis fields launch from a plane
    that is not their wavefront), and measured about the cell's weighted
    mean (piston removed; defocus is NOT removed — refocus is the
    designer's job via ``image_z`` or a floating ``best_focus`` solve).
    The merit's sum of squares is the weighted mean-square wavefront
    error in squared waves, so ``sqrt(loss)`` is the familiar "RMS
    wavefront error in waves" a diffraction-limited spec (< 0.07 waves,
    Marechal) is written against.

    ``wave_scale`` converts the wavelength list's units (um) to the
    trace's length units (default 1e-3: lens units in mm).  With
    ``wavelengths=None`` the d line (0.5876 um) sets the wave unit.
    All other parameters are as in :func:`spot_residuals`.

    Physics note: built on Fermat's principle exactly like
    utils/wavefront.py::wavefront_rms (OPL + remaining distance to the
    reference point is constant across a perfect pupil), generalized to
    tilted fields by the launch-phase term n0 * (d . p0).
    """
    g = _grid_trace(scene, params, fields, wavelengths, n_pupil, aperture,
                    stop_z, stop_after, aiming, n_aim_iter, image_z, key,
                    dtype, track_opl=True, aim_params=aim_params)
    F, W, P = g['shape']
    rx, ry = _cell_reference(g, reference)
    out = g['out']

    # incoming wavefront: rays of one cell share a direction d but
    # launch at different p0 — the optical path from the incoming plane
    # wave (the wavefront through the origin, normal d) to the launch
    # point is n0 * (d . p0) (n0 = 1 object-space ambient), and the
    # traced OPL starts at ZERO on the launch plane, so it must be
    # added back for rays to share a common wavefront, not a common
    # plane.
    px0, py0, pz0 = g['launch']
    dx0, dy0, dz0 = g['dirs']
    phase0 = px0 * dx0 + py0 * dy0 + pz0 * dz0

    # continue each ray to its closest approach to the cell's reference
    # point (utils/wavefront.py::opl_to_point, componentized): the total
    # OPL to the reference sphere through that point.
    rxf = jnp.broadcast_to(rx, (F, W, P)).reshape(-1)
    ryf = jnp.broadcast_to(ry, (F, W, P)).reshape(-1)
    z_img = jnp.broadcast_to(g['z_img'], rxf.shape)
    t_close = ((rxf - out.px) * out.dx + (ryf - out.py) * out.dy
               + (z_img - out.pz) * out.dz)
    opd = (phase0 + g['aux']['opl'] + t_close).reshape(F, W, P)

    # piston removal per cell (weighted), then waves
    w = g['w']
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12)
    piston = jnp.sum(w * opd, -1, keepdims=True) / wsum
    lam_g = (jnp.full((F, W, P), LINE_D, g['dtype']) if g['lam'] is None
             else g['lam'].reshape(F, W, P))
    scale = _cell_scale(g, field_weights, wavelength_weights)
    res = (opd - piston) / (lam_g * wave_scale) * scale
    return res.reshape(-1)                               # [F*W*P]


def default_merit(scene, fields, metric='spot', **kw):
    """Build ``(loss_fn, residual_fn)`` closures over the default merit.

    ``metric='spot'`` measures transverse ray errors in lens units
    (:func:`spot_residuals`); ``metric='wavefront'`` measures optical
    path differences in waves (:func:`opd_residuals` — ``sqrt(loss)`` is
    the RMS wavefront error).  ``residual_fn(params) -> [m]``
    (flattened) feeds ``fit_lm``; ``loss_fn(params) -> scalar`` is its
    sum of squares for ``fit`` / ``fit_lbfgs``.  All keyword arguments
    pass through::

        loss, resid = default_merit(scene, fields=[0., 0.05, 0.1],
                                    wavelengths=[0.486, 0.588, 0.656])
        params, hist = fit_lm(resid, params, trainable=scene.trainable())
    """
    if metric == 'spot':
        fn = spot_residuals
    elif metric == 'wavefront':
        fn = opd_residuals
    else:
        raise ValueError(
            f"metric must be 'spot' or 'wavefront': {metric!r}")

    def residual_fn(params):
        return fn(scene, params, fields, **kw).reshape(-1)

    def loss_fn(params):
        r = residual_fn(params)
        return jnp.sum(r * r)

    return loss_fn, residual_fn
