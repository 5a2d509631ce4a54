"""Interactive workbench: a browser UI over the headless engine.

TPU-native equivalent of the reference's Dear PyGui desktop app
(gui/workbench.py:1014, gui/viewport.py:130-296, gui/forms.py:35-437,
gui/gizmo.py:282-336): a stdlib HTTP server exposes the existing layers —
``Renderer.render_3d`` as the viewport (orbit/pan/zoom), ``record_paths``
as the ray-path overlay, sensor moments/hits as the spot-diagram panel,
the auto-captured constructor configs (config.py) as introspected element
forms, ``optim.fit`` behind the optimize button, and ``project.py`` for
save/load — no GUI toolkit dependency, works over SSH.

Run ``python -m raytracetorch_tpu.gui [project.rtt] [--port 8000]``.
"""

from __future__ import annotations

import base64
import inspect
import json
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfgmod
from .. import project as projmod
from ..optim.fit import fit
from ..optim.goals import focal_length_loss, spot_size_loss
from ..render.camera import Camera, OrbitCamera, Renderer
from ..scene.scene import Scene, SequentialScene
from .png import encode_rgb

MAX_OVERLAY_RAYS = 60
MAX_SPOT_POINTS = 3000


def _tolist(x):
    return np.asarray(x).tolist()


class Workbench:
    """Server-side state: scene + live params + orbit camera."""

    MAX_UNDO = 64

    def __init__(self, scene=None, width=640, height=480):
        self.lock = threading.Lock()
        self.width, self.height = int(width), int(height)
        self.scene = scene if scene is not None else SequentialScene([])
        self.params = self.scene.init_params()
        self.key = jax.random.PRNGKey(0)
        self._render_cache = None
        self._undo, self._redo = [], []
        self.reset_camera()

    # -- undo/redo ---------------------------------------------------------
    # Element specs are treated as immutable by the form editors (edits
    # replace them in the list) and jax arrays are immutable, so a snapshot
    # is shallow copies of the element/bundle lists + per-element param
    # dicts — EXCEPT the pose fields the gizmo mutates in place
    # (_trans_init/_rot_init/_ctor_config translation+rotation), which are
    # captured and restored explicitly.  Every mutating endpoint pushes one
    # snapshot (gizmo drags coalesce: one per drag gesture).

    def _snapshot(self):
        poses = []
        for el in self.scene.elements:
            cc = getattr(el, '_ctor_config', None)
            poses.append((el, list(el._trans_init), list(el._rot_init),
                          None if cc is None else cc.get('translation'),
                          None if cc is None else cc.get('rotation')))
        return dict(cls=type(self.scene),
                    elements=list(self.scene.elements),
                    bundles=list(self.scene.bundles),
                    n_bounces=self.scene.n_bounces,
                    poses=poses,
                    params={k: dict(v) for k, v in self.params.items()})

    def push_undo(self):
        self._undo.append(self._snapshot())
        del self._undo[:-self.MAX_UNDO]
        self._redo.clear()

    def _restore(self, snap):
        sc = snap['cls'](snap['elements'], n_bounces=snap['n_bounces'])
        sc.bundles = snap['bundles']
        sc.grid_shape = self.scene.grid_shape
        sc.grid_half_extent = self.scene.grid_half_extent
        self.scene = sc
        for el, trans, rot, cc_t, cc_r in snap['poses']:
            el._trans_init = list(trans)
            el._rot_init = list(rot)
            cc = getattr(el, '_ctor_config', None)
            if cc is not None:
                for k, v in (('translation', cc_t), ('rotation', cc_r)):
                    if v is None:
                        cc.pop(k, None)
                    else:
                        cc[k] = list(v)
        self.params = {k: dict(v) for k, v in snap['params'].items()}
        self._render_cache = None

    def undo(self):
        if not self._undo:
            raise ValueError('nothing to undo')
        self._redo.append(self._snapshot())
        self._restore(self._undo.pop())
        return {'undo_left': len(self._undo), 'redo_left': len(self._redo)}

    def redo(self):
        if not self._redo:
            raise ValueError('nothing to redo')
        self._undo.append(self._snapshot())
        self._restore(self._redo.pop())
        return {'undo_left': len(self._undo), 'redo_left': len(self._redo)}

    # -- camera ------------------------------------------------------------

    def _scene_center(self):
        zs = [float(np.asarray(p['trans'])[2])
              for p in self.params.values()] or [0.0]
        return (0.0, 0.0, (min(zs) + max(zs)) / 2.0)

    def reset_camera(self):
        pivot = self._scene_center()
        span = 40.0
        self.camera = OrbitCamera(
            pivot=pivot,
            position=(pivot[0] + 0.5 * span, pivot[1] + 0.4 * span,
                      pivot[2] - 1.1 * span),
            look_at=pivot, width=self.width, height=self.height)

    # -- scene mutation ------------------------------------------------------

    def _reinit_params(self):
        """Re-init params after a structural edit, preserving optimized
        values of untouched elements (matched by name + leaf shape)."""
        old = self.params
        fresh = self.scene.init_params()
        for name, d in fresh.items():
            if name in old:
                for k in d:
                    if k in old[name] and np.shape(old[name][k]) == \
                            np.shape(d[k]):
                        d[k] = old[name][k]
        self.params = fresh
        self.scene._static_meta = None
        self._render_cache = None

    def set_scene(self, scene):
        self.scene = scene
        self.params = scene.init_params()
        self._render_cache = None
        self.reset_camera()

    # -- viewport ------------------------------------------------------------

    def _render_fn(self):
        """Jitted render keyed on scene structure; camera vectors are traced
        arguments so orbiting does NOT recompile."""
        if self._render_cache is None:
            renderer = Renderer(self.scene)
            cam = Camera(position=(0.0, 0.0, -1.0), look_at=(0.0, 0.0, 0.0),
                         width=self.width, height=self.height)

            def f(params, origin, forward, right, up):
                cam.origin, cam.forward = origin, forward
                cam.right, cam.up_cam = right, up
                return renderer.render_3d(params, cam)

            self._render_cache = jax.jit(f)
        return self._render_cache

    def render_png(self):
        if not self.scene.elements:
            img = np.full((self.height, self.width, 3), 0.15, np.float32)
            return encode_rgb(img)
        c = self.camera
        img = self._render_fn()(self.params, c.origin, c.forward, c.right,
                                c.up_cam)
        return encode_rgb(np.asarray(img))

    def project_points(self, pts):
        """World [M, 3] -> pixel [M, 2] + in-front mask, matching
        Camera.generate_rays' pixel grid."""
        c = self.camera
        rel = pts - np.asarray(c.origin)[None, :]
        z = rel @ np.asarray(c.forward)
        x = rel @ np.asarray(c.right)
        y = rel @ np.asarray(c.up_cam)
        sy = np.tan(np.deg2rad(c.fov_deg * 0.5))
        sx = sy * self.width / self.height
        ok = z > 1e-6
        zs = np.where(ok, z, 1.0)
        u = (x / (zs * sx) + 1.0) / 2.0 * self.width
        v = (1.0 - y / (zs * sy)) / 2.0 * self.height
        return np.stack([u, v], -1), ok

    # -- trace / metrics ------------------------------------------------------

    def _sim_kwargs(self):
        """Per-scene simulate kwargs the workbench must supply: JONES
        elements (polarizer/waveplate) act on the tracked E-field, so
        any scene containing one is traced with track_field=True
        (x-polarized default launch)."""
        from ..constants import PhysKind
        try:
            metas = self.scene.static_meta()
        except Exception:
            return {}
        if any(m.ph == PhysKind.JONES for m in metas):
            if any(m.ph in (PhysKind.GRIN, PhysKind.SCATTER)
                   for m in metas):
                raise ValueError(
                    'a scene cannot hold BOTH a polarizer/waveplate '
                    '(needs track_field) and a GRIN rod or scatter '
                    'surface (they reject it — polarization transport '
                    'along curved/scattered rays is not modeled); '
                    'remove one of them')
            return {'track_field': True}
        return {}

    def trace(self):
        if not self.scene.bundles:
            raise ValueError("add a bundle (ray source) first")
        k1, k2 = jax.random.split(self.key)
        rays = self.scene.sample_rays(k1)
        out, sensors, aux = self.scene.simulate(
            self.params, rays, k2, record_paths=True, record_hits=True,
            **self._sim_kwargs())

        # path overlay: stride to <= MAX_OVERLAY_RAYS, project to pixels
        paths = np.asarray(aux['paths'])              # [S(+1), N, 3]
        if self.scene.sequential:
            launch = np.asarray(rays.pos)[None]
            if paths.shape[0] and paths.shape[1] == launch.shape[1] \
                    and not np.allclose(paths[0], launch[0]):
                paths = np.concatenate([launch, paths], 0)
        n = paths.shape[1]
        stride = max(1, n // MAX_OVERLAY_RAYS)
        sel = paths[:, ::stride, :]                    # [S, M, 3]
        ids = np.asarray(rays.ray_id)[::stride]
        polylines = []
        for i in range(sel.shape[1]):
            px, ok = self.project_points(sel[:, i, :])
            seg = [[round(float(u), 1), round(float(v), 1)]
                   for (u, v), o in zip(px, ok) if o]
            polylines.append({'id': int(ids[i]), 'pts': seg})

        # spot diagram: sensor-local hits — both drivers record them now
        # (sequential: per-surface rows; non-sequential: per-bounce rows
        # with hit_weights marking actual sensor crossings)
        spots = []
        meta = self.scene.static_meta()
        hits = np.asarray(aux['hits'])
        hw = np.asarray(aux['hit_weights'])
        rid = np.asarray(rays.ray_id)
        if self.scene.sequential:
            rows = [(k, None) for k, m in enumerate(meta) if m.sensor]
        else:
            slots = np.asarray(aux['hit_slots'])
            sensor_slots = sorted({m.slot for m in meta if m.sensor})
            rows = [(None, sl) for sl in sensor_slots]
        for ksurf, slot in rows:
            if ksurf is not None:                      # sequential row
                keep = hw[ksurf] > 0
                xy, ii = hits[ksurf][keep][:, :2], rid[keep]
            else:                                      # nonseq: gather slot
                keep = (hw > 0) & (slots == slot)      # [B, N]
                xy = hits[keep][:, :2]
                ii = np.broadcast_to(rid[None, :], keep.shape)[keep]
            if xy.shape[0] > MAX_SPOT_POINTS:
                st = xy.shape[0] // MAX_SPOT_POINTS + 1
                xy, ii = xy[::st], ii[::st]
            spots.append({'x': _tolist(xy[:, 0]), 'y': _tolist(xy[:, 1]),
                          'id': _tolist(ii)})

        metrics = []
        for slot in range(max(self.scene.n_sensors, 1)):
            metrics.append({
                'sensor': slot,
                'rms': _tolist(sensors.spot_rms(slot)),
                'centroid': _tolist(sensors.centroid(slot)),
                'weight': _tolist(sensors.total_weight(slot)),
            })
        n_alive = int(np.sum(np.asarray(out.intensity) > 0))
        return {'paths': polylines, 'spots': spots, 'metrics': metrics,
                'n_rays': int(rays.n), 'n_alive': n_alive}

    # -- optimize --------------------------------------------------------------

    def irradiance(self, sensor=0, res=128, half_extent=None, log=True):
        """Sensor irradiance image (the north-star 'sensor irradiance
        accumulation' view): re-trace with a [res, res] grid on the scene
        — binned by one-hot MXU matmuls, core/sensor.py::_bin_grid, so a
        full-resolution image costs about the same as the plain trace —
        and return it as a false-color PNG.  ``half_extent=None``
        auto-fits the window to centroid + 4 RMS of the selected
        sensor's spot."""
        if not self.scene.bundles:
            raise ValueError("add a bundle (ray source) first")
        k1, k2 = jax.random.split(self.key)
        rays = self.scene.sample_rays(k1)
        sensor = int(sensor)
        if half_extent is None:
            _, sensors, _ = self.scene.simulate(self.params, rays, k2,
                                                **self._sim_kwargs())
            c = np.asarray(sensors.centroid(sensor))
            r = np.asarray(sensors.spot_rms(sensor))
            half_extent = float(max(float(np.abs(c).max())
                                    + 4.0 * float(r.max()), 1e-3))
        old = (self.scene.grid_shape, self.scene.grid_half_extent)
        try:
            self.scene.grid_shape = (int(res), int(res))
            self.scene.grid_half_extent = float(half_extent)
            _, sensors, _ = self.scene.simulate(self.params, rays, k2,
                                                **self._sim_kwargs())
        finally:
            self.scene.grid_shape, self.scene.grid_half_extent = old
        g = np.asarray(sensors.grid[min(sensor, sensors.grid.shape[0] - 1)])
        peak = float(g.max())
        norm = g / max(peak, 1e-12)
        if log:
            norm = np.log1p(norm * 1e3) / np.log(1e3 + 1.0)
        # compact inferno-style ramp (black -> purple -> orange -> white)
        t = norm[..., None]
        stops = np.asarray([[0.0, 0.0, 0.0], [0.35, 0.05, 0.38],
                            [0.9, 0.35, 0.05], [0.98, 0.9, 0.55],
                            [1.0, 1.0, 1.0]])
        seg = np.clip(t * (len(stops) - 1), 0, len(stops) - 1 - 1e-6)
        i0 = seg.astype(np.int32)
        frac = seg - i0
        rgb = stops[i0[..., 0]] * (1 - frac) + stops[i0[..., 0] + 1] * frac
        png = encode_rgb(rgb[::-1])            # sensor-local +y up
        return {'png': base64.b64encode(png).decode(),
                'half_extent': float(half_extent),
                'total': float(g.sum()), 'peak': peak, 'res': int(res)}

    def interferogram(self, tilt=4.0, res=96, defocus=0.0,
                      wavelength=0.5876):
        """Two-beam interferogram of the traced wavefront
        (utils/wavefront.py::interferogram): pupil OPD referenced to the
        bundle's best focus (+``defocus``, lens units), ``tilt``
        reference fringes, grayscale PNG.  Needs a collimated-style
        bundle (the launch x/y are the pupil coordinates)."""
        if not self.scene.bundles:
            raise ValueError("add a bundle (ray source) first")
        if not self.scene.sequential:
            raise ValueError("interferogram needs a sequential scene")
        from ..utils.psf import pupil_from_trace
        from ..utils.wavefront import best_focus, interferogram
        k1, k2 = jax.random.split(self.key)
        rays = self.scene.sample_rays(k1)
        r_p = float(np.sqrt(np.asarray(rays.px) ** 2
                            + np.asarray(rays.py) ** 2).max())
        if r_p < 1e-6:
            raise ValueError("bundle has no pupil extent — use a "
                             "collimated (disk) source")
        out, _, aux = self.scene.simulate(self.params, rays, k2,
                                          track_opl=True)
        point = np.asarray(best_focus(out)) + np.array([0, 0,
                                                        float(defocus)])
        opd, amp = pupil_from_trace(rays, out, aux['opl'], r_p,
                                    n=int(res),
                                    point=jnp.asarray(point, jnp.float32))
        lam_mm = float(wavelength) * 1e-3
        img = np.asarray(interferogram(opd, amp, lam_mm,
                                       tilt_fringes=float(tilt)))
        a = np.asarray(amp)
        w = a / max(float(a.sum()), 1e-12)
        opd_np = np.asarray(opd)
        mean = float((opd_np * w).sum())
        rms_waves = float(np.sqrt((((opd_np - mean) ** 2) * w).sum())
                          / lam_mm)
        rgb = np.clip(img, 0.0, 1.0)[..., None] * np.ones(3)
        png = encode_rgb(rgb[::-1])
        return {'png': base64.b64encode(png).decode(),
                'rms_waves': rms_waves, 'pupil_radius': r_p,
                'res': int(res)}

    def through_focus(self, span=0.5, n_planes=33, res=48,
                      wavelength=0.5876, pad=4):
        """Through-focus axial intensity map: the traced pupil's focal
        field propagated to ``n_planes`` defocus planes over +-``span``
        (utils/propagation.py::through_focus_psf — true angular-spectrum
        propagation, so spherical aberration shows its asymmetric
        caustic).  Returns the [z, x] center-row slice as a PNG, the
        peak-intensity defocus, and the working f-number estimated from
        the traced marginal-ray slope."""
        if not self.scene.bundles:
            raise ValueError("add a bundle (ray source) first")
        if not self.scene.sequential:
            raise ValueError("through-focus needs a sequential scene")
        from ..utils.propagation import through_focus_psf
        from ..utils.psf import pupil_from_trace
        k1, k2 = jax.random.split(self.key)
        rays = self.scene.sample_rays(k1)
        r_p = float(np.sqrt(np.asarray(rays.px) ** 2
                            + np.asarray(rays.py) ** 2).max())
        if r_p < 1e-6:
            raise ValueError("bundle has no pupil extent — use a "
                             "collimated (disk) source")
        out, _, aux = self.scene.simulate(self.params, rays, k2,
                                          track_opl=True)
        opd, amp = pupil_from_trace(rays, out, aux['opl'], r_p,
                                    n=int(res))
        # working f-number from the traced image-side marginal slope
        w = np.asarray(out.intensity)
        dz_ = np.abs(np.asarray(out.dz))
        slope = (np.sqrt(np.asarray(out.dx) ** 2 + np.asarray(out.dy) ** 2)
                 / np.maximum(dz_, 1e-9))
        u_marg = float(np.max(np.where(w > 0, slope, 0.0)))
        if u_marg < 1e-9:
            raise ValueError("beam leaves collimated — nothing focuses")
        f_number = 1.0 / (2.0 * u_marg)
        lam_mm = float(wavelength) * 1e-3
        zs = np.linspace(-float(span), float(span), int(n_planes))
        stack, dxi = through_focus_psf(opd, amp, lam_mm, f_number,
                                       jnp.asarray(zs, jnp.float32),
                                       pad=int(pad))
        stack = np.asarray(stack)
        c = stack.shape[1] // 2
        carpet = stack[:, c, :].T            # [x, z]
        peaks = stack.max(axis=(1, 2))
        g = carpet / max(float(carpet.max()), 1e-24)
        g = np.sqrt(g)                       # gamma for visibility
        rgb = g[..., None] * np.ones(3)
        png = encode_rgb(rgb[::-1])
        return {'png': base64.b64encode(png).decode(),
                'z_peak': float(zs[int(np.argmax(peaks))]),
                'f_number': f_number, 'span': float(span),
                'peaks': [float(v) for v in peaks],
                'dx': float(dxi)}

    def phase_retrieval(self, res=32, n_planes=3, diversity_waves=1.5,
                        wavelength=0.5876, n_terms=15, steps=300,
                        noise=0.005, pupil_radius=None, pad=4):
        """Phase-diversity wavefront-sensing demo on the CURRENT system
        (utils/phase_retrieval.py): trace the pupil, render ``n_planes``
        noisy through-focus images, then recover the wavefront from the
        IMAGES alone and report retrieved vs directly-fitted Noll
        coefficients.  ``pupil_radius`` stops the beam down (cold-start
        retrieval converges below ~lambda/2 of aberration — fast wide-open
        systems need stopping down, and the panel says so via
        ``converged``); ``diversity_waves`` sets the end-plane defocus
        in waves via W020 = z / (8 F#^2)."""
        if not self.scene.bundles:
            raise ValueError("add a bundle (ray source) first")
        if not self.scene.sequential:
            raise ValueError("phase retrieval needs a sequential scene")
        from ..utils.phase_retrieval import phase_diversity
        from ..utils.propagation import through_focus_psf
        from ..utils.psf import pupil_from_trace
        from ..utils.wavefront import zernike_basis, zernike_name
        k1, k2 = jax.random.split(self.key)
        rays = self.scene.sample_rays(k1)
        r2_launch = np.asarray(rays.px) ** 2 + np.asarray(rays.py) ** 2
        r_full = float(np.sqrt(r2_launch.max()))
        if r_full < 1e-6:
            raise ValueError("bundle has no pupil extent — use a "
                             "collimated (disk) source")
        r_p = float(pupil_radius) if pupil_radius else r_full
        sel = jnp.asarray((r2_launch <= r_p * r_p).astype(np.float32))
        out, _, aux = self.scene.simulate(self.params, rays, k2,
                                          track_opl=True)
        w = np.asarray(out.intensity) * np.asarray(sel)
        if w.sum() <= 0:
            raise ValueError("no rays inside pupil_radius reach the end")
        # best focus of the SUB-pupil bundle: referencing a stopped-down
        # pupil to the full bundle's focus would inject waves of defocus
        # (an aberrated marginal focus is mm away from the paraxial one)
        mk = w > 0
        pos = np.asarray(out.pos)[mk]
        dirs = np.asarray(out.dir)[mk]
        proj = np.eye(3)[None] - dirs[:, :, None] * dirs[:, None, :]
        focus = np.linalg.solve(proj.sum(0),
                                np.einsum('nij,nj->ni', proj, pos).sum(0))
        opd, amp = pupil_from_trace(rays, out, aux['opl'], r_p,
                                    n=int(res), point=jnp.asarray(focus),
                                    weights=out.intensity * sel)
        dz_ = np.abs(np.asarray(out.dz))
        slope = (np.sqrt(np.asarray(out.dx) ** 2 + np.asarray(out.dy) ** 2)
                 / np.maximum(dz_, 1e-9))
        u_marg = float(np.max(np.where(w > 0, slope, 0.0)))
        if u_marg < 1e-9:
            raise ValueError("beam leaves collimated — nothing focuses")
        f_number = 1.0 / (2.0 * u_marg)
        lam_mm = float(wavelength) * 1e-3
        z_div = 8.0 * f_number ** 2 * lam_mm * float(diversity_waves)
        zs = np.linspace(-z_div, z_div, int(n_planes))
        clean, _ = through_focus_psf(opd, amp, lam_mm, f_number,
                                     jnp.asarray(zs, jnp.float32),
                                     pad=int(pad))
        images = clean
        if noise:
            rng = np.random.default_rng(0)
            images = jnp.asarray(
                np.asarray(clean) + float(noise)
                * float(np.asarray(clean).max())
                * rng.standard_normal(clean.shape).astype(np.float32))
        c_rec, loss_f, hist = phase_diversity(
            images, amp, lam_mm, f_number, zs, n_terms=int(n_terms),
            steps=int(steps), pad=int(pad))
        # convergence is judged against the CLEAN stack (the panel made
        # the measurement, so it can): the recovered model must explain
        # the noiseless images far better than the zero-aberration one —
        # unless the system is already so good there is nothing to fit.
        # (A loss-drop test on the NOISY stack misreads the noise floor
        # as failure for near-diffraction-limited systems.)
        def _norm(s):
            return np.asarray(s) / np.maximum(
                np.asarray(s).sum(axis=(1, 2), keepdims=True), 1e-24)
        from ..utils.phase_retrieval import zernike_pupil_basis
        Zp = zernike_pupil_basis(int(res), int(n_terms))
        rec_stack, _ = through_focus_psf(
            Zp @ c_rec, amp, lam_mm, f_number,
            jnp.asarray(zs, jnp.float32), pad=int(pad))
        zero_stack, _ = through_focus_psf(
            jnp.zeros_like(opd), amp, lam_mm, f_number,
            jnp.asarray(zs, jnp.float32), pad=int(pad))
        fit_err = float(((_norm(rec_stack) - _norm(clean)) ** 2).sum())
        base_err = float(((_norm(zero_stack) - _norm(clean)) ** 2).sum())
        converged = fit_err < max(0.1 * base_err, 1e-10)
        # direct fit of the traced pupil for comparison
        axp = (np.arange(int(res)) - (int(res) - 1) / 2.0) / (int(res) / 2.0)
        X, Y = np.meshgrid(axp, axp, indexing='xy')
        m = np.asarray(amp).ravel() > 0
        Z = np.asarray(zernike_basis(jnp.asarray(X.ravel()[m]),
                                     jnp.asarray(Y.ravel()[m]), 1.0,
                                     int(n_terms)))
        c_fit, *_ = np.linalg.lstsq(Z, np.asarray(opd).ravel()[m],
                                    rcond=None)
        rows = [{'j': j, 'name': zernike_name(j),
                 'retrieved': float(c_rec[j - 1]) / lam_mm,
                 'fitted': float(c_fit[j - 1]) / lam_mm}
                for j in range(4, int(n_terms) + 1)]
        err = np.abs(np.asarray(c_rec)[3:] - c_fit[3:]) / lam_mm
        stack = np.asarray(images)
        strip = np.concatenate(
            [s / max(float(s.max()), 1e-24) for s in stack], axis=1)
        rgb = np.sqrt(np.clip(strip, 0.0, 1.0))[..., None] * np.ones(3)
        png = encode_rgb(rgb[::-1])
        return {'png': base64.b64encode(png).decode(), 'rows': rows,
                'max_err_waves': float(err.max()),
                'f_number': f_number, 'pupil_radius': r_p,
                'zs': [float(z) for z in zs],
                'loss_drop': float(loss_f / max(float(hist[0]), 1e-24)),
                'fit_err': fit_err, 'base_err': base_err,
                'converged': bool(converged)}

    def image_sim(self, fields=(0.0, 0.05, 0.1), res=40, n_img=224,
                  wavelength=0.5876, crop=64, edge_deg=5.0):
        """Extended-scene image simulation: a slanted-edge + three-bar
        target blurred with the FIELD-VARYING PSF interpolation
        (utils/imaging.py::field_psf_grid + convolve_psf_varying — one
        batched trace builds per-field pupil maps aimed through the
        stop).  Returns object|image PNGs side by side, the traced
        f-number and image heights, and per-field MTF50 measured off
        the blurred edge (utils/mtf.py::slanted_edge_mtf)."""
        if not self.scene.sequential:
            raise ValueError("image simulation needs a sequential scene")
        from ..utils.imaging import (convolve_psf, convolve_psf_varying,
                                     field_psf_grid)
        from ..utils.mtf import mtf50, slanted_edge_mtf
        if self.scene.bundles:
            k1, _ = jax.random.split(self.key)
            rays = self.scene.sample_rays(k1)
            r_p = float(np.sqrt(np.asarray(rays.px) ** 2
                                + np.asarray(rays.py) ** 2).max())
        else:
            r_p = 0.0
        if r_p < 1e-6:
            raise ValueError("add a collimated (disk) bundle first — "
                             "its footprint sizes the pupil")
        fields = [float(f) for f in fields]
        grid = field_psf_grid(self.scene, self.params, fields,
                              aperture_radius=r_p,
                              wavelengths=[float(wavelength)],
                              n_grid=int(res), n_rays=12000,
                              key=self.key)
        dx = float(grid.dx)
        n = int(n_img)
        crop = min(int(crop), grid.psfs.shape[-1])
        psfs = grid.cropped(crop)

        ax = np.arange(n) - (n - 1) / 2.0
        a = np.deg2rad(float(edge_deg))
        s = ax[None, :] * np.cos(a) - ax[:, None] * np.sin(a)
        obj = (s > 0).astype(np.float32)
        for gi, pitch_px in enumerate((8, 5, 3)):
            y0 = int(n * (0.2 + 0.22 * gi))
            for k in range(3):
                lo = y0 + 2 * k * pitch_px
                obj[lo:lo + pitch_px, int(n * 0.1):int(n * 0.3)] = 1.0
        obj_j = jnp.asarray(obj)

        cy = np.abs(np.asarray(grid.centers)[:, 1])
        axm = (jnp.arange(n) - (n - 1) / 2.0) * dx
        mid = cy[len(cy) // 2]
        coord = jnp.sqrt((axm[None, :] + mid) ** 2 + axm[:, None] ** 2)
        img = np.asarray(convolve_psf_varying(obj_j, psfs,
                                              jnp.asarray(cy), coord))

        m50 = []
        ne = 160
        se = np.arange(ne) - (ne - 1) / 2.0
        edge = jnp.asarray((se[None, :] * np.cos(a)
                            - se[:, None] * np.sin(a)) > 0,
                           jnp.float32)
        for fi in range(len(fields)):
            em = convolve_psf(edge, psfs[fi])
            fm, mm = slanted_edge_mtf(em, dx, float(edge_deg))
            m50.append(float(mtf50(fm, mm)))

        def png_of(m):
            g = np.clip(m, 0.0, 1.0)
            return base64.b64encode(
                encode_rgb(g[::-1, :, None] * np.ones(3))).decode()

        return {'object_png': png_of(obj), 'image_png': png_of(img),
                'f_number': float(grid.f_number),
                'centers_y': [float(v) for v in
                              np.asarray(grid.centers)[:, 1]],
                'mtf50': m50, 'dx': dx, 'fields': fields,
                'res': n}

    def footprints(self, surface=None, max_points=1500):
        """Per-surface clearance table (utils/footprint.py) and,
        when ``surface`` names a row label, that surface's hit cloud
        (downsampled) for the canvas."""
        if not self.scene.bundles:
            raise ValueError("add a bundle (ray source) first")
        if not self.scene.sequential:
            raise ValueError("footprints needs a sequential scene")
        from ..utils.footprint import footprints as _fp
        k1, k2 = jax.random.split(self.key)
        rays = self.scene.sample_rays(k1)
        reps = _fp(self.scene, self.params, rays, k2)
        table = [{'label': r['label'], 'r_max': r['r_max'],
                  'semi_dia': r['semi_dia'], 'fill': r['fill'],
                  'n': r['n']} for r in reps]
        out = {'table': table}
        if surface is not None:
            for r in reps:
                if r['label'] == surface:
                    n = r['x'].shape[0]
                    step = max(1, n // int(max_points))
                    out['points'] = {
                        'label': r['label'],
                        'x': [float(v) for v in r['x'][::step]],
                        'y': [float(v) for v in r['y'][::step]],
                        'semi_dia': r['semi_dia']}
                    break
        return out

    def seidel(self, aperture=None, field=0.02):
        """Third-order aberration report of the current sequential scene
        (utils/seidel.py): per-surface S_I..S_V + C_I/C_II rows, totals,
        and the real-ray-calibrated image-plane conversions.  ``aperture``
        defaults to the first CircularAperture's radius, else the largest
        element semi-diameter."""
        if not self.scene.sequential:
            raise ValueError("Seidel analysis needs a sequential scene")
        if aperture is None:
            from ..elements.aperture import CircularAperture
            for el in self.scene.elements:
                if isinstance(el, CircularAperture):
                    aperture = float(np.asarray(
                        self.params[el.name]['radius']))
                    break
        if aperture is None:
            ds = [float(getattr(el, 'd', 0.0) or 0.0)
                  for el in self.scene.elements if not el.is_sensor]
            aperture = max(ds) / 2.0 if ds and max(ds) > 0 else 1.0
        rep = self.scene.seidel(self.params, aperture=float(aperture),
                                field=float(field))
        surfaces = [
            {'label': lab,
             **{k: float(np.asarray(getattr(rep, a))[i])
                for k, a in (('S_I', 's1'), ('S_II', 's2'), ('S_III', 's3'),
                             ('S_IV', 's4'), ('S_V', 's5'),
                             ('C_I', 'c1'), ('C_II', 'c2'))}}
            for i, lab in enumerate(rep.labels)]
        totals = {k: float(getattr(rep, k))
                  for k in ('S_I', 'S_II', 'S_III', 'S_IV', 'S_V',
                            'C_I', 'C_II')}
        derived = {k: float(getattr(rep, k)) for k in (
            'transverse_spherical', 'coma_tangential', 'astigmatism_ts',
            'field_curvature_sagittal', 'field_curvature_tangential',
            'petzval_curvature', 'distortion_transverse',
            'axial_color_longitudinal', 'lateral_color_transverse')}
        fo = self.scene.first_order(self.params, aperture=float(aperture),
                                    field=float(field))
        gaussian = {k: float(getattr(fo, k)) for k in (
            'efl', 'bfl', 'ffl', 'enp_z', 'enp_semi', 'exp_z', 'exp_semi',
            'fno', 'na_image')}
        return {'surfaces': surfaces, 'totals': totals, 'derived': derived,
                'wavefront': {k: float(v)
                              for k, v in rep.wavefront_coeffs.items()},
                'first_order': gaussian,
                'z_image': float(rep.z_image), 'H': float(rep.H),
                'aperture': float(aperture), 'field': float(field)}

    def fieldscan(self, max_field=0.05, n_fields=9, aperture=None):
        """Astigmatic field curves + distortion + vignetting across the
        field (utils/fieldscan.py) for the curves panel."""
        if not self.scene.sequential:
            raise ValueError("field scan needs a sequential scene")
        fields = jnp.linspace(1e-4, float(max_field), int(n_fields))
        fs = self.scene.field_scan(self.params, fields, aperture=aperture)
        return {'fields': _tolist(fs.fields),
                'field_t': _tolist(fs.field_t),
                'field_s': _tolist(fs.field_s),
                'distortion_pct': _tolist(fs.distortion_pct),
                'rel_illumination': _tolist(fs.rel_illumination),
                'z_image': float(fs.z_image)}

    def rayfan(self, field=0.0, aperture=None, n=33):
        """Tangential/sagittal transverse-aberration fans
        (utils/firstorder.py::ray_fan) for the fan panel."""
        if not self.scene.sequential:
            raise ValueError("ray fans need a sequential scene")
        fan = self.scene.ray_fan(self.params, field=float(field),
                                 aperture=aperture, n=int(n))
        return {'pupil': _tolist(fan.pupil),
                'ey_t': _tolist(fan.ey_t), 'ex_s': _tolist(fan.ex_s),
                'alive_t': _tolist(fan.alive_t),
                'alive_s': _tolist(fan.alive_s),
                'z_image': float(fan.z_image)}

    def ghosts(self, aperture=None, top=8):
        """Ranked two-reflection ghost table (utils/ghosts.py) for the
        stray-light panel: every pair traced in one vmapped batch."""
        if not self.scene.sequential:
            raise ValueError("ghost analysis needs a sequential scene")
        from ..utils.ghosts import ghost_report
        if aperture is None:
            from ..elements.aperture import CircularAperture
            for el in self.scene.elements:
                if isinstance(el, CircularAperture):
                    aperture = float(np.asarray(
                        self.params[el.name]['radius']))
                    break
        if aperture is None:
            ds = [float(getattr(el, 'd', 0.0) or 0.0)
                  for el in self.scene.elements if not el.is_sensor]
            aperture = max(ds) / 2.0 if ds and max(ds) > 0 else 1.0
        rep = ghost_report(self.scene, self.params, aperture=float(aperture))
        order = rep.ranked()[:int(top)]
        rows = [{'pair': list(rep.pairs[k]),
                 'flux': float(rep.flux[k]),
                 'z_focus': float(rep.z_focus[k]),
                 'r_det': float(rep.r_det[k]),
                 'rel_irr': float(rep.irradiance[k]
                                  / max(rep.primary_irradiance, 1e-30))}
                for k in order]
        return {'ghosts': rows, 'n_pairs': len(rep.pairs),
                'primary_flux': rep.primary_flux,
                'primary_r_det': rep.primary_r_det,
                'z_det': rep.z_det, 'aperture': float(aperture)}

    def optimize(self, loss_kind='spot_size', steps=50, lr=1e-3,
                 f_target=None):
        scene = self.scene
        k1, k2 = jax.random.split(self.key)
        if loss_kind == 'focal_length':
            if not scene.sequential:
                raise ValueError("focal-length loss needs a sequential scene")
            if not f_target:
                raise ValueError("set f_target for the focal-length loss")

            def loss(p):
                return focal_length_loss(scene, p, float(f_target))
        else:
            if not scene.bundles:
                raise ValueError("add a bundle (ray source) first")
            rays = scene.sample_rays(k1)

            kw_sim = self._sim_kwargs()

            def loss(p):
                _, sensors, _ = scene.simulate(p, rays, k2, **kw_sim)
                return spot_size_loss(sensors)

        new_params, losses = fit(loss, self.params,
                                 trainable=scene.trainable(),
                                 steps=int(steps), lr=float(lr))
        self.params = new_params
        return {'losses': _tolist(losses),
                'final_loss': float(np.asarray(losses)[-1])}

    # -- pick ------------------------------------------------------------------

    def pick(self, px, py):
        """Single-ray pick at a pixel -> element index (reference
        gui/viewport.py:130-190)."""
        from ..rays.ray import Rays
        c = self.camera
        sy = float(np.tan(np.deg2rad(c.fov_deg * 0.5)))
        sx = sy * self.width / self.height
        u = (2.0 * (px + 0.5) / self.width - 1.0) * sx
        v = (1.0 - 2.0 * (py + 0.5) / self.height) * sy
        d = (u * np.asarray(c.right) + v * np.asarray(c.up_cam)
             + np.asarray(c.forward))
        rays = Rays.create(np.asarray(c.origin)[None], d[None])
        res = self.scene.ray_cast(self.params, rays)
        if not bool(np.asarray(res['hit'])[0]):
            return {'element': None}
        el = int(np.asarray(res['element'])[0])
        return {'element': el, 'name': self.scene.elements[el].name,
                'surface': int(np.asarray(res['surf_in_element'])[0])}

    # -- gizmo -----------------------------------------------------------------

    def gizmo(self, index, px_delta, mode='trans'):
        """Screen-space pose gizmo (reference gui/gizmo.py:282-336, which
        writes straight into the picked element's transform params).

        ``px_delta`` = (dx, dy) in viewport pixels.  trans mode drags the
        element in the camera plane (right/up basis, scaled to world units
        at the orbit pivot's depth); rot mode maps dx/dy to rotations about
        the camera's up/right axes.  Edits go into the live param pytree
        (like the optimizer's) AND the element's captured ctor config, so
        forms and project saves stay in sync."""
        el = self.scene.elements[int(index)]
        p = self.params[el.name]
        c = self.camera
        dx, dy = float(px_delta[0]), float(px_delta[1])
        if mode == 'trans':
            dist = float(np.linalg.norm(np.asarray(c.pivot)
                                        - np.asarray(c.origin)))
            wpp = 2.0 * np.tan(np.deg2rad(c.fov_deg * 0.5)) * \
                max(dist, 1e-3) / self.height
            delta = (dx * wpp * np.asarray(c.right)
                     - dy * wpp * np.asarray(c.up_cam))
            p['trans'] = p['trans'] + jnp.asarray(delta, p['trans'].dtype)
        else:
            k = 0.008        # radians per pixel
            dvec = (dx * k * np.asarray(c.up_cam)
                    + dy * k * np.asarray(c.right))
            p['rot_vec'] = p['rot_vec'] + jnp.asarray(dvec,
                                                      p['rot_vec'].dtype)
        # keep the spec + captured ctor config consistent with the live pose
        el._trans_init = [float(x) for x in np.asarray(p['trans'])]
        el._rot_init = [float(x) for x in np.asarray(p['rot_vec'])]
        cc = getattr(el, '_ctor_config', None)
        if cc is not None:
            cc['translation'] = list(el._trans_init)
            cc['rotation'] = list(el._rot_init)
        return {'trans': _tolist(p['trans']), 'rot': _tolist(p['rot_vec'])}

    # -- introspection -----------------------------------------------------------

    def state(self):
        els = []
        for i, el in enumerate(self.scene.elements):
            try:
                cfg = cfgmod.element_config(el)
            except ValueError:
                cfg = {'name': el.name, 'class': type(el).__name__,
                       'params': {}}
            cur = {k: _tolist(v) for k, v in self.params[el.name].items()}
            els.append({'index': i, 'config': cfg, 'current': cur,
                        'is_sensor': bool(el.is_sensor)})
        bundles = []
        for i, (b, n) in enumerate(self.scene.bundles):
            bundles.append({'index': i, 'n_rays': int(n),
                            'config': cfgmod.bundle_config(b)})
        return {'elements': els, 'bundles': bundles,
                'settings': {'n_bounces': self.scene.n_bounces,
                             'sequential': self.scene.sequential},
                'viewport': {'width': self.width, 'height': self.height}}


def registry():
    """Constructor forms: {class: [{name, default, kind}]} for every
    registered element and bundle (the reference's FormBuilder
    introspection, gui/forms.py:35-437)."""
    from ..elements.base import Element
    from ..rays import sources

    def _ctor_params(cls):
        """Named ctor params of cls, following **kw up the MRO so
        base-class options (e.g. _MirrorBase's metal/coating) surface in
        subclass forms."""
        merged = {}
        for c in cls.__mro__:
            init = c.__dict__.get('__init__')
            if init is None:
                continue
            try:
                sig = inspect.signature(init)
            except (TypeError, ValueError):
                break
            has_var_kw = any(p.kind is inspect.Parameter.VAR_KEYWORD
                             for p in sig.parameters.values())
            for pname, p in sig.parameters.items():
                if pname not in merged:
                    merged[pname] = p
            if not has_var_kw:
                break
        return merged

    _TERM_FIELDS = {             # structured list editors for surface
        'xy1': ['i', 'j', 'c'],  # term lists: freeform XY monomials,
        'xy2': ['i', 'j', 'c'],  # Zernike (Noll j, coeff) pairs, even-
        'z1': ['j', 'coeff'],    # asphere coefficient lists.  Reuses the
        'z2': ['j', 'coeff'],    # variable-row 'pairs' widget; 1-label
        'a1': ['a'], 'a2': ['a'],  # lists flatten client-side (app.js)
    }

    def element_fields(cls):
        out = []
        for pname, p in _ctor_params(cls).items():
            if pname in ('self', 'kw', 'kwargs', 'args'):
                continue
            if p.kind in (inspect.Parameter.VAR_KEYWORD,
                          inspect.Parameter.VAR_POSITIONAL):
                continue
            default = None if p.default is inspect.Parameter.empty \
                else p.default
            if pname == 'coating' or pname.startswith('sellmeier'):
                # structured list-of-pairs editor (coating stacks) /
                # 6-coefficient rows; closes the round-2 'raw coating
                # field' gap (reference FormBuilder nested groupboxes,
                # gui/forms.py:219-437)
                # coating rows are (n, k, d_um) — k = 0 for dielectric
                # layers (parse_coating_entries); legacy (n, d) configs
                # are widened client-side
                kind = 'pairs' if pname == 'coating' else 'numlist'
                out.append({'name': pname, 'default': None, 'kind': kind,
                            'labels': (['n', 'k', 'd_um']
                                       if pname == 'coating'
                                       else ['B1', 'B2', 'B3',
                                             'C1', 'C2', 'C3']),
                            'required': False})
                continue
            if pname in _TERM_FIELDS:
                out.append({'name': pname, 'default': None, 'kind': 'pairs',
                            'labels': _TERM_FIELDS[pname],
                            'required': False})
                continue
            if pname == 'metal':
                from ..utils.coatings import METALS
                out.append({'name': pname, 'default': '', 'kind': 'select',
                            'options': [''] + sorted(METALS),
                            'required': False})
                continue
            kind = ('bool' if isinstance(default, bool)
                    else 'vec3' if isinstance(default, (list, tuple))
                    or pname in ('translation', 'rotation')
                    else 'str' if isinstance(default, str)
                    else 'number')
            out.append({'name': pname, 'default': cfgmod._jsonable(default),
                        'kind': kind,
                        'required': p.default is inspect.Parameter.empty})
        for extra in ('translation', 'rotation'):
            if not any(f['name'] == extra for f in out):
                out.append({'name': extra, 'default': [0.0, 0.0, 0.0],
                            'kind': 'vec3', 'required': False})
        return out

    import dataclasses as dc

    def _emission_choices():
        """Polymorphic nested-class options: every non-Bundle dataclass in
        rays.sources with a sample_dir (the EmissionModel strategy family,
        reference rays/panels.py:10-61) -> its own numeric sub-fields."""
        choices = {}
        for nm in dir(sources):
            c = getattr(sources, nm)
            if (isinstance(c, type) and dc.is_dataclass(c)
                    and not issubclass(c, sources.Bundle)
                    and hasattr(c, 'sample_dir')):
                subs = []
                for f in dc.fields(c):
                    d = (f.default if f.default is not dc.MISSING
                         else f.default_factory()
                         if f.default_factory is not dc.MISSING
                         else None)
                    subs.append({'name': f.name,
                                 'default': cfgmod._jsonable(d),
                                 'kind': 'number'})
                choices[nm] = subs
        return choices

    def bundle_fields(cls):
        out = [{'name': 'translation', 'default': [0.0, 0.0, 0.0],
                'kind': 'vec3', 'required': False},
               {'name': 'rotation', 'default': [0.0, 0.0, 0.0],
                'kind': 'vec3', 'required': False},
               {'name': 'ray_id', 'default': 0, 'kind': 'number',
                'required': False}]
        skip = set(getattr(cls, '_derived_fields', ())) | {'frame', 'ray_id'}
        for f in dc.fields(cls):
            if f.name in skip:
                continue
            if f.default is not dc.MISSING:
                d = f.default
            elif f.default_factory is not dc.MISSING:  # type: ignore
                d = f.default_factory()                # type: ignore
            else:
                d = None
            if dc.is_dataclass(d) and not isinstance(d, type):
                # nested polymorphic sub-form: subclass dropdown + inline
                # fields (closes round-2 Missing #1; reference
                # gui/forms.py:219-437 recursive groupboxes)
                out.append({'name': f.name, 'kind': 'nested',
                            'default': cfgmod._pytree_config(d),
                            'choices': _emission_choices(),
                            'required': False})
                continue
            d = cfgmod._jsonable(d)
            if isinstance(d, dict):
                continue
            kind = ('vec3' if isinstance(d, (list, tuple)) else 'number')
            out.append({'name': f.name, 'default': d, 'kind': kind,
                        'required': d is None})
        return out

    els = {c.__name__: element_fields(c)
           for c in sorted(cfgmod.get_subclasses(Element),
                           key=lambda c: c.__name__)
           if not c.__name__.startswith('_')}
    bds = {c.__name__: bundle_fields(c)
           for c in sorted(cfgmod.get_subclasses(sources.Bundle),
                           key=lambda c: c.__name__)
           if not c.__name__.startswith('_')}
    return {'elements': els, 'bundles': bds}


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------

def make_handler(wb: Workbench):
    from .app import INDEX_HTML

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):        # quiet
            pass

        def _send(self, code, body, ctype='application/json'):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj, code=200):
            self._send(code, json.dumps(obj).encode())

        def do_GET(self):
            try:
                if self.path in ('/', '/index.html'):
                    self._send(200, INDEX_HTML.encode(),
                               'text/html; charset=utf-8')
                elif self.path == '/api/state':
                    with wb.lock:
                        self._json(wb.state())
                elif self.path == '/api/registry':
                    self._json(registry())
                elif self.path == '/api/render':
                    with wb.lock:
                        png = wb.render_png()
                    self._send(200, png, 'image/png')
                else:
                    self._json({'error': 'not found'}, 404)
            except Exception as e:            # pragma: no cover
                traceback.print_exc()
                self._json({'error': str(e)}, 500)

        def do_POST(self):
            try:
                length = int(self.headers.get('Content-Length', 0))
                body = json.loads(self.rfile.read(length) or b'{}')
                with wb.lock:
                    out = self._route(body)
                self._json(out if out is not None else {'ok': True})
            except Exception as e:
                traceback.print_exc()
                self._json({'error': str(e)}, 500)

        def _route(self, body):
            p = self.path
            if p == '/api/camera':
                c = wb.camera
                if body.get('reset'):
                    wb.reset_camera()
                if 'orbit' in body:
                    c.orbit(float(body['orbit'][0]), float(body['orbit'][1]))
                if 'pan' in body:
                    c.pan(float(body['pan'][0]), float(body['pan'][1]))
                if 'zoom' in body:
                    c.zoom(float(body['zoom']))
                return {'ok': True}
            if p == '/api/render':
                png = wb.render_png()
                return {'png': base64.b64encode(png).decode()}
            if p == '/api/trace':
                return wb.trace()
            if p == '/api/pick':
                return wb.pick(float(body['x']), float(body['y']))
            if p == '/api/irradiance':
                return wb.irradiance(
                    sensor=int(body.get('sensor', 0)),
                    res=int(body.get('res', 128)),
                    half_extent=body.get('half_extent'),
                    log=bool(body.get('log', True)))
            if p == '/api/footprints':
                return wb.footprints(surface=body.get('surface'))
            if p == '/api/interferogram':
                return wb.interferogram(
                    tilt=float(body.get('tilt', 4.0)),
                    res=int(body.get('res', 96)),
                    defocus=float(body.get('defocus', 0.0)),
                    wavelength=float(body.get('wavelength', 0.5876)))
            if p == '/api/through_focus':
                return wb.through_focus(
                    span=float(body.get('span', 0.5)),
                    n_planes=int(body.get('n_planes', 33)),
                    res=int(body.get('res', 48)),
                    wavelength=float(body.get('wavelength', 0.5876)))
            if p == '/api/phase_retrieval':
                kw = {k: body[k] for k in
                      ('res', 'n_planes', 'diversity_waves', 'wavelength',
                       'n_terms', 'steps', 'noise', 'pupil_radius')
                      if body.get(k) is not None}
                return wb.phase_retrieval(**kw)
            if p == '/api/image_sim':
                return wb.image_sim(
                    fields=body.get('fields', (0.0, 0.05, 0.1)),
                    res=int(body.get('res', 40)),
                    n_img=int(body.get('n_img', 224)),
                    wavelength=float(body.get('wavelength', 0.5876)))
            if p == '/api/seidel':
                return wb.seidel(aperture=body.get('aperture'),
                                 field=float(body.get('field', 0.02)))
            if p == '/api/fieldscan':
                return wb.fieldscan(
                    max_field=float(body.get('max_field', 0.05)),
                    n_fields=int(body.get('n_fields', 9)),
                    aperture=body.get('aperture'))
            if p == '/api/ghosts':
                return self._json(wb.ghosts(**body))
            if p == '/api/rayfan':
                return wb.rayfan(field=float(body.get('field', 0.0)),
                                 aperture=body.get('aperture'),
                                 n=int(body.get('n', 33)))
            if p == '/api/gizmo':
                if body.get('begin'):     # one undo entry per drag gesture
                    wb.push_undo()
                return wb.gizmo(body['index'], body['delta'],
                                body.get('mode', 'trans'))
            if p == '/api/undo':
                return wb.undo()
            if p == '/api/redo':
                return wb.redo()
            if p == '/api/optimize':
                wb.push_undo()
                return wb.optimize(body.get('loss', 'spot_size'),
                                   body.get('steps', 50),
                                   body.get('lr', 1e-3),
                                   body.get('f_target'))
            if p == '/api/element/add':
                wb.push_undo()
                el = cfgmod.instantiate_element(body['config'])
                wb.scene.add_element(el)
                wb._reinit_params()
                return {'ok': True}
            if p == '/api/element/update':
                wb.push_undo()
                i = int(body['index'])
                el = cfgmod.instantiate_element(body['config'])
                old = wb.scene.elements[i]
                if el.name != old.name and el.name in [
                        e.name for e in wb.scene.elements]:
                    raise ValueError(f"duplicate element name {el.name!r}")
                wb.scene.elements[i] = el
                wb.scene._static_meta = None
                wb._reinit_params()
                return {'ok': True}
            if p == '/api/element/delete':
                wb.push_undo()
                del wb.scene.elements[int(body['index'])]
                wb.scene._static_meta = None
                wb._reinit_params()
                return {'ok': True}
            if p == '/api/bundle/add':
                wb.push_undo()
                b = cfgmod.instantiate_bundle(body['config'])
                wb.scene.add_bundle(b, int(body.get('n_rays', 200)))
                return {'ok': True}
            if p == '/api/bundle/update':
                wb.push_undo()
                i = int(body['index'])
                b = cfgmod.instantiate_bundle(body['config'])
                wb.scene.bundles[i] = (b, int(body.get('n_rays', 200)))
                return {'ok': True}
            if p == '/api/bundle/delete':
                wb.push_undo()
                del wb.scene.bundles[int(body['index'])]
                return {'ok': True}
            if p == '/api/settings':
                wb.push_undo()
                if 'n_bounces' in body:
                    wb.scene.n_bounces = int(body['n_bounces'])
                if 'sequential' in body:
                    cls = (SequentialScene if body['sequential'] else Scene)
                    new = cls(wb.scene.elements,
                              n_bounces=wb.scene.n_bounces)
                    new.bundles = wb.scene.bundles
                    wb.scene = new
                    wb._render_cache = None
                return {'ok': True}
            if p == '/api/save':
                projmod.save_project(body['path'], wb.scene)
                projmod.save_params(body['path'] + '.params.npz', wb.params)
                return {'ok': True, 'path': body['path']}
            if p == '/api/load':
                wb.push_undo()
                scene = projmod.load_scene(body['path'])
                wb.set_scene(scene)
                import os
                ppath = body['path'] + '.params.npz'
                if os.path.exists(ppath):
                    wb.params = projmod.load_params(ppath)
                return {'ok': True}
            if p == '/api/import_zmx':
                from ..utils.zemax import load_zmx
                wb.push_undo()
                imp = load_zmx(body.get('text') or body['path'])
                sc = imp.scene
                if imp.enpd:          # tracing bundle sized to the pupil
                    from ..rays.sources import CollimatedDisk
                    z0 = min(float(np.asarray(e._trans_init)[2])
                             for e in sc.elements) - 10.0
                    sc.add_bundle(CollimatedDisk.make(
                        radius=jnp.float32(imp.enpd / 2.0),
                        translation=[0.0, 0.0, z0]), 400)
                wb.set_scene(sc)
                return {'ok': True, 'n_elements': len(sc.elements),
                        'name': imp.name,
                        'wavelengths_um': imp.wavelengths_um,
                        'enpd': imp.enpd}
            if p == '/api/export_zmx':
                from ..utils.zemax import save_zmx
                text = save_zmx(wb.scene, wb.params,
                                path=body.get('path'))
                return {'ok': True, 'text': text}
            raise ValueError(f'unknown endpoint {p}')

    return Handler


def serve(scene=None, port=8000, host='127.0.0.1'):
    """Start the workbench server (blocking).  Returns never; for embedded
    use build ``Workbench`` + ``make_handler`` directly (see tests)."""
    try:      # persistent jit cache: interactive edits recompile warm
        jax.config.update('jax_compilation_cache_dir', '/tmp/rtt_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:
        pass
    wb = Workbench(scene)
    httpd = ThreadingHTTPServer((host, port), make_handler(wb))
    print(f'raytracetorch_tpu workbench: http://{host}:{port}/')
    httpd.serve_forever()


def run(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description='raytracetorch_tpu workbench')
    ap.add_argument('project', nargs='?', help='.rtt project file to open')
    ap.add_argument('--port', type=int, default=8000)
    ap.add_argument('--host', default='127.0.0.1')
    ap.add_argument('--cpu', action='store_true',
                    help='run on the CPU backend (e.g. while the TPU is '
                         'claimed by a batch job; must be set before any '
                         'device touch)')
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    scene = projmod.load_scene(args.project) if args.project else None
    serve(scene, port=args.port, host=args.host)
