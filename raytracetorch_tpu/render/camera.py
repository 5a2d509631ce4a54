"""Visualization: pinhole camera, orbit controls, single-bounce renderer,
profile scanner (reference ``render/camera.py``).

The renderer is one jitted program: all-surface nearest hit (apertures
excluded from the occlusion table, reference render/camera.py:203-211),
normals for the winners, physics-kind coloring with the reference's
IOR colormap (white->cyan->blue->navy->purple, :276-299), two-sided Lambert
shading 0.3 + 0.7|n.l| (:303-318).  No per-(element,surface) Python loops —
the winner gather + branchless color select replaces them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BIG, PhysKind
from ..core.intersect import intersect, normal_world
from ..rays.ray import Rays

# Reference base colors (render/camera.py:270-301).  Plain numpy on
# purpose: a module-scope jnp.array would initialize the DEFAULT backend
# (axon/TPU in this container) at import time, before entry points like
# ``python -m raytracetorch_tpu.gui --cpu`` get a chance to select the
# CPU platform — every jitted consumer converts these at trace time.
_COLOR_REFLECT = np.array([1.0, 0.6, 0.0], np.float32)
_COLOR_BLOCK = np.array([0.2, 0.2, 0.2], np.float32)
_COLOR_TRANSMIT = np.array([0.0, 0.8, 0.2], np.float32)
_COLOR_OTHER = np.array([1.0, 0.0, 1.0], np.float32)

# IOR colormap breakpoints (render/camera.py:282-298)
_IOR_STOPS = np.array([1.0, 1.3, 1.4, 1.7, 2.0], np.float32)
_IOR_COLORS = np.array([
    [0.9, 0.9, 0.9],   # white
    [0.0, 1.0, 1.0],   # cyan
    [0.3, 0.6, 1.0],   # blue
    [0.0, 0.0, 0.5],   # navy
    [0.3, 0.0, 0.3],   # purple
], np.float32)


class Camera:
    """Pinhole camera (reference render/camera.py:16-72)."""

    def __init__(self, position, look_at, up_vector=(0.0, 1.0, 0.0),
                 fov_deg=45.0, width=640, height=480):
        self.width, self.height = int(width), int(height)
        self.fov_deg = float(fov_deg)
        self.origin = jnp.asarray(position, jnp.float32)
        self._aim(jnp.asarray(look_at, jnp.float32),
                  jnp.asarray(up_vector, jnp.float32))

    def _aim(self, target, up):
        fwd = target - self.origin
        self.forward = fwd / jnp.linalg.norm(fwd)
        right = jnp.cross(self.forward, up)
        self.right = right / jnp.linalg.norm(right)
        self.up_cam = jnp.cross(self.right, self.forward)

    def generate_rays(self) -> Rays:
        """One ray per pixel, row-major (reference render/camera.py:39-72)."""
        aspect = self.width / self.height
        scale_y = jnp.tan(jnp.deg2rad(jnp.float32(self.fov_deg * 0.5)))
        scale_x = scale_y * aspect
        y = jnp.linspace(scale_y, -scale_y, self.height)
        x = jnp.linspace(-scale_x, scale_x, self.width)
        yy, xx = jnp.meshgrid(y, x, indexing='ij')
        dirs = (xx.reshape(-1, 1) * self.right
                + yy.reshape(-1, 1) * self.up_cam + self.forward)
        origins = jnp.broadcast_to(self.origin, dirs.shape)
        return Rays.create(origins, dirs)


class OrbitCamera(Camera):
    """Turntable orbit / roll / pan / zoom with gimbal-lock fallback
    (reference render/camera.py:75-169)."""

    def __init__(self, pivot=(0.0, 0.0, 0.0), **kw):
        self.pivot = jnp.asarray(pivot, jnp.float32)
        super().__init__(**kw)
        self.update_view_matrix()

    def update_view_matrix(self):
        direction = self.pivot - self.origin
        dist = jnp.linalg.norm(direction)
        if float(dist) < 1e-3:
            return
        self.forward = direction / dist
        world_up = jnp.array([0.0, 1.0, 0.0])
        right = jnp.cross(self.forward, world_up)
        if float(jnp.linalg.norm(right)) < 1e-3:
            right = jnp.array([1.0, 0.0, 0.0])
        self.right = right / jnp.linalg.norm(right)
        up = jnp.cross(self.right, self.forward)
        self.up_cam = up / jnp.linalg.norm(up)

    @staticmethod
    def _rotate(vec, axis, angle):
        c, s = jnp.cos(angle), jnp.sin(angle)
        return (vec * c + jnp.cross(axis, vec) * s
                + axis * jnp.dot(axis, vec) * (1 - c))

    def orbit(self, d_yaw, d_pitch):
        radius = self.origin - self.pivot
        world_up = jnp.array([0.0, 1.0, 0.0])
        radius = self._rotate(radius, world_up, -jnp.float32(d_yaw))
        rhat = radius / jnp.linalg.norm(radius)
        if abs(float(jnp.dot(rhat, world_up))) > 0.95:
            axis = jnp.array([1.0, 0.0, 0.0])
        else:
            axis = jnp.cross(rhat, world_up)
            axis = axis / jnp.linalg.norm(axis)
        radius = self._rotate(radius, axis, jnp.float32(d_pitch))
        self.origin = self.pivot + radius
        self.update_view_matrix()

    def roll(self, angle):
        c, s = jnp.cos(jnp.float32(angle)), jnp.sin(jnp.float32(angle))
        right = c * self.right - s * self.up_cam
        self.up_cam = s * self.right + c * self.up_cam
        self.right = right

    def pan(self, dx, dy):
        move = self.right * -dx + self.up_cam * dy
        self.origin = self.origin + move
        self.pivot = self.pivot + move

    def zoom(self, delta):
        radius = self.origin - self.pivot
        scale = 1.0 - delta * 0.1
        if float(jnp.linalg.norm(radius)) * scale < 0.1:
            scale = 1.0
        self.origin = self.pivot + radius * scale


def ior_color(ior):
    """Piecewise-linear IOR colormap (reference render/camera.py:282-298)."""
    ior = jnp.clip(ior, _IOR_STOPS[0], _IOR_STOPS[-1])
    return jnp.stack([jnp.interp(ior, _IOR_STOPS, _IOR_COLORS[:, c])
                      for c in range(3)], axis=-1)


class Renderer:
    """Single-bounce shaded renderer over the compiled scene table
    (reference render/camera.py:172-318)."""

    def __init__(self, scene, background_color=(1.0, 1.0, 1.0),
                 light_dir=(-0.5, 1.0, -1.0)):
        self.scene = scene
        self.bg = jnp.asarray(background_color, jnp.float32)
        ld = jnp.asarray(light_dir, jnp.float32)
        self.light = ld / jnp.linalg.norm(ld)
        # Static per-element aperture exclusion (render/camera.py:203-211)
        self._renderable = [not el.is_aperture for el in scene.elements]

    def _render_mask_list(self):
        mask = []
        for el, keep in zip(self.scene.elements, self._renderable):
            mask.extend([keep] * el.n_surfaces)
        return mask

    def jit_render(self, camera: Camera):
        """A jitted render function closed over the (static) camera:
        ``f(params) -> [H, W, 3]``."""
        return jax.jit(lambda params: self.render_3d(params, camera))

    def render_3d(self, params, camera: Camera):
        """-> [H, W, 3] float image in [0, 1].  ``camera`` is static Python
        state — jit via :meth:`jit_render` or a closure."""
        rays = camera.generate_rays()
        table = self.scene.build_table(params)
        renderable = self._render_mask_list()
        static_meta = self.scene.static_meta()
        pos, direction = rays.pos_c, rays.dir_c
        light = self.light

        # Nearest hit + per-row masked shading, statically unrolled like the
        # trace drivers (a dense [N, K] pass loses the planar layout).
        ts = []
        for k in range(table.n_surfaces):
            if not renderable[k]:
                ts.append(jnp.full_like(pos[0], BIG))
                continue
            row = table.row(k)
            res = intersect(row, pos, direction, static_meta=static_meta[k])
            ts.append(jnp.where(res['valid'], res['t'], BIG))
        t_all = jnp.stack(ts)                        # [K, N]
        win = jnp.argmin(t_all, axis=0)
        hit = jnp.min(t_all, axis=0) < BIG * 0.5

        r = jnp.where(hit, self.bg[0], self.bg[0])
        g = jnp.where(hit, self.bg[1], self.bg[1])
        b = jnp.where(hit, self.bg[2], self.bg[2])
        for k in range(table.n_surfaces):
            if not renderable[k]:
                continue
            row = table.row(k)
            meta = static_meta[k]
            res = intersect(row, pos, direction, static_meta=meta)
            mask = hit & (win == k) & res['valid']
            n = normal_world(row, res['hit_s'], meta)
            # per-row base color is a compile-time choice
            if meta.ph == PhysKind.REFLECT:
                base = _COLOR_REFLECT
            elif meta.ph == PhysKind.BLOCK:
                base = _COLOR_BLOCK
            elif meta.ph in (PhysKind.TRANSMIT, PhysKind.LINEAR):
                base = _COLOR_TRANSMIT
            elif meta.ph in (PhysKind.SNELL, PhysKind.FRESNEL):
                base = ior_color(jnp.maximum(row.ph[0], row.ph[1]))
            else:
                base = _COLOR_OTHER
            diffuse = jnp.abs(n[0] * light[0] + n[1] * light[1]
                              + n[2] * light[2])
            shading = 0.3 + 0.7 * diffuse
            r = jnp.where(mask, base[0] * shading, r)
            g = jnp.where(mask, base[1] * shading, g)
            b = jnp.where(mask, base[2] * shading, b)

        img = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)
        return img.reshape(camera.height, camera.width, 3)

    def scan_profile(self, params, element_index, axis='x', num_points=200,
                     bounds=(-11.0, 11.0), z_start=-100.0):
        """2D cross-section polylines of one element: fire a row of +Z rays
        and collect per-surface hit distances (reference
        render/camera.py:320-361).  Returns (coords [P], t [P, K], valid
        [P, K]) restricted to the element's surface rows."""
        table = self.scene.build_table(params)
        el = self.scene.elements[element_index]
        start = sum(e.n_surfaces for e in self.scene.elements[:element_index])
        rows = jax.tree_util.tree_map(
            lambda a: a[start:start + el.n_surfaces], table)

        coords = jnp.linspace(bounds[0], bounds[1], num_points)
        zeros = jnp.zeros_like(coords)
        zs = jnp.full_like(coords, z_start)
        if axis == 'x':
            origin = (coords[:, None], zeros[:, None], zs[:, None])
        else:
            origin = (zeros[:, None], coords[:, None], zs[:, None])
        ones = jnp.ones_like(coords)[:, None]
        zero = jnp.zeros_like(coords)[:, None]
        res = intersect(rows, origin, (zero, zero, ones))
        return coords, z_start + res['t'], res['valid']
