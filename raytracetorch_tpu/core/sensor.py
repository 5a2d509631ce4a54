"""Sensor state: streaming moment accumulators + optional irradiance grids.

TPU-native re-design of the reference ``Sensor`` (``elements/sensor.py:9``),
which appends per-step Python lists of hit tensors — a dynamic-shape pattern
that cannot live inside jit.  Instead we accumulate sufficient statistics
in O(1) memory during the trace:

  moments[s, b] = [sum_w, sum_wx, sum_wy, sum_wx2, sum_wy2, sum_wxy, n_hits]

per sensor surface ``s`` and bundle id ``b``.  Centroids, RMS spot radii and
per-axis second moments — everything ``getHitsTensors`` /
``getSpotSizeID_xy`` / ``getSpotSizeParallel_xy`` (sensor.py:46-176) derive —
fall out of these in closed form, and the scatter-adds reduce cleanly with
``psum`` across a sharded ray axis.

An optional irradiance grid (the idiomatic equivalent of the GUI spot diagram,
cf. SURVEY.md §2.10 note) bins intensity-weighted hits into a fixed [H, W]
image per sensor.  Binning is NOT a scatter-add: TPUs serialize scatters
(the round-2 profile showed the scatter dominating grid traces 596.9 ms /
16M rays), so ``_bin_grid`` recasts the histogram as one-hot MXU matmuls
over ray tiles — the same trick the fused Pallas kernels use in VMEM
(ops/pallas_trace.py::_grid_partial), here as a lax.scan the XLA scheduler
pipelines.  A custom_vjp keeps gradients EXACT: the transpose of binning
is a per-ray gather ``ct[iy, ix]`` (bin indices are integer floors, zero
derivative in position — identical cotangents to the scatter it replaces,
without the bf16 rounding a transposed bf16 dot would introduce).
float64 traces (jax.enable_x64 wavefront work) keep the exact scatter.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from flax import struct

N_MOMENTS = 7

_BIN_TILE = 8192        # rays per one-hot matmul tile ([H, 8192] x [8192, W])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _bin_grid(hw, half_extent, tile, x, y, w):
    """[H, W] weighted histogram of (x, y) hits via one-hot MXU matmuls.

    Forward: per ray tile, one-hot indicators A[H, L] (y bins) and
    B[W, L] (x bins); ``grid += A @ (w * B)^T``.  One-hots are exact in
    bf16 and the weight rides a hi+lo bf16 split (two matmuls, ~2^-16
    relative per ray) — the MXU does the histogram at bf16 rate with f32
    accumulation, matching the fused kernels' in-VMEM binning
    (ops/pallas_trace.py::_grid_partial).  Backward: an exact f32 gather
    (see module notes)."""
    return _bin_grid_impl(hw, half_extent, tile, x, y, w)


def _bin_indices(hw, half_extent, x, y):
    h, w_dim = hw
    e = half_extent
    ix = jnp.clip(((x + e) / (2 * e) * w_dim).astype(jnp.int32),
                  0, w_dim - 1)
    iy = jnp.clip(((y + e) / (2 * e) * h).astype(jnp.int32), 0, h - 1)
    return ix, iy


def _bin_grid_impl(hw, half_extent, tile, x, y, w):
    from jax import lax
    h, w_dim = hw
    n = x.shape[0]
    t = max(1, -(-n // tile))
    pad = t * tile - n
    if pad:
        x, y = jnp.pad(x, (0, pad)), jnp.pad(y, (0, pad))
        w = jnp.pad(w, (0, pad))        # zero weight: pad rays bin nothing
    xs = x.reshape(t, tile)
    ys = y.reshape(t, tile)
    ws = w.reshape(t, tile)
    contract = (((1,), (1,)), ((), ()))     # A [H,L] x B [W,L] -> [H,W]

    def body(acc, xyw):
        xr, yr, wr = xyw
        ix, iy = _bin_indices(hw, half_extent, xr, yr)
        eq_y = jax.lax.broadcasted_iota(jnp.int32, (h, tile), 0) == iy[None]
        eq_x = jax.lax.broadcasted_iota(jnp.int32, (w_dim, tile),
                                        0) == ix[None]
        a = jnp.where(eq_y, 1.0, 0.0).astype(jnp.bfloat16)
        b1 = jnp.where(eq_x, 1.0, 0.0).astype(jnp.bfloat16)
        w_hi = wr.astype(jnp.bfloat16)
        w_lo = (wr - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + lax.dot_general(a, b1 * w_hi[None], contract,
                                    preferred_element_type=jnp.float32)
        acc = acc + lax.dot_general(a, b1 * w_lo[None], contract,
                                    preferred_element_type=jnp.float32)
        return acc, None

    acc, _ = jax.lax.scan(body, jnp.zeros((h, w_dim), jnp.float32),
                          (xs, ys, ws))
    return acc


def _bin_grid_fwd(hw, half_extent, tile, x, y, w):
    return _bin_grid_impl(hw, half_extent, tile, x, y, w), (x, y)


def _bin_grid_bwd(hw, half_extent, tile, res, ct):
    x, y = res
    ix, iy = _bin_indices(hw, half_extent, x, y)
    return jnp.zeros_like(x), jnp.zeros_like(y), ct[iy, ix]


_bin_grid.defvjp(_bin_grid_fwd, _bin_grid_bwd)


@dataclasses.dataclass(frozen=True)
class SensorConfig:
    """Static sensor configuration for a scene trace."""

    n_sensors: int = 0
    n_bundles: int = 1
    grid_shape: tuple = ()          # (H, W) or () to disable the grid
    grid_half_extent: float = 1.0   # grid spans [-e, e]^2 in sensor-local xy


class SensorState(struct.PyTreeNode):
    moments: jnp.ndarray            # [S, B, 7]
    grid: jnp.ndarray               # [S, H, W] (or [S, 0, 0] when disabled)

    @classmethod
    def init(cls, cfg: SensorConfig, dtype=jnp.float32):
        s = max(cfg.n_sensors, 1)
        h, w = cfg.grid_shape if cfg.grid_shape else (0, 0)
        return cls(
            moments=jnp.zeros((s, cfg.n_bundles, N_MOMENTS), dtype),
            grid=jnp.zeros((s, h, w), dtype),
        )

    def record(self, cfg: SensorConfig, slot, ray_id, hit_local, weight,
               maybe_sensor=True, grid_cond=False):
        """Accumulate hits (weight already masked to zero for non-hits and
        non-sensor surfaces).  ``slot`` may be a scalar (sequential trace) or
        [N] (non-sequential winners).  ``hit_local`` is a component tuple.
        ``maybe_sensor=False`` (a STATIC hint from the specialized drivers)
        skips the grid work for rows known at compile time not to be
        sensors — the moment sums are cheap, the binning matmuls are not.

        For few bundles (the common case) the per-bundle reduction is a set
        of masked sums — dense, lane-packed, psum-friendly; large bundle
        counts fall back to scatter-add.  Grid binning is the one-hot MXU
        matmul path (module notes); float64 traces keep the exact
        scatter."""
        x, y = hit_local[0], hit_local[1]
        terms = (weight, weight * x, weight * y, weight * x * x,
                 weight * y * y, weight * x * y,
                 (weight > 0).astype(weight.dtype))

        if cfg.n_bundles <= 8 and jnp.ndim(slot) == 0:
            cols = []
            for b in range(cfg.n_bundles):
                wb = jnp.where(ray_id == b, 1.0, 0.0)
                cols.append(jnp.stack([jnp.sum(t * wb) for t in terms]))
            delta = jnp.stack(cols)                      # [B, 7]
            moments = self.moments.at[slot].add(delta)
        else:
            basis = jnp.stack(terms, axis=-1)
            slot_b = jnp.broadcast_to(slot, ray_id.shape)
            moments = self.moments.at[slot_b, ray_id].add(basis)

        grid = self.grid
        if cfg.grid_shape and maybe_sensor:
            h, w = cfg.grid_shape
            e = float(cfg.grid_half_extent)
            if weight.dtype == jnp.float32:
                if jnp.ndim(slot) == 0:
                    if grid_cond:
                        # non-sequential bounce loops: most bounces have
                        # no sensor crossing at all — skip the binning
                        # matmuls entirely then (the fused kernel's same
                        # guard measured 2.8x on ghost-analysis scenes)
                        grid = grid.at[slot].add(jax.lax.cond(
                            jnp.any(weight > 0),
                            lambda: _bin_grid((h, w), e, _BIN_TILE,
                                              x, y, weight),
                            lambda: jnp.zeros((h, w), jnp.float32)))
                    else:
                        grid = grid.at[slot].add(
                            _bin_grid((h, w), e, _BIN_TILE, x, y, weight))
                else:
                    # non-sequential [N]-slot winners: one masked binning
                    # pass per sensor slot (S is small and static)
                    parts = [_bin_grid((h, w), e, _BIN_TILE, x, y,
                                       jnp.where(slot == s, weight, 0.0))
                             for s in range(grid.shape[0])]
                    grid = grid + jnp.stack(parts)
            else:
                # float64 wavefront traces: keep the exact scatter
                ix, iy = _bin_indices((h, w), e, x, y)
                slot_b = jnp.broadcast_to(slot, ray_id.shape)
                grid = grid.at[slot_b, iy, ix].add(weight)
        return self.replace(moments=moments, grid=grid)

    # -- derived statistics (reference elements/sensor.py:67-176) ----------

    def total_weight(self, slot=0):
        return self.moments[slot, :, 0]

    def centroid(self, slot=0):
        """Intensity-weighted centroid per bundle: [B, 2]."""
        m = self.moments[slot]
        w = jnp.maximum(m[:, 0], 1e-12)
        return jnp.stack([m[:, 1] / w, m[:, 2] / w], axis=-1)

    def spot_rms(self, slot=0, target_xy=None):
        """Intensity-weighted RMS spot radius about the centroid (or fixed
        targets): [B].  Equals sqrt(Var_x + Var_y) — the quantity the
        reference's spot losses minimize (optim/goals.py:99-187,
        elements/sensor.py:87-176)."""
        m = self.moments[slot]
        w = jnp.maximum(m[:, 0], 1e-12)
        ex, ey = m[:, 1] / w, m[:, 2] / w
        ex2, ey2 = m[:, 3] / w, m[:, 4] / w
        if target_xy is None:
            var = (ex2 - ex * ex) + (ey2 - ey * ey)
        else:
            tx, ty = target_xy[..., 0], target_xy[..., 1]
            var = (ex2 - 2 * tx * ex + tx * tx) + (ey2 - 2 * ty * ey + ty * ty)
        return jnp.sqrt(jnp.maximum(var, 1e-24))

    def spot_moment(self, slot=0, target_xy=None):
        """Per-axis second moment about centroid/target, averaged over x and y
        — matches ``getSpotSizeParallel_xy``'s final reduction
        (elements/sensor.py:168): sum_w(dx^2+dy^2) / (2 sum_w).  Returns
        ([B], [B]) = (spot_size, intensity_sum)."""
        m = self.moments[slot]
        w_raw = m[:, 0]
        w = jnp.where(w_raw == 0, 1.0, w_raw)
        ex, ey = m[:, 1] / w, m[:, 2] / w
        ex2, ey2 = m[:, 3] / w, m[:, 4] / w
        if target_xy is None:
            cx, cy = ex, ey
        else:
            cx, cy = target_xy[..., 0], target_xy[..., 1]
        var = (ex2 - 2 * cx * ex + cx * cx) + (ey2 - 2 * cy * ey + cy * cy)
        return var / 2.0, w_raw
