"""Pixelated phase plates (PhysKind.PHASE_GRID): exact ramp/grating
equivalence, quadratic-profile agreement with DiffractiveLens,
per-pixel gradient design, guards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CollimatedDisk, PhaseGridPlate, Scene,
                               SensorElement, SequentialScene, fit)
from raytracetorch_tpu.rays.ray import Rays

HX = 4.0
LAM0 = 0.5876


def _rays(xs, ys, wavelength=LAM0):
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    pos = jnp.stack([xs, ys, jnp.full_like(xs, -3.0)], -1)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (xs.shape[0], 3))
    return Rays.create(pos, d, wavelength=jnp.full_like(xs, wavelength))


def test_ramp_grid_is_a_grating(key):
    """phi = c*x cycles: every ray exits with dx = m lam_mm c exactly
    (bilinear interpolation is exact on linear data)."""
    c = 30.0                              # cycles/mm
    n = 17
    xs = np.linspace(-HX, HX, n)
    grid = np.broadcast_to(c * xs[None, :], (n, n)).astype(np.float32)
    sc = SequentialScene([PhaseGridPlate(half_x=HX, half_y=HX,
                                         shape=(n, n), init=grid,
                                         name='pp')])
    out, _, _ = sc.simulate(sc.init_params(),
                            _rays([0.3, -2.1, 1.7], [0.5, -1.0, 3.0]),
                            key)
    expect = LAM0 * 1e-3 * c
    np.testing.assert_allclose(np.asarray(out.dx), expect, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.dy), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.intensity), 1.0, atol=1e-6)


def test_quadratic_grid_matches_doe_lens(key):
    """phi = c1 r^2 sampled on a fine grid behaves as the radial DOE
    to bilinear-quantization accuracy."""
    from raytracetorch_tpu import DiffractiveLens
    c1, n = -8.5, 65
    xs = np.linspace(-HX, HX, n)
    X, Y = np.meshgrid(xs, xs, indexing='xy')
    grid = (c1 * (X * X + Y * Y)).astype(np.float32)
    sc_g = SequentialScene([PhaseGridPlate(half_x=HX, half_y=HX,
                                           shape=(n, n), init=grid,
                                           name='pp')])
    sc_d = SequentialScene([DiffractiveLens(radius=1.5 * HX,
                                            coeffs=[c1], name='doe')])
    probe = _rays([0.4, 1.3, -2.2, 3.1], [0.2, -0.8, 1.1, -1.9])
    out_g, _, _ = sc_g.simulate(sc_g.init_params(), probe, key)
    out_d, _, _ = sc_d.simulate(sc_d.init_params(), probe, key)
    # bilinear gradient of a sampled quadratic: error <= c1 * cell
    np.testing.assert_allclose(np.asarray(out_g.dx),
                               np.asarray(out_d.dx), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_g.dy),
                               np.asarray(out_d.dy), atol=2e-3)


def test_grid_gradient_designs_a_steerer(key):
    """Optimize the pixel map to steer a beam onto an off-axis target:
    adam on the per-pixel gradients converges to a ramp."""
    L, xt = 50.0, 1.5
    sc = SequentialScene([
        PhaseGridPlate(half_x=HX, half_y=HX, shape=(16, 16), name='pp'),
        SensorElement(radius=20.0, translation=[0, 0, L], name='s')])
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -3.0],
                               wavelength=LAM0).sample(key, 2000)

    def loss(p):
        # full second moment about the TARGET (centroid alone is
        # underdetermined: a survivor-balancing phase surface can put
        # the mean anywhere): every ray must land at (xt, 0)
        _, sens, _ = sc.simulate(p, rays, key)
        c = sens.centroid(0)[0]
        rms = sens.spot_rms(0)[0]
        return (c[0] - xt) ** 2 + c[1] ** 2 + rms ** 2

    p0 = sc.init_params()
    g0 = jax.grad(loss)(p0)['pp']['grid']
    assert np.isfinite(np.asarray(g0)).all() and float(jnp.abs(g0).max()) > 0
    # the optimal ramp spans ~400 cycles across the plate and adam
    # moves ~lr per pixel per step: size lr accordingly
    p, hist = fit(loss, p0, trainable=sc.trainable(), steps=600, lr=2.0)
    # converged to the plate's intra-cell quantization floor (bilinear
    # cells cannot represent the focusing x^2 term exactly)
    assert float(hist[-1]) < 0.05
    assert float(hist[-1]) < 0.02 * float(hist[0])
    # the learned map's mean x-slope over the ILLUMINATED pixels is the
    # steering ramp c = xt / (L * m * lam_mm) (plus the focusing
    # curvature, whose mean slope over the symmetric beam is ~0)
    grid = np.asarray(p['pp']['grid'])
    cell = 2 * HX / 15
    lit = slice(4, 12)                    # beam radius 2 on half_x 4
    slope = np.mean(np.diff(grid[lit, lit], axis=1)) / cell
    c_analytic = xt / (L * LAM0 * 1e-3)
    assert slope == pytest.approx(c_analytic, rel=0.25)


def test_phase_grid_guards(key):
    with pytest.raises(ValueError):
        PhaseGridPlate(half_x=0.0, half_y=4.0)
    with pytest.raises(ValueError):
        PhaseGridPlate(half_x=4.0, half_y=4.0, shape=(1, 8))
    with pytest.raises(ValueError):
        PhaseGridPlate(half_x=4.0, half_y=4.0, shape=(4, 4),
                       init=np.zeros((8, 8)))


def test_phase_grid_nonseq_parity(key):
    """The non-sequential bounce loop reads the traced [H, W] side maps
    through the same per-row grid channel as the sequential driver
    (Scene.side_grids -> bounce_step): ordered scene => exact parity,
    values AND per-pixel gradients (round-3 VERDICT missing #1)."""
    n = 16
    xs = np.linspace(-HX, HX, n)
    X, Y = np.meshgrid(xs, xs, indexing='xy')
    els = [PhaseGridPlate(half_x=HX, half_y=HX, shape=(n, n), name='pp'),
           SensorElement(radius=20.0, translation=[0, 0, 50.0], name='s')]
    seq = SequentialScene(els)
    nsc = Scene(els, n_bounces=3)
    p = seq.init_params()
    p['pp']['grid'] = jnp.asarray(3.0 * X + 0.15 * Y * Y, jnp.float32)
    probe = _rays([0.4, 1.3, -2.2, 3.1], [0.2, -0.8, 1.1, -1.9])
    o1, s1, _ = seq.simulate(p, probe, key)
    o2, s2, _ = nsc.simulate(p, probe, key)
    np.testing.assert_allclose(np.asarray(o2.dir), np.asarray(o1.dir),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(o2.pos), np.asarray(o1.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.moments),
                               np.asarray(s1.moments), rtol=1e-6,
                               atol=1e-6)

    def mk(scene):
        def loss(p):
            _, sens, _ = scene.simulate(p, probe, key)
            m = sens.moments[0, 0]
            return m[1] / jnp.maximum(m[0], 1e-9) + 1e-3 * m[3]
        return loss

    g1 = jax.grad(mk(seq))(p)['pp']['grid']
    g2 = jax.grad(mk(nsc))(p)['pp']['grid']
    assert float(jnp.abs(g1).max()) > 0
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-7)


def _steerer_scene(n=16):
    sc = SequentialScene([
        PhaseGridPlate(half_x=HX, half_y=HX, shape=(n, n), name='pp'),
        SensorElement(radius=20.0, translation=[0, 0, 50.0], name='s')])
    xs = np.linspace(-HX, HX, n)
    X, Y = np.meshgrid(xs, xs, indexing='xy')
    p = sc.init_params()
    p['pp']['grid'] = jnp.asarray(3.0 * X + 0.15 * Y * Y, jnp.float32)
    return sc, p


def test_fused_kernel_phase_grid_parity(key):
    """The fused sequential kernel reads the [H, W] phase map through
    one-hot MXU corner matmuls (ops/pallas_trace.py::_grid_corners_mxu)
    — directions/positions/moments/opl match the XLA driver's per-ray
    gather path."""
    sc, p = _steerer_scene()
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -3.0],
                               wavelength=LAM0).sample(key, 2048)
    o1, s1, a1 = sc.simulate(p, rays, key, track_opl=True)
    o2, s2, a2 = sc.simulate_fused(p, rays, key, track_opl=True)
    np.testing.assert_allclose(np.asarray(o1.dx), np.asarray(o2.dx),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(o1.px), np.asarray(o2.px),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1['opl']), np.asarray(a2['opl']),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.moments),
                               np.asarray(s2.moments), rtol=1e-5,
                               atol=1e-3)


def _nonseq_pg_scene(with_grid=False):
    n = 16
    xs = np.linspace(-HX, HX, n)
    X, Y = np.meshgrid(xs, xs, indexing='xy')
    sc = Scene([
        PhaseGridPlate(half_x=HX, half_y=HX, shape=(n, n), name='pp'),
        SensorElement(radius=20.0, translation=[0, 0, 50.0], name='s')],
        n_bounces=3)
    if with_grid:
        sc.grid_shape = (8, 8)
        sc.grid_half_extent = 8.0
    p = sc.init_params()
    p['pp']['grid'] = jnp.asarray(3.0 * X + 0.15 * Y * Y, jnp.float32)
    return sc, p


def test_nonseq_fused_phase_grid_parity(key):
    """The non-sequential fused kernel traces pixelated phase plates:
    the [H, W] maps ride VMEM-resident through the bounce loop
    (cond-guarded one-hot corner reads) — per-ray streams match the XLA
    bounce loop bitwise, moments/grids to f32 sum-order noise."""
    sc, p = _nonseq_pg_scene(with_grid=True)
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -3.0],
                               wavelength=LAM0).sample(key, 2048)
    o1, s1, a1 = sc.simulate(p, rays, key, track_opl=True)
    o2, s2, a2 = sc.simulate_fused(p, rays, key, track_opl=True,
                                   block_rows=4)
    np.testing.assert_allclose(np.asarray(o1.dx), np.asarray(o2.dx),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(o1.px), np.asarray(o2.px),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1['opl']), np.asarray(a2['opl']),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.moments),
                               np.asarray(s2.moments), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s1.grid), np.asarray(s2.grid),
                               rtol=1e-5, atol=1e-3)


def test_nonseq_fused_phase_grid_grad(key):
    """jax.grad through Scene.simulate_fused with a phase plate matches
    the XLA driver's per-pixel gradients (interpret mode routes through
    the XLA-recompute custom_vjp; the fused scan-backward kernel path is
    covered below and on real TPU)."""
    sc, p = _nonseq_pg_scene()
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -3.0],
                               wavelength=LAM0).sample(key, 1024)

    def mk(sim):
        def loss(q):
            _, sens, _ = sim(q)
            m = sens.moments[0, 0]
            return m[1] / jnp.maximum(m[0], 1e-9) + 1e-3 * m[3]
        return loss

    g_x = jax.grad(mk(lambda q: sc.simulate(q, rays, key)))(p)
    g_f = jax.grad(mk(lambda q: sc.simulate_fused(q, rays, key,
                                                  block_rows=4)))(p)
    gx, gf = g_x['pp']['grid'], g_f['pp']['grid']
    assert float(jnp.abs(gx).max()) > 0
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=1e-7)


def test_nonseq_fused_phase_grid_scan_bwd(key):
    """The checkpointed-scan backward kernel carries the phase maps as
    vjp diff-args: its per-bounce-accumulated map cotangent (plus table
    and ray cotangents) matches jax.grad through the XLA bounce loop —
    a moments + spot + irradiance-grid-weighted loss."""
    import jax.tree_util as jtu

    from raytracetorch_tpu.core.sensor import SensorState
    from raytracetorch_tpu.core.trace import trace_nonsequential
    from raytracetorch_tpu.ops.pallas_trace import trace_nonseq_pallas_bwd

    sc, p = _nonseq_pg_scene(with_grid=True)
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -3.0],
                               wavelength=LAM0).sample(key, 1024)
    cfg = sc.sensor_config()
    meta = sc.static_meta()
    table = sc.build_table(p)
    grids = sc.side_grids(p)
    comps = ('px', 'py', 'pz', 'dx', 'dy', 'dz', 'intensity')
    W = np.asarray(jax.random.normal(jax.random.fold_in(key, 3),
                                     (1, 8, 8)), np.float32)

    def xla_loss(table, grids, *ray_comps):
        r = rays.replace(**dict(zip(comps, ray_comps)))
        _, sens, _ = trace_nonsequential(table, r, key, 3, cfg,
                                         static_meta=meta, grids=grids)
        return (sens.total_weight(0)[0] + sens.spot_rms(0)[0]
                + jnp.sum(sens.grid * W) * 1e-2)

    grads = jax.grad(xla_loss, argnums=tuple(range(9)), allow_int=True)(
        table, grids, *(getattr(rays, c) for c in comps))
    gt_ref, gg_ref, gr_ref = grads[0], grads[1], grads[2:]

    _, sens_x, _ = trace_nonsequential(table, rays, key, 3, cfg,
                                       static_meta=meta, grids=grids)

    def head(moments, grid):
        sens = SensorState(moments=moments, grid=grid)
        return (sens.total_weight(0)[0] + sens.spot_rms(0)[0]
                + jnp.sum(grid * W) * 1e-2)

    _, head_vjp = jax.vjp(head, sens_x.moments, sens_x.grid)
    g_mom, g_grid = head_vjp(jnp.float32(1.0))
    g_rays = rays.replace(**{c: jnp.zeros_like(getattr(rays, c))
                             for c in comps})

    gt_f, ct = trace_nonseq_pallas_bwd(
        table, rays, key, cfg, meta, 3, g_rays, g_mom,
        interpret=True, block_rows=4, g_grid=g_grid, grids=grids,
        mode='scan')

    for a, b in zip(jtu.tree_leaves(gt_f), jtu.tree_leaves(gt_ref)):
        if not np.issubdtype(np.asarray(b).dtype, np.inexact):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ct['grids'][0]),
                               np.asarray(gg_ref[0]), atol=1e-7)
    for c, ref in zip(comps, gr_ref):
        np.testing.assert_allclose(np.asarray(ct[c]), np.asarray(ref),
                                   rtol=1e-4, atol=1e-6)


def test_fused_kernel_phase_grid_gradients(key):
    """jax.grad through the fused kernel routes per-pixel cotangents back
    into the map via the transposed one-hot corner matmuls — matching
    the XLA scatter-add gradients (the 'deep optics' design loop keeps
    the fused backward)."""
    sc, p = _steerer_scene()
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -3.0],
                               wavelength=LAM0).sample(key, 1024)

    def mk(sim):
        def loss(p):
            _, sens, _ = sim(p)
            m = sens.moments[0, 0]
            return m[1] / jnp.maximum(m[0], 1e-9) + 1e-3 * m[3]
        return loss

    g_x = jax.grad(mk(lambda p: sc.simulate(p, rays, key)))(p)
    g_f = jax.grad(mk(lambda p: sc.simulate_fused(p, rays, key)))(p)
    gx, gf = g_x['pp']['grid'], g_f['pp']['grid']
    assert float(jnp.linalg.norm(gx)) > 0
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gf), atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_x['pp']['trans'][2]),
                               np.asarray(g_f['pp']['trans'][2]),
                               rtol=1e-4)
