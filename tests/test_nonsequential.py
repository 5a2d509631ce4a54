"""Non-sequential (nearest-hit bounce) scene tests: parity with the
sequential driver on ordered systems, mirror fold paths, bounce budgets
(reference scene/base.py:129-235; the 'naive scene' config of BASELINE.json).
"""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CircularAperture, CollimatedDisk, Rays,
                               SensorElement, Scene, SequentialScene,
                               SingletLens, SphericalMirror)


def _elements():
    return [
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
        CircularAperture(radius=5.0, translation=[0.0, 0.0, 10.0],
                         name='stop'),
        SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0],
                      name='sensor'),
    ]


def test_nonsequential_matches_sequential_on_ordered_system(key):
    seq = SequentialScene(_elements())
    non = Scene(_elements(), n_bounces=8)
    p = seq.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0.0, 0.0, -10.0]).sample(key, 2048)

    out_s, sens_s, _ = seq.simulate(p, rays, key)
    out_n, sens_n, _ = non.simulate(p, rays, key)

    np.testing.assert_allclose(out_n.pos, out_s.pos, atol=1e-4)
    np.testing.assert_allclose(out_n.dir, out_s.dir, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sens_n.moments),
                               np.asarray(sens_s.moments), rtol=1e-4,
                               atol=1e-4)   # f32 accumulation-order noise


def test_mirror_fold_path(key):
    """A spherical mirror folds rays back to a sensor behind the source —
    inherently non-sequential (z-ordering breaks)."""
    scene = Scene([
        SphericalMirror(c1=-0.025, d=0.0, translation=[0.0, 0.0, 40.0],
                        name='mirror'),
        SensorElement(radius=10.0, translation=[0.0, 0.0, 0.5],
                      name='sensor'),
    ], n_bounces=4)
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(2.0)).sample(key, 512)
    out, sensors, _ = scene.simulate(p, rays, key)

    # R = -40 -> f = |R|/2 = 20: collimated light focuses at z = 40 - 20 = 20,
    # then diverges back through the sensor plane at z = 0.5.
    assert float(jnp.mean(out.dir[:, 2])) < 0.0     # rays travel backwards
    w = float(sensors.total_weight(0)[0])
    assert w > 500
    # Spot at z=0.5 after focusing at 20: radius ~ 2 * (19.5/20) ~ 1.95
    rms = float(sensors.spot_rms(0)[0])
    assert 1.0 < rms < 2.0


def test_bounce_budget_masks_dead_rays(key):
    """Rays that leave the scene stop interacting; extra bounces are no-ops."""
    scene4 = Scene(_elements(), n_bounces=4)
    scene16 = Scene(_elements(), n_bounces=16)
    p = scene4.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0.0, 0.0, -10.0]).sample(key, 512)
    out4, _, _ = scene4.simulate(p, rays, key)
    out16, _, _ = scene16.simulate(p, rays, key)
    np.testing.assert_allclose(out4.pos, out16.pos, atol=1e-5)


def test_nonsequential_gradients(key):
    scene = Scene(_elements(), n_bounces=6)
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(3.0),
                               translation=[0.0, 0.0, -10.0]).sample(key, 256)

    def loss(pp):
        _, sensors, _ = scene.simulate(pp, rays, key)
        return sensors.spot_rms(0)[0]

    g = jax.grad(loss)(p)
    g1 = float(g['lens']['c1'])
    assert np.isfinite(g1) and g1 != 0.0
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_to_sequential_sorts_by_z(key):
    scene = Scene([
        SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0],
                      name='sensor'),
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
    ])
    seq = scene.to_sequential()
    assert [el.name for el in seq.elements] == ['lens', 'sensor']


def test_glass_ball_lens(key):
    """A glass sphere focuses per the ball-lens formula: two sequential
    refractions through the SAME surface — the bounce loop must revisit it
    (impossible in a one-pass sequential trace)."""
    from raytracetorch_tpu import ElementCustom
    from raytracetorch_tpu.constants import PhysKind
    from raytracetorch_tpu.elements import shapes

    n_glass, R = 1.5, 5.0
    # The sphere normal points outward, so the normal-side medium is air
    ball = ElementCustom(shapes.sphere, 1, PhysKind.SNELL,
                         ph=(1.0, n_glass), extra={'radius': R},
                         translation=[0.0, 0.0, 20.0], name='ball')
    scene = Scene([ball], n_bounces=4)
    p = scene.init_params()

    h = 0.4
    rays = Rays.create([[0.0, h, 0.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, rays, key)
    t_ax = -out.pos[0, 1] / out.dir[0, 1]
    z_cross = float(out.pos[0, 2] + t_ax * out.dir[0, 2])
    # Ball lens BFL from the back surface: R(2-n)/(2(n-1)); back vertex at 25
    bfl = R * (2 - n_glass) / (2 * (n_glass - 1))
    np.testing.assert_allclose(z_cross, 25.0 + bfl, rtol=2e-2)
    # The ray exited the glass (unit direction, forward)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(out.dir[0])), 1.0, atol=1e-5)


def test_early_exit_matches_full_budget(key):
    """A generous bounce budget with early exit traces identically to the
    tight budget (and to the unconditional scan) — rays settle after ~4
    bounces in this system, the remaining iterations are skipped on-device
    (VERDICT round-1 weak #4; reference early exit scene/base.py:139-142)."""
    mk = lambda n_bounces: Scene(_elements(), n_bounces=n_bounces)
    p = mk(8).init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0.0, 0.0, -10.0]).sample(key, 1024)

    big = mk(100)
    out_b, sens_b, _ = big.simulate(p, rays, key)
    out_u, sens_u, _ = big.simulate(p, rays, key, early_exit=False)
    small = mk(8)
    out_s, sens_s, _ = small.simulate(p, rays, key)

    for a, b in ((out_b, out_u), (out_b, out_s)):
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
        np.testing.assert_array_equal(np.asarray(a.dir), np.asarray(b.dir))
    np.testing.assert_array_equal(np.asarray(sens_b.moments),
                                  np.asarray(sens_u.moments))
    np.testing.assert_array_equal(np.asarray(sens_b.moments),
                                  np.asarray(sens_s.moments))


def test_early_exit_gradients(key):
    """Reverse-mode gradients flow through the cond-guarded scan and match
    the unconditional loop (up to f32 cotangent accumulation order)."""
    scene = Scene(_elements(), n_bounces=40)
    scene.find_element('lens')  # ensure naming
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0.0, 0.0, -10.0]).sample(key, 512)

    def loss(pp, **kw):
        _, sensors, _ = scene.simulate(pp, rays, key, **kw)
        return sensors.spot_rms(0)[0]

    g1 = jax.grad(lambda pp: loss(pp))(p)
    g2 = jax.grad(lambda pp: loss(pp, early_exit=False))(p)
    l1 = jax.tree_util.tree_leaves(g1)
    l2 = jax.tree_util.tree_leaves(g2)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in l1)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_no_phantom_sensor_recrossings(key):
    """Regression: the self-intersection epsilon must scale with the WORLD
    coordinate magnitude, not just the surface-local offset — near-axis
    rays landing on a far sensor plane used to re-hit it at t ~ 5e-6 and
    re-record (>1% phantom flux, dependent on how XLA fused the previous
    bounce).  Total recorded flux of a Fresnel singlet must equal the
    transmitted fraction (< launched) and be budget-independent."""
    import numpy as np

    from raytracetorch_tpu import (CollimatedDisk, Scene, SensorElement,
                                   SingletLens)

    r = CollimatedDisk.make(radius=jnp.float32(4.0),
                            translation=[0, 0, -10.0]).sample(key, 10_000)
    fluxes = []
    for nb in (3, 6, 12):
        scene = Scene([
            SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0,
                        ior_glass=1.5168, fresnel=True, name='lens'),
            SensorElement(radius=8.0, translation=[0, 0, 19.3], name='s'),
        ], n_bounces=nb)
        _, sens, _ = scene.simulate(scene.init_params(), r, key)
        fluxes.append(float(sens.moments[0, 0, 0]))
    # < launched (Fresnel losses), > 90% (only ~4% reflects per surface),
    # and converged by nb=6 (double-ghosts are the only late additions)
    assert 9000 < fluxes[0] <= 10_000
    assert abs(fluxes[2] - fluxes[1]) < 5
    assert fluxes[2] - fluxes[0] < 50


def test_nonsequential_record_hits_match_sequential(key):
    """record_hits in the bounce-loop driver: per-bounce sensor-local hits
    match the sequential driver's per-surface record on the same ordered
    scene (round-2 VERDICT item 7; reference elements/sensor.py:22-39
    records hits regardless of scene type)."""
    seq = SequentialScene(_elements())
    non = Scene(_elements(), n_bounces=8)
    p = seq.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0.0, 0.0, -10.0]).sample(key, 1024)

    _, _, aux_s = seq.simulate(p, rays, key, record_hits=True)
    _, _, aux_n = non.simulate(p, rays, key, record_hits=True)

    meta = seq.static_meta()
    krow = next(k for k, m in enumerate(meta) if m.sensor)
    hs, ws = np.asarray(aux_s['hits'])[krow], \
        np.asarray(aux_s['hit_weights'])[krow]

    hn = np.asarray(aux_n['hits'])          # [B, N, 3]
    wn = np.asarray(aux_n['hit_weights'])   # [B, N]
    # each ray crosses the sensor at most once in this ordered scene:
    # collapse the bounce axis to a single per-ray record
    crossed = wn > 0
    assert np.all(crossed.sum(0) <= 1)
    w_flat = wn.sum(0)
    h_flat = (hn * crossed[..., None]).sum(0)

    np.testing.assert_allclose(w_flat, ws, atol=1e-6)
    keep = ws > 0
    assert keep.sum() > 500
    np.testing.assert_allclose(h_flat[keep], hs[keep], atol=1e-4)
    # slots recorded for the crossings are the sensor's slot (0)
    assert np.all(np.asarray(aux_n['hit_slots'])[crossed] == 0)


def test_nonsequential_track_opl(key):
    """track_opl in the bounce loop: matches the sequential driver's OPL
    on an ordered scene (glass path weighted by n), and equals the pure
    geometric path length for an all-air mirror fold."""
    seq = SequentialScene(_elements())
    non = Scene(_elements(), n_bounces=8)
    p = seq.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0.0, 0.0, -10.0]).sample(key, 1024)
    _, _, aux_s = seq.simulate(p, rays, key, track_opl=True)
    _, _, aux_n = non.simulate(p, rays, key, track_opl=True)
    np.testing.assert_allclose(np.asarray(aux_n['opl']),
                               np.asarray(aux_s['opl']), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(aux_n['n_final']),
                               np.asarray(aux_s['n_final']), rtol=1e-6)

    fold = Scene([
        SphericalMirror(c1=-0.025, d=0.0, translation=[0.0, 0.0, 40.0],
                        name='mirror'),
        SensorElement(radius=10.0, translation=[0.0, 0.0, 0.5],
                      name='sensor'),
    ], n_bounces=4)
    pf = fold.init_params()
    r1 = Rays.create([[0.0, 0.0, 1.0]], [[0.0, 0.0, 1.0]])
    out, _, aux = fold.simulate(pf, r1, key, track_opl=True)
    # axial ray: 1 -> 40 (mirror) -> back through sensor plane at 0.5:
    # all in air, opl = geometric distance = 39 + 39.5
    np.testing.assert_allclose(float(aux['opl'][0]), 39.0 + 39.5, rtol=1e-5)
