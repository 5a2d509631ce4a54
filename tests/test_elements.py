"""Element-layer tests across the full catalog: doublet/triplet stacks,
mirrors, ideal ABCD elements (conjugate imaging + autograd magnification,
porting tests/test_ideal.py math), cylindrical lenses, boxes, apertures."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (Box4SideElement, BoxElement, CollimatedDisk,
                               CylindricalMirror, CylSingletLens, DoubletLens,
                               EllipticAperture, Fan, IdealCylThinLens,
                               IdealMirror, IdealThinLens, ParabolicMirror,
                               PointSource, Rays, RectangularAperture, Scene,
                               SensorElement, SequentialScene, SingletLens,
                               SphericalMirror, TripletLens)
from raytracetorch_tpu.constants import PhysKind


def _axis_crossing(out, i=0):
    """z where ray i crosses the y=0 plane."""
    t = -out.pos[i, 1] / out.dir[i, 1]
    return float(out.pos[i, 2] + t * out.dir[i, 2])


# ---------------------------------------------------------------------------
# Lens stacks
# ---------------------------------------------------------------------------

def test_doublet_paraxial_and_trace(key):
    """Achromat-style doublet: traced paraxial ray focus must match the
    system matrix focal length."""
    doublet = DoubletLens(c1=0.02, c2=-0.03, c3=-0.005, d=20.0,
                          t1=4.0, t2=2.0, ior_glass1=1.517,
                          ior_glass2=1.649, name='doublet')
    scene = SequentialScene([doublet])
    p = scene.init_params()
    M = scene.paraxial(p)
    f_sys = float(1.0 / -M[1, 0])

    rays = Rays.create([[0.0, 1.0, -20.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, rays, key)
    # paraxial: crossing at z ~ back principal plane + f
    z_cross = _axis_crossing(out)
    # For a unit-height paraxial ray the crossing is bfl-from-back-vertex;
    # check the slope against the system power instead (exact statement):
    slope = float(out.dir[0, 1] / out.dir[0, 2])
    np.testing.assert_allclose(slope, -1.0 / f_sys, rtol=5e-3)
    assert z_cross > 0


def test_triplet_trace_converges(key):
    triplet = TripletLens(c1=0.015, c2=-0.01, c3=0.012, c4=-0.008, d=20.0,
                          t1=3.0, t2=2.0, t3=3.0, ior_glass1=1.517,
                          ior_glass2=1.62, ior_glass3=1.517, name='triplet')
    scene = SequentialScene([triplet])
    p = scene.init_params()
    M = scene.paraxial(p)
    f_sys = float(1.0 / -M[1, 0])
    rays = Rays.create([[0.0, 0.5, -20.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, rays, key)
    slope = float(out.dir[0, 1] / out.dir[0, 2])
    np.testing.assert_allclose(slope, -0.5 / f_sys, rtol=5e-3)


def test_lens_edge_blocks_when_inked(key):
    """A ray aimed at the barrel edge is absorbed when inked=True."""
    lens = SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                       inked=True, name='lens')
    scene = Scene([lens], n_bounces=4)
    p = scene.init_params()
    # Ray traveling +x at lens mid-plane height: hits the edge cylinder
    rays = Rays.create([[-20.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]])
    out, _, _ = scene.simulate(p, rays, key)
    assert float(out.intensity[0]) == 0.0


def test_cyl_singlet_focuses_y_only(key):
    lens = CylSingletLens(c1=0.05, c2=-0.05, height=10.0, width=12.0, t=3.0,
                          ior_glass=1.5, name='cyl')
    scene = SequentialScene([lens])
    p = scene.init_params()
    ray_y = Rays.create([[0.0, 2.0, -10.0]], [[0.0, 0.0, 1.0]])
    ray_x = Rays.create([[2.0, 0.0, -10.0]], [[0.0, 0.0, 1.0]])
    out_y, _, _ = scene.simulate(p, ray_y, key)
    out_x, _, _ = scene.simulate(p, ray_x, key)
    # y-ray converges, x-ray passes straight
    assert float(out_y.dir[0, 1]) < -1e-3
    np.testing.assert_allclose(out_x.dir[0, 0], 0.0, atol=1e-6)
    # paraxial: power only in the y block of the matrix
    M = scene.paraxial(p)
    assert abs(float(M[1, 0])) < 1e-8       # no x power
    assert float(M[3, 2]) < -1e-3           # y power present


def test_cyl_singlet_edge_bounds(key):
    """Rays outside the rectangular aperture miss the optical faces."""
    lens = CylSingletLens(c1=0.05, c2=-0.05, height=10.0, width=12.0, t=3.0,
                          ior_glass=1.5, name='cyl')
    scene = SequentialScene([lens])
    p = scene.init_params()
    ray = Rays.create([[7.0, 0.0, -10.0]], [[0.0, 0.0, 1.0]])  # x > w/2
    out, _, _ = scene.simulate(p, ray, key)
    np.testing.assert_allclose(out.pos[0], [7.0, 0.0, -10.0], atol=1e-6)


# ---------------------------------------------------------------------------
# Mirrors
# ---------------------------------------------------------------------------

def test_spherical_mirror_focus(key):
    """Concave mirror R=-40: paraxial focus at |R|/2 = 20 before the vertex."""
    scene = Scene([SphericalMirror(c1=-0.025, d=0.0,
                                   translation=[0.0, 0.0, 40.0],
                                   name='m')], n_bounces=2)
    p = scene.init_params()
    rays = Rays.create([[0.0, 0.5, 0.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, rays, key)
    assert float(out.dir[0, 2]) < 0
    z_cross = _axis_crossing(out)
    np.testing.assert_allclose(z_cross, 40.0 - 20.0, rtol=1e-3)
    # paraxial mirror matrix agrees
    zs, mats = scene.elements[0].paraxial(p['m'])
    np.testing.assert_allclose(float(mats[0][1, 0]), -2 * (-0.025), rtol=1e-6)


def test_parabolic_mirror_perfect_on_axis_focus(key):
    """A paraboloid focuses ALL collimated on-axis rays to exactly f=1/(2c),
    spherical aberration free — unlike the spherical mirror."""
    c = -0.02
    scene = Scene([ParabolicMirror(c1=c, d=40.0, translation=[0.0, 0.0, 50.0],
                                   name='m')], n_bounces=2)
    p = scene.init_params()
    heights = jnp.array([0.5, 3.0, 8.0, 15.0])
    rays = Rays.create(
        jnp.stack([jnp.zeros(4), heights, jnp.zeros(4)], axis=1),
        jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1)))
    out, _, _ = scene.simulate(p, rays, key)
    f = 1.0 / (2.0 * abs(c))
    for i in range(4):
        t = -out.pos[i, 1] / out.dir[i, 1]
        z_cross = float(out.pos[i, 2] + t * out.dir[i, 2])
        # vertex at 50 (+ sag already accounted by the trace); focus at 50 - 25
        np.testing.assert_allclose(z_cross, 50.0 - f, rtol=1e-4)


def test_cylindrical_mirror_folds_y_only(key):
    scene = Scene([CylindricalMirror(c1=-0.025, d=0.0,
                                     translation=[0.0, 0.0, 40.0],
                                     name='m')], n_bounces=2)
    p = scene.init_params()
    ray_y = Rays.create([[0.0, 1.0, 0.0]], [[0.0, 0.0, 1.0]])
    ray_x = Rays.create([[1.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
    out_y, _, _ = scene.simulate(p, ray_y, key)
    out_x, _, _ = scene.simulate(p, ray_x, key)
    assert float(out_y.dir[0, 1]) < -1e-3       # converges in y
    np.testing.assert_allclose(out_x.dir[0, 0], 0.0, atol=1e-6)  # x unchanged
    assert float(out_x.dir[0, 2]) < 0           # but still reflected


# ---------------------------------------------------------------------------
# Ideal elements (reference tests/test_ideal.py)
# ---------------------------------------------------------------------------

def test_ideal_lens_conjugate_imaging(key):
    """2f-2f imaging: a point source at -2f refocuses at +2f with
    magnification -1 (reference tests/test_ideal.py:55-107)."""
    f = 50.0
    scene = Scene([IdealThinLens(focal=f, name='lens')], n_bounces=2)
    p = scene.init_params()
    src = PointSource.make(na=jnp.float32(0.05),
                           translation=[0.0, 1.0, -2 * f])
    rays = src.sample(key, 1000)
    out, _, _ = scene.simulate(p, rays, key)
    # Propagate to +2f: all rays land at (0, -1)
    t = (2 * f - out.pos[:, 2]) / out.dir[:, 2]
    xy = out.pos[:, :2] + t[:, None] * out.dir[:, :2]
    np.testing.assert_allclose(np.asarray(jnp.mean(xy, axis=0)),
                               [0.0, -1.0], atol=1e-3)
    spread = float(jnp.sqrt(jnp.mean(jnp.sum((xy - jnp.mean(xy, 0)) ** 2, 1))))
    assert spread < 1e-3


def test_ideal_lens_autograd_image_distance(key):
    """d(zi)/d(zo) = -(zi/zo)^2 via jax.grad (reference
    tests/test_ideal.py:117-187's autograd-vs-theory check)."""
    f = 50.0
    scene = Scene([IdealThinLens(focal=f, name='lens')], n_bounces=2)
    p = scene.init_params()

    def image_distance(zo):
        # One chief + one marginal ray from an axial point at -zo
        pos = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]]) \
            + jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]]) * zo
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.05, 1.0]])
        rays = Rays.create(pos, d)
        out, _, _ = scene.simulate(p, rays, key)
        # marginal ray crosses the axis at the image plane
        t = -out.pos[1, 1] / out.dir[1, 1]
        return out.pos[1, 2] + t * out.dir[1, 2]

    zo = jnp.float32(75.0)
    zi = float(image_distance(zo))
    zi_theory = 1.0 / (1.0 / f - 1.0 / float(zo))
    np.testing.assert_allclose(zi, zi_theory, rtol=1e-4)
    g = float(jax.grad(image_distance)(zo))
    np.testing.assert_allclose(g, -((zi_theory / float(zo)) ** 2), rtol=1e-3)


def test_ideal_cyl_lens_and_mirror(key):
    scene = Scene([IdealCylThinLens(focal_x=1e9, focal_y=50.0, name='cl')],
                  n_bounces=2)
    p = scene.init_params()
    ray_y = Rays.create([[0.0, 1.0, -10.0]], [[0.0, 0.0, 1.0]])
    ray_x = Rays.create([[1.0, 0.0, -10.0]], [[0.0, 0.0, 1.0]])
    oy, _, _ = scene.simulate(p, ray_y, key)
    ox, _, _ = scene.simulate(p, ray_x, key)
    np.testing.assert_allclose(float(oy.dir[0, 1] / oy.dir[0, 2]),
                               -1.0 / 50.0, rtol=1e-4)
    np.testing.assert_allclose(ox.dir[0, 0], 0.0, atol=1e-6)

    m = IdealMirror(radius_x=100.0, radius_y=100.0, name='im')
    pm = m.init_params()
    zs, mats = m.paraxial(pm)
    np.testing.assert_allclose(float(mats[0][1, 0]), -2.0 / 100.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# Solids and apertures
# ---------------------------------------------------------------------------

def test_box_halfspace_bounds(key):
    """Rays only hit box faces within the finite extents, not the infinite
    planes (reference CvxPolyhedron.inBounds, shape.py:122-132)."""
    box = BoxElement(length=4.0, width=6.0, height=8.0,
                     translation=[0.0, 0.0, 10.0], name='box')
    scene = Scene([box], n_bounces=1)
    p = scene.init_params()
    hit_ray = Rays.create([[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, hit_ray, key)
    np.testing.assert_allclose(out.pos[0], [0.0, 0.0, 8.0], atol=1e-5)
    assert float(out.intensity[0]) == 0.0   # Block physics

    # Ray passing beside the box: must NOT hit the infinite face planes
    miss_ray = Rays.create([[10.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, miss_ray, key)
    np.testing.assert_allclose(out.pos[0], [10.0, 0.0, 0.0], atol=1e-6)


def test_box4side_open_caps(key):
    barrel = Box4SideElement(width=6.0, height=8.0,
                             translation=[0.0, 0.0, 10.0], name='barrel')
    scene = Scene([barrel], n_bounces=1)
    p = scene.init_params()
    # Axial ray flies straight through the open ends
    thru = Rays.create([[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, thru, key)
    np.testing.assert_allclose(out.pos[0], [0.0, 0.0, 0.0], atol=1e-6)
    # Side ray hits the +x wall
    side = Rays.create([[-10.0, 0.0, 10.0]], [[1.0, 0.0, 0.0]])
    out, _, _ = scene.simulate(p, side, key)
    np.testing.assert_allclose(out.pos[0], [-3.0, 0.0, 10.0], atol=1e-5)


def test_rect_and_ellipse_apertures(key):
    scene = Scene([
        RectangularAperture(half_x=2.0, half_y=1.0, invert=True,
                            translation=[0.0, 0.0, 5.0], name='rect'),
    ], n_bounces=2)
    p = scene.init_params()
    inside = Rays.create([[1.0, 0.5, 0.0]], [[0.0, 0.0, 1.0]])
    outside = Rays.create([[3.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
    oi, _, _ = scene.simulate(p, inside, key)
    oo, _, _ = scene.simulate(p, outside, key)
    assert float(oi.intensity[0]) == 1.0    # through the opening
    assert float(oo.intensity[0]) == 0.0    # blocked by the plate

    scene = Scene([
        EllipticAperture(r_major=2.0, r_minor=1.0, rot=math.pi / 2,
                         invert=True, translation=[0.0, 0.0, 5.0],
                         name='ell'),
    ], n_bounces=2)
    p = scene.init_params()
    # After a 90-degree rotation the major axis lies along y
    along_major = Rays.create([[0.0, 1.8, 0.0]], [[0.0, 0.0, 1.0]])
    along_minor = Rays.create([[1.8, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
    om, _, _ = scene.simulate(p, along_major, key)
    on, _, _ = scene.simulate(p, along_minor, key)
    assert float(om.intensity[0]) == 1.0
    assert float(on.intensity[0]) == 0.0


def test_duplicate_element_names_rejected():
    """Params are keyed by element name — a duplicate would silently
    alias two elements onto one pytree slot (or KeyError deep in build
    when schemas differ, as two default-named elements do over HTTP).
    init_params must reject it with an actionable message."""
    from raytracetorch_tpu import SensorElement, SequentialScene, SingletLens
    sc = SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='element'),
        SensorElement(radius=6.0, translation=[0, 0, 19.0],
                      name='element')])
    import pytest
    with pytest.raises(ValueError, match='duplicate element name'):
        sc.init_params()
