"""Registry-wide config/serialization round-trip tests.

VERDICT.md round-1 weak #3: nested dataclass fields (panel emission models)
serialized as empty params — a RectangularPanel with a custom
SolidAngleEmission cone silently reloaded with the default.  These tests
pin the fix: every registered element class and every bundle family must
round-trip through JSON to an object with bit-identical parameters and an
identical compiled surface table / sampled ray batch (reference semantics:
recursive CLASS instantiation, config.py:156-235).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracetorch_tpu as rt
from raytracetorch_tpu.config import (bundle_config, element_config,
                                      get_subclasses, instantiate_bundle,
                                      instantiate_element)
from raytracetorch_tpu.core.table import stack_records
from raytracetorch_tpu.elements.base import Element

# One constructible exemplar per serializable element class.  A class
# missing here fails test_registry_has_exemplars — add an entry when adding
# an element.
EXEMPLARS = {
    'SingletLens': dict(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                        c1_grad=True, translation=[0.0, 0.5, 2.0]),
    'DoubletLens': dict(c1=0.02, c2=-0.025, c3=-0.004, d=20.0, t1=4.0,
                        t2=2.0, ior_glass1=1.5168, ior_glass2=1.6727,
                        abbe_vd1=64.17, abbe_vd2=32.25),
    'TripletLens': dict(c1=0.02, c2=-0.01, c3=0.01, c4=-0.02, d=20.0,
                        t1=3.0, t2=2.0, t3=3.0, ior_glass1=1.5168,
                        ior_glass2=1.6727, ior_glass3=1.5168),
    'CylSingletLens': dict(c1=0.05, c2=-0.05, height=10.0, width=12.0,
                           t=3.0, ior_glass=1.5),
    'AsphericLens': dict(c1=0.0167, c2=-0.0028, d=25.4, t=4.0,
                         ior_glass=1.5168, k1=-0.8, a1=(1e-6, 2e-9),
                         k1_grad=True),
    'FreeformLens': dict(c1=0.0167, c2=-0.0028, d=25.4, t=4.0,
                         ior_glass=1.5168, xy1=[(2, 0, 1e-3), (0, 2, -2e-3),
                                                (2, 1, 1e-5)],
                         xy1_grad=True),
    'ZernikeLens': dict(c1=0.0167, c2=-0.0028, d=25.4, t=4.0,
                        ior_glass=1.5168, z1=[(4, 1e-3), (6, -2e-4),
                                              (11, 5e-5)],
                        z1_grad=True, norm_radius=10.0),
    'WedgePrism': dict(wedge_angle=0.1, d=10.0, t=3.0, ior_glass=1.5),
    'DiffractiveLens': dict(radius=8.0, coeffs=[-8.5, 0.01], order=1,
                            efficiency=True, phase_grad=True),
    'GrinRod': dict(radius=5.0, thickness=20.0, n0=1.6, grin_A=0.01,
                    n_steps=32, grin_A_grad=True),
    'LambertianScatterer': dict(radius=12.0, albedo=0.35),
    'MicrolensArray': dict(half_x=4.0, half_y=3.0, pitch=0.8, f=25.0,
                           f_grad=True),
    'ObscuredAperture': dict(radius=4.0, obscuration=0.3, n_vanes=4,
                             vane_width=0.12, vane_angle=0.2),
    'PhaseGridPlate': dict(half_x=4.0, half_y=3.0, shape=(6, 8),
                           init=0.5, order=1, grid_grad=True),
    'LinearPolarizer': dict(radius=9.0, angle=0.3, extinction=1e-3,
                            angle_grad=True),
    'Waveplate': dict(radius=9.0, retardance=0.25, angle=0.2,
                      chromatic=True, design_wavelength=0.55),
    'QuarterWaveplate': dict(radius=9.0, angle=0.1),
    'HalfWaveplate': dict(radius=9.0, angle=0.4),
    'RoughMirror': dict(radius=8.0, roughness=2e-3, roughness_grad=True),
    'Diffuser': dict(radius=6.0, roughness=0.08, albedo=0.9),
    'SphericalMirror': dict(c1=-0.025, d=8.0, rotation=[0.1, 0.0, 0.0]),
    'CylindricalMirror': dict(c1=-0.025, d=8.0),
    'ParabolicMirror': dict(c1=-0.0125, d=8.0),
    'ParabolicMirrorXZ': dict(c1=-0.0125, d=8.0),
    'ParabolicMirrorOffAxis': dict(c1=0.005, d=25.4, off_axis=50.0),
    'ConicMirror': dict(c1=-0.04, k=-2.25, d=16.0, k_grad=True),
    'ManginMirror': dict(c1=-0.02, c2=-0.025, d=20.0, t=4.0,
                         ior_glass=1.5168, c2_grad=True),
    'AsphericMirror': dict(c1=-0.01, d=40.0, k=-0.5, a=[1e-6, -2e-9],
                           a_grad=True),
    'CircularAperture': dict(radius=5.0, invert=True),
    'RectangularAperture': dict(half_x=2.0, half_y=3.0),
    'EllipticAperture': dict(r_major=3.0, r_minor=2.0, rot=0.3),
    'LinearElement': dict(diameter=20.0),
    'IdealThinLens': dict(focal=50.0, focal_grad=True),
    'IdealCylThinLens': dict(focal_x=50.0, focal_y=80.0),
    'IdealMirror': dict(radius_x=100.0, radius_y=100.0),
    'DiffractionGrating': dict(period_um=1.0, order=2, reflective=True),
    'SensorElement': dict(radius=6.0),
    'BoxElement': dict(length=2.0, width=3.0, height=4.0),
    'Box4SideElement': dict(width=3.0, height=4.0),
    'CvxPolyhedronElement': dict(
        normals=[[0, 0, 1], [0, 0, -1], [1, 0, 0], [-1, 0, 0], [0, 1, 0],
                 [0, -1, 0], [0.577, 0.577, 0.577]],
        offsets=[1.0, 1.0, 1.5, 1.5, 2.0, 2.0, 2.5],
        ior_glass=1.5, offsets_grad=True),
}

# Classes that take callables (static scene structure) — documented as not
# project-file serializable.
NON_SERIALIZABLE = {'ElementCustom', 'FuzzyAperture'}


def test_registry_has_exemplars():
    names = {c.__name__ for c in get_subclasses(Element)
             if not c.__name__.startswith('_')}
    missing = names - NON_SERIALIZABLE - set(EXEMPLARS)
    assert not missing, f"element classes without roundtrip exemplar: {missing}"


def _table(el):
    p = el.init_params()
    rows = el.build(p)
    return stack_records(rows, [0] * len(rows), list(range(len(rows))))


@pytest.mark.parametrize('name', sorted(EXEMPLARS))
def test_element_roundtrip(name):
    el = getattr(rt, name)(**EXEMPLARS[name], name='x')
    cfg = json.loads(json.dumps(element_config(el)))  # through real JSON
    el2 = instantiate_element(cfg)
    assert type(el2) is type(el)

    # params bit-identical
    p1, p2 = el.init_params(), el2.init_params()
    leaves1 = jax.tree_util.tree_leaves_with_path(p1)
    leaves2 = dict(jax.tree_util.tree_leaves_with_path(p2))
    assert set(leaves2) == {k for k, _ in leaves1}
    for path, v in leaves1:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(leaves2[path]),
                                      err_msg=f"{name}{path}")

    # trainability flags survive
    t1 = jax.tree_util.tree_map(np.asarray, el.trainable())
    t2 = jax.tree_util.tree_map(np.asarray, el2.trainable())
    jax.tree_util.tree_map(np.testing.assert_array_equal, t1, t2)

    # compiled surface table bit-identical
    tab1, tab2 = _table(el), _table(el2)
    for f1, f2 in zip(jax.tree_util.tree_leaves(tab1),
                      jax.tree_util.tree_leaves(tab2)):
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2),
                                      err_msg=name)

    # re-serialization is stable
    assert element_config(el2) == json.loads(json.dumps(element_config(el)))


BUNDLES = {
    'CollimatedDisk': dict(radius=4.0),
    'CollimatedLine': dict(length=3.0),
    'Fan': dict(angle=0.25),
    'PointSource': dict(na=0.2),
    'GaussianBeam': dict(diameter_x=2.0, diameter_y=3.0),
    'LambertianSphere': dict(radius=1.5),
    'RayleighScatter': dict(),
    'MieScatter': dict(particle_size_nm=500.0, wavelength_nm=532.0,
                       particle_ior=1.59, environment_ior=1.33),
    'RectangularPanel': dict(width=2.0, height=1.0),
    'RingSource': dict(radius_inner=0.5, radius_outer=1.0),
}


@pytest.mark.parametrize('name', sorted(BUNDLES))
def test_bundle_roundtrip(name, key):
    b = getattr(rt, name).make(translation=[0.0, 0.0, -5.0],
                               rotation=[0.0, 0.1, 0.0], ray_id=2,
                               **BUNDLES[name])
    cfg = json.loads(json.dumps(bundle_config(b)))
    b2 = instantiate_bundle(cfg)
    assert type(b2) is type(b)
    r1, r2 = b.sample(key, 64), b2.sample(key, 64)
    np.testing.assert_array_equal(np.asarray(r1.pos), np.asarray(r2.pos),
                                  err_msg=name)
    np.testing.assert_array_equal(np.asarray(r1.dir), np.asarray(r2.dir),
                                  err_msg=name)
    assert int(r1.ray_id[0]) == int(r2.ray_id[0]) == 2


def test_panel_nested_emission_roundtrip(key):
    """The round-1 silent-data-loss bug: custom cone angle must survive."""
    from raytracetorch_tpu import RectangularPanel, RingSource, SolidAngleEmission
    p = RectangularPanel.make(width=2.0, height=1.0,
                              emission=SolidAngleEmission(
                                  cone_angle=jnp.float32(0.2)))
    cfg = json.loads(json.dumps(bundle_config(p)))
    assert cfg['params']['emission']['params']['cone_angle'] == pytest.approx(0.2)
    p2 = instantiate_bundle(cfg)
    assert float(p2.emission.cone_angle) == pytest.approx(0.2)
    r1, r2 = p.sample(key, 128), p2.sample(key, 128)
    np.testing.assert_array_equal(np.asarray(r1.dir), np.asarray(r2.dir))

    ring = RingSource.make(radius_inner=0.25, radius_outer=0.75,
                           emission=SolidAngleEmission(
                               cone_angle=jnp.float32(0.37)))
    ring2 = instantiate_bundle(json.loads(json.dumps(bundle_config(ring))))
    assert float(ring2.emission.cone_angle) == pytest.approx(0.37)


def test_scene_with_panel_traces_identically(tmp_path, key):
    """Whole-project roundtrip with a parameterized emission model."""
    from raytracetorch_tpu import (RectangularPanel, Scene, SensorElement,
                                   SolidAngleEmission)
    from raytracetorch_tpu.project import load_scene, save_project
    scene = Scene([SensorElement(radius=20.0, translation=[0, 0, 10.0],
                                 name='s')], n_bounces=2)
    scene.add_bundle(
        RectangularPanel.make(width=2.0, height=1.0,
                              emission=SolidAngleEmission(
                                  cone_angle=jnp.float32(0.2))), 512)
    path = str(tmp_path / 'panel.rtt')
    save_project(path, scene)
    loaded = load_scene(path)
    r0 = scene.sample_rays(key)
    r1 = loaded.sample_rays(key)
    np.testing.assert_array_equal(np.asarray(r0.pos), np.asarray(r1.pos))
    np.testing.assert_array_equal(np.asarray(r0.dir), np.asarray(r1.dir))
    out0, s0, _ = scene.simulate(scene.init_params(), r0, key)
    out1, s1, _ = loaded.simulate(loaded.init_params(), r1, key)
    np.testing.assert_array_equal(np.asarray(out0.pos), np.asarray(out1.pos))
