"""Scene serialization round-trip tests (reference project.py / config.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CircularAperture, CollimatedDisk, GaussianBeam,
                               SensorElement, SequentialScene, SingletLens,
                               SphericalMirror)
from raytracetorch_tpu.project import (load_params, load_project, load_scene,
                                       save_params, save_project)


def _scene():
    scene = SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    c1_grad=True, c2_grad=True, name='lens'),
        CircularAperture(radius=5.0, translation=[0.0, 0.0, 10.0],
                         name='stop'),
        SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0],
                      name='sensor'),
    ], n_bounces=30)
    scene.add_bundle(CollimatedDisk.make(radius=jnp.float32(4.0),
                                         translation=[0.0, 0.0, -10.0]), 500)
    scene.add_bundle(GaussianBeam.make(diameter_x=jnp.float32(2.0),
                                       diameter_y=jnp.float32(3.0),
                                       ray_id=1), 300)
    return scene


def test_roundtrip(tmp_path, key):
    scene = _scene()
    path = tmp_path / 'scene.rtt'
    save_project(str(path), scene)

    data = load_project(str(path))
    assert data['version'] == '1.0'
    assert len(data['elements']) == 3
    assert data['elements'][0]['config']['class'] == 'SingletLens'

    loaded = load_scene(str(path))
    assert loaded.sequential
    assert loaded.n_bounces == 30
    assert [el.name for el in loaded.elements] == ['lens', 'stop', 'sensor']
    assert loaded.find_element('lens').fresnel is False
    assert loaded.bundles[0][1] == 500
    assert type(loaded.bundles[1][0]).__name__ == 'GaussianBeam'

    # Trainability flags survive
    assert loaded.trainable()['lens']['c1'] is True
    assert loaded.trainable()['lens']['t'] is False

    # Loaded scene traces identically to the original
    p0 = scene.init_params()
    p1 = loaded.init_params()
    rays = scene.sample_rays(key)
    out0, s0, _ = scene.simulate(p0, rays, key)
    out1, s1, _ = loaded.simulate(p1, rays, key)
    np.testing.assert_allclose(np.asarray(out0.pos), np.asarray(out1.pos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s0.moments), np.asarray(s1.moments),
                               atol=1e-6)


def test_mirror_and_frame_roundtrip(tmp_path, key):
    from raytracetorch_tpu import Scene
    scene = Scene([SphericalMirror(c1=-0.025, d=8.0,
                                   rotation=[0.1, 0.0, 0.0],
                                   translation=[0.0, 1.0, 40.0],
                                   name='m')], n_bounces=3)
    path = tmp_path / 'mirror.rtt'
    save_project(str(path), scene)
    loaded = load_scene(str(path))
    assert not loaded.sequential
    p = loaded.init_params()
    np.testing.assert_allclose(np.asarray(p['m']['rot_vec']),
                               [0.1, 0.0, 0.0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(p['m']['trans']),
                               [0.0, 1.0, 40.0], atol=1e-7)
    np.testing.assert_allclose(float(p['m']['c']), -0.025, atol=1e-9)


def test_version_gate(tmp_path):
    import json
    bad = tmp_path / 'bad.rtt'
    bad.write_text(json.dumps({'version': '9.9', 'elements': []}))
    with pytest.raises(ValueError, match='Unsupported project version'):
        load_project(str(bad))
    noversion = tmp_path / 'nv.rtt'
    noversion.write_text(json.dumps({'elements': []}))
    with pytest.raises(ValueError, match='Not a valid project file'):
        load_project(str(noversion))


def test_param_checkpoint_roundtrip(tmp_path):
    scene = _scene()
    p = scene.init_params()
    p['lens']['c1'] = jnp.float32(0.0777)
    path = str(tmp_path / 'design.npz')
    save_params(path, p)
    p2 = load_params(path)
    np.testing.assert_allclose(float(p2['lens']['c1']), 0.0777, rtol=1e-6)
    assert set(p2.keys()) == set(p.keys())
    for el in p:
        assert set(p2[el].keys()) == set(p[el].keys())


def test_new_elements_roundtrip(tmp_path, key):
    """Aspheres + dispersive doublets survive project-file serialization."""
    from raytracetorch_tpu import AsphericLens, DoubletLens
    scene = SequentialScene([
        AsphericLens(c1=0.0167, c2=-0.0028, d=25.4, t=4.0,
                     ior_glass=1.5168, k1=-0.8, a1=(1e-6, 2e-9),
                     k1_grad=True, name='asph'),
        DoubletLens(c1=0.02, c2=-0.025, c3=-0.004, d=20.0, t1=4.0, t2=2.0,
                    ior_glass1=1.5168, ior_glass2=1.6727,
                    abbe_vd1=64.17, abbe_vd2=32.25, name='achro',
                    translation=[0, 0, 30.0]),
    ])
    path = tmp_path / 'chromatic.rtt'
    save_project(str(path), scene)
    loaded = load_scene(str(path))
    lp = loaded.init_params()
    np.testing.assert_allclose(float(lp['asph']['k1']), -0.8, atol=1e-7)
    np.testing.assert_allclose(np.asarray(lp['asph']['a1'])[:2],
                               [1e-6, 2e-9], rtol=1e-6)
    assert loaded.find_element('achro').abbe_vd1 == 64.17
    assert loaded.trainable()['asph']['k1'] is True

    # identical physics after the round trip (chromatic ray)
    p0 = scene.init_params()
    from raytracetorch_tpu import Rays
    r = Rays.create([[0.0, 2.0, -10.0]], [[0.0, 0.0, 1.0]],
                    wavelength=[0.4861])
    o0, _, _ = scene.simulate(p0, r, key)
    o1, _, _ = loaded.simulate(lp, r, key)
    np.testing.assert_allclose(np.asarray(o0.pos), np.asarray(o1.pos),
                               atol=1e-6)
