"""Zemax .zmx import: parse, element grouping, placement, physics.

No reference counterpart (the torch reference only has its own .rtt
JSON, reference project.py:1-60).  Correctness anchors: the imported
scene's first-order EFL must match the thick-lens analytics of the
prescription, and a traced axial pencil must focus on the imported
image plane.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (AsphericLens, CircularAperture,
                               CollimatedDisk, DoubletLens, SensorElement,
                               SingletLens)
from raytracetorch_tpu.utils.zemax import (ZmxSurface, load_zmx, parse_zmx,
                                           save_zmx)

# An f/5-ish N-BK7 biconvex singlet with a front stop, bfl-positioned
# image plane.  Layout: OBJ - STOP - lens(2 faces) - IMA.
SINGLET_ZMX = """\
VERS 140124 258 25216
MODE SEQ
NAME imported singlet
UNIT MM X W X CM MR CPMM
ENPD 8.0
WAVM 1 0.48613270 1
WAVM 2 0.58756180 1
WAVM 3 0.65627250 1
PWAV 2
SURF 0
  TYPE STANDARD
  CURV 0.0
  DISZ INFINITY
SURF 1
  STOP
  TYPE STANDARD
  CURV 0.0
  DISZ 2.0
  DIAM 4.0 1 0 0 1 ""
SURF 2
  TYPE STANDARD
  CURV 0.02
  DISZ 3.0
  GLAS N-BK7 0 0 1.516800 64.167336
  DIAM 6.0 1 0 0 1 ""
SURF 3
  TYPE STANDARD
  CURV -0.02
  DISZ 47.875187
  DIAM 6.0 1 0 0 1 ""
SURF 4
  TYPE STANDARD
  CURV 0.0
  DISZ 0.0
  DIAM 2.0 1 0 0 1 ""
"""

# Cemented achromat with one cataloged and one GLAS-line-only glass.
DOUBLET_ZMX = """\
MODE SEQ
UNIT MM X W X CM MR CPMM
ENPD 10.0
WAVM 1 0.58756180 1
SURF 0
  TYPE STANDARD
  DISZ INFINITY
SURF 1
  TYPE STANDARD
  CURV 0.016
  DISZ 4.0
  GLAS N-BK7 0 0 1.5168 64.17
  DIAM 7.0
SURF 2
  TYPE STANDARD
  CURV -0.016
  DISZ 2.0
  GLAS MYSTERYFLINT 0 0 1.6012 38.47
  DIAM 7.0
SURF 3
  TYPE STANDARD
  CURV -0.004
  DISZ 104.481651
  DIAM 7.0
SURF 4
  TYPE STANDARD
  DISZ 0.0
  DIAM 3.0
"""

ASPH_ZMX = """\
MODE SEQ
UNIT MM X W X CM MR CPMM
ENPD 8.0
WAVM 1 0.58756180 1
SURF 0
  TYPE STANDARD
  DISZ INFINITY
SURF 1
  TYPE EVENASPH
  CURV 0.02
  CONI -0.6
  PARM 2 1.0E-05
  PARM 3 -2.0E-08
  DISZ 3.0
  GLAS N-BK7 0 0 1.5168 64.17
  DIAM 6.0
SURF 2
  TYPE STANDARD
  CURV -0.02
  DISZ 47.0
  DIAM 6.0
SURF 3
  TYPE STANDARD
  DISZ 0.0
  DIAM 2.0
"""


def test_parse_keywords():
    surfs, meta = parse_zmx(SINGLET_ZMX)
    assert meta['name'] == 'imported singlet'
    assert meta['enpd'] == 8.0
    assert meta['wavelengths_um'] == [0.4861327, 0.5875618, 0.6562725]
    assert meta['primary_wave_um'] == pytest.approx(0.5875618)
    assert [s.index for s in surfs] == [0, 1, 2, 3, 4]
    assert surfs[1].is_stop and surfs[1].semi_diam == 4.0
    assert surfs[2].glass == 'N-BK7' and surfs[2].curv == 0.02
    assert surfs[2].nd == pytest.approx(1.5168)
    assert surfs[0].disz == float('inf')


def test_parse_utf16_bytes():
    surfs, meta = parse_zmx(SINGLET_ZMX.encode('utf-16'))
    assert len(surfs) == 5 and meta['enpd'] == 8.0


def test_unit_scaling():
    cm = SINGLET_ZMX.replace('UNIT MM', 'UNIT CM')
    surfs, meta = parse_zmx(cm)
    assert meta['enpd'] == 80.0
    assert surfs[2].curv == pytest.approx(0.002)
    assert surfs[2].disz == pytest.approx(30.0)
    assert surfs[2].semi_diam == pytest.approx(60.0)


def test_singlet_import_layout_and_efl(key):
    imp = load_zmx(SINGLET_ZMX)
    kinds = [type(e) for e in imp.scene.elements]
    assert kinds == [CircularAperture, SingletLens, SensorElement]
    stop, lens, image = imp.scene.elements
    # placement: stop at z=0, lens vertices at z=2 (front) / 5 (back),
    # image at 5 + bfl (the prescription puts it at paraxial focus)
    assert np.allclose(np.asarray(stop._trans_init), [0, 0, 0.0])
    assert np.allclose(np.asarray(lens._trans_init), [0, 0, 3.5])
    assert np.allclose(np.asarray(image._trans_init), [0, 0, 52.875187])
    assert lens.sellmeier is not None        # N-BK7 is cataloged

    p = imp.scene.init_params()
    fo = imp.scene.first_order(p)
    # thick biconvex: P = (n-1)(c1 - c2 + (n-1) c1 c2 t / n)
    n = 1.5168
    P = (n - 1) * (0.02 + 0.02 - (n - 1) * 0.02 * 0.02 * 3.0 / n)
    assert float(fo.efl) == pytest.approx(1.0 / P, rel=1e-4)

    # an axial pencil focuses on the imported image plane (bfl ~ 47.04)
    rays = CollimatedDisk.make(radius=jnp.float32(0.5),
                               translation=[0, 0, -5.0]).sample(key, 800)
    out, sensors, _ = imp.scene.simulate(p, rays, key)
    assert float(sensors.spot_rms(0)[0]) < 2e-3


def test_doublet_import_and_glass_fallback(key):
    imp = load_zmx(DOUBLET_ZMX)
    lens = imp.scene.elements[0]
    assert isinstance(lens, DoubletLens)
    assert lens.sellmeier1 is not None       # cataloged -> Sellmeier
    assert lens.sellmeier2 is None           # unknown -> GLAS-line Abbe
    assert lens.abbe_vd2 == pytest.approx(38.47)
    # center: vertices at 0/4/6 -> center z = 3
    assert np.allclose(np.asarray(lens._trans_init), [0, 0, 3.0])
    p = imp.scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(3.0),
                               translation=[0, 0, -5.0]).sample(key, 2000)
    out, sensors, _ = imp.scene.simulate(p, rays, key)
    assert float(sensors.spot_rms(0)[0]) < 0.05
    assert float(jnp.sum(out.intensity)) > 0


def test_asphere_import(key):
    imp = load_zmx(ASPH_ZMX)
    lens = imp.scene.elements[0]
    assert isinstance(lens, AsphericLens)
    p = imp.scene.init_params()
    assert float(p['lens1_s1']['k1']) == pytest.approx(-0.6)
    assert float(p['lens1_s1']['a1'][0]) == pytest.approx(1e-5)
    assert float(p['lens1_s1']['a1'][1]) == pytest.approx(-2e-8)
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -5.0]).sample(key, 500)
    _, sensors, _ = imp.scene.simulate(p, rays, key)
    assert np.isfinite(float(sensors.spot_rms(0)[0]))


def test_import_is_differentiable(key):
    """The point of importing: the prescription lands in a params pytree
    jax.grad understands."""
    imp = load_zmx(SINGLET_ZMX)
    p = imp.scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(3.0),
                               translation=[0, 0, -5.0]).sample(key, 400)

    def loss(pp):
        _, sensors, _ = imp.scene.simulate(pp, rays, key)
        return sensors.spot_rms(0)[0] ** 2

    g = jax.grad(loss)(p)
    lg = g['lens1_s2']
    assert np.isfinite(float(lg['c1'])) and float(lg['c1']) != 0.0


def test_export_roundtrip_singlet():
    """save_zmx(load_zmx(x)) re-imports to the same first-order system:
    EFL, element classes, vertex placement, catalog glass."""
    imp = load_zmx(SINGLET_ZMX)
    p = imp.scene.init_params()
    text = save_zmx(imp.scene, p, wavelengths_um=[0.5875618], enpd=8.0)
    imp2 = load_zmx(text)
    assert [type(e) for e in imp2.scene.elements] == \
        [type(e) for e in imp.scene.elements]
    for a, b in zip(imp.scene.elements, imp2.scene.elements):
        assert np.allclose(a._trans_init, b._trans_init, atol=1e-6)
    assert imp2.scene.elements[1].sellmeier is not None   # named N-BK7
    p2 = imp2.scene.init_params()
    f1 = float(imp.scene.first_order(p).efl)
    f2 = float(imp2.scene.first_order(p2).efl)
    assert f2 == pytest.approx(f1, rel=1e-6)


def test_export_carries_optimized_params_and_aspheres(tmp_path):
    """Export uses the LIVE params (an optimized curvature survives) and
    EVENASPH conic/terms roundtrip."""
    imp = load_zmx(ASPH_ZMX)
    p = imp.scene.init_params()
    p['lens1_s1']['c1'] = jnp.asarray(0.025)      # 'optimized' curvature
    path = tmp_path / 'out.zmx'
    save_zmx(imp.scene, p, path=str(path))
    imp2 = load_zmx(str(path))
    p2 = imp2.scene.init_params()
    assert float(p2['lens1_s1']['c1']) == pytest.approx(0.025)
    assert float(p2['lens1_s1']['k1']) == pytest.approx(-0.6)
    assert float(p2['lens1_s1']['a1'][0]) == pytest.approx(1e-5)
    assert float(p2['lens1_s1']['a1'][1]) == pytest.approx(-2e-8)


def test_export_doublet_glass_fallback_roundtrip():
    imp = load_zmx(DOUBLET_ZMX)
    p = imp.scene.init_params()
    text = save_zmx(imp.scene, p)
    assert 'N-BK7' in text                 # catalog reverse lookup
    imp2 = load_zmx(text)
    lens = imp2.scene.elements[0]
    assert isinstance(lens, DoubletLens)
    assert lens.abbe_vd2 == pytest.approx(38.47, abs=1e-3)
    f1 = float(imp.scene.first_order(p).efl)
    f2 = float(imp2.scene.first_order(imp2.scene.init_params()).efl)
    assert f2 == pytest.approx(f1, rel=1e-5)


def test_export_rejects_tilted():
    imp = load_zmx(SINGLET_ZMX)
    p = imp.scene.init_params()
    p['lens1_s2']['rot_vec'] = jnp.asarray([0.1, 0.0, 0.0])
    with pytest.raises(ValueError, match='axial'):
        save_zmx(imp.scene, p)


def test_unsupported_constructs_raise():
    with pytest.raises(ValueError, match='Mangin'):
        # a mirror surface INSIDE a glass run
        load_zmx(DOUBLET_ZMX.replace('GLAS MYSTERYFLINT 0 0 1.6012 38.47',
                                     'GLAS MIRROR'))
    with pytest.raises(ValueError, match='TYPE COORDBRK'):
        load_zmx(SINGLET_ZMX.replace('TYPE STANDARD\n  CURV 0.02',
                                     'TYPE COORDBRK\n  CURV 0.02'))
    with pytest.raises(ValueError, match='PARM 1'):
        load_zmx(ASPH_ZMX.replace('PARM 2 1.0E-05', 'PARM 1 1.0E-05'))
    with pytest.raises(ValueError, match='MODE'):
        load_zmx(SINGLET_ZMX.replace('MODE SEQ', 'MODE NSC'))
    with pytest.raises(ValueError, match='glass run'):
        # glass continues into the image plane
        load_zmx(DOUBLET_ZMX.replace('  CURV -0.004\n  DISZ 104.481651\n'
                                     '  DIAM 7.0',
                                     '  CURV -0.004\n  DISZ 104.481651\n'
                                     '  GLAS N-BK7 0 0 1.5168 64.17\n'
                                     '  DIAM 7.0'))


# -- coordinate breaks ------------------------------------------------------

CB_TILT_ZMX = """\
MODE SEQ
UNIT MM X W X CM MR CPMM
ENPD 6.0
WAVM 1 0.58756180 1
SURF 0
  TYPE STANDARD
  DISZ INFINITY
SURF 1
  TYPE COORDBRK
  PARM 1 0.0
  PARM 2 0.0
  PARM 3 5.0
  DISZ 4.0
SURF 2
  TYPE STANDARD
  CURV 0.02
  DISZ 3.0
  GLAS N-BK7 0 0 1.5168 64.17
  DIAM 6.0
SURF 3
  TYPE STANDARD
  CURV -0.02
  DISZ 2.0
  DIAM 6.0
SURF 4
  TYPE COORDBRK
  PARM 3 -5.0
  PARM 6 1
  DISZ 40.0
SURF 5
  TYPE STANDARD
  DISZ 0.0
  DIAM 8.0
"""


def test_coordbrk_tilt_matches_rotated_element(key):
    """A 5-degree tilt-about-x COORDBRK must place the lens exactly like
    a directly-built SingletLens with rotation=[5 deg, 0, 0] at the
    frame-advanced center — trace parity to float precision."""
    import math

    from raytracetorch_tpu import SequentialScene
    imp = load_zmx(CB_TILT_ZMX)
    lens = imp.scene.elements[0]
    th = math.radians(5.0)
    assert np.allclose(lens._rot_init, [th, 0, 0], atol=1e-12)
    # frame: CB advances 4 along the TILTED z, lens center 1.5 further
    ez = np.array([0.0, -math.sin(th), math.cos(th)])
    np.testing.assert_allclose(lens._trans_init, 5.5 * ez, atol=1e-9)

    direct = SequentialScene([
        SingletLens(c1=0.02, c2=-0.02, d=12.0, t=3.0, ior_glass=1.5168,
                    sellmeier=lens.sellmeier,
                    translation=list(5.5 * ez),
                    rotation=[th, 0.0, 0.0], name='lens1_s2'),
        SensorElement(radius=8.0,
                      translation=list(np.asarray(
                          imp.scene.elements[-1]._trans_init)),
                      name='image')])
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -6.0]).sample(key, 700)
    o1, _, _ = imp.scene.simulate(imp.scene.init_params(), rays, key)
    o2, _, _ = direct.simulate(direct.init_params(), rays, key)
    np.testing.assert_allclose(np.asarray(o1.px), np.asarray(o2.px),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1.py), np.asarray(o2.py),
                               atol=1e-6)


def test_coordbrk_restore_pair_returns_to_axis():
    """The (CB, negated-CB with order flag 1) bracket is the standard
    'tilt this element' idiom: after the second break the frame must be
    EXACTLY axial again (image plane un-rotated, on-axis)."""
    imp = load_zmx(CB_TILT_ZMX)
    image = imp.scene.elements[-1]
    assert np.allclose(image._rot_init, [0, 0, 0], atol=1e-12)
    # z: 4 (tilted, but restored before advancing) ... the restore CB's
    # own DISZ runs along the RESTORED axis, so x stays 0
    t = np.asarray(image._trans_init)
    assert abs(t[0]) < 1e-9
    assert t[2] > 40.0


def test_coordbrk_decenter_shifts_focus(key):
    """A pure y-decenter of the lens puts the focal spot on the lens's
    own displaced axis: centroid y ~ dy."""
    dy = 0.8
    txt = CB_TILT_ZMX.replace('  PARM 2 0.0\n  PARM 3 5.0',
                              f'  PARM 2 {dy}\n  PARM 3 0.0') \
                     .replace('  PARM 3 -5.0\n  PARM 6 1',
                              f'  PARM 2 {-dy}\n  PARM 6 1') \
                     .replace('DISZ 40.0', 'DISZ 45.875187')  # at focus
    imp = load_zmx(txt)
    assert np.allclose(imp.scene.elements[0]._trans_init[:2], [0.0, dy])
    p = imp.scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -6.0]).sample(key, 4000)
    out, sensors, _ = imp.scene.simulate(p, rays, key)
    cy = float(sensors.centroid(0)[0][1])
    assert cy == pytest.approx(dy, abs=0.05)


# -- fold mirrors -----------------------------------------------------------

FOLD_ZMX = """\
MODE SEQ
UNIT MM X W X CM MR CPMM
ENPD 6.0
WAVM 1 0.58756180 1
SURF 0
  TYPE STANDARD
  DISZ INFINITY
SURF 1
  TYPE STANDARD
  DISZ 10.0
SURF 2
  TYPE COORDBRK
  PARM 3 45.0
  DISZ 0.0
SURF 3
  TYPE STANDARD
  CURV 0.0
  DISZ 0.0
  GLAS MIRROR
  DIAM 8.0
SURF 4
  TYPE COORDBRK
  PARM 3 45.0
  DISZ -10.0
SURF 5
  TYPE STANDARD
  CURV -0.02
  DISZ -3.0
  GLAS N-BK7 0 0 1.5168 64.17
  DIAM 6.0
SURF 6
  TYPE STANDARD
  CURV 0.02
  DISZ -47.875187
  DIAM 6.0
SURF 7
  TYPE STANDARD
  DISZ 0.0
  DIAM 4.0
"""


def test_fold_mirror_import_matches_unfolded(key):
    """A 45-degree flat fold + singlet (Zemax negative thicknesses,
    negated curvatures) must image exactly like the unfolded system:
    same spot RMS at the same optical distances, centroid on axis."""
    from raytracetorch_tpu import SphericalMirror
    imp = load_zmx(FOLD_ZMX)
    kinds = [type(e).__name__ for e in imp.scene.elements]
    assert kinds == ['SphericalMirror', 'SingletLens', 'SensorElement']
    mirror, lens, image = imp.scene.elements
    np.testing.assert_allclose(mirror._trans_init, [0, 0, 10.0], atol=1e-9)
    # after the fold the beam travels +y: lens center at y = 10 + 1.5
    np.testing.assert_allclose(lens._trans_init, [0, 11.5, 10.0],
                               atol=1e-9)
    np.testing.assert_allclose(image._trans_init,
                               [0, 13 + 47.875187, 10.0], atol=1e-6)

    p = imp.scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -5.0]).sample(key, 3000)
    out, sensors, _ = imp.scene.simulate(p, rays, key)
    rms_fold = float(sensors.spot_rms(0)[0])
    cx, cy = (float(v) for v in np.asarray(sensors.centroid(0)[0])[:2])
    assert abs(cx) < 1e-4 and abs(cy) < 1e-4     # on the folded axis
    assert float(jnp.sum(out.intensity)) > 2000  # fold did not clip

    flat = load_zmx(SINGLET_ZMX)                 # same lens, unfolded
    pf = flat.scene.init_params()
    rays_f = CollimatedDisk.make(radius=jnp.float32(2.0),
                                 translation=[0, 0, -5.0]).sample(key, 3000)
    _, sens_f, _ = flat.scene.simulate(pf, rays_f, key)
    rms_flat = float(sens_f.spot_rms(0)[0])
    np.testing.assert_allclose(rms_fold, rms_flat, rtol=1e-3)


NORMAL_MIRROR_ZMX = """\
MODE SEQ
UNIT MM X W X CM MR CPMM
ENPD 1.0
WAVM 1 0.58756180 1
SURF 0
  TYPE STANDARD
  DISZ INFINITY
SURF 1
  TYPE STANDARD
  DISZ 10.0
SURF 2
  TYPE STANDARD
  CURV -0.01
  DISZ -50.0
  GLAS MIRROR
  DIAM 4.0
SURF 3
  TYPE STANDARD
  DISZ 0.0
  DIAM 2.0
"""


def test_concave_normal_incidence_mirror_focuses(key):
    """A concave mirror hit at normal incidence (R = -100 in Zemax
    convention, beam reversing straight back) focuses at f = 50 before
    the mirror — exercises the 180-degree frame flip and negative
    thickness after the fold."""
    imp = load_zmx(NORMAL_MIRROR_ZMX)
    mirror, image = imp.scene.elements
    assert np.allclose(mirror._trans_init, [0, 0, 10.0])
    np.testing.assert_allclose(np.asarray(image._trans_init),
                               [0, 0, -40.0], atol=1e-9)
    p = imp.scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(0.5),
                               translation=[0, 0, -5.0]).sample(key, 1500)
    out, sensors, _ = imp.scene.simulate(p, rays, key)
    assert float(jnp.sum(out.intensity)) > 1000
    assert float(sensors.spot_rms(0)[0]) < 2e-3   # on-axis sphere: tiny SA


RC_ZMX = """\
MODE SEQ
NAME cassegrain rc
UNIT MM X W X CM MR CPMM
ENPD 50.0
WAVM 1 0.58756180 1
SURF 0
  TYPE STANDARD
  CURV 0.0
  DISZ INFINITY
SURF 1
  TYPE STANDARD
  CURV -0.01
  CONI -1.0
  DISZ -40.0
  GLAS MIRROR
  DIAM 30.0 1 0 0 1 ""
SURF 2
  TYPE STANDARD
  CURV -0.04
  CONI -2.25
  DISZ 50.0
  GLAS MIRROR
  DIAM 8.0 1 0 0 1 ""
SURF 3
  TYPE STANDARD
  CURV 0.0
  DISZ 0.0
  DIAM 2.0 1 0 0 1 ""
"""

MANGIN_ZMX = """\
MODE SEQ
NAME mangin searchlight
UNIT MM X W X CM MR CPMM
ENPD 10.0
WAVM 1 0.58756180 1
SURF 0
  TYPE STANDARD
  CURV 0.0
  DISZ INFINITY
SURF 1
  TYPE STANDARD
  CURV -0.012
  DISZ 2.0
  GLAS N-BK7 0 0 1.516800 64.167336
  DIAM 15.0 1 0 0 1 ""
SURF 2
  TYPE STANDARD
  CURV -0.01
  DISZ -2.0
  GLAS MIRROR
  DIAM 15.0 1 0 0 1 ""
SURF 3
  TYPE STANDARD
  CURV -0.012
  DISZ -53.246
  DIAM 15.0 1 0 0 1 ""
SURF 4
  TYPE STANDARD
  CURV 0.0
  DISZ 0.0
  DIAM 3.0 1 0 0 1 ""
"""


def test_rc_telescope_import_and_focus(key):
    """A two-conic-mirror Cassegrain .zmx (parabolic primary CONI -1,
    hyperbolic secondary CONI -2.25 with the stigmatic m=5 prescription)
    imports as ConicMirror elements and focuses an annular beam at its
    image plane EXACTLY (hyperboloid foci property; same analytic system
    as tests/test_conic_mirror.py, here arriving through the importer
    incl. the mirror-parity bookkeeping)."""
    from raytracetorch_tpu import ConicMirror, Rays
    from raytracetorch_tpu.utils.zemax import load_zmx

    imp = load_zmx(RC_ZMX)
    kinds = [type(el).__name__ for el in imp.elements]
    assert kinds == ['ConicMirror', 'ConicMirror', 'SensorElement']
    sc = imp.scene
    p = sc.init_params()
    # secondary at z = -40, image at z = +10
    np.testing.assert_allclose(
        np.asarray(p[imp.elements[1].name]['trans'])[2], -40.0)
    np.testing.assert_allclose(
        np.asarray(p[imp.elements[2].name]['trans'])[2], 10.0)
    xs, ys = [], []
    for r in (15.0, 20.0, 25.0):
        for a in np.linspace(0, 2 * np.pi, 8, endpoint=False):
            xs.append(r * np.cos(a))
            ys.append(r * np.sin(a))
    pos = np.stack([xs, ys, np.full(len(xs), -30.0)], -1)
    d = np.tile([[0.0, 0.0, 1.0]], (len(xs), 1))
    out, sens, _ = sc.simulate(p, Rays.create(pos, d), key)
    assert float(jnp.sum(out.intensity)) == len(xs)
    assert float(sens.spot_rms(0)[0]) < 1e-3


def test_mangin_import_and_focus(key):
    """The three-surface Mangin double pass folds onto ManginMirror and
    focuses a paraxial pencil on the imported image plane (placed at the
    element's exact paraxial crossing)."""
    from raytracetorch_tpu import ManginMirror, Rays
    from raytracetorch_tpu.utils.zemax import load_zmx

    imp = load_zmx(MANGIN_ZMX)
    kinds = [type(el).__name__ for el in imp.elements]
    assert kinds == ['ManginMirror', 'SensorElement']
    sc = imp.scene
    p = sc.init_params()
    el = imp.elements[0]
    np.testing.assert_allclose(np.asarray(p[el.name]['trans'])[2], 1.0)
    np.testing.assert_allclose(float(p[el.name]['t']), 2.0)
    np.testing.assert_allclose(
        np.asarray(p[imp.elements[1].name]['trans'])[2], -53.246)
    heights = np.array([0.1, 0.2, 0.3, 0.4])
    pos = np.stack([heights, np.zeros(4), np.full(4, -5.0)], -1)
    out, sens, _ = sc.simulate(p, Rays.create(
        pos, np.tile([[0.0, 0.0, 1.0]], (4, 1))), key)
    assert float(jnp.sum(out.intensity)) == 4.0
    assert float(sens.spot_rms(0)[0]) < 2e-4


def test_zmx_wedged_mangin_raises():
    bad = MANGIN_ZMX.replace('SURF 3\n  TYPE STANDARD\n  CURV -0.012',
                             'SURF 3\n  TYPE STANDARD\n  CURV -0.015')
    from raytracetorch_tpu.utils.zemax import load_zmx
    with pytest.raises(ValueError, match='exit face curvature'):
        load_zmx(bad)


def test_curved_stop_imports(key):
    """A STOP surface with CURV imports as a curved CircularAperture:
    the opening sits on the spherical cap (hit z = sag of hit r), and
    rays outside the opening are absorbed."""
    from raytracetorch_tpu import CircularAperture, Rays
    from raytracetorch_tpu.utils.zemax import load_zmx

    curved = SINGLET_ZMX.replace(
        'SURF 1\n  STOP\n  TYPE STANDARD\n  CURV 0.0',
        'SURF 1\n  STOP\n  TYPE STANDARD\n  CURV 0.05')
    imp = load_zmx(curved)
    stop = imp.elements[0]
    assert isinstance(stop, CircularAperture)
    p0 = stop.init_params()
    assert float(p0['c']) == pytest.approx(0.05)

    # geometry: a lone curved stop traced directly.  Under ``invert``
    # the iris plate exists only OUTSIDE the opening (reference
    # phys/filter.py:24-33 semantics): the in-opening ray flies by with
    # no recorded hit, the blocked ray's recorded hit position lies on
    # the cap z(r) = c r^2 / (1 + sqrt(1 - c^2 r^2)).
    sc = type(imp.scene)([CircularAperture(radius=4.0, curvature=0.05,
                                           invert=True, name='iris')])
    p = sc.init_params()
    r_in, r_out = 2.0, 4.5
    rays = Rays.create([[r_in, 0.0, -5.0], [r_out, 0.0, -5.0]],
                       [[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    out, _, aux = sc.simulate(p, rays, key, record_paths=True)
    inten = np.asarray(out.intensity)
    assert inten[0] == 1.0 and inten[1] == 0.0   # iris blocks outside
    paths = np.asarray(aux['paths'])             # [step, ray, 3]
    assert paths[1, 0, 2] == -5.0                # passer: no interaction
    hit_z = float(paths[1, 1, 2])
    c = 0.05
    sag = c * r_out ** 2 / (1 + np.sqrt(1 - c * c * r_out ** 2))
    np.testing.assert_allclose(hit_z, sag, atol=1e-6)
