"""OPL tracking + wavefront analysis tests."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, Rays, SequentialScene,
                               SingletLens)
from raytracetorch_tpu.utils.wavefront import (best_focus, wavefront_rms,
                                               zernike_name)


def _scene(**kw):
    return SequentialScene([SingletLens(
        c1=0.016667, c2=-0.00283, d=25.4, t=4.0, ior_glass=1.5168,
        name='lens', **kw)])


def test_opl_accumulates_glass_path(key):
    """An axial ray's OPL is air path + n * glass thickness exactly."""
    scene = _scene()
    p = scene.init_params()
    r = Rays.create([[0.0, 0.0, -10.0]], [[0.0, 0.0, 1.0]])
    out, _, aux = scene.simulate(p, r, key, track_opl=True)
    # path: 10-2=8 air to front vertex, 4 glass, then edge cylinder misses
    expect = 8.0 + 1.5168 * 4.0
    np.testing.assert_allclose(float(aux['opl'][0]), expect, rtol=1e-6)
    np.testing.assert_allclose(float(aux['n_final'][0]), 1.0, rtol=1e-6)


def test_best_focus_matches_axis_crossing(key):
    scene = _scene()
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(1.0),
                               translation=[0, 0, -10.0]).sample(key, 500)
    out, _, aux = scene.simulate(p, rays, key, track_opl=True)
    F = np.asarray(best_focus(out))
    # paraxial focus ~ z = 2 + bfl = 2 + 97.31
    np.testing.assert_allclose(F[2], 99.3, atol=0.3)
    np.testing.assert_allclose(F[:2], 0.0, atol=1e-3)


def test_wavefront_rms_tracks_aberration(key):
    """Wavefront error grows ~r^4 with aperture (spherical aberration) and
    is tiny for a paraxial pencil."""
    scene = _scene()
    p = scene.init_params()

    def wfe(radius):
        rays = CollimatedDisk.make(radius=jnp.float32(radius),
                                   translation=[0, 0, -10.0]).sample(key,
                                                                     4000)
        out, _, aux = scene.simulate(p, rays, key, track_opl=True)
        return float(wavefront_rms(out, aux['opl']))

    small, large = wfe(1.0), wfe(8.0)
    # r=1 sits at the f32 OPL quantization floor (~1e-5 of a ~111-unit
    # path); r=8 shows genuine balanced spherical aberration, consistent
    # with the Seidel estimate W040/(6 sqrt 5) ~ 1e-4 for this f/6 lens
    assert small < 5e-5
    assert 5e-5 < large < 1e-3
    assert large > small * 5


def test_refocus_absorbs_reference_tilt(key):
    """refocus=True re-solves the reference sphere center, so a reference
    point displaced laterally off the true focus (pure wavefront TILT —
    several waves for a 0.1-unit offset) must not inflate the RMS; about
    the true focus both modes agree."""
    scene = _scene()
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, -10.0]).sample(key, 4000)
    out, _, aux = scene.simulate(p, rays, key, track_opl=True)
    F = best_focus(out)
    at_f = float(wavefront_rms(out, aux['opl'], point=F))
    off = F + jnp.array([0.1, 0.0, 0.0])
    plain = float(wavefront_rms(out, aux['opl'], point=off))
    refoc = float(wavefront_rms(out, aux['opl'], point=off, refocus=True))
    assert plain > 20 * at_f            # tilt dominates the naive RMS
    assert refoc < at_f + 2e-5          # ...and is fully projected out
    both = float(wavefront_rms(out, aux['opl'], point=F, refocus=True))
    assert both <= at_f + 1e-7          # refocus never increases the RMS


def test_zernike_names():
    assert zernike_name(4) == 'defocus'
    assert zernike_name(11) == 'spherical'
    assert zernike_name(22) == 'spherical2'
    assert zernike_name(25) == 'z25'


def test_wavefront_differentiable(key):
    scene = _scene(c1_grad=True, c2_grad=True)
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(6.0),
                               translation=[0, 0, -10.0]).sample(key, 512)

    def loss(pp):
        out, _, aux = scene.simulate(pp, rays, key, track_opl=True)
        return wavefront_rms(out, aux['opl'])

    g = jax.grad(loss)(p)
    assert np.isfinite(float(g['lens']['c1']))
    assert float(g['lens']['c1']) != 0.0
