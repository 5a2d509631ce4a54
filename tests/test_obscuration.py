"""ObscuredAperture: exact mask geometry, energy fraction, spider
diffraction spikes in the Fraunhofer PSF, fused-kernel support,
project-file roundtrip.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CollimatedDisk, IdealThinLens,
                               ObscuredAperture, SensorElement,
                               SequentialScene)
from raytracetorch_tpu.rays.ray import Rays

R, OBS, NV, VW = 4.0, 0.3, 4, 0.12


def _sc(**kw):
    return SequentialScene([ObscuredAperture(radius=R, obscuration=OBS,
                                             n_vanes=NV, vane_width=VW,
                                             name='pupil', **kw)])


def test_mask_geometry(key):
    """Point checks of every zone: open annulus, central obscuration,
    outside, on a vane, between vanes."""
    pts = {
        (2.0, 2.0): 1.0,           # open annulus (off every vane)
        (0.5, 0.4): 0.0,           # inside the 1.2-radius obscuration
        (4.2, 0.0): 0.0,           # outside the pupil
        (2.5, 0.03): 0.0,          # on the +x vane (|y| < 0.06)
        (0.0, -2.5): 0.0,          # on the -y vane
        (-2.5, 0.2): 1.0,          # clear of the -x vane (0.2 > 0.06)
    }
    xs = np.asarray([p[0] for p in pts])
    ys = np.asarray([p[1] for p in pts])
    rays = Rays.create(
        jnp.asarray(np.stack([xs, ys, np.full_like(xs, -3.0)], -1),
                    jnp.float32),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (len(pts), 3)))
    out, _, _ = _sc().simulate(_sc().init_params(), rays, key)
    np.testing.assert_allclose(np.asarray(out.intensity),
                               list(pts.values()), atol=1e-6)


def test_energy_fraction(key):
    """Transmitted energy ~ open area fraction: (1 - e^2) minus the
    vane area, on a uniform disk sample."""
    rays = CollimatedDisk.make(radius=jnp.float32(R),
                               translation=[0, 0, -3.0]).sample(key,
                                                                200_000)
    out, _, _ = _sc().simulate(_sc().init_params(), rays, key)
    frac = float(out.intensity.sum()) / 200_000
    area = math.pi * R * R
    vanes = NV * VW * (R - OBS * R) / area     # radial strips
    expect = (1 - OBS ** 2) - vanes
    assert frac == pytest.approx(expect, abs=0.004)


def test_spider_spikes_in_psf(key):
    """The 4-vane pupil puts the classic 4-spike star on the PSF:
    integrated flux along the spike axes is several times that of the
    SAME pupil without vanes (ring-position-robust comparison)."""
    from raytracetorch_tpu.utils.psf import diffraction_psf
    n = 128
    xs = (np.arange(n) + 0.5) / n * 2 * R - R
    X, Y = np.meshgrid(xs, xs, indexing='xy')
    x, y = X.reshape(-1), Y.reshape(-1)
    rays = Rays.create(
        jnp.asarray(np.stack([x, y, np.full_like(x, -3.0)], -1),
                    jnp.float32),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (x.shape[0], 3)))

    def psf_of(vw):
        sc = SequentialScene([ObscuredAperture(radius=R, obscuration=OBS,
                                               n_vanes=NV, vane_width=vw,
                                               name='pupil')])
        out, _, _ = sc.simulate(sc.init_params(), rays, key)
        amp = np.asarray(out.intensity).reshape(n, n)
        psf, _ = diffraction_psf(jnp.zeros((n, n)), jnp.asarray(amp),
                                 0.55e-3, 10.0)
        return np.asarray(psf)

    p_vane, p_clean = psf_of(0.25), psf_of(0.0)
    c = p_vane.shape[0] // 2
    band = slice(c + 30, c + 120)
    axis_vane = p_vane[c, band].sum() + p_vane[band, c].sum()
    axis_clean = p_clean[c, band].sum() + p_clean[band, c].sum()
    assert axis_vane > 5 * axis_clean


def test_fused_and_roundtrip(key, tmp_path):
    """Component-style mask runs in the fused kernel; ctor capture
    serializes the element through a project file."""
    sc = SequentialScene([
        ObscuredAperture(radius=R, obscuration=OBS, n_vanes=NV,
                         vane_width=VW, name='pupil'),
        IdealThinLens(focal=50.0, diameter=12.0, translation=[0, 0, 2.0],
                      name='lens'),
        SensorElement(radius=6.0, translation=[0, 0, 52.0], name='s')])
    p = sc.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(R),
                               translation=[0, 0, -3.0]).sample(key, 4096)
    out_x, sens_x, _ = sc.simulate(p, rays, key)
    out_f, sens_f, _ = sc.simulate_fused(p, rays, key, block_rows=4)
    np.testing.assert_allclose(np.asarray(out_f.intensity),
                               np.asarray(out_x.intensity), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sens_f.moments),
                               np.asarray(sens_x.moments), rtol=1e-4,
                               atol=1e-3)

    from raytracetorch_tpu import load_scene, save_project
    path = tmp_path / 'obsc.rtt'
    save_project(str(path), sc)
    sc2 = load_scene(str(path))
    out2, _, _ = sc2.simulate(sc2.init_params(), rays, key)
    np.testing.assert_allclose(np.asarray(out2.intensity),
                               np.asarray(out_x.intensity), atol=1e-6)


def test_ctor_validation():
    with pytest.raises(ValueError, match='obscuration'):
        ObscuredAperture(radius=4.0, obscuration=1.2)
    with pytest.raises(ValueError):
        ObscuredAperture(radius=4.0, vane_width=-0.1)
