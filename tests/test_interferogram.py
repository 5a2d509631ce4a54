"""Interferogram simulation: fringe counting against closed forms, and
an end-to-end traced-wavefront interferogram of a defocused singlet.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                               SequentialScene, SingletLens, interferogram)

LAM = 0.55e-3        # mm


def _disk_maps(n=128):
    u = (np.arange(n) + 0.5) / n * 2 - 1
    X, Y = np.meshgrid(u, u, indexing='xy')
    r2 = X * X + Y * Y
    amp = (r2 <= 1.0).astype(np.float32)
    return jnp.asarray(r2, jnp.float32), jnp.asarray(amp)


def _count_dark_rings(img, amp):
    """Dark-fringe count along the +x radius from the center."""
    n = img.shape[0]
    row = np.asarray(img)[n // 2, n // 2:]
    mask = np.asarray(amp)[n // 2, n // 2:] > 0
    row = row[mask]
    dark = row < 0.25
    return int(np.count_nonzero(dark[1:] & ~dark[:-1]) + dark[0])


def test_defocus_ring_count():
    """k waves of defocus peak-to-valley = k dark rings (null test)."""
    r2, amp = _disk_maps()
    for k in (3, 7):
        opd = k * LAM * r2            # k waves at the pupil edge
        img = interferogram(opd, amp, LAM)
        assert _count_dark_rings(img, amp) == k
    # perfect null: uniformly bright (normalized peak 1)
    img0 = np.asarray(interferogram(jnp.zeros_like(r2), amp, LAM))
    inside = np.asarray(amp) > 0
    np.testing.assert_allclose(img0[inside], 1.0, atol=1e-6)
    assert img0[~inside].max() == pytest.approx(0.25, abs=1e-6)


def test_tilt_fringes():
    """N tilt fringes across a flat pupil = N dark bands along x."""
    r2, amp = _disk_maps()
    img = np.asarray(interferogram(jnp.zeros_like(r2), amp, LAM,
                                   tilt_fringes=6.0))
    n = img.shape[0]
    row = img[n // 2, :]
    mask = np.asarray(amp)[n // 2, :] > 0
    dark = (row < 0.25) & mask
    count = int(np.count_nonzero(dark[1:] & ~dark[:-1]))
    assert count == 6


def test_traced_defocus_interferogram(key):
    """End to end: trace a singlet, reference the pupil OPD to a point
    displaced dz from the traced best focus, and count the defocus
    rings predicted by W_pv = dz/(8 F#^2)."""
    from raytracetorch_tpu.utils.psf import pupil_from_trace
    from raytracetorch_tpu.utils.wavefront import best_focus
    f, r_pupil, dz = 60.0, 3.0, 1.2
    c = 1.0 / (2 * (1.5168 - 1) * f)
    sc = SequentialScene([
        SingletLens(c1=c, c2=-c, d=8.0, t=0.5, ior_glass=1.5168,
                    name='lens'),
        SensorElement(radius=5.0, translation=[0, 0, f + dz], name='s')])
    rays = CollimatedDisk.make(radius=jnp.float32(r_pupil),
                               translation=[0, 0, -5.0]).sample(key,
                                                                200_000)
    out, _, aux = sc.simulate(sc.init_params(), rays, key, track_opl=True)
    z_star = np.asarray(best_focus(out))
    point = jnp.asarray(z_star + np.array([0.0, 0.0, dz]), jnp.float32)
    opd, amp = pupil_from_trace(rays, out, aux['opl'], r_pupil, n=96,
                                point=point)
    img = interferogram(opd, amp, LAM)
    rings = _count_dark_rings(img, amp)
    f_number = f / (2 * r_pupil)
    w_pv_waves = dz / (8 * f_number ** 2) / LAM
    assert rings == pytest.approx(w_pv_waves, abs=1.5)
