"""Vector (polarization-resolved) PSF: scalar parity on a neutral
system, analyzer energy ratios, crossed-analyzer null.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CollimatedDisk, LinearPolarizer,
                               SensorElement, SequentialScene, SingletLens)
from raytracetorch_tpu.utils.psf import (diffraction_psf, pupil_from_trace,
                                         vector_psf,
                                         vector_pupil_from_trace)

LAM = 0.55e-3
F, R_P = 60.0, 3.0


def _trace(key, *extra):
    c = 1.0 / (2 * (1.5168 - 1) * F)
    sc = SequentialScene(list(extra) + [
        SingletLens(c1=c, c2=-c, d=8.0, t=0.5, ior_glass=1.5168,
                    translation=[0, 0, 10.0], name='lens'),
        SensorElement(radius=5.0, translation=[0, 0, F + 10.0], name='s')])
    rays = CollimatedDisk.make(radius=jnp.float32(R_P),
                               translation=[0, 0, -5.0]).sample(key,
                                                                150_000)
    out, _, aux = sc.simulate(sc.init_params(), rays, key,
                              track_opl=True, track_field=True)
    return rays, out, aux


def test_scalar_parity_neutral_system(key):
    """x-polarized input through a polarization-neutral train: the
    vector PSF equals the scalar diffraction PSF (same pupil maps)."""
    rays, out, aux = _trace(key)
    opd_s, amp = pupil_from_trace(rays, out, aux['opl'], R_P, n=64)
    psf_s, dx_s = diffraction_psf(opd_s, amp, LAM, F / (2 * R_P))
    opd_v, comps = vector_pupil_from_trace(rays, out, aux['opl'],
                                           aux['field'], R_P, n=64)
    psf_v, dx_v = vector_psf(opd_v, comps, LAM, F / (2 * R_P))
    assert dx_v == dx_s
    psf_s = np.asarray(psf_s)
    psf_v = np.asarray(psf_v) / max(float(jnp.sum(psf_v)), 1e-24)
    # SNELL faces polarize slightly (sub-percent at this NA): tight but
    # not exact
    np.testing.assert_allclose(psf_v, psf_s, atol=2e-4 * psf_s.max())


def test_analyzer_energy_ratios(key):
    """A 45-deg analyzer in the beam halves the vector-PSF energy; a
    crossed (90-deg) analyzer nulls it."""
    def energy(*extra):
        rays, out, aux = _trace(key, *extra)
        opd, comps = vector_pupil_from_trace(rays, out, aux['opl'],
                                             aux['field'], R_P, n=48)
        psf, _ = vector_psf(opd, comps, LAM, F / (2 * R_P))
        return float(jnp.sum(psf))

    e0 = energy()
    e45 = energy(LinearPolarizer(radius=6.0, angle=math.pi / 4,
                                 translation=[0, 0, 2.0], name='pol'))
    e90 = energy(LinearPolarizer(radius=6.0, angle=math.pi / 2,
                                 translation=[0, 0, 2.0], name='pol'))
    assert e45 / e0 == pytest.approx(0.5, rel=2e-3)
    assert e90 / e0 < 1e-6
