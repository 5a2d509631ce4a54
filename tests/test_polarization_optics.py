"""Polarization optics elements (PhysKind.JONES): Malus's law, crossed
polarizers, waveplate conversion, chromatic retardance, axis anchoring
to the element frame, angle gradients, fused-kernel parity.

Beyond the reference (its physics functors are intensity-only,
reference phys/std.py); the analytic anchors are textbook Jones
calculus, so every assertion is closed-form.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CollimatedDisk, HalfWaveplate,
                               LinearPolarizer, QuarterWaveplate,
                               SensorElement, SequentialScene, Waveplate)
from raytracetorch_tpu.utils.polarization import stokes_parameters


def _beam(n=512, r=1.0, key=0, wavelength=0.0):
    return CollimatedDisk.make(radius=jnp.float32(r),
                               translation=[0, 0, -5.0],
                               wavelength=wavelength).sample(
                                   jax.random.PRNGKey(key), n)


def _scene(*els):
    return SequentialScene(list(els) + [
        SensorElement(radius=50.0, translation=[0, 0, 30.0], name='sens')])


def test_malus_law(key):
    """x-polarized light through an analyzer at theta: |E|^2 = cos^2."""
    sc = _scene(LinearPolarizer(radius=10.0, angle=0.0, name='pol'))
    p0 = sc.init_params()
    for theta in (0.0, math.pi / 6, math.pi / 4, math.pi / 3, math.pi / 2):
        p = jax.tree.map(lambda x: x, p0)
        p['pol']['angle'] = jnp.float32(theta)
        _, _, aux = sc.simulate(p, _beam(), key, track_field=True)
        np.testing.assert_allclose(np.asarray(aux['field_power']),
                                   math.cos(theta) ** 2, atol=1e-6)


def test_crossed_polarizers(key):
    """Crossed pair -> extinction; a 45-deg mediator restores
    cos^2(45) * cos^2(45) = 1/4 (input already x-polarized — the
    textbook 1/8 includes an unpolarized-to-linear first cut)."""
    sc = _scene(LinearPolarizer(radius=10.0, angle=0.0, name='p1'),
                LinearPolarizer(radius=10.0, angle=math.pi / 2,
                                translation=[0, 0, 5.0], name='p2'))
    _, _, aux = sc.simulate(sc.init_params(), _beam(), key,
                            track_field=True)
    np.testing.assert_allclose(np.asarray(aux['field_power']), 0.0,
                               atol=1e-10)

    sc3 = _scene(LinearPolarizer(radius=10.0, angle=0.0, name='p1'),
                 LinearPolarizer(radius=10.0, angle=math.pi / 4,
                                 translation=[0, 0, 5.0], name='pm'),
                 LinearPolarizer(radius=10.0, angle=math.pi / 2,
                                 translation=[0, 0, 10.0], name='p2'))
    _, sens, aux3 = sc3.simulate(sc3.init_params(), _beam(), key,
                                 track_field=True)
    np.testing.assert_allclose(np.asarray(aux3['field_power']), 0.25,
                               atol=1e-6)
    # the sensor flux is polarization-weighted: intensity * |E|^2
    flux = float(np.asarray(sens.moments)[0, ..., 0].sum())
    assert flux == pytest.approx(0.25 * 512, rel=1e-4)


def test_leaky_polarizer_extinction(key):
    sc = _scene(LinearPolarizer(radius=10.0, angle=0.0, extinction=1e-2,
                                name='p1'),
                LinearPolarizer(radius=10.0, angle=math.pi / 2,
                                extinction=1e-2,
                                translation=[0, 0, 5.0], name='p2'))
    _, _, aux = sc.simulate(sc.init_params(), _beam(), key,
                            track_field=True)
    # leaked amplitude = sqrt(ext) on one blocked axis each -> power
    # ext * 1 (first passes x fully, second leaks sqrt(ext))... the
    # crossed pair transmits a1*sqrt(ext) and sqrt(ext)*a1 coherently:
    # J = P(90,e) P(0,e): x-input -> amp sqrt(e) along y times 1, plus
    # e * x leak: power = e * (1 + O(e))
    np.testing.assert_allclose(np.asarray(aux['field_power']), 1e-2,
                               rtol=2e-2)


def test_quarter_waveplate_circular(key):
    """QWP at 45 deg turns x-linear into circular: |S3|/S0 = 1."""
    sc = _scene(QuarterWaveplate(radius=10.0, angle=math.pi / 4, name='q'))
    out, _, aux = sc.simulate(sc.init_params(), _beam(), key,
                              track_field=True)
    s0, s1, s2, s3 = stokes_parameters(aux['field'], out.dir_c)
    np.testing.assert_allclose(np.asarray(s0), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.abs(np.asarray(s3) / np.asarray(s0)),
                               1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), 0.0, atol=1e-6)


def test_half_waveplate_rotates(key):
    """HWP with fast axis at 22.5 deg rotates x-polarization to 45 deg:
    S1 = 0, S2 = 1; a second pass (another HWP at the same angle)
    returns to x (involution)."""
    sc = _scene(HalfWaveplate(radius=10.0, angle=math.pi / 8, name='h'))
    out, _, aux = sc.simulate(sc.init_params(), _beam(), key,
                              track_field=True)
    s0, s1, s2, s3 = stokes_parameters(aux['field'], out.dir_c)
    np.testing.assert_allclose(np.asarray(s1) / np.asarray(s0), 0.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.abs(np.asarray(s2) / np.asarray(s0)),
                               1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s3), 0.0, atol=1e-6)

    sc2 = _scene(HalfWaveplate(radius=10.0, angle=math.pi / 8, name='h1'),
                 HalfWaveplate(radius=10.0, angle=math.pi / 8,
                               translation=[0, 0, 5.0], name='h2'))
    out2, _, aux2 = sc2.simulate(sc2.init_params(), _beam(), key,
                                 track_field=True)
    s0, s1, s2, s3 = stokes_parameters(aux2['field'], out2.dir_c)
    np.testing.assert_allclose(np.asarray(s1) / np.asarray(s0), 1.0,
                               atol=1e-6)


def test_element_rotation_rotates_axis(key):
    """The Jones axes anchor to the ELEMENT frame: rotating the whole
    polarizer element by phi about z equals setting angle=phi."""
    phi = 0.6
    sc = _scene(LinearPolarizer(radius=10.0, angle=0.0,
                                rotation=[0.0, 0.0, phi], name='pol'))
    _, _, aux = sc.simulate(sc.init_params(), _beam(), key,
                            track_field=True)
    np.testing.assert_allclose(np.asarray(aux['field_power']),
                               math.cos(phi) ** 2, atol=1e-5)


def test_chromatic_retardance(key):
    """chromatic=True: retardance scales as lam0/lam.  x-pol through a
    retarder at 45 deg gives S3 = sin(delta): full quarter-wave at the
    design wavelength, half the retardance at twice the wavelength."""
    q = Waveplate(radius=10.0, retardance=0.25, angle=math.pi / 4,
                  chromatic=True, design_wavelength=0.55, name='q')
    sc = _scene(q)
    p = sc.init_params()
    for lam, delta in ((0.55, math.pi / 2), (1.10, math.pi / 4)):
        out, _, aux = sc.simulate(p, _beam(wavelength=lam), key,
                                  track_field=True)
        s0, s1, s2, s3 = stokes_parameters(aux['field'], out.dir_c)
        np.testing.assert_allclose(np.asarray(s3) / np.asarray(s0),
                                   -math.sin(delta), atol=1e-5)


def test_angle_gradient_matches_malus(key):
    """d(power)/d(angle) = -sin(2 theta) — the analyzer angle is a
    designable parameter."""
    theta = 0.5
    sc = _scene(LinearPolarizer(radius=10.0, angle=theta, angle_grad=True,
                                name='pol'))
    rays = _beam(128)

    def loss(p):
        _, _, aux = sc.simulate(p, rays, key, track_field=True)
        return aux['field_power'].mean()

    g = float(jax.grad(loss)(sc.init_params())['pol']['angle'])
    assert g == pytest.approx(-math.sin(2 * theta), rel=1e-4)


def test_requires_track_field(key):
    sc = _scene(LinearPolarizer(radius=10.0, name='pol'))
    with pytest.raises(NotImplementedError, match='track_field'):
        sc.simulate(sc.init_params(), _beam(64), key)


def test_fused_v2_parity(key):
    """The v2 fused kernel runs JONES surfaces through the same
    transport_field formulas: field, |E|^2 and weighted moments match
    the XLA driver (deterministic physics — strict parity)."""
    sc = _scene(LinearPolarizer(radius=10.0, angle=0.4, name='pol'),
                QuarterWaveplate(radius=10.0, angle=math.pi / 4,
                                 translation=[0, 0, 5.0], name='q'))
    p = sc.init_params()
    rays = _beam(777)
    out_x, sens_x, aux_x = sc.simulate(p, rays, key, track_field=True)
    out_f, sens_f, aux_f = sc.simulate_fused(p, rays, key,
                                             track_field=True, block_rows=4)
    np.testing.assert_allclose(np.asarray(aux_f['field_power']),
                               np.asarray(aux_x['field_power']),
                               rtol=1e-5, atol=1e-7)
    for leaf in ('erx', 'ery', 'erz', 'eix', 'eiy', 'eiz'):
        np.testing.assert_allclose(
            np.asarray(getattr(aux_f['field'], leaf)),
            np.asarray(getattr(aux_x['field'], leaf)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sens_f.moments),
                               np.asarray(sens_x.moments), rtol=1e-4,
                               atol=1e-3)


def test_mueller_matrix_of_polarizer(key):
    """JonesPupil.mueller: the traced polarizer's Mueller matrix equals
    the textbook ideal-polarizer form 0.5[[1,C,S,0],[C,C2,CS,0],...]"""
    from raytracetorch_tpu.utils.polarization import jones_pupil

    theta = 0.3
    sc = _scene(LinearPolarizer(radius=10.0, angle=theta, name='pol'))
    jp = jones_pupil(sc, sc.init_params(), key, pupil_radius=3.0, n=8)
    M = jp.mueller
    c2, s2 = math.cos(2 * theta), math.sin(2 * theta)
    expect = 0.5 * np.array([
        [1.0, c2, s2, 0.0],
        [c2, c2 * c2, c2 * s2, 0.0],
        [s2, c2 * s2, s2 * s2, 0.0],
        [0.0, 0.0, 0.0, 0.0]])
    center = M[4, 4]
    np.testing.assert_allclose(center, expect, atol=1e-5)
    # Mueller-Jones consistency: M00 = transmittance/... and the QWP
    # case rotates S3: quarter-wave at 45 deg maps S1 -> -+S3
    sc2 = _scene(QuarterWaveplate(radius=10.0, angle=math.pi / 4,
                                  name='q'))
    M2 = jones_pupil(sc2, sc2.init_params(), key, pupil_radius=3.0,
                     n=8).mueller[4, 4]
    s_in = np.array([1.0, 1.0, 0.0, 0.0])     # x-linear
    s_out = M2 @ s_in
    np.testing.assert_allclose(s_out[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(abs(s_out[3]), 1.0, atol=1e-5)
    np.testing.assert_allclose(s_out[1], 0.0, atol=1e-5)


def test_jones_nonseq_fused_parity(key):
    """JONES rows + track_field in the fused non-sequential kernel."""
    from raytracetorch_tpu import Scene
    sc = Scene([
        LinearPolarizer(radius=10.0, angle=0.4, translation=[0, 0, 8.0],
                        name='pol'),
        QuarterWaveplate(radius=10.0, angle=math.pi / 4,
                         translation=[0, 0, 14.0], name='q'),
        SensorElement(radius=40.0, translation=[0, 0, 30.0], name='s'),
    ], n_bounces=4)
    p = sc.init_params()
    rays = _beam(700)
    out_x, sens_x, aux_x = sc.simulate(p, rays, key, track_field=True)
    out_f, sens_f, aux_f = sc.simulate_fused(p, rays, key,
                                             track_field=True,
                                             block_rows=4)
    np.testing.assert_allclose(np.asarray(aux_f['field_power']),
                               np.asarray(aux_x['field_power']),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sens_f.moments),
                               np.asarray(sens_x.moments), rtol=1e-4,
                               atol=1e-3)
