"""Polarization ray tracing tests: Fresnel transmission vs analytic s/p
coefficients, Brewster angle, normal-incidence energy, TIR unitarity."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (ElementCustom, Rays, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.constants import PhysKind
from raytracetorch_tpu.elements import shapes
from raytracetorch_tpu.utils.polarization import polarized_sequential_trace

N_GLASS = 1.5


def _interface_scene():
    """A single infinite refracting plane at z=0 (air -> glass)."""
    el = ElementCustom(shapes.plane, 1, PhysKind.SNELL, ph=(N_GLASS, 1.0),
                       name='iface')
    return SequentialScene([el])


def _trace_pol(scene, theta_i, E0, key):
    p = scene.init_params()
    d = [0.0, math.sin(theta_i), math.cos(theta_i)]
    rays = Rays.create([[0.0, -10.0 * d[1], -10.0 * d[2]]], [d])
    out, power, E = polarized_sequential_trace(scene, p, rays, key, E0)
    return float(power[0])


def _T_analytic(theta_i, pol):
    n1, n2 = 1.0, N_GLASS
    ci = math.cos(theta_i)
    st = n1 / n2 * math.sin(theta_i)
    ct = math.sqrt(1 - st * st)
    if pol == 's':
        t = 2 * n1 * ci / (n1 * ci + n2 * ct)
    else:
        t = 2 * n1 * ci / (n2 * ci + n1 * ct)
    return (n2 * ct) / (n1 * ci) * t * t


def test_normal_incidence_transmission(key):
    scene = _interface_scene()
    T = _trace_pol(scene, 0.0, [[1.0, 0.0, 0.0]], key)
    np.testing.assert_allclose(T, 4 * N_GLASS / (1 + N_GLASS) ** 2, rtol=1e-5)


def test_s_and_p_transmission_at_angle(key):
    scene = _interface_scene()
    theta = 0.8
    # s-pol: E along x (perpendicular to the y-z plane of incidence)
    Ts = _trace_pol(scene, theta, [[1.0, 0.0, 0.0]], key)
    np.testing.assert_allclose(Ts, _T_analytic(theta, 's'), rtol=1e-4)
    # p-pol: E in the plane of incidence, perpendicular to d
    Ep = [[0.0, math.cos(theta), -math.sin(theta)]]
    Tp = _trace_pol(scene, theta, Ep, key)
    np.testing.assert_allclose(Tp, _T_analytic(theta, 'p'), rtol=1e-4)
    assert Tp > Ts     # p transmits more approaching Brewster


def test_brewster_angle(key):
    """At Brewster incidence p-polarized light transmits completely."""
    scene = _interface_scene()
    theta_b = math.atan(N_GLASS)
    Ep = [[0.0, math.cos(theta_b), -math.sin(theta_b)]]
    Tp = _trace_pol(scene, theta_b, Ep, key)
    np.testing.assert_allclose(Tp, 1.0, atol=1e-5)


def test_lens_polarized_power_matches_two_faces(key):
    """Through a singlet near normal incidence: T_face^2."""
    scene = SequentialScene([SingletLens(
        c1=0.016667, c2=-0.00283, d=25.4, t=4.0, ior_glass=N_GLASS,
        name='lens')])
    p = scene.init_params()
    rays = Rays.create([[0.0, 0.5, -10.0]], [[0.0, 0.0, 1.0]])
    out, power, _ = polarized_sequential_trace(
        scene, p, rays, key, [[1.0, 0.0, 0.0]])
    T1 = 4 * N_GLASS / (1 + N_GLASS) ** 2
    np.testing.assert_allclose(float(power[0]), T1 * T1, rtol=1e-3)


def test_tir_keeps_unit_power(key):
    """Past the critical angle the TIR reflection is unitary: |E|^2 = 1."""
    el = ElementCustom(shapes.plane, 1, PhysKind.SNELL, ph=(1.0, N_GLASS),
                       name='iface')   # normal side = air, ray inside glass
    scene = SequentialScene([el])
    p = scene.init_params()
    theta = 0.9   # > critical angle asin(1/1.5) = 0.7297
    d = [0.0, math.sin(theta), math.cos(theta)]
    rays = Rays.create([[0.0, -5.0 * d[1], -5.0 * d[2]]], [d])
    out, power, _ = polarized_sequential_trace(
        scene, p, rays, key, [[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(power[0]), 1.0, rtol=1e-5)
    assert float(out.dir[0, 2]) < 0    # geometrically reflected


# ---------------------------------------------------------------------------
# Integrated E-field transport in the main drivers (track_field=True)
# ---------------------------------------------------------------------------

def test_track_field_sequential_aux(key):
    """scene.simulate(track_field=True) exposes the field and power in aux
    and weights the sensor by the polarization-resolved power."""
    from raytracetorch_tpu import SensorElement

    theta = 0.8
    el = ElementCustom(shapes.plane, 1, PhysKind.SNELL, ph=(N_GLASS, 1.0),
                       name='iface')
    scene = SequentialScene([el, SensorElement(name='sensor',
                                               translation=[0, 0, 40.0])])
    scene.grid_shape = (16, 16)
    scene.grid_half_extent = 60.0
    p = scene.init_params()
    d = [0.0, math.sin(theta), math.cos(theta)]
    rays = Rays.create([[0.0, -10.0 * d[1], -10.0 * d[2]]], [d])

    out, sensors, aux = scene.simulate(p, rays, key, track_field=True,
                                       E0=[[1.0, 0.0, 0.0]])
    Ts = _T_analytic(theta, 's')
    np.testing.assert_allclose(float(aux['field_power'][0]), Ts, rtol=1e-4)
    # sensor total weight = intensity * |E|^2 at arrival
    np.testing.assert_allclose(float(sensors.total_weight(0)[0]), Ts,
                               rtol=1e-4)
    # the polarization-aware irradiance grid carries the same power
    np.testing.assert_allclose(float(sensors.grid.sum()), Ts, rtol=1e-4)


def test_track_field_nonsequential_tir(key):
    """Non-sequential bounce loop transports the field: TIR keeps unit
    power and the geometric reflection."""
    from raytracetorch_tpu import Scene

    el = ElementCustom(shapes.plane, 1, PhysKind.SNELL, ph=(1.0, N_GLASS),
                       name='iface')
    scene = Scene([el], n_bounces=3)
    p = scene.init_params()
    theta = 0.9   # > critical angle asin(1/1.5)
    d = [0.0, math.sin(theta), math.cos(theta)]
    rays = Rays.create([[0.0, -5.0 * d[1], -5.0 * d[2]]], [d])

    out, _, aux = scene.simulate(p, rays, key, track_field=True,
                                 E0=[[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(aux['field_power'][0]), 1.0, rtol=1e-5)
    assert float(out.dir[0, 2]) < 0


def test_track_field_nonsequential_matches_sequential(key):
    """Ordered system: both drivers report the same transmitted power."""
    from raytracetorch_tpu import Scene

    lens = SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                       ior_glass=N_GLASS, name='lens')
    seq = SequentialScene([lens])
    non = Scene([lens], n_bounces=4)
    p = seq.init_params()
    rays = Rays.create([[0.0, 0.5, -10.0]], [[0.0, 0.0, 1.0]])
    E0 = [[1.0, 0.0, 0.0]]
    _, _, aux_s = seq.simulate(p, rays, key, track_field=True, E0=E0)
    _, _, aux_n = non.simulate(p, rays, key, track_field=True, E0=E0)
    np.testing.assert_allclose(np.asarray(aux_n['field_power']),
                               np.asarray(aux_s['field_power']), rtol=1e-5)


def test_stokes_parameters(key):
    """Stokes analysis: linear-x gives S1=+S0; circular gives |S3|=S0."""
    from raytracetorch_tpu.core.field import FieldState
    from raytracetorch_tpu.utils.polarization import (
        degree_of_polarization, stokes_parameters)

    rays = Rays.create([[0.0, 0.0, 0.0]] * 2, [[0.0, 0.0, 1.0]] * 2)
    fx = FieldState.init(rays, [[1.0, 0.0, 0.0]])
    s0, s1, s2, s3 = stokes_parameters(fx, rays.dir_c)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2), 0.0, atol=1e-6)

    E_circ = np.array([[1.0 + 0.0j, 0.0 + 1.0j, 0.0 + 0.0j]]) / math.sqrt(2)
    fc = FieldState.init(rays, np.broadcast_to(E_circ, (2, 3)))
    s0, s1, s2, s3 = stokes_parameters(fc, rays.dir_c)
    np.testing.assert_allclose(np.abs(np.asarray(s3)), np.asarray(s0),
                               rtol=1e-6)
    dop = degree_of_polarization(s0, s1, s2, s3)
    np.testing.assert_allclose(np.asarray(dop), 1.0, rtol=1e-6)


def _brewster_mc_scene():
    from raytracetorch_tpu import CollimatedDisk, ElementCustom, Scene
    from raytracetorch_tpu.constants import PhysKind
    from raytracetorch_tpu.elements import shapes

    n_g = 1.5168
    th_b = math.atan(n_g)
    scene = Scene([
        ElementCustom(shapes.plane, 1, PhysKind.FRESNEL, ph=(n_g, 1.0),
                      name='iface'),
    ], n_bounces=3)
    bundle = CollimatedDisk.make(
        radius=jnp.float32(2.0), translation=[0, 0, -10.0],
        rotation=[th_b, 0.0, 0.0])
    return scene, bundle, n_g, th_b


def test_polarized_mc_draw_brewster(key):
    """The Monte-Carlo Fresnel branch draw is POLARIZED (round-2 VERDICT
    item 1): at Brewster incidence a pure p wave NEVER reflects (Rp = 0),
    while an s wave reflects with frequency Rs; surviving branches carry
    the renormalized field (|E|^2 preserved — the branch power lives in
    the draw probability itself)."""
    scene, bundle, n_g, th_b = _brewster_mc_scene()
    p = scene.init_params()
    rays = bundle.sample(key, 100_000)
    rs_b = ((n_g ** 2 - 1) / (n_g ** 2 + 1)) ** 2        # Rs(Brewster)

    # plane of incidence is y-z: p-polarization lies in it, s along x
    Ep = [0.0, math.cos(th_b), math.sin(th_b)]
    out, _, aux = scene.simulate(p, rays, key, track_field=True, E0=[Ep])
    refl = (np.asarray(out.dir)[:, 2] < 0) & (np.asarray(out.intensity) > 0)
    assert refl.sum() == 0               # Rp(Brewster) = 0: no draws reflect

    out, _, aux = scene.simulate(p, rays, key, track_field=True,
                                 E0=[[1.0, 0.0, 0.0]])
    refl = (np.asarray(out.dir)[:, 2] < 0) & (np.asarray(out.intensity) > 0)
    np.testing.assert_allclose(refl.mean(), rs_b, atol=0.005)
    pw = np.asarray(aux['field_power'])
    np.testing.assert_allclose(pw[refl].mean(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(pw[~refl].mean(), 1.0, rtol=1e-5)


def test_polarized_mc_flux_energy_exact(key):
    """Expected intensity * |E|^2 sensor flux through a Brewster-angle
    interface matches the analytic polarized Ts/Tp with NO selection-
    factor correction (the round-2 VERDICT's 'Done' criterion for the
    energy-exact polarized draw)."""
    scene, bundle, n_g, th_b = _brewster_mc_scene()
    p = scene.init_params()
    rays = bundle.sample(key, 100_000)
    rs_b = ((n_g ** 2 - 1) / (n_g ** 2 + 1)) ** 2

    def transmitted_flux(E0):
        out, _, aux = scene.simulate(p, rays, key, track_field=True,
                                     E0=[E0])
        fwd = (np.asarray(out.dir)[:, 2] > 0) & \
            (np.asarray(out.intensity) > 0)
        w = np.asarray(out.intensity) * np.asarray(aux['field_power'])
        return float(w[fwd].sum() / len(w))

    # p at Brewster: Tp = 1 exactly (deterministic — zero MC variance)
    Ep = [0.0, math.cos(th_b), math.sin(th_b)]
    np.testing.assert_allclose(transmitted_flux(Ep), 1.0, atol=1e-5)
    # s at Brewster: Ts = 1 - Rs (MC noise ~ sqrt(Rs(1-Rs)/N) ~ 1.2e-3)
    np.testing.assert_allclose(transmitted_flux([1.0, 0.0, 0.0]),
                               1.0 - rs_b, atol=0.005)
    # 45-degree linear: Ts/2 + Tp/2
    E45 = [math.sqrt(0.5), math.cos(th_b) * math.sqrt(0.5),
           math.sin(th_b) * math.sqrt(0.5)]
    np.testing.assert_allclose(transmitted_flux(E45),
                               1.0 - 0.5 * rs_b, atol=0.005)


def test_weighted_fresnel_track_field_polarized_loss(key):
    """fresnel='weighted' now composes with track_field: the intensity
    carries the POLARIZED (1 - R) loss exactly once (the field is
    renormalized), so p at Brewster keeps full intensity and s loses Rs."""
    from raytracetorch_tpu import ElementCustom, Scene
    from raytracetorch_tpu.constants import PhysKind
    from raytracetorch_tpu.elements import shapes

    n_g = 1.5168
    th_b = math.atan(n_g)
    el = ElementCustom(shapes.plane, 1, PhysKind.FRESNEL_W, ph=(n_g, 1.0),
                       name='iface')
    scene = Scene([el], n_bounces=2)
    p = scene.init_params()
    d = [0.0, math.sin(th_b), math.cos(th_b)]
    rays = Rays.create([[0.0, -10.0 * d[1], -10.0 * d[2]]], [d])
    rs_b = ((n_g ** 2 - 1) / (n_g ** 2 + 1)) ** 2

    Ep = [[0.0, math.cos(th_b), math.sin(th_b)]]
    out, _, aux = scene.simulate(p, rays, key, track_field=True, E0=Ep)
    flux = float(out.intensity[0]) * float(aux['field_power'][0])
    np.testing.assert_allclose(flux, 1.0, atol=1e-5)

    out, _, aux = scene.simulate(p, rays, key, track_field=True,
                                 E0=[[1.0, 0.0, 0.0]])
    flux = float(out.intensity[0]) * float(aux['field_power'][0])
    np.testing.assert_allclose(flux, 1.0 - rs_b, rtol=1e-4)


def test_jones_pupil_axial_plate_is_identity(key):
    """Normal incidence through a plate: J = t*I with t the two-face
    Fresnel amplitude product; no diattenuation, no retardance."""
    from raytracetorch_tpu.utils.polarization import jones_pupil
    n = 1.5168
    sc = SequentialScene([
        SingletLens(c1=0.0, c2=0.0, d=30.0, t=3.0, ior_glass=n,
                    name='plate'),
        SensorElement(radius=40.0, translation=[0, 0, 30.0], name='s')])
    jp = jones_pupil(sc, sc.init_params(), key, pupil_radius=3.0, n=8)
    J = jp.jones[jp.mask]
    t = (2.0 / (1 + n)) * (2 * n / (1 + n))       # in + out faces
    np.testing.assert_allclose(np.abs(J[:, 0, 0]), t, atol=2e-4)
    np.testing.assert_allclose(np.abs(J[:, 1, 1]), t, atol=2e-4)
    np.testing.assert_allclose(np.abs(J[:, 0, 1]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(J[:, 1, 0]), 0.0, atol=1e-5)
    assert jp.diattenuation[jp.mask].max() < 1e-4
    assert jp.retardance[jp.mask].max() < 1e-4
    np.testing.assert_allclose(jp.transmittance[jp.mask], t * t, atol=5e-4)


def test_jones_pupil_tilted_plate_diattenuation(key):
    """A plate tilted 0.9 rad about x: plane of incidence is y-z, so
    p = y transmits more than s = x; the center-pupil diattenuation
    matches the analytic two-face Fresnel value and the retardance
    stays ~0 (lossless dielectric, no TIR)."""
    import math

    from raytracetorch_tpu.utils.polarization import jones_pupil
    n = 1.5168
    th = 0.9
    sc = SequentialScene([
        SingletLens(c1=0.0, c2=0.0, d=30.0, t=3.0, ior_glass=n,
                    rotation=[th, 0.0, 0.0], name='plate'),
        SensorElement(radius=40.0, translation=[0, 0, 30.0], name='s')])
    jp = jones_pupil(sc, sc.init_params(), key, pupil_radius=4.0, n=16)
    c = 8
    assert jp.mask[c, c]
    J = jp.jones[c, c]
    assert np.abs(J[1, 1]) > np.abs(J[0, 0])      # p (=y) wins
    thp = math.asin(math.sin(th) / n)
    ts = (2 * math.cos(th) / (math.cos(th) + n * math.cos(thp))) * \
         (2 * n * math.cos(thp) / (n * math.cos(thp) + math.cos(th)))
    tp = (2 * math.cos(th) / (n * math.cos(th) + math.cos(thp))) * \
         (2 * n * math.cos(thp) / (math.cos(thp) + n * math.cos(th)))
    Ts, Tp = ts ** 2, tp ** 2
    np.testing.assert_allclose(jp.diattenuation[c, c],
                               (Tp - Ts) / (Tp + Ts), atol=2e-3)
    assert jp.retardance[c, c] < 1e-3
