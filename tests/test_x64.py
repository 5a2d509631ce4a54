"""float64 dtype policy: the table/trace follow the parameter dtype under
jax.experimental.enable_x64 (reference threads a dtype policy incl. float64,
config.py:197).

The payoff test is the OPL quantization floor: a parabolic mirror focuses a
collimated bundle with EXACTLY equal optical path lengths (directrix
property), so its wavefront RMS is a pure measure of numerical noise.  In
float32 the ~100 mm path magnitudes quantize the OPL at ~1e-5 mm (~lambda/50
at 500 nm); in float64 the same trace reports < 1e-4 waves.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import enable_x64

from raytracetorch_tpu import ParabolicMirror, Rays, SequentialScene
from raytracetorch_tpu.utils.wavefront import wavefront_rms

WAVELENGTH_MM = 0.5e-3      # 500 nm


def _parabola_scene():
    # c = 0.025 -> f = 1/(2c) = 20 mm, aperture d = 10 (f/2 — fast enough
    # that paraxial approximations would fail; the parabola is still exact)
    return SequentialScene([ParabolicMirror(c1=0.025, d=10.0, name='m')])


def _launch(dtype, n_side=31):
    u = np.linspace(-4.0, 4.0, n_side)
    xx, yy = np.meshgrid(u, u)
    r2 = xx ** 2 + yy ** 2
    keep = r2 <= 16.0
    x, y = xx[keep], yy[keep]
    pos = np.stack([x, y, np.full_like(x, 10.0)], axis=-1)
    d = np.broadcast_to(np.array([0.0, 0.0, -1.0]), pos.shape)
    return Rays.create(pos, d, dtype=dtype)


def _wavefront_rms_mm(dtype, key):
    scene = _parabola_scene()
    p = scene.init_params(dtype)
    rays = _launch(dtype)
    out, _, aux = scene.simulate(p, rays, key, track_opl=True)
    assert out.px.dtype == dtype
    focus = jnp.asarray([0.0, 0.0, 20.0], dtype)    # parabola focus at f
    return float(wavefront_rms(out, aux['opl'], point=focus))


def test_x64_table_and_trace_dtype(key):
    with enable_x64():
        scene = _parabola_scene()
        p = scene.init_params(jnp.float64)
        table = scene.build_table(p)
        assert table.q.dtype == jnp.float64
        assert table.Rw.dtype == jnp.float64
        rms = _wavefront_rms_mm(jnp.float64, key)
    assert np.isfinite(rms)


def test_f64_beats_f32_opl_floor(key):
    """Perfect parabola: f64 wavefront RMS < 1e-4 waves; f32 sits at its
    documented quantization floor (orders of magnitude higher)."""
    rms32 = _wavefront_rms_mm(jnp.float32, key)
    with enable_x64():
        rms64 = _wavefront_rms_mm(jnp.float64, key)
    waves32 = rms32 / WAVELENGTH_MM
    waves64 = rms64 / WAVELENGTH_MM
    assert waves64 < 1e-4, f"f64 floor {waves64} waves"
    assert waves32 > 10 * waves64   # the f32 floor is real and much higher


def test_f32_trace_unchanged_by_dtype_plumbing(key):
    """Default-dtype traces keep float32 leaves end to end."""
    scene = _parabola_scene()
    p = scene.init_params()
    rays = _launch(jnp.float32)
    out, sensors, _ = scene.simulate(p, rays, key)
    assert out.px.dtype == jnp.float32
    assert sensors.moments.dtype == jnp.float32
