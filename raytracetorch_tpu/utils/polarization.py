"""Polarization analysis layer over the E-field transport in the core trace.

The transport physics lives in ``core/field.py`` and is integrated into the
main drivers (``trace_sequential`` / ``trace_nonsequential`` accept
``track_field=True``), so sequential, non-sequential, render and sensor
paths all see polarization.  This module keeps the original standalone
driver API as a thin wrapper plus Jones/Stokes analysis helpers.

A capability beyond the reference (whose Fresnel functor is intensity-only
and stochastic, phys/std.py:148).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.field import (FieldState, fresnel_amplitudes,   # noqa: F401
                          sp_basis, transport_field)
from ..geom import vec3 as v3

# backward-compatible private aliases (pre-integration module layout)
_basis = sp_basis
_fresnel_amplitudes = fresnel_amplitudes


def polarized_sequential_trace(scene, params, rays, key, E0):
    """Sequential trace carrying a complex field vector per ray.

    ``E0``: [N, 3] complex-compatible initial field (real array means linear
    polarization), must be perpendicular to the launch directions; it is
    projected and normalized internally so |E|^2 starts at 1.

    Returns ``(rays_out, power [N], E_out (real, imag) component tuples)``.
    |E|^2 = polarization-resolved transmitted power fraction (TIR folds into
    reflection: transmitted power 0 at that surface; rays still follow the
    geometric TIR/refraction path of the intensity trace).
    """
    out, _, aux = scene.simulate(params, rays, key, track_field=True, E0=E0)
    field = aux['field']
    return out, aux['field_power'], (field.r_c, field.i_c)


def stokes_parameters(field: FieldState, d=None):
    """Stokes vector (S0, S1, S2, S3) per ray from the transported field.

    The s/p-analyzer basis is built in the plane transverse to ``d`` (the
    ray directions as a component tuple; defaults cannot be inferred from
    the field alone, so pass ``rays.dir_c``).  S0 = |E|^2 total power;
    S3 > 0 means right-hand circular."""
    assert d is not None, "pass the ray directions (rays.dir_c)"
    # transverse basis (h, v): h = normalize(z_hat x d) (or x_hat at poles)
    hx = -d[1]
    hy = d[0]
    h2 = hx * hx + hy * hy
    pole = h2 < 1e-12
    inv = 1.0 / jnp.sqrt(jnp.where(pole, 1.0, h2))
    h = (jnp.where(pole, 1.0, hx * inv), jnp.where(pole, 0.0, hy * inv),
         jnp.zeros_like(hx))
    v = (d[1] * h[2] - d[2] * h[1],
         d[2] * h[0] - d[0] * h[2],
         d[0] * h[1] - d[1] * h[0])
    Er, Ei = field.r_c, field.i_c
    ah_r, ah_i = v3.dot(Er, h), v3.dot(Ei, h)
    av_r, av_i = v3.dot(Er, v), v3.dot(Ei, v)
    s0 = ah_r ** 2 + ah_i ** 2 + av_r ** 2 + av_i ** 2
    s1 = ah_r ** 2 + ah_i ** 2 - av_r ** 2 - av_i ** 2
    s2 = 2.0 * (ah_r * av_r + ah_i * av_i)
    s3 = 2.0 * (ah_r * av_i - ah_i * av_r)
    return s0, s1, s2, s3


def degree_of_polarization(s0, s1, s2, s3):
    """DoP of an (ensemble-averaged) Stokes vector — 1 for pure states."""
    return jnp.sqrt(s1 * s1 + s2 * s2 + s3 * s3) / jnp.maximum(s0, 1e-24)


# ---------------------------------------------------------------------------
# Jones pupil
# ---------------------------------------------------------------------------

class JonesPupil:
    """Polarization aberration map of a system: the 2x2 Jones matrix at
    every pupil sample, from TWO field-tracked traces (x- and y-polarized
    input) — the standard polarization-ray-tracing analysis
    (Chipman-style; nothing comparable in the reference, whose Fresnel
    functor is intensity-only, reference phys/std.py:148).

    Traced data stays in (re, im) float arrays (the axon tunnel rejects
    complex arrays — CLAUDE.md); the derived maps assemble complex
    matrices HOST-side with numpy.

    Attributes: ``j_re`` / ``j_im`` [n, n, 2, 2] (row = output x/y
    analyzer, column = input x/y polarization), ``mask`` [n, n] (rays
    that reached the sensor with power), ``xs`` the pupil sample
    coordinates.
    """

    def __init__(self, j_re, j_im, mask, xs):
        import numpy as np
        self.j_re = np.asarray(j_re)
        self.j_im = np.asarray(j_im)
        self.mask = np.asarray(mask)
        self.xs = np.asarray(xs)

    @property
    def jones(self):
        """[n, n, 2, 2] complex Jones matrices (numpy, host-side)."""
        return self.j_re + 1j * self.j_im

    @property
    def transmittance(self):
        """Unpolarized intensity transmittance map: mean of |J e|^2 over
        the two input polarizations = ||J||_F^2 / 2."""
        import numpy as np
        return np.where(self.mask,
                        0.5 * np.sum(self.j_re ** 2 + self.j_im ** 2,
                                     axis=(-2, -1)), 0.0)

    def _singvals(self):
        import numpy as np
        s = np.linalg.svd(self.jones, compute_uv=False)
        return s[..., 0], s[..., 1]

    @property
    def diattenuation(self):
        """D = (T_max - T_min)/(T_max + T_min) from the singular values
        of J — 0 for a polarization-neutral pupil point, 1 for a
        perfect polarizer."""
        import numpy as np
        s1, s2 = self._singvals()
        return np.where(self.mask,
                        (s1 ** 2 - s2 ** 2)
                        / np.maximum(s1 ** 2 + s2 ** 2, 1e-24), 0.0)

    @property
    def mueller(self):
        """[n, n, 4, 4] real Mueller matrices: M = A (J kron J*) A^-1
        with A the Stokes-from-coherency map — the standard
        Jones-to-Mueller lift (valid per pupil point; depolarization
        needs an ensemble, which a single coherent trace cannot
        produce, so these M are all Mueller-Jones matrices).  An ideal
        linear polarizer at angle t gives the textbook
        0.5 [[1, C, S, 0], [C, C^2, CS, 0], [S, CS, S^2, 0], [0,0,0,0]]
        with C = cos 2t, S = sin 2t (tests/test_polarization_optics.py).
        """
        import numpy as np
        J = self.jones                                   # [n, n, 2, 2]
        A = np.array([[1, 0, 0, 1],
                      [1, 0, 0, -1],
                      [0, 1, 1, 0],
                      [0, 1j, -1j, 0]], complex)
        A_inv = np.linalg.inv(A)
        # kron over the trailing 2x2 axes: [n, n, 4, 4]
        K = np.einsum('...ij,...kl->...ikjl', J, J.conj())
        K = K.reshape(J.shape[:-2] + (4, 4))
        M = np.real(A @ K @ A_inv)
        return np.where(self.mask[..., None, None], M, 0.0)

    @property
    def retardance(self):
        """Phase difference (radians) of the eigenvalues of the unitary
        factor of J = U H (polar decomposition): the pupil's phase
        aberration BETWEEN polarization states, independent of the
        shared OPD (which lives in ``track_opl``)."""
        import numpy as np
        J = self.jones
        # polar decomposition via SVD: J = (W Vh)(V S Vh) -> U = W Vh
        W, s, Vh = np.linalg.svd(J)
        U = W @ Vh
        lam = np.linalg.eigvals(U)
        d = np.abs(np.angle(lam[..., 0] * np.conj(lam[..., 1])))
        return np.where(self.mask, np.where(d > np.pi, 2 * np.pi - d, d),
                        0.0)


def jones_pupil(scene, params, key, pupil_radius, n=32, launch_z=-10.0,
                wavelength=None):
    """Trace the Jones pupil of ``scene``: an n x n collimated grid over
    the pupil, field-tracked twice (x / y input polarization), output
    fields projected onto the exit transverse basis.

    The exit basis is the parallel transport of (x_hat, y_hat) onto each
    output direction (x_out = normalize(x_hat - (x_hat.d) d),
    y_out = d x x_out) so a perfect axial system reads as the identity
    Jones matrix times the Fresnel transmission amplitude.
    """
    import jax
    import jax.numpy as jnp

    from ..rays.ray import Rays

    R = float(pupil_radius)
    xs = jnp.linspace(-R * (1 - 0.5 / n), R * (1 - 0.5 / n), n)
    X, Y = jnp.meshgrid(xs, xs, indexing='xy')
    x, y = X.reshape(-1), Y.reshape(-1)
    inside = (x * x + y * y) <= R * R
    zero = jnp.zeros_like(x)
    rays = Rays.from_components(
        (x, y, zero + launch_z), (zero, zero, jnp.ones_like(x)),
        inside.astype(jnp.float32), jnp.zeros(x.shape, jnp.int32),
        zero if wavelength is None else zero + wavelength)

    cols = []
    for E0 in ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]):
        out, _, aux = scene.simulate(params, rays, key, track_field=True,
                                     E0=jnp.broadcast_to(
                                         jnp.asarray(E0), (x.shape[0], 3)))
        f = aux['field']
        d = out.dir_c
        # exit transverse basis by projecting x_hat off d
        bx = (1.0 - d[0] * d[0], -d[0] * d[1], -d[0] * d[2])
        nrm = 1.0 / jnp.sqrt(jnp.maximum(v3.dot(bx, bx), 1e-24))
        bx = tuple(c * nrm for c in bx)
        by = (d[1] * bx[2] - d[2] * bx[1],
              d[2] * bx[0] - d[0] * bx[2],
              d[0] * bx[1] - d[1] * bx[0])
        Er, Ei = f.r_c, f.i_c
        cols.append(((v3.dot(bx, Er), v3.dot(bx, Ei)),
                     (v3.dot(by, Er), v3.dot(by, Ei)),
                     out.intensity))
    (xx_r, xx_i), (yx_r, yx_i), wx = cols[0]
    (xy_r, xy_i), (yy_r, yy_i), wy = cols[1]
    j_re = jnp.stack([jnp.stack([xx_r, xy_r], -1),
                      jnp.stack([yx_r, yy_r], -1)], -2)
    j_im = jnp.stack([jnp.stack([xx_i, xy_i], -1),
                      jnp.stack([yx_i, yy_i], -1)], -2)
    mask = inside & (wx > 0) & (wy > 0)
    shape = (n, n)
    return JonesPupil(j_re.reshape(shape + (2, 2)),
                      j_im.reshape(shape + (2, 2)),
                      mask.reshape(shape), xs)
