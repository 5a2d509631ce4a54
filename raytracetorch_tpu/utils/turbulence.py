"""Atmospheric turbulence: Kolmogorov / von Karman phase screens and
seeing-limited imaging.

A turbulent atmosphere multiplies the pupil field by exp(i phi(x, y))
with phi a Gaussian random field of Kolmogorov statistics — structure
function  D(r) = <(phi(x) - phi(x+r))^2> = 6.88 (r / r0)^(5/3)  with
r0 the Fried parameter (the aperture size at which turbulence starts
to dominate diffraction).  Screens are synthesized spectrally: white
complex Gaussian noise shaped by the von Karman phase PSD

    Phi(kappa) = 0.49 r0^(-5/3) (kappa^2 + kappa0^2)^(-11/6),

kappa in rad/length, kappa0 = 2 pi / L0 the outer-scale cutoff
(L0 = inf gives pure Kolmogorov), inverse-DFT'd with the repo's
(re, im) matmul transforms — no complex dtype, so screens generate on
the TPU under jit/vmap like everything else in the wave stack.

The two classic anchors (tests/test_turbulence.py): the ensemble
structure function follows 6.88 (r/r0)^(5/3) in the inertial range,
and the LONG-EXPOSURE image of a point source through an aperture
D >> r0 has the seeing-limited FWHM ~ 0.98 lambda / r0 instead of the
diffraction limit 1.03 lambda / D — the number every observatory
quotes.  Compose with the coherence layer's pattern: a long exposure
is an incoherent average over screens exactly as a partially coherent
image is over modes.

Finite-grid caveat (documented, not hidden): a single n*dx-wide
periodic screen cannot carry modes larger than the grid, so the pure
Kolmogorov structure function runs ~10-20% low at separations
approaching the grid size.  Pass L0 <~ (n dx) / 4 for quantitative
work on a finite grid (the anchor test does), or add subharmonics
upstream if you need the unbounded law.

No reference counterpart (no wave optics there at all).
"""

import math

import jax
import jax.numpy as jnp

__all__ = ['kolmogorov_screens', 'long_exposure_psf']


def kolmogorov_screens(key, n, dx, r0, L0=None, n_screens=1,
                       dtype=jnp.float32):
    """Draw ``n_screens`` independent phase screens [n_screens, n, n]
    (radians) of Fried parameter ``r0`` (same length unit as ``dx``)
    and outer scale ``L0`` (None = pure Kolmogorov).

    Spectral synthesis on the standard fftfreq grid; each complex draw
    yields two independent real screens (real + imaginary parts), so
    only ceil(n_screens / 2) transforms run.  jit/vmap-safe; the DFTs
    are the wave stack's (re, im) matmuls.
    """
    from .propagation import _dft_mats_std, _dft2

    # rad/length frequency grid (fftfreq ordering, matching _dft2)
    k1 = (2.0 * jnp.pi / (n * dx)) * jnp.concatenate(
        [jnp.arange(0, (n + 1) // 2), jnp.arange(-(n // 2), 0)]
    ).astype(dtype)
    k2 = k1[:, None] ** 2 + k1[None, :] ** 2
    k02 = 0.0 if L0 is None else (2.0 * jnp.pi / L0) ** 2
    psd = 0.49 * r0 ** (-5.0 / 3.0) * (k2 + k02 + 1e-24) ** (-11.0 / 6.0)
    psd = psd.at[0, 0].set(0.0)                     # no piston power
    dk = 2.0 * jnp.pi / (n * dx)
    # sqrt(2): each of the two real output screens takes one quadrature
    # of the complex synthesis, carrying HALF the drawn power — the
    # factor restores the full Phi per screen (calibrated against the
    # 6.88 (r/r0)^(5/3) structure function, see tests)
    amp = jnp.sqrt(2.0 * psd) * dk                  # sqrt(2 Phi dkappa^2)

    Ch, Sh = _dft_mats_std(n, dtype)
    n_draws = (int(n_screens) + 1) // 2
    keys = jax.random.split(key, 2 * n_draws)

    def one(kr, ki):
        hr = jax.random.normal(kr, (n, n), dtype) * amp
        hi = jax.random.normal(ki, (n, n), dtype) * amp
        # inverse DFT divides by n^2; the synthesis wants the plain sum
        fr, fi = _dft2(hr, hi, Ch, Sh, Ch, Sh, inverse=True)
        return fr * (n * n), fi * (n * n)

    re, im = jax.vmap(one)(keys[0::2], keys[1::2])  # [n_draws, n, n] x2
    return jnp.concatenate([re, im])[:int(n_screens)]


def long_exposure_psf(key, amp, dx, wavelength, r0, n_screens=32,
                      L0=None, pad=2):
    """Ensemble-averaged (seeing-limited) far-field PSF of the pupil
    ``amp`` [n, n] through ``n_screens`` independent phase screens:
    mean_k |FT(amp e^{i phi_k})|^2, normalized to unit total energy.

    Returns ``(psf [pad*n, pad*n], dtheta)`` with ``dtheta`` the
    angular pixel in radians (lambda / (pad n dx)).  For D >> r0 the
    FWHM approaches the seeing disk 0.98 lambda / r0; with r0 >> D it
    collapses to the Airy core — the transition IS the Fried
    parameter's definition.
    """
    from .psf import dft2_field

    n = amp.shape[0]
    screens = kolmogorov_screens(key, n, dx, r0, L0=L0,
                                 n_screens=n_screens, dtype=amp.dtype)

    def one(ph):
        fr, fi = dft2_field(amp * jnp.cos(ph), amp * jnp.sin(ph),
                            pad * n)
        return fr * fr + fi * fi

    psf = jnp.mean(jax.vmap(one)(screens), axis=0)
    psf = psf / jnp.maximum(jnp.sum(psf), 1e-24)
    return psf, wavelength / (pad * n * dx)
