"""Extended-source image simulation: convolve scene radiance with a PSF.

Beyond-reference capability completing the imaging chain (the reference
stops at ray hits; SURVEY.md lists no image-simulation layer): trace ->
pupil map (utils/psf.py::pupil_from_trace) -> PSF (diffraction_psf /
polychromatic_psf or an irradiance-grid kernel from a point source) ->
THIS module smears an object-plane radiance image with it.

TPU-first: the convolution is `lax.conv_general_dilated`, which XLA lowers
onto the MXU (an [H, W] x [k, k] 'same' convolution is the systolic
array's native workload) — no FFT anywhere, so it runs on the axon tunnel
(which rejects complex arrays, CLAUDE.md) and inside any jitted/sharded
program.  Everything is differentiable: gradients flow from the simulated
image back through the PSF into lens parameters, enabling end-to-end
"optimize the lens for image quality" loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def convolve_psf(image, psf, normalize=True):
    """Convolve an ``[H, W]`` or ``[H, W, C]`` radiance image with a
    ``[k, k]`` PSF ('same' padding, zero boundary).

    ``normalize=True`` scales the PSF to unit total energy first, so the
    simulated image conserves flux (up to boundary losses).  Per-channel
    PSFs: pass ``psf [k, k, C]`` with a matching C-channel image — each
    channel convolves with its own kernel (the polychromatic case:
    ``polychromatic_psf`` per band).  Returns an image shaped like the
    input.  Precision: f32 accumulation is requested from the MXU
    (``preferred_element_type``)."""
    image = jnp.asarray(image, jnp.float32)
    psf = jnp.asarray(psf, jnp.float32)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    if psf.ndim == 2:
        psf = jnp.broadcast_to(psf[..., None],
                               psf.shape + (image.shape[-1],))
    if normalize:
        psf = psf / jnp.maximum(jnp.sum(psf, axis=(0, 1), keepdims=True),
                                1e-24)
    # one grouped convolution: each channel with its own kernel.
    # NCHW image [1, C, H, W]; kernel OIHW [C, 1, k, k]; groups=C.
    c = image.shape[-1]
    img = jnp.transpose(image, (2, 0, 1))[None]          # [1, C, H, W]
    # convolution kernels correlate in XLA: flip for true convolution
    ker = jnp.transpose(psf[::-1, ::-1, :], (2, 0, 1))[:, None]
    out = lax.conv_general_dilated(
        img, ker, window_strides=(1, 1), padding='SAME',
        feature_group_count=c,
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        preferred_element_type=jnp.float32)
    out = jnp.transpose(out[0], (1, 2, 0))               # [H, W, C]
    return out[..., 0] if squeeze else out


def simulate_image(image, opd, amp, wavelength, f_number, pad=2):
    """Object radiance ``image`` seen through the system whose exit-pupil
    OPD/amplitude maps are given: builds the diffraction PSF
    (utils/psf.py) and convolves.  Returns ``(simulated [H, W], psf, dx)``
    with dx the PSF pixel pitch — resample the object to that pitch for
    physically-scaled results (this helper treats the image as already
    sampled at dx; the PSF is shift-invariant over the field)."""
    from .psf import diffraction_psf
    psf, dx = diffraction_psf(opd, amp, wavelength, f_number, pad=pad)
    return convolve_psf(image, psf), psf, dx
