"""Phase-diversity wavefront retrieval: recover a pupil OPD from
through-focus intensity images by gradient descent through the wave
model.

The forward operator is :func:`utils.propagation.through_focus_psf` —
the SAME differentiable focal-region propagator the analysis stack uses
— so the retrieval is nothing but ``jax.grad`` through it: parametrize
the pupil OPD by Zernike coefficients, render the model through-focus
stack, and adam the summed intensity mismatch.  This is the classic
Gonsalves / Paxman phase-diversity estimator, TPU-native: the whole
iteration (DFT matmuls + adam update) is one jitted ``lax.scan``, so a
retrieval is a single device program rather than a host loop.

No reference counterpart exists (the torch reference has no wave optics
at all); this closes the loop on the repo's own wavefront stack — the
coefficients come back in the exact Noll convention
``utils/wavefront.py::zernike_fit`` reports, so a retrieval is directly
comparable to (and testable against) a ray-traced OPD fit.

Conventions: ``amp`` is an [n, n] pupil amplitude map whose array
half-width is the unit pupil radius (the ``pupil_from_trace`` layout);
OPD and Zernike coefficients share the trace LENGTH unit (mm in the
repo's convention — 0.5e-3 is a wave at 500 nm); piston (Noll j=1) is
unobservable in intensity and is pinned to zero.

Ambiguities: a SINGLE in-focus image cannot tell phi from its parity
twin -phi(-x, -y); known-sign defocus diversity breaks the twin, which
is why ``zs`` should straddle focus asymmetrically or include at least
one strongly defocused plane.  Tilts (j=2,3) are observable only as a
common image shift — fit them (default) if the measurement's centering
is meaningful, or exclude them with ``fit_tilt=False``.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['phase_diversity', 'zernike_pupil_basis']


def zernike_pupil_basis(n, n_terms, dtype=jnp.float32):
    """[n, n, n_terms] Zernike stack over the standard pupil array:
    normalized radius 1 at the array half-width, masked to the unit
    disk (utils/wavefront.py::zernike_basis on the dense grid)."""
    from .wavefront import zernike_basis
    ax = (jnp.arange(n, dtype=dtype) - (n - 1) / 2.0) / (n / 2.0)
    X, Y = jnp.meshgrid(ax, ax, indexing='xy')
    Z = zernike_basis(X.ravel(), Y.ravel(), 1.0, n_terms)
    mask = (X * X + Y * Y <= 1.0).astype(dtype).ravel()
    return (Z * mask[:, None]).reshape(n, n, n_terms)


@partial(jax.jit, static_argnames=('n_terms', 'steps', 'pad', 'fit_tilt',
                                   'active'))
def _retrieve(images, amp, wavelength, f_number, zs, n_terms, steps,
              lr, pad, fit_tilt, c0, active=None):
    import optax

    n = amp.shape[0]
    Z = zernike_pupil_basis(n, n_terms, dtype=amp.dtype)
    # piston is invisible to intensity; tilts optionally frozen too;
    # ``active`` (multiscale stages) freezes everything above Noll j=active
    frozen = 1 if fit_tilt else 3
    hi = n_terms if active is None else min(int(active), n_terms)
    mask = jnp.where((jnp.arange(n_terms) >= frozen)
                     & (jnp.arange(n_terms) < hi), 1.0, 0.0)

    # per-plane unit energy: detector gain/exposure drops out of the fit
    meas = images / jnp.maximum(
        jnp.sum(images, axis=(1, 2), keepdims=True), 1e-24)

    from .propagation import through_focus_psf

    def model(c):
        opd = Z @ (c * mask)
        stack, _ = through_focus_psf(opd, amp, wavelength, f_number,
                                     zs, pad=pad)
        return stack / jnp.maximum(
            jnp.sum(stack, axis=(1, 2), keepdims=True), 1e-24)

    def loss(c):
        d = model(c) - meas
        return jnp.sum(d * d) * (pad * n) ** 2 / zs.shape[0]

    opt = optax.adam(lr)

    def body(carry, _):
        c, st = carry
        val, g = jax.value_and_grad(loss)(c)
        up, st = opt.update(g * mask, st, c)
        return (c + up, st), val

    (c, _), hist = jax.lax.scan(body, (c0, opt.init(c0)), None,
                                length=steps)
    return c * mask, loss(c), hist


@partial(jax.jit, static_argnames=('n_terms', 'pad'))
def _grid_search(images, amp, wavelength, f_number, zs, n_terms, pad,
                 cand):
    """Loss of every candidate coefficient vector in ``cand``
    [M, n_terms] (vmapped full renders) -> (best candidate, its loss)."""
    n = amp.shape[0]
    Z = zernike_pupil_basis(n, n_terms, dtype=amp.dtype)
    meas = images / jnp.maximum(
        jnp.sum(images, axis=(1, 2), keepdims=True), 1e-24)
    from .propagation import through_focus_psf

    def loss_of(c):
        stack, _ = through_focus_psf(Z @ c, amp, wavelength, f_number,
                                     zs, pad=pad)
        stack = stack / jnp.maximum(
            jnp.sum(stack, axis=(1, 2), keepdims=True), 1e-24)
        d = stack - meas
        return jnp.sum(d * d) * (pad * n) ** 2 / zs.shape[0]

    ls = jax.vmap(loss_of)(cand)
    i = jnp.argmin(ls)
    return cand[i], ls[i]


def phase_diversity(images, amp, wavelength, f_number, zs, n_terms=15,
                    steps=400, lr=None, pad=4, fit_tilt=True,
                    coeffs0=None, multiscale=False):
    """Recover Noll-Zernike pupil-OPD coefficients from a through-focus
    intensity stack.

    Args: ``images`` [K, N, N] measured intensities at defocus
    distances ``zs`` [K] (N = pad * n for pupil maps [n, n] — the
    :func:`through_focus_psf` layout); ``amp`` the known pupil
    amplitude (aperture shape / apodization); ``f_number`` the working
    f-number; ``wavelength``/``zs``/returned coefficients share the
    trace length unit.  Each plane is internally normalized to unit
    energy, so absolute detector gain need not be calibrated.

    Returns ``(coeffs [n_terms], final_loss, loss_history [steps])``.
    ``coeffs`` follow utils/wavefront.py::zernike_fit's convention
    (defocus = index 3, primary spherical = index 10); piston is 0 by
    construction, tilts too unless ``fit_tilt``.

    ``multiscale=True`` extends the cold-start convergence bound
    (~lambda/2 of aberration — beyond it adam parks in a wrapped
    local optimum): a vmapped grid search over (defocus, primary
    spherical) seeds the estimate — one batched render of a few
    hundred candidate stacks, the TPU-friendly way to globalize the
    two classically-dominant modes — then adam runs coarse-to-fine
    (low Noll orders first, then all).  Measured: the 0.65-wave-SA
    wide-open singlet that cold-start fails on converges to <0.03
    waves (tests/test_phase_retrieval.py).
    """
    images = jnp.asarray(images)
    amp = jnp.asarray(amp)
    zs = jnp.asarray(zs, dtype=amp.dtype)
    if images.shape[0] != zs.shape[0]:
        raise ValueError(f'images {images.shape} vs zs {zs.shape}: '
                         'one plane per defocus')
    if images.shape[1] != pad * amp.shape[0]:
        raise ValueError(
            f'images are {images.shape[1]}^2 but pad*n = '
            f'{pad * amp.shape[0]} — pass the pad used to render them')
    if lr is None:
        # step scale: coefficients live in OPD length units, so a
        # sensible default is a few hundredths of a wave per step
        lr = 0.03 * float(wavelength)
    c0 = (jnp.zeros(n_terms, amp.dtype) if coeffs0 is None
          else jnp.asarray(coeffs0, amp.dtype))
    wl = jnp.asarray(wavelength)
    fno = jnp.asarray(f_number)
    if multiscale:
        lam = float(wavelength)
        # stage 0a: seed TILTS from the most-focused plane's centroid.
        # The L2 image-matching landscape has NO gradient once the
        # model and measured PSFs stop overlapping, so a large tilt
        # (e.g. atmospheric tip/tilt) must be seeded, not descended
        # into.  Calibration: an x-tilt coefficient a (length units,
        # unnormalized Noll basis) shifts the image by -2*pad*a/lam
        # pixels along the same axis.
        if fit_tilt:
            j0 = int(np.argmin(np.abs(np.asarray(zs))))
            img = np.asarray(images[j0])
            g = np.arange(img.shape[0]) - img.shape[0] // 2
            tot = max(float(img.sum()), 1e-24)
            cx = float((img * g[None, :]).sum() / tot)
            cy = float((img * g[:, None]).sum() / tot)
            c0 = c0.at[1].add(-cx * lam / (2.0 * pad))
            c0 = c0.at[2].add(-cy * lam / (2.0 * pad))
        # stage 0b: global grid over the two dominant symmetric modes
        dgrid = np.linspace(-2.0, 2.0, 21) * lam        # defocus, j=4
        sgrid = np.linspace(-1.0, 1.0, 13) * lam        # spherical, j=11
        cand = np.tile(np.asarray(c0)[None], (len(dgrid) * len(sgrid), 1))
        dd, ss = np.meshgrid(dgrid, sgrid, indexing='ij')
        cand[:, 3] = np.asarray(c0)[3] + dd.ravel()
        if n_terms >= 11:
            cand[:, 10] = np.asarray(c0)[10] + ss.ravel()
        c0, _ = _grid_search(images, amp, wl, fno, zs, int(n_terms),
                             int(pad), jnp.asarray(cand, amp.dtype))
        # stage 1: low orders only (through primary spherical)
        c0, _, h1 = _retrieve(images, amp, wl, fno, zs, int(n_terms),
                              int(steps), float(lr), int(pad),
                              bool(fit_tilt), c0, active=11)
        c, fl, h2 = _retrieve(images, amp, wl, fno, zs, int(n_terms),
                              int(steps), float(lr), int(pad),
                              bool(fit_tilt), c0)
        return c, float(fl), jnp.concatenate([h1, h2])
    c, fl, hist = _retrieve(images, amp, wl, fno, zs, int(n_terms),
                            int(steps), float(lr), int(pad),
                            bool(fit_tilt), c0)
    return c, float(fl), hist
