"""Partially coherent light: Gaussian Schell-model sources as coherent
mode sums.

A partially coherent field is not ONE complex amplitude — it is a
correlation function W(x1, x2).  The TPU-friendly representation is the
Mercer expansion W = sum_k  lam_k phi_k(x1) phi_k*(x2): propagate each
coherent mode phi_k through the (linear) wave layer and add the output
INTENSITIES with weights lam_k.  Every tool in utils/propagation.py /
utils/beamprop.py then works unchanged — vmap over the mode stack turns
partial coherence into one batched program.

For the Gaussian Schell-model (GSM) source — intensity
I(x) = exp(-2 x^2 / w0^2), complex degree of coherence
g(x1 - x2) = exp(-(x1 - x2)^2 / (2 xi^2)) — the decomposition is closed
form (Starikov & Wolf, JOSA 72, 923 (1982); Mandel & Wolf §5.6.4): with

    a = 1 / w0^2            (so sigma_s = w0 / 2),
    b = 1 / (2 xi^2),
    c = sqrt(a^2 + 2 a b),

the 1-D eigenfunctions are Hermite-Gaussians of width parameter c,

    phi_n(x) = (2 c / pi)^(1/4) / sqrt(2^n n!) H_n(x sqrt(2 c)) e^(-c x^2),

with geometrically decaying eigenvalues  lam_n ∝ q^n,
q = b / (a + b + c) < 1.  2-D modes are the tensor products with weight
q^(nx + ny).  The mode count for a weight-tail epsilon is
~ log(eps) / log(q) per axis: nearly coherent sources need ONE mode,
nearly incoherent ones many — exactly the physics.

The classic checks (all in tests/test_coherence.py): the weighted mode
sum reassembles the source intensity EXACTLY; the far-field divergence
grows by the GSM factor  sqrt(1 + (w0 / xi)^2)  over the coherent
Gaussian's lam / (pi w0) (Friberg & Sudol's global beam parameter); the
modes are orthonormal on the grid.

No reference counterpart (the torch reference has no wave optics); this
extends the repo's coherent wave layer to the partially coherent
regime the same way polychromatic_psf extends monochromatic: an
incoherent weighted sum over a batch of coherent problems.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['gsm_modes', 'gsm_mode_count', 'incoherent_mode_sum']


def gsm_mode_count(w0, xi, tail=1e-3):
    """Modes per axis so the discarded 1-D eigenvalue tail is < ``tail``
    of the total: q^M < tail with q = b / (a + b + c)."""
    a = 1.0 / (w0 * w0)
    b = 1.0 / (2.0 * xi * xi)
    c = math.sqrt(a * a + 2.0 * a * b)
    q = b / (a + b + c)
    if q <= 0.0:
        return 1
    return max(1, int(math.ceil(math.log(tail) / math.log(q))))


def gsm_modes(n, dx, w0, xi, n_modes=None, tail=1e-3,
              dtype=jnp.float32):
    """Coherent-mode stack of a 2-D GSM source sampled on the standard
    centered grid.

    Args: ``n``/``dx`` grid size and pitch; ``w0`` the 1/e^2 INTENSITY
    radius; ``xi`` the coherence width (of the complex degree of
    coherence; ``xi -> inf`` is a coherent Gaussian beam).  ``n_modes``
    caps the PER-AXIS mode count (default: enough for a < ``tail``
    eigenvalue tail).

    Returns ``(modes [M, n, n], weights [M])`` — real mode fields
    (launch them with im = 0) sorted by descending weight, weights
    normalized so ``sum(weights) * dx^2 * sum(mode^2)`` ... more simply:
    so the weighted intensity sum equals exp(-2 r^2 / w0^2) exactly on
    the grid.  M = M_axis^2 tensor products.
    """
    a = 1.0 / (w0 * w0)
    b = 1.0 / (2.0 * xi * xi)
    c = math.sqrt(a * a + 2.0 * a * b)
    q = b / (a + b + c)
    M = n_modes if n_modes is not None else gsm_mode_count(w0, xi, tail)

    ax = (np.arange(n) - n // 2) * dx
    u = ax * math.sqrt(2.0 * c)
    # Hermite polynomials by recurrence: H_0 = 1, H_{n+1} = 2u H_n - 2n H_{n-1}
    H = [np.ones_like(u)]
    if M > 1:
        H.append(2.0 * u)
    for k in range(2, M):
        H.append(2.0 * u * H[k - 1] - 2.0 * (k - 1) * H[k - 2])
    g = np.exp(-c * ax * ax)
    phi = np.stack([(2.0 * c / np.pi) ** 0.25
                    / math.sqrt(2.0 ** k * math.factorial(k))
                    * H[k] * g for k in range(M)])        # [M, n] 1-D modes

    # 1-D eigenvalues lam_n = lam_0 q^n with the Starikov-Wolf prefactor;
    # the weighted sum then reproduces exp(-x^2/(2 sigma_s^2)) = the
    # 1-D factor of the source intensity (unit peak)
    lam0 = math.sqrt(np.pi / (a + b + c))
    lam = lam0 * q ** np.arange(M)

    # 2-D tensor products, sorted by weight (largest first)
    wx, wy = np.meshgrid(lam, lam, indexing='ij')
    w2 = (wx * wy).ravel()
    order = np.argsort(-w2)
    ix, iy = np.unravel_index(order, (M, M))
    modes = phi[ix][:, :, None] * phi[iy][:, None, :]     # [M^2, n, n]
    return jnp.asarray(modes, dtype), jnp.asarray(w2[order], dtype)


def incoherent_mode_sum(modes, weights, field_op, batch=None):
    """Weighted intensity sum of ``field_op`` applied to every coherent
    mode: the partially coherent image/propagation.

    ``field_op(re, im) -> (re_out, im_out)`` is any LINEAR field
    operation built from the wave layer (an ``angular_spectrum`` hop, a
    full ``wave_trace``, ...).  Returns the [n_out, n_out] intensity
    ``sum_k w_k |field_op(mode_k)|^2`` — vmapped over the stack (pass
    ``batch`` to process the modes in chunks when the stack is large).
    """
    def one(m):
        r, i = field_op(m, jnp.zeros_like(m))
        return r * r + i * i

    if batch is None:
        return jnp.tensordot(weights, jax.vmap(one)(modes), axes=1)
    out = None
    for k in range(0, modes.shape[0], batch):
        part = jnp.tensordot(weights[k:k + batch],
                             jax.vmap(one)(modes[k:k + batch]), axes=1)
        out = part if out is None else out + part
    return out
