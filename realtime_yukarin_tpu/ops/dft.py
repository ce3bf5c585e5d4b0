"""DFT-as-matmul: the MXU-native replacement for XLA's TPU FFT.

XLA's FFT HLO on TPU is an order of magnitude slower than a dense DFT
matmul at our sizes (measured: |STFT|^2 via rfft = 42 ms vs ~3 ms as two
[rows, n]x[n, n//2+1] matmuls for a 64-stream chunk).  All analysis
transforms are fixed-size per config (n = cfg.fft_size, default 1022 so
spec_bins = 512 tiles the MXU lanes exactly — see config.DspConfig), so
the bases are precomputed host-side once per size and the per-frame work
rides the MXU (SURVEY.md §7 step 3: "fused framing+STFT+cepstrum ... as
matmul against a precomputed basis").  A matmul DFT has no power-of-two
constraint; the only shape requirement is EVEN n (the bases treat bin
n//2 as a self-conjugate Nyquist bin).

Precision: bf16_3x (``Precision.HIGH``) keeps DFT error ~1e-6 relative to
the spectral peak — comfortably below the -70 dB envelope floor — at 1/2
the cost of full fp32 (HIGHEST, 6 passes).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

DFT_PRECISION = jax.lax.Precision.HIGH


# ---------------------------------------------------------------------------
# Host-side basis builders (float64, cast at use site)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def rfft_bases(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(cos [n, n//2+1], sin [n, n//2+1]): rfft_k = x@cos - j * x@sin."""
    assert n % 2 == 0, f"DFT bases assume even n (Nyquist bin), got {n}"
    k = np.arange(n // 2 + 1)
    t = np.arange(n)
    ang = 2.0 * np.pi * np.outer(t, k) / n
    return np.cos(ang), np.sin(ang)


@functools.lru_cache(maxsize=None)
def cepstrum_basis(n: int) -> np.ndarray:
    """[K, Q]: half real cepstrum from one-sided log spectrum.

    c_q = (1/n) [L_0 + 2 sum_{0<k<n/2} L_k cos(2 pi k q / n) + L_{n/2} cos(pi q)]
    for q = 0..n/2 (the cepstrum of a symmetric spectrum is symmetric).
    """
    assert n % 2 == 0, f"DFT bases assume even n (Nyquist bin), got {n}"
    K = n // 2 + 1
    w = np.full(K, 2.0)
    w[0] = w[-1] = 1.0
    q = np.arange(K)
    k = np.arange(K)
    basis = np.cos(2.0 * np.pi * np.outer(k, q) / n) * w[:, None] / n
    return basis                                     # [K(k), Q(q)]


@functools.lru_cache(maxsize=None)
def cepstrum_inverse_basis(n: int) -> np.ndarray:
    """[Q, K]: one-sided log spectrum back from the half cepstrum.

    L_k = c_0 + 2 sum_{0<q<n/2} c_q cos(2 pi k q / n) + c_{n/2} cos(pi k)
    """
    assert n % 2 == 0, f"DFT bases assume even n (Nyquist bin), got {n}"
    K = n // 2 + 1
    u = np.full(K, 2.0)
    u[0] = u[-1] = 1.0
    q = np.arange(K)
    k = np.arange(K)
    return np.cos(2.0 * np.pi * np.outer(q, k) / n) * u[:, None]  # [Q, K]


@functools.lru_cache(maxsize=None)
def prefix_sum_matrix(n: int) -> np.ndarray:
    """[n, n] ones where row <= col: (d @ M)[l] = sum_{j<=l} d[j].

    Lane-axis cumsums serialize on TPU (measured ~6 ms/step at 128 streams
    for the F0 running energy); the same prefix sum as a triangular-ones
    MXU matmul is noise.  Shared by dsp/f0.py (CMND) and dsp/synthesis.py
    (phase integration)."""
    return np.triu(np.ones((n, n), np.float64))


@functools.lru_cache(maxsize=None)
def autocorr_weights(n: int) -> np.ndarray:
    """[K]: weights turning a one-sided power spectrum into autocorrelation:
    r_l = sum_k w_k P_k cos(2 pi k l / n)  ==  irfft(P_two_sided)[l]."""
    assert n % 2 == 0, f"DFT bases assume even n (Nyquist bin), got {n}"
    K = n // 2 + 1
    w = np.full(K, 2.0 / n)
    w[0] = w[-1] = 1.0 / n
    return w


# ---------------------------------------------------------------------------
# Device ops
# ---------------------------------------------------------------------------

def power_spectrum(frames: jnp.ndarray, n: int) -> jnp.ndarray:
    """|rfft(frames, n)|^2 via two MXU matmuls.  frames [..., n]."""
    cos, sin = rfft_bases(n)
    cos = jnp.asarray(cos, frames.dtype)
    sin = jnp.asarray(sin, frames.dtype)
    re = jnp.matmul(frames, cos, precision=DFT_PRECISION)
    im = jnp.matmul(frames, sin, precision=DFT_PRECISION)
    return re * re + im * im


def quefrency_filter(L: jnp.ndarray, lift_half: jnp.ndarray, n: int
                     ) -> jnp.ndarray:
    """rfft(lift * irfft(L)).real for symmetric lifters, as two matmuls.

    L [..., K] one-sided spectrum (linear or log domain); lift_half
    [..., K] the lifter at quefrencies q = 0..n/2 (symmetric extension
    implied).  With lift = sinc(f0 q / fs) this IS frequency-domain
    rectangular smoothing of full width f0 Hz (rect <-> sinc duality), so
    one routine serves both CheapTrick roles: linear-domain pitch-adaptive
    smoothing and log-domain cepstral liftering.
    """
    C = jnp.asarray(cepstrum_basis(n), L.dtype)
    D = jnp.asarray(cepstrum_inverse_basis(n), L.dtype)
    c_half = jnp.matmul(L, C, precision=DFT_PRECISION)     # [..., Q]
    return jnp.matmul(c_half * lift_half, D, precision=DFT_PRECISION)


@functools.lru_cache(maxsize=None)
def irfft_bases(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(A [K, n], B [K, n]): irfft(X, n) = Re(X) @ A + Im(X) @ B."""
    assert n % 2 == 0, f"DFT bases assume even n (Nyquist bin), got {n}"
    K = n // 2 + 1
    w = np.full(K, 2.0 / n)
    w[0] = w[-1] = 1.0 / n
    k = np.arange(K)
    t = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, t) / n
    return np.cos(ang) * w[:, None], -np.sin(ang) * w[:, None]


def irfft_real(re: jnp.ndarray, im: jnp.ndarray, n: int,
               out_len: int | None = None) -> jnp.ndarray:
    """irfft from split re/im one-sided spectra, as two MXU matmuls.

    ``out_len`` truncates the time output (the basis is sliced host-side,
    so only the needed columns are ever multiplied — used by the F0
    cross-correlation, which only wants lags [0, lag_max]).
    """
    A, B = irfft_bases(n)
    if out_len is not None:
        A, B = A[:, :out_len], B[:, :out_len]
    A = jnp.asarray(A, re.dtype)
    B = jnp.asarray(B, re.dtype)
    return (jnp.matmul(re, A, precision=DFT_PRECISION)
            + jnp.matmul(im, B, precision=DFT_PRECISION))


def cross_correlation(a: jnp.ndarray, b: jnp.ndarray, n: int, out_len: int
                      ) -> jnp.ndarray:
    """c[l] = sum_n a[n] b[n+l] for l in [0, out_len), rows batched.

    a, b: [..., n] zero-padded so the circular correlation is linear.
    irfft(conj(rfft(a)) * rfft(b)) as six MXU matmuls — XLA's TPU FFT is
    ~10x slower at these sizes (see module docstring).
    """
    cos, sin = rfft_bases(n)
    cos = jnp.asarray(cos, a.dtype)
    sin = jnp.asarray(sin, a.dtype)
    re_a = jnp.matmul(a, cos, precision=DFT_PRECISION)
    im_a = jnp.matmul(a, sin, precision=DFT_PRECISION)   # -Im(rfft(a))
    re_b = jnp.matmul(b, cos, precision=DFT_PRECISION)
    im_b = jnp.matmul(b, sin, precision=DFT_PRECISION)   # -Im(rfft(b))
    # conj(A) * B with A = re_a - j*im_a', where im stored negated:
    # Re = re_a re_b + im_a im_b ; Im = re_a (-im_b) - (-im_a) re_b
    re = re_a * re_b + im_a * im_b
    im = im_a * re_b - re_a * im_b
    return irfft_real(re, im, n, out_len)


def autocorr_at_lag(P: jnp.ndarray, lag: jnp.ndarray, n: int) -> jnp.ndarray:
    """r(lag) = irfft(two_sided(P))[lag] for per-row lags, FFT-free.

    P [..., K] one-sided power spectrum; lag [...] (broadcastable to P's
    batch shape), may be float (fractional lags are exact — the cosine
    basis is evaluated, not indexed).
    """
    K = P.shape[-1]
    w = jnp.asarray(autocorr_weights(n), P.dtype)
    k = jnp.arange(K, dtype=P.dtype)
    ang = (2.0 * jnp.pi / n) * lag[..., None] * k
    return jnp.sum(P * w * jnp.cos(ang), axis=-1)
