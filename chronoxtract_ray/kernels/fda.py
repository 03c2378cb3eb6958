"""Frequency-domain kernels (pure NumPy).

Parity targets:
- FFT: /root/reference/src/fda/mod.rs:32-48 + src/fda/fft.rs:14-26. The
  reference computes in f32 internally then widens to complex128; its own
  tests only assert np.allclose against np.fft.fft (tests/test_fda.py:5-25),
  so this engine computes in f64 by default (exactly np.fft.fft) and offers
  ``emulate_f32=True`` for bit-closer parity experiments.
- Lomb-Scargle with per-frequency tau correction:
  /root/reference/src/fda/lombscargle.rs:31-74.
- FFT band energies are an engine-side feature (north star: "FFT-band
  energies"): |FFT|^2 summed over equal index bands of the one-sided
  spectrum, band 0 containing DC.
"""

from __future__ import annotations

import numpy as np

__all__ = ["perform_fft", "fft_band_energies", "lomb_scargle"]


def perform_fft(x, emulate_f32: bool = False) -> np.ndarray:
    """Forward FFT of a real series, complex128 out."""
    x = np.asarray(x, dtype=np.float64)
    if emulate_f32:
        return np.fft.fft(x.astype(np.float32).astype(np.complex64)).astype(np.complex128)
    return np.fft.fft(x)


def fft_band_energies(x, n_bands: int = 4) -> np.ndarray:
    """Sum of |FFT|^2 over ``n_bands`` equal index ranges of the one-sided
    spectrum (bins 0..n//2 inclusive). Returns a float64 array of length
    n_bands; trailing bands are 0.0 when the series is shorter than n_bands."""
    x = np.asarray(x, dtype=np.float64)
    spec = np.abs(np.fft.rfft(x)) ** 2
    out = np.zeros(n_bands, dtype=np.float64)
    edges = np.linspace(0, spec.size, n_bands + 1).astype(np.int64)
    for b in range(n_bands):
        out[b] = spec[edges[b] : edges[b + 1]].sum()
    return out


def lomb_scargle(t, y, freqs) -> np.ndarray:
    """Classic Lomb-Scargle periodogram with tau correction
    (src/fda/lombscargle.rs:31-74). Vectorized over (freqs x samples)."""
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    freqs = np.asarray(freqs, dtype=np.float64)
    if t.size != y.size:
        raise ValueError("t and y must have the same length.")
    omega = 2.0 * np.pi * freqs[:, None]  # (F, 1)
    arg2 = 2.0 * omega * t[None, :]  # (F, n)
    sum_sin2 = np.sin(arg2).sum(axis=1)
    sum_cos2 = np.cos(arg2).sum(axis=1)
    w = omega.ravel()
    with np.errstate(divide="ignore", invalid="ignore"):
        tau = np.where(
            np.abs(w) > np.finfo(float).eps,
            0.5 * np.arctan(sum_sin2 / sum_cos2) / w,
            0.0,
        )
    phi = omega * (t[None, :] - tau[:, None])
    c = np.cos(phi)
    s = np.sin(phi)
    sum_yc = (y[None, :] * c).sum(axis=1)
    sum_ys = (y[None, :] * s).sum(axis=1)
    sum_c2 = (c * c).sum(axis=1)
    sum_s2 = (s * s).sum(axis=1)
    eps = np.finfo(float).eps
    term_c = np.where(np.abs(sum_c2) > eps, sum_yc * sum_yc / np.where(sum_c2 == 0, 1, sum_c2), 0.0)
    term_s = np.where(np.abs(sum_s2) > eps, sum_ys * sum_ys / np.where(sum_s2 == 0, 1, sum_s2), 0.0)
    return 0.5 * (term_c + term_s)
