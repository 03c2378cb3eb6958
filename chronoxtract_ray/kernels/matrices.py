"""Matrix-transform kernels (pure NumPy).

Parity target: /root/reference/src/matrices/mod.rs. The reference's rayon
thresholds (Hankel rows >=512 etc.) are an intra-process concern; here NumPy
vectorization covers it and cross-series parallelism comes from Ray.
"""

from __future__ import annotations

import numpy as np

__all__ = ["time_delay_embedding", "gramian_angular_summation_field", "markov_transition_field"]


def _validate(x: np.ndarray):
    if x.size == 0:
        raise ValueError("Input time series cannot be empty")
    if not np.isfinite(x).all():
        raise ValueError("Input time series must contain only finite values")


def _degenerate_range(mn: float, mx: float) -> bool:
    """src/matrices/mod.rs:26-29."""
    scale = max(abs(mn), abs(mx), 1.0)
    return abs(mx - mn) <= 1e-12 * scale


def time_delay_embedding(x, window_length: int) -> np.ndarray:
    """Hankel matrix H[i,j] = x[i+j], shape (n-L+1, L)
    (src/matrices/mod.rs:52-97)."""
    x = np.asarray(x, dtype=np.float64)
    _validate(x)
    if window_length == 0:
        raise ValueError("window_length must be greater than 0")
    if window_length > x.size:
        raise ValueError("window_length must be less than or equal to time series length")
    return np.lib.stride_tricks.sliding_window_view(x, window_length).copy()


def gramian_angular_summation_field(x) -> np.ndarray:
    """GASF via the algebraic form x'x'^T - s s^T with s = sqrt(1-x'^2)
    (src/matrices/mod.rs:122-171); degenerate range normalizes to zeros."""
    x = np.asarray(x, dtype=np.float64)
    _validate(x)
    mn, mx = float(x.min()), float(x.max())
    if _degenerate_range(mn, mx):
        norm = np.zeros_like(x)
    else:
        norm = np.clip(2.0 * (x - mn) / (mx - mn) - 1.0, -1.0, 1.0)
    s = np.sqrt(np.maximum(1.0 - norm * norm, 0.0))
    return np.outer(norm, norm) - np.outer(s, s)


def markov_transition_field(x, num_bins: int) -> np.ndarray:
    """MTF M[i,j] = P[q_i, q_j] from the row-normalized first-order transition
    matrix over Q min-max bins (src/matrices/mod.rs:197-269)."""
    x = np.asarray(x, dtype=np.float64)
    _validate(x)
    if num_bins < 2:
        raise ValueError("num_bins must be at least 2")
    n = x.size
    mn, mx = float(x.min()), float(x.max())
    if _degenerate_range(mn, mx):
        bins = np.zeros(n, dtype=np.int64)
    else:
        scaled = np.clip((x - mn) / (mx - mn), 0.0, 1.0)
        bins = np.minimum(np.floor(scaled * num_bins).astype(np.int64), num_bins - 1)
    transition = np.zeros((num_bins, num_bins), dtype=np.float64)
    if n > 1:
        np.add.at(transition, (bins[:-1], bins[1:]), 1.0)
    row_sums = transition.sum(axis=1, keepdims=True)
    transition = np.divide(transition, row_sums, out=transition, where=row_sums > 0)
    return transition[np.ix_(bins, bins)]
