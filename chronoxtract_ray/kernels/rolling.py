"""Rolling / expanding per-element transforms (pure NumPy).

Parity target: /root/reference/src/rollingstats/mod.rs.
All outputs are arrays (length n-w+1 for windowed ops, n for scans); windows
never cross conversation boundaries because callers invoke these inside a
per-(conv_id) group.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "rolling_mean",
    "rolling_variance",
    "expanding_sum",
    "exponential_moving_average",
    "sliding_window_entropy",
]


def rolling_mean(x, window: int) -> np.ndarray:
    """Sliding-window mean, output length n-w+1 (src/rollingstats/mod.rs:6-19).

    The reference updates one running sum incrementally; a cumulative sum
    reproduces it to float tolerance and stays O(n) vectorized."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if window <= 0 or window > n:
        return np.empty(0, dtype=np.float64)
    c = np.concatenate(([0.0], np.cumsum(x)))
    return (c[window:] - c[:-window]) / float(window)


def rolling_variance(x, window: int) -> np.ndarray:
    """Per-window population variance (src/rollingstats/mod.rs:23-35).

    The reference recomputes each window two-pass (ndarray ``var(0.0)``), so we
    use the numerically-equivalent two-pass form per window, vectorized via
    sliding_window_view (cancellation-free, unlike cumsum-of-squares)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if window <= 0 or window > n:
        return np.empty(0, dtype=np.float64)
    w = np.lib.stride_tricks.sliding_window_view(x, window)
    mu = w.mean(axis=1, keepdims=True)
    return np.mean((w - mu) ** 2, axis=1)


def expanding_sum(x) -> np.ndarray:
    """Cumulative sum (src/rollingstats/mod.rs:39-48)."""
    return np.cumsum(np.asarray(x, dtype=np.float64))


def exponential_moving_average(x, alpha: float, exact: bool = False) -> np.ndarray:
    """EMA seeded with x[0] (src/rollingstats/mod.rs:52-64).

    ema[i] = alpha*x[i] + (1-alpha)*ema[i-1]. Order-dependent: callers must
    sort by (ts, turn_idx) first. Vectorized with a decay power-scan; falls
    back to the sequential loop when (1-alpha)**n underflows.

    ``exact=True`` forces the sequential recurrence (the reference's exact
    float-op order, bit-identical to a SQL recursive CTE computing
    ``a*x + (1-a)*prev`` in doubles); the power-scan is ~1 ulp * beta^-i off
    that, which matters only for hash-exact oracle comparison."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        return x
    beta = 1.0 - alpha
    if beta == 0.0:
        return x.copy()
    # ema[i] = beta^i * x0 + alpha * sum_{k=1..i} beta^(i-k) x[k]
    # Stable for moderate n; if beta^n underflows/overflows intermediate
    # scaling, use the sequential scan (still cheap per group).
    if not exact and n <= 2048 and abs(beta) ** n > 1e-280:
        powers = beta ** np.arange(n)  # beta^i
        scaled = np.empty(n)
        scaled[0] = x[0]
        scaled[1:] = alpha * x[1:] / powers[1:]
        return np.cumsum(scaled) * powers
    out = np.empty(n)
    out[0] = x[0]
    prev = x[0]
    for i in range(1, n):
        prev = alpha * x[i] + beta * prev
        out[i] = prev
    return out


def sliding_window_entropy(x, window: int, bins: int) -> np.ndarray:
    """Per-window min-max histogram Shannon entropy in bits
    (src/rollingstats/mod.rs:68-104). Zero-range windows yield 0.0."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if window <= 0 or window > n or bins <= 0:
        return np.empty(0, dtype=np.float64)
    w = np.lib.stride_tricks.sliding_window_view(x, window)  # (m, window)
    mn = w.min(axis=1, keepdims=True)
    mx = w.max(axis=1, keepdims=True)
    rng = mx - mn
    ok = (rng != 0.0).ravel()
    out = np.zeros(w.shape[0], dtype=np.float64)
    if ok.any():
        wo = w[ok]
        b = np.floor((wo - mn[ok]) / rng[ok] * bins).astype(np.int64)
        np.clip(b, 0, bins - 1, out=b)
        # histogram each row: offset rows into disjoint bin ranges, one bincount
        rows = np.arange(b.shape[0])[:, None]
        counts = np.bincount((rows * bins + b).ravel(), minlength=b.shape[0] * bins)
        counts = counts.reshape(b.shape[0], bins).astype(np.float64)
        p = counts / float(window)
        with np.errstate(divide="ignore", invalid="ignore"):
            term = np.where(p > 0, p * np.log2(p), 0.0)
        out[ok] = -term.sum(axis=1)
    return out
