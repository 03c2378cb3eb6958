"""Seasonality / trend kernels (pure NumPy).

Parity target: /root/reference/src/seasonality/mod.rs.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "simple_stl_decomposition",
    "seasonal_trend_strength",
    "seasonal_strength",
    "trend_strength",
    "detect_seasonality",
    "autocorrelation",
    "detrended_fluctuation_analysis",
]


def _popvar(x: np.ndarray) -> float:
    if x.size == 0:
        return 0.0
    m = x.sum() / x.size
    return float(((x - m) ** 2).sum() / x.size)


def _moving_average(x: np.ndarray, window_size: int) -> np.ndarray:
    """Centered moving average with edge-shrinking windows
    (src/seasonality/mod.rs:215-230): window [i-half, i+half] clipped."""
    n = x.size
    half = window_size // 2
    c = np.concatenate(([0.0], np.cumsum(x)))
    idx = np.arange(n)
    start = np.maximum(idx - half, 0)
    end = np.minimum(idx + half + 1, n)
    return (c[end] - c[start]) / (end - start)


def simple_stl_decomposition(x, period: int):
    """(trend, seasonal, remainder); trend = centered MA with window
    int(period*1.5); seasonal = per-phase mean of detrended
    (src/seasonality/mod.rs:172-213). Additive: x = t + s + r exactly."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < 2 * period:
        raise ValueError("Time series must be at least 2 times the period length")
    if period < 2:
        raise ValueError("Period must be at least 2")
    window_size = int(period * 1.5)
    trend = _moving_average(x, window_size)
    detrended = x - trend
    phases = np.arange(n) % period
    sums = np.bincount(phases, weights=detrended, minlength=period)
    counts = np.bincount(phases, minlength=period)
    pattern = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
    seasonal = pattern[phases]
    remainder = x - trend - seasonal
    return trend, seasonal, remainder


def seasonal_trend_strength(x, period: int):
    """(seasonal_strength, trend_strength) = 1 - var(rem)/var(component+rem),
    clamped >= 0 (src/seasonality/mod.rs:148-170)."""
    trend, seasonal, remainder = simple_stl_decomposition(x, period)
    var_r = _popvar(remainder)
    var_sr = _popvar(seasonal + remainder)
    var_tr = _popvar(trend + remainder)
    ss = 1.0 - max(var_r / var_sr, 0.0) if var_sr > 0.0 else 0.0
    ts = 1.0 - max(var_r / var_tr, 0.0) if var_tr > 0.0 else 0.0
    return max(ss, 0.0), max(ts, 0.0)


def seasonal_strength(x, period: int) -> float:
    return seasonal_trend_strength(x, period)[0]


def trend_strength(x, period: int) -> float:
    return seasonal_trend_strength(x, period)[1]


def autocorrelation(x, lag: int) -> float:
    """Biased-denominator ACF at one lag (src/seasonality/mod.rs:238-265)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if lag >= n:
        return 0.0
    mean = x.mean() if n else 0.0
    d = x - mean
    num = float((d[: n - lag] * d[lag:]).sum())
    den = float((d * d).sum())
    return num / den if den > 0.0 else 0.0


def detect_seasonality(x, period: int, threshold: float | None = None) -> bool:
    """|ACF(period)| > threshold (default 0.3)
    (src/seasonality/mod.rs:99-110, 232-236)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < period + 1:
        raise ValueError("Time series must be longer than the period")
    if period < 1:
        raise ValueError("Period must be at least 1")
    return bool(abs(autocorrelation(x, period)) > (0.3 if threshold is None else threshold))


def _linear_fit_indices(y: np.ndarray):
    """OLS of y against 0..n-1 via closed-form sums
    (src/seasonality/mod.rs:334-347)."""
    n = float(y.size)
    sum_x = n * (n - 1.0) / 2.0
    sum_y = float(y.sum())
    sum_xx = n * (n - 1.0) * (2.0 * n - 1.0) / 6.0
    sum_xy = float((np.arange(y.size) * y).sum())
    slope = (n * sum_xy - sum_x * sum_y) / (n * sum_xx - sum_x * sum_x)
    intercept = (sum_y - slope * sum_x) / n
    return slope, intercept


def _fluctuation(integrated: np.ndarray, window_size: int) -> float:
    """RMS of per-window detrended variance (src/seasonality/mod.rs:305-332)."""
    n = integrated.size
    num_windows = n // window_size
    total = 0.0
    for i in range(num_windows):
        w = integrated[i * window_size : (i + 1) * window_size]
        slope, intercept = _linear_fit_indices(w)
        resid = w - (slope * np.arange(window_size) + intercept)
        total += float((resid * resid).sum()) / window_size
    return float(np.sqrt(total / num_windows))


def detrended_fluctuation_analysis(x, min_window: int, max_window: int, num_windows: int) -> float:
    """DFA scaling exponent via log-spaced windows and a log-log fit
    (src/seasonality/mod.rs:267-303)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < max_window:
        raise ValueError("Time series must be longer than max_window")
    if min_window >= max_window:
        raise ValueError("min_window must be less than max_window")
    if num_windows < 3:
        raise ValueError("num_windows must be at least 3")
    integrated = np.cumsum(x - (x.mean() if x.size else 0.0))
    log_min, log_max = np.log(min_window), np.log(max_window)
    step = (log_max - log_min) / (num_windows - 1)
    sizes, flucts = [], []
    for i in range(num_windows):
        ws = int(round(np.exp(log_min + i * step)))
        if min_window <= ws <= max_window:
            sizes.append(ws)
            flucts.append(_fluctuation(integrated, ws))
    if len(sizes) < 2:
        return 0.0
    lx = np.log(np.asarray(sizes, dtype=np.float64))
    ly = np.log(np.asarray(flucts, dtype=np.float64))
    n = float(lx.size)
    sum_x, sum_y = float(lx.sum()), float(ly.sum())
    sum_xx = float((lx * lx).sum())
    sum_xy = float((lx * ly).sum())
    return (n * sum_xy - sum_x * sum_y) / (n * sum_xx - sum_x * sum_x)
