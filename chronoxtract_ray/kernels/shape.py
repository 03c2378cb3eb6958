"""Shape / slope / peak-statistic kernels (pure NumPy).

Parity target: /root/reference/src/shape/mod.rs.

Note the reference has TWO peak stacks: the scipy-like ``find_peaks`` /
``peak_prominence`` in src/peaks/ (see peaks.py here) and this module's
strict-maxima + global-side-minima prominence stack (src/shape/mod.rs:224-390).
They intentionally differ; both are reproduced.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "zero_crossing_rate",
    "slope_features",
    "mean_slope",
    "slope_variance",
    "max_slope",
    "variability_features",
    "turning_points",
    "energy_distribution",
    "enhanced_peak_stats",
    "peak_to_peak_amplitude",
]


def zero_crossing_rate(x) -> float:
    """Sign changes (>=0 convention, src/shape/mod.rs:180-194) / (n-1)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2:
        raise ValueError("Time series must have at least 2 points")
    nonneg = x >= 0.0
    crossings = int((nonneg[1:] != nonneg[:-1]).sum())
    return crossings / float(x.size - 1)


def slope_features(x):
    """(mean_slope, slope_variance(pop), max |slope|) over first differences
    (src/shape/mod.rs:196-222)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2:
        raise ValueError("Time series must have at least 2 points")
    s = np.diff(x)
    mean = s.sum() / s.size
    var = ((s - mean) ** 2).sum() / s.size
    return float(mean), float(var), float(np.abs(s).max(initial=0.0))


def mean_slope(x) -> float:
    return slope_features(x)[0]


def slope_variance(x) -> float:
    return slope_features(x)[1]


def max_slope(x) -> float:
    return slope_features(x)[2]


def variability_features(x):
    """(CV, quartile coeff of dispersion, MAD, IQR).

    IMPORTANT: quartiles here are the INDEX-based sorted[n/4], sorted[n/2],
    sorted[3n/4] (src/shape/mod.rs:408-418), not interpolated quantiles.
    MAD uses sorted_deviations[len/2] (src/shape/mod.rs:424-431)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        raise ValueError("Input time series cannot be empty")
    mean = x.sum() / n
    std = np.sqrt(((x - mean) ** 2).sum() / n)
    cv = float(std / abs(mean)) if mean != 0.0 else 0.0
    s = np.sort(x)
    q1, q2, q3 = s[n // 4], s[n // 2], s[3 * n // 4]
    qcd = float((q3 - q1) / (q3 + q1)) if (q1 + q3) != 0.0 else 0.0
    dev = np.sort(np.abs(x - q2))
    mad = float(dev[dev.size // 2])
    return cv, qcd, mad, float(q3 - q1)


def turning_points(x):
    """(count, rate over n-2) of strict local extrema
    (src/shape/mod.rs:439-459)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < 3:
        raise ValueError("Time series must have at least 3 points")
    mid, left, right = x[1:-1], x[:-2], x[2:]
    tp = int((((mid > left) & (mid > right)) | ((mid < left) & (mid < right))).sum())
    return tp, tp / float(n - 2)


def energy_distribution(x):
    """(energy entropy [nats], mean energy, top-ceil(10%) concentration)
    (src/shape/mod.rs:461-498)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        raise ValueError("Input time series cannot be empty")
    e = x * x
    total = e.sum()
    if total == 0.0:
        return 0.0, 0.0, 0.0
    p = e / total
    nz = p > 0
    entropy = float(-(p[nz] * np.log(p[nz])).sum())
    top = int(np.ceil(n * 0.1))
    concentrated = np.sort(e)[::-1][:top].sum()
    return entropy, float(total / n), float(concentrated / total)


# ---- shape-module peak stack (src/shape/mod.rs:224-390) ----


def _shape_prominence(x: np.ndarray, idx: int) -> float:
    """Global side-minima prominence (src/shape/mod.rs:289-304):
    peak - max(min(x[:idx]), min(x[idx+1:])) with the peak value standing in
    for an empty side."""
    pv = x[idx]
    left = x[:idx].min() if idx > 0 else pv
    right = x[idx + 1 :].min() if idx + 1 < x.size else pv
    return float(pv - max(left, right))


def _find_peaks_with_prominence(x: np.ndarray, min_prominence: float, min_distance: int) -> np.ndarray:
    """Strict local maxima filtered by prominence then greedy min-distance
    (src/shape/mod.rs:267-321)."""
    n = x.size
    if n < 3:
        return np.empty(0, dtype=np.int64)
    mid = x[1:-1]
    cand = np.flatnonzero((mid > x[:-2]) & (mid > x[2:])) + 1
    peaks = [int(i) for i in cand if _shape_prominence(x, int(i)) >= min_prominence]
    if len(peaks) <= 1:
        return np.asarray(peaks, dtype=np.int64)
    kept = [peaks[0]]
    for p in peaks[1:]:
        if p - kept[-1] >= min_distance:
            kept.append(p)
    return np.asarray(kept, dtype=np.int64)


def _mean_peak_width(x: np.ndarray, peaks: np.ndarray) -> float:
    """Half-prominence width walk-out (src/shape/mod.rs:323-352)."""
    if peaks.size == 0:
        return 0.0
    total = 0.0
    n = x.size
    for p in peaks:
        level = x[p] - _shape_prominence(x, int(p)) / 2.0
        li = int(p)
        while li > 0 and x[li] > level:
            li -= 1
        ri = int(p)
        while ri < n - 1 and x[ri] > level:
            ri += 1
        total += ri - li
    return total / peaks.size


def _peak_amplitudes(x: np.ndarray, peaks: np.ndarray):
    """Between-consecutive-peak amplitudes relative to the valley between them
    (src/shape/mod.rs:371-390)."""
    amps = []
    for a, b in zip(peaks[:-1], peaks[1:]):
        valley = x[a : b + 1].min()
        amps.append(max(x[a] - valley, x[b] - valley))
    max_amp = max(amps, default=0.0)
    return float(max_amp), amps


def enhanced_peak_stats(x, min_prominence: float | None = None, min_distance: int | None = None):
    """(count, mean prominence, mean spacing, mean half-prom width,
    max p2p amplitude, density) — src/shape/mod.rs:96-111, 224-265."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 3:
        raise ValueError("Time series must have at least 3 points")
    mp = 0.1 if min_prominence is None else min_prominence
    md = 1 if min_distance is None else min_distance
    peaks = _find_peaks_with_prominence(x, mp, md)
    if peaks.size == 0:
        return 0, 0.0, 0.0, 0.0, 0.0, 0.0
    proms = np.array([_shape_prominence(x, int(p)) for p in peaks])
    mean_prom = float(proms.mean())
    spacing = float(np.diff(peaks).mean()) if peaks.size > 1 else 0.0
    width = _mean_peak_width(x, peaks)
    max_p2p, _ = _peak_amplitudes(x, peaks)
    return int(peaks.size), mean_prom, spacing, width, max_p2p, peaks.size / float(x.size)


def peak_to_peak_amplitude(x):
    """(max, mean, std[pop]) of between-peak amplitudes with prominence 0.01,
    distance 1 (src/shape/mod.rs:354-369)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 3:
        raise ValueError("Time series must have at least 3 points")
    peaks = _find_peaks_with_prominence(x, 0.01, 1)
    max_amp, amps = _peak_amplitudes(x, peaks)
    if not amps:
        return 0.0, 0.0, 0.0
    a = np.asarray(amps)
    mean = a.sum() / a.size
    std = float(np.sqrt(((a - mean) ** 2).sum() / a.size))
    return float(max_amp), float(mean), std
