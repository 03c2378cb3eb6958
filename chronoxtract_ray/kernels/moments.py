"""Summary-statistic kernels (pure NumPy, no Ray).

Behavioral parity targets (reference = /root/reference, amanasci/ChronoXtract):

- raw-moment single-pass accumulation: src/stats/mod.rs:21-79
- population variance as E[x^2] - E[x]^2: src/stats/mod.rs:46
- skew/kurt gated to ``None`` when std_dev <= 1e-9: src/stats/mod.rs:49-65
- median explicit even/odd average: src/stats/mod.rs:91-95
- quantiles via linear interpolation at pos = q*(n-1): src/stats/mod.rs:98-110
- mode over bit-exact value counts: src/stats/mod.rs:116-130 (the reference's
  tie-break depends on HashMap iteration order and is non-deterministic; this
  engine deterministically returns the SMALLEST value among the tied — a
  documented divergence)
- central moments 5..8: src/higherorder/mod.rs:192-203

The reference accumulates sums in index order; NumPy uses pairwise summation.
Equality therefore holds to np.isclose tolerance (the reference's own test
tolerance, tests/test_stats.py), not bit-for-bit.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "summary_statistics",
    "time_series_summary",
    "calculate_mean",
    "calculate_median",
    "calculate_mode",
    "calculate_variance",
    "calculate_std_dev",
    "calculate_skewness",
    "calculate_kurtosis",
    "calculate_min_max_range",
    "calculate_quantiles",
    "calculate_sum",
    "calculate_absolute_energy",
    "median_and_quantiles",
    "higher_moments",
    "central_moment",
]

_QUANTS = (0.05, 0.25, 0.75, 0.95)
_STD_EPS = 1e-9  # src/stats/mod.rs:49


def _require_nonempty(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        raise ValueError("Input time series cannot be empty")
    return x


def summary_statistics(x: np.ndarray) -> dict:
    """Raw-moment summary. Mirrors _calculate_summary_statistics
    (src/stats/mod.rs:21-79). skewness/kurtosis are None when std<=1e-9."""
    x = np.asarray(x, dtype=np.float64)
    n = float(x.size)
    x2 = x * x
    s1 = float(x.sum())
    s2 = float(x2.sum())
    s3 = float((x2 * x).sum())
    s4 = float((x2 * x2).sum())
    m1, m2, m3, m4 = s1 / n, s2 / n, s3 / n, s4 / n
    variance = m2 - m1 * m1
    # Rust f64::sqrt of a (tiny) negative cancellation artifact yields NaN; so
    # does np.sqrt — keep identical behavior.
    with np.errstate(invalid="ignore"):
        std_dev = float(np.sqrt(variance))
    if std_dev > _STD_EPS:
        mu3 = m3 - 3.0 * m1 * m2 + 2.0 * m1**3
        mu4 = m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1**4
        skewness = mu3 / variance**1.5
        kurtosis = mu4 / (variance * variance) - 3.0
    else:
        skewness = None
        kurtosis = None
    mn = float(x.min())
    mx = float(x.max())
    return {
        "mean": m1,
        "variance": variance,
        "std_dev": std_dev,
        "skewness": skewness,
        "kurtosis": kurtosis,
        "min": mn,
        "max": mx,
        "range": mx - mn,
        "sum": s1,
        "energy": s2,
    }


def median_and_quantiles(x: np.ndarray, sorted_x: np.ndarray | None = None):
    """(median, [q05,q25,q75,q95]) per src/stats/mod.rs:81-114."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        return float("nan"), [float("nan")] * 4
    s = np.sort(x) if sorted_x is None else sorted_x
    if n % 2 == 0:
        median = (s[n // 2 - 1] + s[n // 2]) / 2.0
    else:
        median = s[n // 2]
    qs = []
    for q in _QUANTS:
        pos = q * (n - 1)
        lo = int(np.floor(pos))
        hi = int(np.ceil(pos))
        if lo == hi:
            qs.append(float(s[lo]))
        else:
            frac = pos - lo
            qs.append(float(s[lo] * (1.0 - frac) + s[hi] * frac))
    return float(median), qs


def calculate_mode(x: np.ndarray) -> float:
    """Bit-exact value mode; deterministic smallest-value tie-break.

    Reference: src/stats/mod.rs:116-130 (its HashMap-order tie-break is
    non-deterministic; we pin 'smallest value wins')."""
    x = _require_nonempty(x)
    vals, counts = np.unique(x, return_counts=True)  # vals sorted ascending
    return float(vals[np.argmax(counts)])  # argmax -> first max -> smallest value


def time_series_summary(x: np.ndarray) -> dict:
    """Full 16-key summary dict with the reference's exact key names.

    Mirrors time_series_summary (src/lib.rs:59-99): raises on empty/NaN input,
    omits skewness/kurtosis keys when std<=1e-9."""
    x = _require_nonempty(x)
    if np.isnan(x).any():
        raise ValueError("Input contains NaN values")
    st = summary_statistics(x)
    median, qs = median_and_quantiles(x)
    out = {
        "mean": st["mean"],
        "median": median,
        "mode": calculate_mode(x),
        "variance": st["variance"],
        "standard_deviation": st["std_dev"],
    }
    if st["skewness"] is not None:
        out["skewness"] = st["skewness"]
    if st["kurtosis"] is not None:
        out["kurtosis"] = st["kurtosis"]
    out.update(
        {
            "minimum": st["min"],
            "maximum": st["max"],
            "range": st["range"],
            "q05": qs[0],
            "q25": qs[1],
            "q75": qs[2],
            "q95": qs[3],
            "sum": st["sum"],
            "absolute_energy": st["energy"],
        }
    )
    return out


def calculate_mean(x):  # src/stats/mod.rs:169-175
    return summary_statistics(_require_nonempty(x))["mean"]


def calculate_median(x):  # src/stats/mod.rs:191-197
    return median_and_quantiles(_require_nonempty(x))[0]


def calculate_variance(x):  # src/stats/mod.rs:213-219
    return summary_statistics(_require_nonempty(x))["variance"]


def calculate_std_dev(x):  # src/stats/mod.rs:235-241
    return summary_statistics(_require_nonempty(x))["std_dev"]


def calculate_skewness(x):  # src/stats/mod.rs:258-264
    return summary_statistics(_require_nonempty(x))["skewness"]


def calculate_kurtosis(x):  # src/stats/mod.rs:281-287
    return summary_statistics(_require_nonempty(x))["kurtosis"]


def calculate_min_max_range(x):  # src/stats/mod.rs:302-309
    st = summary_statistics(_require_nonempty(x))
    return st["min"], st["max"], st["range"]


def calculate_quantiles(x):  # src/stats/mod.rs:324-331
    return np.asarray(median_and_quantiles(_require_nonempty(x))[1])


def calculate_sum(x):  # src/stats/mod.rs:346-352
    return summary_statistics(_require_nonempty(x))["sum"]


def calculate_absolute_energy(x):  # src/stats/mod.rs:368-374
    return summary_statistics(_require_nonempty(x))["energy"]


def central_moment(x: np.ndarray, order: int) -> float:
    """k-th central moment, naive two-pass (src/higherorder/mod.rs:192-203)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        return 0.0
    mean = x.sum() / x.size
    return float(((x - mean) ** order).sum() / x.size)


def higher_moments(x: np.ndarray):
    """(m5, m6, m7, m8) central moments (src/higherorder/mod.rs:63-71)."""
    x = _require_nonempty(x)
    return tuple(central_moment(x, k) for k in (5, 6, 7, 8))
