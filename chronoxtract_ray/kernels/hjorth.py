"""Hjorth parameters (pure NumPy).

Parity target: /root/reference/src/higherorder/mod.rs:115-182.
- activity = population variance (÷n)
- mobility = sqrt(var(diff x) / var(x)); 0.0 when activity <= 0
- complexity = mobility(diff x) / mobility(x); 1.0 fallbacks when the first
  derivative has no variance or mobility(x) <= 0
"""

from __future__ import annotations

import numpy as np

__all__ = ["hjorth_activity", "hjorth_mobility", "hjorth_complexity", "hjorth_parameters"]


def _popvar(x: np.ndarray) -> float:
    if x.size == 0:
        return 0.0
    m = x.sum() / x.size
    return float(((x - m) ** 2).sum() / x.size)


def hjorth_activity(x) -> float:
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        raise ValueError("Input time series cannot be empty")
    return _popvar(x)


def hjorth_mobility(x) -> float:
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2:
        raise ValueError("Time series must have at least 2 points for mobility")
    activity = _popvar(x)
    if activity <= 0.0:
        return 0.0
    return float(np.sqrt(_popvar(np.diff(x)) / activity))


def hjorth_complexity(x) -> float:
    x = np.asarray(x, dtype=np.float64)
    if x.size < 3:
        raise ValueError("Time series must have at least 3 points for complexity")
    d1 = np.diff(x)
    d2 = np.diff(d1)
    var_d1 = _popvar(d1)
    if var_d1 <= 0.0:
        return 1.0
    mob_x = hjorth_mobility(x)
    if mob_x <= 0.0:
        return 1.0
    mob_d1 = np.sqrt(_popvar(d2) / var_d1)
    return float(mob_d1 / mob_x)


def hjorth_parameters(x):
    """(activity, mobility, complexity); needs >= 3 points
    (src/higherorder/mod.rs:18-29)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 3:
        raise ValueError("Time series must have at least 3 points for Hjorth parameters")
    return hjorth_activity(x), hjorth_mobility(x), hjorth_complexity(x)
