"""scipy-like peak detection kernels (pure NumPy).

Parity target: /root/reference/src/peaks/peak_func.rs.
"""

from __future__ import annotations

import numpy as np

__all__ = ["find_peaks", "peak_prominence"]


def find_peaks(data, height: float | None = None, distance: int | None = None) -> np.ndarray:
    """Plateau-aware local maxima (src/peaks/peak_func.rs:1-40).

    Rise into the peak must be strict; plateaus report their midpoint; greedy
    min-distance against the last accepted peak. Divergence note: a plateau
    that runs to the final sample indexes one-past-the-end in the reference
    (would panic); this engine treats it as not-a-peak.
    """
    x = np.asarray(data, dtype=np.float64)
    n = x.size
    peaks: list[int] = []
    if n == 0:
        return np.empty(0, dtype=np.int64)
    i = 1
    while i < n - 1:
        if x[i] > x[i - 1] and x[i] >= x[i + 1]:
            plateau_start = i
            plateau_end = i
            while plateau_end < n - 1 and x[plateau_end] == x[plateau_end + 1]:
                plateau_end += 1
            if plateau_end + 1 >= n:
                # trailing plateau: reference indexes data[n] (panic); skip it.
                i = plateau_end + 1
                continue
            if x[plateau_start] > x[plateau_end + 1]:
                peak_pos = (plateau_start + plateau_end) // 2
                if height is not None and x[peak_pos] < height:
                    i = plateau_end + 1
                    continue
                if distance is not None and peaks and peak_pos - peaks[-1] < distance:
                    i = plateau_end + 1
                    continue
                peaks.append(peak_pos)
            i = plateau_end + 1
        else:
            i += 1
    return np.asarray(peaks, dtype=np.int64)


def peak_prominence(data, peaks) -> np.ndarray:
    """Walk-out-while-<=-peak minima, base = max(left_min, right_min)
    (src/peaks/peak_func.rs:42-63)."""
    x = np.asarray(data, dtype=np.float64)
    out = []
    for p in np.asarray(peaks, dtype=np.int64):
        pv = x[p]
        left_min = None
        for i in range(p - 1, -1, -1):
            if x[i] > pv:
                break
            left_min = x[i] if left_min is None else min(left_min, x[i])
        right_min = None
        for i in range(p + 1, x.size):
            if x[i] > pv:
                break
            right_min = x[i] if right_min is None else min(right_min, x[i])
        if left_min is not None and right_min is not None:
            base = max(left_min, right_min)
        elif left_min is not None:
            base = left_min
        elif right_min is not None:
            base = right_min
        else:
            base = pv
        out.append(pv - base)
    return np.asarray(out, dtype=np.float64)
