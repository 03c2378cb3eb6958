"""Astronomy-flavored variability kernels (pure NumPy).

Parity targets: /root/reference/src/misc/frac.rs and src/misc/var.rs.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "fractional_variability",
    "fractional_variability_error",
    "rolling_fractional_variability",
    "calc_variability_timescale",
    "variability_statistics",
]


def _fvar_terms(flux: np.ndarray, flux_err: np.ndarray):
    if flux.size == 0 or flux_err.size != flux.size:
        raise ValueError("Input arrays are empty or have mismatched lengths.")
    if (flux < 0.0).any():
        raise ValueError("Flux values cannot be negative.")
    n = float(flux.size)
    mean = float(flux.sum() / n)
    if mean == 0.0:
        return n, 0.0, None, None  # NaN signal
    if n < 2.0:
        raise ValueError("Input arrays must have at least two elements.")
    variance = float(((flux - mean) ** 2).sum() / (n - 1.0))  # SAMPLE variance, frac.rs:31-35
    mean_err_sq = float((flux_err**2).sum() / n)
    return n, mean, variance, mean_err_sq


def fractional_variability(flux, flux_err) -> float:
    """Fvar = sqrt(S^2 - <err^2>)/<x> (src/misc/frac.rs:12-47); NaN on zero
    mean; 0.0 when S^2 <= <err^2>."""
    flux = np.asarray(flux, dtype=np.float64)
    flux_err = np.asarray(flux_err, dtype=np.float64)
    n, mean, variance, mean_err_sq = _fvar_terms(flux, flux_err)
    if variance is None:
        return float("nan")
    if variance <= mean_err_sq:
        return 0.0
    return float(np.sqrt(variance - mean_err_sq) / mean)


def fractional_variability_error(flux, flux_err) -> float:
    """Vaughan et al. (2003) error propagation (src/misc/frac.rs:49-89)."""
    flux = np.asarray(flux, dtype=np.float64)
    flux_err = np.asarray(flux_err, dtype=np.float64)
    n, mean, variance, mean_err_sq = _fvar_terms(flux, flux_err)
    if variance is None:
        return float("nan")
    if variance <= mean_err_sq:
        return 0.0
    fvar = np.sqrt(variance - mean_err_sq) / mean
    term1 = np.sqrt(1.0 / (2.0 * n)) * mean_err_sq / (mean * mean * fvar)
    term2 = np.sqrt(mean_err_sq / n) / mean
    return float(np.sqrt(term1 * term1 + term2 * term2))


def rolling_fractional_variability(flux, flux_err, window_size: int):
    """(fvar[], fvar_err[]) per sliding window (src/misc/frac.rs:95-115)."""
    flux = np.asarray(flux, dtype=np.float64)
    flux_err = np.asarray(flux_err, dtype=np.float64)
    if flux.size == 0 or flux_err.size != flux.size or window_size == 0 or flux.size < window_size:
        raise ValueError("Invalid input for rolling fractional variability.")
    fv, fe = [], []
    for i in range(flux.size - window_size + 1):
        fw = flux[i : i + window_size]
        ew = flux_err[i : i + window_size]
        fv.append(fractional_variability(fw, ew))
        fe.append(fractional_variability_error(fw, ew))
    return np.asarray(fv), np.asarray(fe)


def _tau_values(time: np.ndarray, flux: np.ndarray, flux_err: np.ndarray) -> np.ndarray:
    """Vectorized adjacent-pair tau = dt/|ln(f2/f1)| over significant pairs
    (src/misc/var.rs:14-45)."""
    dt = np.diff(time)
    f1, f2 = flux[:-1], flux[1:]
    with np.errstate(divide="ignore", invalid="ignore"):
        dlnf = np.abs(np.log(np.where((f1 > 0) & (f2 > 0), f2 / np.where(f1 > 0, f1, 1.0), 1.0)))
    combined_err = np.sqrt(flux_err[:-1] ** 2 + flux_err[1:] ** 2)
    ok = (dt > 0) & (f1 > 0) & (f2 > 0) & (dlnf != 0) & (np.abs(f2 - f1) >= combined_err)
    # reference uses strict `<` for insignificance → keep pairs with diff >= err
    return dt[ok] / dlnf[ok]


def calc_variability_timescale(time, flux, flux_err):
    """Min tau over significant adjacent pairs (src/misc/var.rs:7-47);
    None when nothing qualifies."""
    time = np.asarray(time, dtype=np.float64)
    flux = np.asarray(flux, dtype=np.float64)
    flux_err = np.asarray(flux_err, dtype=np.float64)
    if time.size < 2 or flux.size < 2 or flux_err.size < 2:
        return None
    taus = _tau_values(time, flux, flux_err)
    return float(taus.min()) if taus.size else None


def variability_statistics(time, flux, flux_err) -> dict:
    """min/max/mean/median/std(pop)/count of the tau distribution
    (src/misc/var.rs:62-150); None-valued dict when empty."""
    time = np.asarray(time, dtype=np.float64)
    flux = np.asarray(flux, dtype=np.float64)
    flux_err = np.asarray(flux_err, dtype=np.float64)
    empty = {"min": None, "max": None, "mean": None, "median": None, "std_dev": None, "count": 0}
    if time.size < 2 or flux.size < 2 or flux_err.size < 2:
        return empty
    taus = np.sort(_tau_values(time, flux, flux_err))
    if taus.size == 0:
        return empty
    count = int(taus.size)
    mean = float(taus.sum() / count)
    median = float((taus[count // 2 - 1] + taus[count // 2]) / 2.0) if count % 2 == 0 else float(taus[count // 2])
    std = float(np.sqrt(((taus - mean) ** 2).sum() / count))
    return {
        "min": float(taus[0]),
        "max": float(taus[-1]),
        "mean": mean,
        "median": median,
        "std_dev": std,
        "count": count,
    }
