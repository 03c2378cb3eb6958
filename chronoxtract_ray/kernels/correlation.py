"""Two-series correlation kernels (pure NumPy).

Parity targets: /root/reference/src/correlation/{dcf.rs,acf.rs,zdcf.rs}.

Divergence note (documented): the reference's ZDCF uses ``thread_rng`` and is
non-reproducible (src/correlation/zdcf.rs:189); this engine takes an explicit
``seed`` so distributed runs are deterministic per (conv_id, window).
"""

from __future__ import annotations

import numpy as np

__all__ = ["dcf", "acf", "zdcf"]


def dcf(t1, v1, e1, t2, v2, e2, lag_min: float, lag_max: float, lag_bin_width: float) -> dict:
    """Edelson-Krolik discrete correlation function
    (src/correlation/dcf.rs:25-75). Errors are accepted but unused in the
    UDCF, exactly like the reference (dcf.rs:56). Empty bins are dropped.

    Returns {'lags','correlations','errors'} arrays, matching dcf_py
    (src/correlation/mod.rs:37-96)."""
    t1 = np.asarray(t1, dtype=np.float64)
    v1 = np.asarray(v1, dtype=np.float64)
    t2 = np.asarray(t2, dtype=np.float64)
    v2 = np.asarray(v2, dtype=np.float64)
    if t1.size < 2 or t2.size < 2:
        raise ValueError("Time series must have at least 2 points")
    mean1, mean2 = v1.sum() / v1.size, v2.sum() / v2.size
    std1 = np.sqrt(((v1 - mean1) ** 2).sum() / (v1.size - 1))
    std2 = np.sqrt(((v2 - mean2) ** 2).sum() / (v2.size - 1))
    # replicate the reference's float-accumulated bin edges (dcf.rs:40-45)
    edges = []
    cur = lag_min
    while cur <= lag_max:
        edges.append(cur)
        cur += lag_bin_width
    lag = t2[None, :] - t1[:, None]  # (n1, n2) pairwise lags
    udcf = ((v1 - mean1)[:, None] * (v2 - mean2)[None, :]) / (std1 * std2)
    lags_out, corr_out, err_out = [], [], []
    for bin_min, bin_max in zip(edges[:-1], edges[1:]):
        sel = (lag >= bin_min) & (lag < bin_max)
        vals = udcf[sel]
        if vals.size:
            n = float(vals.size)
            mean_udcf = float(vals.sum() / n)
            std_err = float(np.sqrt(((vals - mean_udcf) ** 2).sum() / (n - 1.0)) / np.sqrt(n)) if n > 1 else float("nan")
            lags_out.append((bin_min + bin_max) / 2.0)
            corr_out.append(mean_udcf)
            err_out.append(std_err)
    return {
        "lags": np.asarray(lags_out),
        "correlations": np.asarray(corr_out),
        "errors": np.asarray(err_out),
    }


def acf(t, v, e, lag_min: float, lag_max: float, lag_bin_width: float) -> dict:
    """DCF of a series with itself (src/correlation/acf.rs:5-12)."""
    return dcf(t, v, e, t, v, e, lag_min, lag_max, lag_bin_width)


def _alcbin(t1: np.ndarray, t2: np.ndarray, min_points: int):
    """Alexander's equal-population lag binning outward from the median pair
    (src/correlation/zdcf.rs:84-180). Returns a list of (i_idx, j_idx) pairs
    per bin, chronological order."""
    n1, n2 = t1.size, t2.size
    lag = (t2[None, :] - t1[:, None]).ravel()
    i_idx = np.repeat(np.arange(n1), n2)
    j_idx = np.tile(np.arange(n2), n1)
    order = np.argsort(lag, kind="stable")
    i_idx, j_idx = i_idx[order], j_idx[order]
    n_pairs = lag.size
    median_idx = n_pairs // 2

    def collect(start: int, step: int):
        bins = []
        pos = start
        while 0 <= pos < n_pairs:
            used1 = np.zeros(n1, dtype=bool)
            used2 = np.zeros(n2, dtype=bool)
            cur: list[tuple[int, int]] = []
            tmp = pos
            while 0 <= tmp < n_pairs and len(cur) < min_points:
                a, b = int(i_idx[tmp]), int(j_idx[tmp])
                if not used1[a] and not used2[b]:
                    cur.append((a, b))
                    used1[a] = True
                    used2[b] = True
                tmp += step
            if len(cur) >= min_points:
                bins.append(cur)
                pos = tmp
            else:
                break
        return bins

    negative = collect(median_idx - 1, -1)
    positive = collect(median_idx, +1)
    negative.reverse()
    return negative + positive


def _fishs(r: float, n: float) -> float:
    """Fisher small-sample s(z) (zdcf.rs:7-15)."""
    r2 = r * r
    nm1 = n - 1.0
    term = (1.0 / nm1) * (1.0 + (4.0 - r2) / (2.0 * nm1) + (22.0 - 6.0 * r2 - 3.0 * r2 * r2) / (6.0 * nm1 * nm1))
    return float(np.sqrt(max(term, 0.0)))


def _fishe(r: float, n: float) -> float:
    """Fisher small-sample E(z) (zdcf.rs:17-26)."""
    r2 = r * r
    nm1 = n - 1.0
    term1 = 0.5 * np.log((1.0 + r) / (1.0 - r))
    term2 = r / (2.0 * nm1)
    term3 = 1.0 + (5.0 + r2) / (4.0 * nm1)
    term4 = (11.0 + 2.0 * r2 + 3.0 * r2 * r2) / (8.0 * nm1 * nm1)
    return float(term1 + term2 * (term3 + term4))


def zdcf(t1, v1, e1, t2, v2, e2, min_points: int = 11, num_mc: int = 100, seed: int = 0) -> dict:
    """Alexander ZDCF with Monte-Carlo error perturbation and Fisher-z errors
    (src/correlation/zdcf.rs:182-239), seeded for reproducibility."""
    t1 = np.asarray(t1, dtype=np.float64)
    v1 = np.asarray(v1, dtype=np.float64)
    e1 = np.asarray(e1, dtype=np.float64)
    t2 = np.asarray(t2, dtype=np.float64)
    v2 = np.asarray(v2, dtype=np.float64)
    e2 = np.asarray(e2, dtype=np.float64)
    bins = _alcbin(t1, t2, min_points)
    rng = np.random.default_rng(seed)
    lags_acc = np.zeros(len(bins))
    r_acc = np.zeros(len(bins))
    for _ in range(num_mc):
        s1 = v1 + e1 * rng.standard_normal(v1.size)
        s2 = v2 + e2 * rng.standard_normal(v2.size)
        for bi, bin_pairs in enumerate(bins):
            ii = np.fromiter((p[0] for p in bin_pairs), dtype=np.int64)
            jj = np.fromiter((p[1] for p in bin_pairs), dtype=np.int64)
            n = float(ii.size)
            if n < 2:
                continue
            x1, x2 = s1[ii], s2[jj]
            lags_acc[bi] += float((t2[jj] - t1[ii]).sum() / n)
            m1, m2 = x1.sum() / n, x2.sum() / n
            var1 = (x1 * x1).sum() / n - m1 * m1
            var2 = (x2 * x2).sum() / n - m2 * m2
            covar = (x1 * x2).sum() / n - m1 * m2
            r_acc[bi] += covar / np.sqrt(var1 * var2) if var1 > 0 and var2 > 0 else 0.0
    lags_out, corr_out, err_out = [], [], []
    for bi, bin_pairs in enumerate(bins):
        lag = lags_acc[bi] / num_mc
        r = r_acc[bi] / num_mc
        rc = min(max(r, -1.0 + 1e-7), 1.0 - 1e-7)
        n_bin = float(len(bin_pairs))
        z, s = _fishe(rc, n_bin), _fishs(rc, n_bin)
        err = ((rc - np.tanh(z - s)) + (np.tanh(z + s) - rc)) / 2.0
        lags_out.append(lag)
        corr_out.append(r)
        err_out.append(float(err))
    return {
        "lags": np.asarray(lags_out),
        "correlations": np.asarray(corr_out),
        "errors": np.asarray(err_out),
    }
