"""Fused per-window feature computation over many tumbling windows at once.

This is the hot-path kernel of the rollup stage: one call computes features for
EVERY window of one (conv_id, bucket) group, vectorized across windows with
cumsum/reduceat segment reductions. Only the genuinely holistic kernels
(entropy family, FFT bands) loop per window, and those loops call the
vectorized single-series kernels.

Semantics per window match the reference single-series kernels (see sibling
modules for file:line citations into /root/reference). Where the reference
raises on short input (e.g. Hjorth needs n>=3), the windowed engine emits
null (NaN) instead — a window is data, not an argument error.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from chronoxtract_ray.kernels import entropy as kentropy
from chronoxtract_ray.kernels import fda as kfda

__all__ = ["FeatureSpec", "compute_windowed_features", "FEATURE_COLUMNS"]

_STD_EPS = 1e-9  # reference sigma-gate, src/stats/mod.rs:49


@dataclass(frozen=True)
class FeatureSpec:
    """Which feature families to compute and their parameters."""

    order_stats: bool = True  # median/quantiles/mode (needs per-window value sort)
    entropy: bool = True  # sample/approximate/permutation entropy
    fft: bool = True  # FFT band energies
    shape: bool = True  # zcr / slopes / turning points
    hjorth: bool = True
    entropy_m: int = 2
    entropy_r_factor: float = 0.2  # r = factor * window std
    # Bit-stable tolerance mode: when set (e.g. 100 for 2-decimal data), the
    # entropy tolerance r is derived from INTEGER-EXACT power sums of
    # round(value * scale) — integer sums are summation-order-independent, so
    # r is bit-identical no matter how blocks are packed AND reproducible by
    # any external oracle (SQL) that evaluates the same canonical float
    # expression on the same integers. The `<= r` Chebyshev match predicate
    # is discontinuous; a 1-ulp disagreement in r flips integer pair counts
    # and moves SampEn/ApEn by far more than output rounding absorbs
    # (CORRECTNESS_r02 entropy_features failure). None = float-std path.
    # Requires sum(round(v*scale)^2) per window to fit int64.
    entropy_r_int_scale: int | None = None
    perm_m: int = 3
    perm_delay: int = 1
    n_fft_bands: int = 4
    # O(n^2) guard: entropy kernels see at most this many points per window
    # (evenly strided subsample beyond it; documented divergence for
    # pathologically hot windows).
    entropy_max_points: int = 512

    def feature_columns(self) -> list[str]:
        cols = list(_MOMENT_COLS)
        if self.order_stats:
            cols += _ORDER_COLS
        if self.hjorth:
            cols += _HJORTH_COLS
        if self.shape:
            cols += _SHAPE_COLS
        if self.entropy:
            cols += _ENTROPY_COLS
        if self.fft:
            cols += [f"fft_band_energy_{b}" for b in range(self.n_fft_bands)]
        return cols


_MOMENT_COLS = ["mean", "variance", "std", "skewness", "kurtosis", "min", "max", "range", "sum", "energy", "sum3", "sum4"]
_ORDER_COLS = ["median", "q05", "q25", "q75", "q95", "mode"]
_HJORTH_COLS = ["hjorth_activity", "hjorth_mobility", "hjorth_complexity"]
_SHAPE_COLS = ["zero_crossing_rate", "mean_slope", "slope_variance", "max_slope_abs", "turning_points", "turning_point_rate"]
_ENTROPY_COLS = ["sample_entropy", "approx_entropy", "permutation_entropy"]

FEATURE_COLUMNS = FeatureSpec().feature_columns()


def _seg_sums_contig(arr: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-segment sums over contiguous segments [starts[i], starts[i+1]).

    np.add.reduceat keeps each segment's accumulation independent — no
    cross-window cancellation noise (a cumsum-difference approach leaks the
    running total's rounding error into small windows)."""
    if arr.size == 0:
        return np.zeros(starts.size)
    return np.add.reduceat(arr, starts)


def _seg_sums_ranges(arr: np.ndarray, starts: np.ndarray, ends_excl: np.ndarray, boundary_width: int) -> np.ndarray:
    """Per-segment sums over [starts[i], ends_excl[i]) in an offset space
    (diff arrays) where ``boundary_width`` trailing positions before each next
    segment belong to no segment. Those positions are zeroed, then one exact
    reduceat pass; empty ranges sum to 0."""
    n_seg = starts.size
    if arr.size == 0:
        return np.zeros(n_seg)
    # pad so the LAST segment's reduceat slice has the same length it would
    # have mid-block (own positions + boundary_width zeros). np.add.reduceat
    # sums pairwise, so a slice's LENGTH shapes its summation tree: without
    # the pad, the same window summed as "last segment of a block" vs
    # "followed by another conversation" could differ by 1 ulp — per-window
    # results must depend on the window alone, never on block composition
    # (bit-reproducibility across shuffle packings; caught by the
    # incremental-vs-batch equality tests).
    a = np.concatenate((arr, np.zeros(boundary_width, dtype=arr.dtype)))
    for k in range(1, boundary_width + 1):
        zp = ends_excl[:-1] + (boundary_width - k)
        zp = zp[(zp >= 0) & (zp < a.size)]
        a[zp] = 0.0
    rs = np.minimum(starts, a.size - 1)
    res = np.add.reduceat(a, rs)
    return np.where(ends_excl > starts, res, 0.0)


def _seg_max(arr: np.ndarray, starts: np.ndarray, ends: np.ndarray, neutral: float = -np.inf) -> np.ndarray:
    """Per-segment max over [start, end) ranges; ``neutral`` for empty ranges.

    Requires the ranges to be non-overlapping and in order; positions between
    ranges are neutralized before one maximum.reduceat pass."""
    n_seg = starts.size
    if arr.size == 0:
        return np.full(n_seg, neutral)
    a = np.full(arr.size, neutral)
    for_mask = np.zeros(arr.size + 1, dtype=np.int64)
    np.add.at(for_mask, starts, 1)
    np.add.at(for_mask, ends, -1)
    inside = np.cumsum(for_mask[:-1]) > 0
    a[inside] = arr[inside]
    rs = np.minimum(starts, arr.size - 1)
    res = np.maximum.reduceat(a, rs)
    return np.where(ends > starts, res, neutral)


def compute_windowed_features(
    ts_us: np.ndarray,
    value: np.ndarray,
    width_us: int,
    spec: FeatureSpec = FeatureSpec(),
    series_ids: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """Features for every tumbling window of one series — or of MANY series
    at once when ``series_ids`` (integer codes, contiguous runs aligned with
    the sort order) is given: a window then breaks on any change of series or
    of tumbling window. The multi-series form lets one map_batches block
    containing thousands of (conv, bucket) groups run through a single
    vectorized call (no per-group Python dispatch).

    ``ts_us`` int64 microseconds, ``value`` float64, both sorted by
    (series, ts, turn order). Returns dict of equal-length arrays, one row
    per window present in the data (no gap-fill here), including
    ``window_start`` (int64 us), ``n_turns`` and — in multi-series mode —
    ``row_index`` (index into the sorted input of each window's first row,
    for recovering per-series keys).
    """
    ts_us = np.asarray(ts_us, dtype=np.int64)
    v = np.asarray(value, dtype=np.float64)
    n = ts_us.size
    if n == 0:
        out = {"window_start": np.empty(0, np.int64), "n_turns": np.empty(0, np.int64)}
        if series_ids is not None:
            out["row_index"] = np.empty(0, np.int64)
        for c in spec.feature_columns():
            out[c] = np.empty(0, np.float64)
        return out
    win = (ts_us // width_us) * width_us
    changed = win[1:] != win[:-1]  # sorted by ts within series → non-decreasing
    if series_ids is not None:
        changed = changed | (series_ids[1:] != series_ids[:-1])
    boundaries = np.flatnonzero(changed) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [n]))
    counts = ends - starts
    n_win = starts.size

    out: dict[str, np.ndarray] = {
        "window_start": win[starts].astype(np.int64),
        "n_turns": counts.astype(np.int64),
    }
    if series_ids is not None:
        out["row_index"] = starts.astype(np.int64)

    # ---- mergeable raw moments (src/stats/mod.rs:21-79 semantics) ----
    v2 = v * v
    s1 = _seg_sums_contig(v, starts)
    s2 = _seg_sums_contig(v2, starts)
    s3 = _seg_sums_contig(v2 * v, starts)
    s4 = _seg_sums_contig(v2 * v2, starts)
    fn = counts.astype(np.float64)
    m1, m2, m3, m4 = s1 / fn, s2 / fn, s3 / fn, s4 / fn
    variance = m2 - m1 * m1
    with np.errstate(invalid="ignore"):
        std = np.sqrt(variance)
    gate = ~(std > _STD_EPS)  # True also when std is NaN
    with np.errstate(invalid="ignore", divide="ignore"):
        mu3 = m3 - 3.0 * m1 * m2 + 2.0 * m1**3
        mu4 = m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1**4
        skew = np.where(gate, np.nan, mu3 / variance**1.5)
        kurt = np.where(gate, np.nan, mu4 / (variance * variance) - 3.0)
    mn = np.minimum.reduceat(v, starts)
    mx = np.maximum.reduceat(v, starts)
    # sum3/sum4 are the raw power sums kept so coarser tiers can recombine
    # moments EXACTLY (mergeable cascade, SURVEY.md §4.3)
    out.update(
        mean=m1, variance=variance, std=std, skewness=skew, kurtosis=kurt,
        min=mn, max=mx, range=mx - mn, sum=s1, energy=s2, sum3=s3, sum4=s4,
    )

    # ---- order statistics via one within-segment value sort ----
    if spec.order_stats:
        seg_id = np.repeat(np.arange(n_win), counts)
        order = np.lexsort((v, seg_id))
        sv = v[order]  # ascending within each segment
        sseg = seg_id  # seg_id is already sorted; lexsort keeps segment blocks
        L, off = counts, starts
        half = off + L // 2
        even = L % 2 == 0
        median = np.where(even, (sv[np.maximum(half - 1, off)] + sv[np.minimum(half, n - 1)]) / 2.0, sv[np.minimum(half, n - 1)])
        out["median"] = median
        for name, q in (("q05", 0.05), ("q25", 0.25), ("q75", 0.75), ("q95", 0.95)):
            pos = q * (L - 1).astype(np.float64)
            lo = np.floor(pos).astype(np.int64)
            hi = np.ceil(pos).astype(np.int64)
            frac = pos - lo
            out[name] = sv[off + lo] * (1.0 - frac) + sv[off + hi] * frac
        # mode: run-length encode within-segment sorted values; the first
        # max-count run per segment is the smallest tied value (deterministic
        # tie-break; reference HashMap order is non-deterministic,
        # src/stats/mod.rs:116-130)
        is_run_start = np.ones(n, dtype=bool)
        is_run_start[1:] = (sv[1:] != sv[:-1]) | (sseg[1:] != sseg[:-1])
        run_starts = np.flatnonzero(is_run_start)
        run_seg = sseg[run_starts]
        run_val = sv[run_starts]
        run_len = np.diff(np.concatenate((run_starts, [n])))
        seg_run_starts = np.flatnonzero(np.concatenate(([True], run_seg[1:] != run_seg[:-1])))
        runs_per_seg = np.diff(np.concatenate((seg_run_starts, [run_seg.size])))
        max_len = np.maximum.reduceat(run_len, seg_run_starts)
        is_max = run_len == np.repeat(max_len, runs_per_seg)
        idx_max = np.flatnonzero(is_max)
        seg_of_max = run_seg[idx_max]
        seg_first = np.flatnonzero(np.concatenate(([True], seg_of_max[1:] != seg_of_max[:-1])))
        out["mode"] = run_val[idx_max[seg_first]]

    # ---- first/second differences: hjorth / slopes / zcr / turning points ----
    if spec.hjorth or spec.shape:
        d = np.diff(v) if n > 1 else np.empty(0)
        # d-space: segment i owns [starts[i], ends[i]-1)
        d_starts = np.minimum(starts, max(n - 1, 0))
        d_ends = np.maximum(ends - 1, d_starts)
        ds1 = _seg_sums_ranges(d, starts, ends - 1, 1)
        ds2 = _seg_sums_ranges(d * d, starts, ends - 1, 1)
        nd = (counts - 1).astype(np.float64)
        ok1 = counts >= 2
        with np.errstate(invalid="ignore", divide="ignore"):
            d_mean = np.where(ok1, ds1 / nd, np.nan)
            d_var = np.where(ok1, ds2 / nd - d_mean * d_mean, np.nan)

    if spec.hjorth:
        # activity = population variance (src/higherorder/mod.rs:115-118);
        # mobility/complexity fallbacks per src/higherorder/mod.rs:120-173
        d2 = np.diff(v, n=2) if n > 2 else np.empty(0)
        dds1 = _seg_sums_ranges(d2, starts, ends - 2, 2)
        dds2 = _seg_sums_ranges(d2 * d2, starts, ends - 2, 2)
        ndd = (counts - 2).astype(np.float64)
        ok2 = counts >= 3
        with np.errstate(invalid="ignore", divide="ignore"):
            dd_mean = np.where(ok2, dds1 / ndd, np.nan)
            dd_var = np.where(ok2, dds2 / ndd - dd_mean * dd_mean, np.nan)
            mobility = np.where(variance > 0.0, np.sqrt(np.maximum(d_var, 0.0) / variance), 0.0)
            mob_d = np.sqrt(np.maximum(dd_var, 0.0) / d_var)
            complexity = np.where((d_var > 0.0) & (mobility > 0.0), mob_d / mobility, 1.0)
        out["hjorth_activity"] = np.where(ok1, variance, np.nan)
        out["hjorth_mobility"] = np.where(ok1, mobility, np.nan)
        out["hjorth_complexity"] = np.where(ok2, complexity, np.nan)

    if spec.shape:
        msl = _seg_max(np.abs(d), d_starts, d_ends, neutral=-np.inf)
        with np.errstate(invalid="ignore"):
            out["mean_slope"] = d_mean
            out["slope_variance"] = d_var
            out["max_slope_abs"] = np.where(ok1, np.maximum(msl, 0.0), np.nan)
        # zero crossings on the >=0 convention (src/shape/mod.rs:180-194)
        nonneg = v >= 0.0
        flips = (nonneg[1:] != nonneg[:-1]).astype(np.float64) if n > 1 else np.empty(0)
        zc = _seg_sums_ranges(flips, starts, ends - 1, 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            out["zero_crossing_rate"] = np.where(ok1, zc / nd, np.nan)
        # turning points: strict interior extrema (src/shape/mod.rs:439-459)
        if n > 2:
            mid, left, right = v[1:-1], v[:-2], v[2:]
            is_tp = ((mid > left) & (mid > right)) | ((mid < left) & (mid < right))
            seg_of = np.repeat(np.arange(n_win), counts)
            interior = seg_of[2:] == seg_of[:-2]
            tp_counts = np.bincount(seg_of[1:-1][interior & is_tp], minlength=n_win).astype(np.float64)
        else:
            tp_counts = np.zeros(n_win)
        ok3 = counts >= 3
        with np.errstate(invalid="ignore", divide="ignore"):
            out["turning_points"] = np.where(ok3, tp_counts, np.nan)
            out["turning_point_rate"] = np.where(ok3, tp_counts / (counts - 2), np.nan)

    # ---- holistic kernels, batched by window length ----
    # windows are bucketed by exact length; each bucket evaluates as one
    # (k, L) matrix through the batched kernels (kernels/batched.py) —
    # no per-window Python dispatch. Oversize windows (> entropy_max_points)
    # fall back to the strided-subsample single-series path (rare by design).
    if spec.entropy or spec.fft:
        from chronoxtract_ray.kernels import batched as kbatched

        m, pm, pd = spec.entropy_m, spec.perm_m, spec.perm_delay
        cap = spec.entropy_max_points
        nb = spec.n_fft_bands
        if spec.entropy:
            samp = np.full(n_win, np.nan)
            apen = np.full(n_win, np.nan)
            perm = np.full(n_win, np.nan)
            if spec.entropy_r_int_scale is not None:
                # integer-exact variance → canonical float expression; the op
                # sequence below (div, div, mul, sub, sqrt, mul, div — each a
                # single correctly-rounded IEEE op) is mirrored verbatim by
                # the SQL oracle, so r is bit-identical on both sides.
                sc = spec.entropy_r_int_scale
                ivi = np.rint(v * sc).astype(np.int64)
                s1i = np.add.reduceat(ivi, starts).astype(np.float64)
                s2i = np.add.reduceat(ivi * ivi, starts).astype(np.float64)
                m2i = s2i / fn
                m1i = s1i / fn
                vari = m2i - m1i * m1i
                with np.errstate(invalid="ignore"):
                    r_all = np.where(
                        vari > 0.0,
                        spec.entropy_r_factor * np.sqrt(np.maximum(vari, 0.0)) / sc,
                        0.0,
                    )
            else:
                r_all = np.where(np.isfinite(std), spec.entropy_r_factor * std, 0.0)
        if spec.fft:
            bands = np.full((n_win, nb), np.nan)
        uniq_lens = np.unique(counts)
        for L in uniq_lens:
            L = int(L)
            sel = np.flatnonzero(counts == L)
            if L > cap:
                # rare pathological windows: per-window subsampled fallback
                for i in sel:
                    seg = v[starts[i] : ends[i]][:: int(np.ceil((ends[i] - starts[i]) / cap))]
                    if spec.entropy and seg.size >= m + 1 and r_all[i] > 0.0:
                        samp[i] = kentropy.sample_entropy(seg, m, r_all[i])
                        apen[i] = kentropy.approximate_entropy(seg, m, r_all[i])
                    if spec.entropy and seg.size >= pm * pd:
                        perm[i] = kentropy.permutation_entropy(seg, pm, pd)
                    if spec.fft:
                        bands[i] = kfda.fft_band_energies(v[starts[i] : ends[i]], nb)
                continue
            gidx = starts[sel][:, None] + np.arange(L)[None, :]
            W = v[gidx]  # (k, L)
            if spec.fft:
                bands[sel] = kbatched.batched_fft_band_energies(W, nb)
            if spec.entropy and L >= pm * pd and pm >= 2 and pd >= 1:
                perm[sel] = kbatched.batched_permutation_entropy(W, pm, pd)
            if spec.entropy and L >= m + 1:
                ok_r = r_all[sel] > 0.0
                if ok_r.any():
                    # chunk so the (k, L, L) pairwise tensor stays small
                    chunk = max(1, int(4_000_000 // max(L * L, 1)))
                    sub = np.flatnonzero(ok_r)
                    for c0 in range(0, sub.size, chunk):
                        part = sel[sub[c0 : c0 + chunk]]
                        se, ae = kbatched.batched_sample_approx_entropy(
                            W[sub[c0 : c0 + chunk]], m, r_all[part]
                        )
                        samp[part] = se
                        apen[part] = ae
        if spec.entropy:
            out["sample_entropy"] = samp
            out["approx_entropy"] = apen
            out["permutation_entropy"] = perm
        if spec.fft:
            for b in range(nb):
                out[f"fft_band_energy_{b}"] = bands[:, b]
    return out
