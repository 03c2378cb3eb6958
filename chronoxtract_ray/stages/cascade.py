"""Tier cascade: fine-tier points → gap-filled points → coarser-tier rows.

Semantics (SURVEY.md §4.3, FIXTURES.md §3):

- gap-fill: per conversation, every missing fine window between the first and
  last present window gets a synthetic point with ``mean`` linearly
  interpolated between its present neighbors, ``n_turns = 0`` and
  ``gap_filled = true``; all other feature columns are null. Gap-filled
  points participate in the coarser tier's POINT-SERIES features but not in
  its exact merged aggregates.
- coarser tier rows carry two families:
  * point-series features (``mean``, ``median``, entropy, ... of the fine
    tier's mean series) — the north star's "continuous aggregates ...
    cascaded on rolled-up points"; computed by the same fused kernel.
  * exact merged moments (``merged_*``) recombined from the fine tier's raw
    power sums (s1..s4, min, max, n) — identical to a direct rollup of the
    raw turns over the coarse window, asserted in tests.

Ray Data shape: ``groupby("conv_id").map_groups`` over tier points. Tier
points are ~width-ratio smaller than their input, so this group is bounded by
time span, not turn count — no salting needed above 1m (SURVEY.md §7.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from chronoxtract_ray.kernels.windowed import FeatureSpec, compute_windowed_features
from chronoxtract_ray.stages.rollup import RollupConfig

__all__ = ["gap_fill_group", "cascade_group", "cascade", "gap_fill"]

_MERGE_COLS = ["n_turns", "sum", "energy", "sum3", "sum4", "min", "max"]


def gap_fill_group(tbl: pa.Table, width_us: int) -> pa.Table:
    """Insert interpolated rows for missing windows of one conversation."""
    win = tbl["window_start"].to_numpy()
    order = np.argsort(win, kind="stable")
    win = win[order]
    mean = tbl["mean"].to_numpy()[order]
    if win.size == 0:
        out = tbl.append_column("gap_filled", pa.array(np.empty(0, dtype=bool)))
        return out
    full = np.arange(win[0], win[-1] + width_us, width_us, dtype=np.int64)
    present = np.isin(full, win)
    filled_mean = np.interp(full.astype(np.float64), win.astype(np.float64), mean)
    n_rows = full.size
    cols: dict[str, pa.Array] = {}
    src_idx = np.searchsorted(win, full)  # valid where present
    for name in tbl.column_names:
        arr = tbl[name].to_numpy(zero_copy_only=False)[order]
        if name == "conv_id":
            cols[name] = pa.array(np.repeat(arr[0], n_rows), pa.string())
        elif name == "window_start":
            cols[name] = pa.array(full, pa.int64())
        elif name == "n_turns":
            vals = np.zeros(n_rows, dtype=np.int64)
            vals[present] = arr[src_idx[present]]
            cols[name] = pa.array(vals, pa.int64())
        elif name == "mean":
            cols[name] = pa.array(filled_mean, pa.float64())
        elif name == "text_checksum":
            vals = np.zeros(n_rows, dtype=np.uint64)
            vals[present] = arr[src_idx[present]]
            cols[name] = pa.array(vals, pa.uint64())
        else:
            vals = np.full(n_rows, np.nan)
            vals[present] = arr[src_idx[present]]
            cols[name] = pa.array(vals, pa.float64())
    cols["gap_filled"] = pa.array(~present)
    return pa.table(cols)


def cascade_group(tbl: pa.Table, fine_width_us: int, coarse_width_us: int, spec: FeatureSpec) -> pa.Table:
    """One conversation's fine-tier points → coarse-tier rows."""
    filled = gap_fill_group(tbl, fine_width_us)
    win = filled["window_start"].to_numpy()
    mean = filled["mean"].to_numpy()
    conv = filled["conv_id"].to_numpy(zero_copy_only=False)
    # point-series features over (window_start, mean) — already sorted
    out = compute_windowed_features(win, mean, coarse_width_us, spec)
    n_win = out["window_start"].size
    cw = (win // coarse_width_us) * coarse_width_us
    b = np.flatnonzero(cw[1:] != cw[:-1]) + 1
    starts = np.concatenate(([0], b))
    ends = np.concatenate((b, [win.size]))
    # exact merged aggregates from raw power sums (gap rows contribute 0)
    merged: dict[str, np.ndarray] = {}
    npts = filled["n_turns"].to_numpy().astype(np.float64)
    c = np.concatenate(([0.0], np.cumsum(npts)))
    merged_n = c[ends] - c[starts]
    for col in ("sum", "energy", "sum3", "sum4"):
        v = np.nan_to_num(filled[col].to_numpy(), nan=0.0)
        cc = np.concatenate(([0.0], np.cumsum(v)))
        merged[col] = cc[ends] - cc[starts]
    mn_f = np.nan_to_num(filled["min"].to_numpy(), nan=np.inf)
    mx_f = np.nan_to_num(filled["max"].to_numpy(), nan=-np.inf)
    merged_min = np.minimum.reduceat(mn_f, starts)
    merged_max = np.maximum.reduceat(mx_f, starts)
    with np.errstate(invalid="ignore", divide="ignore"):
        N = merged_n
        m1 = merged["sum"] / N
        m2 = merged["energy"] / N
        m3 = merged["sum3"] / N
        m4 = merged["sum4"] / N
        var = m2 - m1 * m1
        std = np.sqrt(var)
        gate = ~(std > 1e-9)
        mu3 = m3 - 3.0 * m1 * m2 + 2.0 * m1**3
        mu4 = m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1**4
        mskew = np.where(gate, np.nan, mu3 / var**1.5)
        mkurt = np.where(gate, np.nan, mu4 / (var * var) - 3.0)
    empty = N == 0
    arrays: dict[str, pa.Array] = {"conv_id": pa.array(np.repeat(conv[0], n_win), pa.string())}
    for k, v in out.items():
        if k == "window_start":
            arrays[k] = pa.array(v, pa.int64())
        elif k == "n_turns":
            arrays["n_points"] = pa.array(v, pa.int64())  # count of fine points
        else:
            arrays[k] = pa.array(v, pa.float64())
    arrays["n_turns"] = pa.array(merged_n.astype(np.int64), pa.int64())
    arrays["merged_mean"] = pa.array(np.where(empty, np.nan, m1), pa.float64())
    arrays["merged_variance"] = pa.array(np.where(empty, np.nan, var), pa.float64())
    arrays["merged_std"] = pa.array(np.where(empty, np.nan, std), pa.float64())
    arrays["merged_skewness"] = pa.array(mskew, pa.float64())
    arrays["merged_kurtosis"] = pa.array(mkurt, pa.float64())
    arrays["merged_min"] = pa.array(np.where(empty, np.nan, merged_min), pa.float64())
    arrays["merged_max"] = pa.array(np.where(empty, np.nan, merged_max), pa.float64())
    arrays["merged_sum"] = pa.array(merged["sum"], pa.float64())
    arrays["merged_energy"] = pa.array(merged["energy"], pa.float64())
    # keep raw power sums mergeable for the NEXT tier
    arrays["sum"] = pa.array(merged["sum"], pa.float64())
    arrays["energy"] = pa.array(merged["energy"], pa.float64())
    arrays["sum3"] = pa.array(merged["sum3"], pa.float64())
    arrays["sum4"] = pa.array(merged["sum4"], pa.float64())
    arrays["min"] = pa.array(np.where(empty, np.nan, merged_min), pa.float64())
    arrays["max"] = pa.array(np.where(empty, np.nan, merged_max), pa.float64())
    if "text_checksum" in filled.column_names:
        chk = filled["text_checksum"].to_numpy()
        cc = np.concatenate(([np.uint64(0)], np.cumsum(chk, dtype=np.uint64)))
        arrays["text_checksum"] = pa.array(cc[ends] - cc[starts], pa.uint64())
    # gap statistics of the fine tier inside each coarse window
    gap = filled["gap_filled"].to_numpy(zero_copy_only=False).astype(np.float64)
    cg = np.concatenate(([0.0], np.cumsum(gap)))
    arrays["n_gap_filled"] = pa.array((cg[ends] - cg[starts]).astype(np.int64), pa.int64())
    return pa.table(arrays)


def gap_fill(tier_ds, width_us: int):
    """Dataset-level gap-fill (one group per conversation)."""
    return tier_ds.groupby("conv_id").map_groups(
        lambda t: gap_fill_group(t, width_us), batch_format="pyarrow"
    )


def cascade(tier_ds, fine_width_us: int, coarse_width_us: int, spec: FeatureSpec | None = None):
    """fine tier points → coarse tier rows (one shuffle by conv_id)."""
    spec = spec or FeatureSpec()

    def fn(t: pa.Table) -> pa.Table:
        return cascade_group(t, fine_width_us, coarse_width_us, spec)

    return tier_ds.groupby("conv_id").map_groups(fn, batch_format="pyarrow")
