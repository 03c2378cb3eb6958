"""Windowed rollup stage: derived rows → one feature row per (conv, window).

Ray Data shape: ``ds.groupby(["conv_id", "bucket"]).map_groups(fn,
batch_format="pyarrow")`` — ONE sort-shuffle co-locates each conversation's
time-bucket, then the fused NumPy kernel (kernels/windowed.py) computes every
tumbling window of the group vectorized. The bucket key is the hot-key salt:
a conversation with 10^6 turns splits into per-bucket groups instead of one
giant straggler group (SURVEY.md §4.2 'salting').

Determinism: rows are sorted by (ts, turn_idx) inside the group before any
order-sensitive computation; ``text_checksum`` is an order-SENSITIVE digest
(crc * in-window-position) whose match against an independently computed
oracle proves stable turn ordering survived the shuffle (the engine-side
check for the north rule's 'per-turn text equality under stable turn
ordering').
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from chronoxtract_ray.kernels import custom_features
from chronoxtract_ray.kernels.windowed import FeatureSpec, compute_windowed_features

__all__ = ["RollupConfig", "make_group_rollup", "rollup", "order_checksum"]

MINUTE_US = 60_000_000
HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


@dataclass(frozen=True)
class RollupConfig:
    width_us: int = MINUTE_US
    bucket_us: int = HOUR_US  # salt granularity; must be a multiple of width_us
    spec: FeatureSpec = field(default_factory=FeatureSpec)
    with_checksum: bool = True
    extra_features: tuple[str, ...] = ()  # names from kernels.register_feature

    def __post_init__(self):
        if self.bucket_us % self.width_us != 0:
            raise ValueError("bucket_us must be a multiple of width_us")


def order_checksum(crc: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Order-sensitive per-window digest: sum(crc_i * (pos_in_window + 1))
    in wrapping uint64 arithmetic."""
    n = crc.size
    counts = ends - starts
    pos = (np.arange(n, dtype=np.uint64) - np.repeat(starts.astype(np.uint64), counts)) + np.uint64(1)
    weighted = crc * pos
    c = np.concatenate(([np.uint64(0)], np.cumsum(weighted, dtype=np.uint64)))
    return c[ends] - c[starts]


def make_group_rollup(cfg: RollupConfig):
    """Build the per-group UDF. Handles the (rare) case of several conv_ids
    colliding in one group batch by segmenting on conv_id first."""
    spec = cfg.spec
    extras = {name: fn for name, fn in custom_features().items() if name in cfg.extra_features}

    def fn(group: pa.Table) -> pa.Table:
        conv = group["conv_id"].to_numpy(zero_copy_only=False)
        ts = group["ts_us"].to_numpy()
        tidx = group["turn_idx"].to_numpy()
        val = group["value"].to_numpy()
        crc = group["crc"].to_numpy() if cfg.with_checksum and "crc" in group.column_names else None
        # deterministic order: (ts, turn_idx); conv constant per group by key
        order = np.lexsort((tidx, ts))
        ts, val = ts[order], val[order]
        if crc is not None:
            crc = crc[order]
        out = compute_windowed_features(ts, val, cfg.width_us, spec)
        n_win = out["window_start"].size
        if crc is not None:
            win = (ts // cfg.width_us) * cfg.width_us
            b = np.flatnonzero(win[1:] != win[:-1]) + 1
            starts = np.concatenate(([0], b))
            ends = np.concatenate((b, [ts.size]))
            out["text_checksum"] = order_checksum(crc, starts, ends)
        if extras:
            win = (ts // cfg.width_us) * cfg.width_us
            b = np.flatnonzero(win[1:] != win[:-1]) + 1
            starts = np.concatenate(([0], b))
            ends = np.concatenate((b, [ts.size]))
            for name, kfn in extras.items():
                vals = np.fromiter(
                    (kfn(val[s:e]) for s, e in zip(starts, ends)), dtype=np.float64, count=n_win
                )
                out[name] = vals
        arrays: dict[str, pa.Array] = {"conv_id": pa.array(np.repeat(conv[order[0]], n_win), pa.string())}
        for k, v in out.items():
            if k == "window_start":
                arrays[k] = pa.array(v, pa.int64())
            elif k == "text_checksum":
                arrays[k] = pa.array(v, pa.uint64())
            elif k == "n_turns":
                arrays[k] = pa.array(v, pa.int64())
            else:
                arrays[k] = pa.array(v, pa.float64())
        return pa.table(arrays)

    return fn


def rollup(derived_ds, cfg: RollupConfig):
    """derived rows → tier point rows (one per (conv_id, window))."""
    return derived_ds.groupby(["conv_id", "bucket"]).map_groups(
        make_group_rollup(cfg), batch_format="pyarrow"
    )
