"""Per-partition checkpoint / watermark / lineage manifest.

Layout under an output root:

    out/
      tier=1m/part=0007/*.parquet        tier rows, hash(conv_id)%P partitions
      chunks/tier=1m/part=0007/*.parquet Gorilla chunk rows
      _manifest/tier=1m/part=0007.json   {"complete": true, "watermark_us": ...,
                                          "rows": n, "wall_s": ..., "input_rows": ...}

Resume contract: a partition with a ``complete`` manifest is (a) skipped at
write time and (b) its input rows are dropped in the derive stage, so a
killed run re-does only unfinished partitions and the final output equals an
uninterrupted run's (asserted in tests/test_resume.py). Writes are atomic:
temp dir then ``os.rename``.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd

__all__ = [
    "conv_partition",
    "manifest_path",
    "load_manifests",
    "completed_parts",
    "write_partition",
    "PartitionWriter",
]


def conv_partition(conv_ids: np.ndarray, num_parts: int) -> np.ndarray:
    """Stable conversation → partition hash (pandas' vectorized hasher; the
    same function the derive stage uses for resume filtering)."""
    return (pd.util.hash_array(conv_ids, categorize=False) % num_parts).astype(np.int64)


def manifest_path(root: str, tier: str, part: int) -> str:
    return os.path.join(root, "_manifest", f"tier={tier}", f"part={part:04d}.json")


def load_manifests(root: str, tier: str, num_parts: int) -> dict[int, dict]:
    out = {}
    for p in range(num_parts):
        mp = manifest_path(root, tier, p)
        if os.path.exists(mp):
            with open(mp) as f:
                out[p] = json.load(f)
    return out


def completed_parts(root: str, tier: str, num_parts: int) -> frozenset[int]:
    return frozenset(p for p, m in load_manifests(root, tier, num_parts).items() if m.get("complete"))


def write_partition(root: str, tier: str, part: int, table, metrics: dict | None = None) -> None:
    """Atomically write one partition's rows + its manifest (both under
    ``root``; pass a distinct root per artifact family, e.g. out/ and
    out/chunks/)."""
    import pyarrow.parquet as pq

    final_dir = os.path.join(root, f"tier={tier}", f"part={part:04d}")
    tmp_dir = final_dir + ".tmp"
    os.makedirs(tmp_dir, exist_ok=True)
    pq.write_table(table, os.path.join(tmp_dir, "data.parquet"))
    if os.path.exists(final_dir):
        import shutil

        shutil.rmtree(final_dir)
    os.rename(tmp_dir, final_dir)
    wm = int(table["window_start"].to_numpy().max()) if table.num_rows and "window_start" in table.column_names else None
    man = {
        "complete": True,
        "tier": tier,
        "part": part,
        "rows": table.num_rows,
        "watermark_us": wm,
        "written_at": time.time(),
    }
    if metrics:
        man.update(metrics)
    mp = manifest_path(root, tier, part)
    os.makedirs(os.path.dirname(mp), exist_ok=True)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.rename(tmp, mp)


class PartitionWriter:
    """map_batches UDF: write each hash partition's rows atomically.

    Fed by ``repartition(keys=["part"])`` so each block holds whole
    partitions (possibly several when hash buckets collide); writes one
    directory + manifest per partition (idempotent: a retried task rewrites
    the same files)."""

    def __init__(self, root: str, tier: str, num_parts: int):
        self.root = root
        self.tier = tier
        self.num_parts = num_parts

    def __call__(self, block):
        import numpy as np
        import pyarrow as pa

        parts_out, rows_out = [], []
        if block.num_rows:
            part_col = block["part"].to_numpy()
            for part in np.unique(part_col):
                t0 = time.time()
                tbl = block.filter(pa.array(part_col == part)).drop_columns(["part"])
                # deterministic row order inside the file
                names = [c for c in ("conv_id", "window_start", "chunk_start") if c in tbl.column_names]
                if names:
                    tbl = tbl.sort_by([(n, "ascending") for n in names])
                extra = {"wall_s": time.time() - t0}
                if "n_turns" in tbl.column_names:
                    extra["n_turns"] = int(tbl["n_turns"].to_numpy().sum())
                write_partition(self.root, self.tier, int(part), tbl, extra)
                parts_out.append(int(part))
                rows_out.append(tbl.num_rows)
        return pa.table({"part": pa.array(parts_out, pa.int64()), "rows": pa.array(rows_out, pa.int64())})
