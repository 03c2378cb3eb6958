"""End-to-end rollup pipeline: transcripts → 1m → 1h → 1d (+ Gorilla chunks).

Dataflow — exactly ONE Ray execution per tier (all lazy; each tier is
written to partitioned Parquet and re-read for the next tier, making every
tier independently streamable AND resumable — the tier boundary is the
natural checkpoint):

    read_parquet(transcripts)
      → map_batches(derive: value/bucket/crc; resume filter)      [stateless]
      → repartition(keys=[conv_id, bucket]) → fused window kernel [shuffle 1]
      → repartition(keys=[part])                                  [shuffle 2, tier rows only]
      → PartitionWriter actor pool: tier parquet + Gorilla chunks + manifest
    read(tier=1m) → repartition(conv) → vectorized gap-fill+cascade → write 1h (+chunks)
    read(tier=1h) → ... → write 1d (+chunks)

Never calls ray.init/shutdown (driver contract).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from chronoxtract_ray.kernels.windowed import FeatureSpec
from chronoxtract_ray.stages.cascade import cascade
from chronoxtract_ray.stages.derive import make_derive
from chronoxtract_ray.stages.rollup import DAY_US, HOUR_US, MINUTE_US, RollupConfig, rollup
from chronoxtract_ray.state import checkpoint as ckpt

__all__ = ["PipelineConfig", "run_rollup_pipeline", "tier_dataset", "tier_table"]

TIERS = (("1m", MINUTE_US), ("1h", HOUR_US), ("1d", DAY_US))


@dataclass
class PipelineConfig:
    num_parts: int = 16  # hash(conv_id) output partitions; raise for clusters
    rollup: RollupConfig = field(default_factory=RollupConfig)
    cascade_spec: FeatureSpec = field(default_factory=FeatureSpec)
    with_gorilla: bool = True
    gorilla_points_per_chunk: int = 1024
    gorilla_concurrency: tuple[int, int] = (1, 8)
    resume: bool = True


def _add_part(ds, num_parts: int):
    def fn(t: pa.Table) -> pa.Table:
        part = ckpt.conv_partition(t["conv_id"].to_numpy(zero_copy_only=False), num_parts)
        return t.append_column("part", pa.array(part, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _filter_done(ds, done: frozenset[int]):
    if not done:
        return ds
    done_arr = np.fromiter(done, dtype=np.int64)

    def fn(t: pa.Table) -> pa.Table:
        keep = ~np.isin(t["part"].to_numpy(), done_arr)
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def _write_tier(
    ds,
    root: str,
    tier: str,
    num_parts: int,
    done: frozenset[int],
    gorilla_cfg: dict | None = None,
    concurrency=(1, 8),
) -> int:
    """Partition rows by conv hash; an actor pool writes each partition's
    tier rows + Gorilla chunks atomically (PartitionWriter docstring).
    Returns rows written (completed partitions excluded)."""
    from chronoxtract_ray.stages.util import ensure_hash_shuffle

    ensure_hash_shuffle(ds)
    ds = _filter_done(_add_part(ds, num_parts), done)
    results = (
        ds.repartition(num_parts, keys=["part"], sort=False)
        .map_batches(
            ckpt.PartitionWriter,
            fn_constructor_args=(root, tier, num_parts, gorilla_cfg),
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
        .take_all()
    )
    return int(sum(r["rows"] for r in results))


def tier_dataset(root: str, tier: str):
    """Read one tier back; hive-partition columns (tier/part) are dropped so
    downstream stages see pure tier rows."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(root, f"tier={tier}"))

    def strip(t: pa.Table) -> pa.Table:
        drop = [c for c in ("tier", "part") if c in t.column_names]
        return t.drop_columns(drop) if drop else t

    return ds.map_batches(strip, batch_format="pyarrow")


def tier_table(root: str, tier: str) -> pa.Table:
    """Small-result helper for tests: full tier as one sorted Arrow table
    (direct pyarrow read, no Ray session needed)."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(root, f"tier={tier}", "part=*", "*.parquet")))
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    keys = [k for k in ("conv_id", "window_start", "chunk_start") if k in tbl.column_names]
    return tbl.sort_by([(k, "ascending") for k in keys])


def run_rollup_pipeline(source, out_root: str, cfg: PipelineConfig | None = None) -> dict:
    """``source``: a transcripts Dataset or a parquet path. Returns metrics."""
    import ray.data as rd

    from chronoxtract_ray.stages.util import ensure_hash_shuffle

    ensure_hash_shuffle()
    cfg = cfg or PipelineConfig()
    P = cfg.num_parts
    os.makedirs(out_root, exist_ok=True)
    ds = rd.read_parquet(source) if isinstance(source, str) else source

    metrics: dict = {"tiers": {}, "num_parts": P}
    t_start = time.time()

    # resume: a partition counts as done only when complete in EVERY tier
    # (one manifest per (tier, part) covers tier rows + gorilla chunks)
    all_tiers = [t for t, _ in TIERS]
    done_everywhere: frozenset[int] = frozenset()
    if cfg.resume:
        sets = [ckpt.completed_parts(out_root, t, P) for t in all_tiers]
        done_everywhere = frozenset.intersection(*sets) if sets else frozenset()
    metrics["resumed_parts_skipped"] = sorted(done_everywhere)

    widths = dict(TIERS)

    def gcfg(tier: str) -> dict | None:
        if not cfg.with_gorilla:
            return None
        return {"width_us": widths[tier], "points_per_chunk": cfg.gorilla_points_per_chunk, "value_col": "mean"}

    # ---- raw → 1m (one execution: derive → rollup shuffle → part shuffle →
    # writer actors emit tier rows + gorilla chunks + manifests) ----
    t0 = time.time()
    done_1m = ckpt.completed_parts(out_root, "1m", P) if cfg.resume else frozenset()
    derived = ds.map_batches(
        make_derive(
            cfg.rollup.bucket_us,
            with_crc=cfg.rollup.with_checksum,
            drop_parts=done_everywhere or None,
            num_parts=P,
        ),
        batch_format="pyarrow",
    )
    t1m = rollup(derived, cfg.rollup)
    rows = _write_tier(t1m, out_root, "1m", P, done_1m | done_everywhere, gcfg("1m"), cfg.gorilla_concurrency)
    metrics["tiers"]["1m"] = {"rows_written": rows, "wall_s": time.time() - t0}

    # ---- cascades (one execution each) ----
    for fine, coarse in (("1m", "1h"), ("1h", "1d")):
        t0 = time.time()
        done_c = (ckpt.completed_parts(out_root, coarse, P) if cfg.resume else frozenset()) | done_everywhere
        fine_ds = tier_dataset(out_root, fine)
        coarse_ds = cascade(fine_ds, widths[fine], widths[coarse], cfg.cascade_spec)
        rows = _write_tier(coarse_ds, out_root, coarse, P, done_c, gcfg(coarse), cfg.gorilla_concurrency)
        metrics["tiers"][coarse] = {"rows_written": rows, "wall_s": time.time() - t0}

    metrics["total_wall_s"] = time.time() - t_start
    return metrics
