"""End-to-end rollup pipeline: transcripts → 1m → 1h → 1d (+ Gorilla chunks).

Partition-aligned dataflow — ONE Ray execution, ONE all-to-all shuffle
(default ``fused_cascade=True``):

    read_parquet(transcripts)
      → map_batches(derive: value/bucket/crc/part; resume filter) [stateless]
      → repartition(P, keys=["part"])                             [the ONE shuffle]
      → RollupWriteStage actor pool: fused window kernel → 1m rows, then the
        1h/1d cascades run in-memory on those rows (a partition never
        round-trips through storage between tiers); tier rows + Gorilla
        chunks + per-partition manifests written atomically per tier

With ``fused_cascade=False`` the cascade runs as a second execution
(CascadeWriteStage reads each partition's WHOLE tier directory — every
segment file — inside the actor, so a reader can never split a partition
across blocks) — useful for rebuilding coarse tiers without touching raw
input, including on segmented stores evolved by incremental ingest.

Why this shape: every group-forming step rides ONE hash partitioning that is
then reused by every later stage (SURVEY.md §7.3 'pick ONE partitioning key
and reuse it'). Writers are callable classes → Ray actor pools; each actor
carries its Gorilla encoder state (north rule). Extreme per-conversation
skew (a single conversation larger than a partition) is handled by raising
``num_parts``; the salted (conv, bucket) rollup stage remains available as
``chronoxtract_ray.stages.rollup.rollup`` for pathological keys.

Resumability: a partition with a complete manifest is skipped at derive time
(stage 1) and at cascade time (stage 2); killed runs redo only unfinished
partitions (tests/test_resume.py).

Never calls ray.init/shutdown (driver contract).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from chronoxtract_ray.kernels.windowed import FeatureSpec
from chronoxtract_ray.stages.cascade import cascade_block
from chronoxtract_ray.stages.derive import make_derive
from chronoxtract_ray.stages.rollup import DAY_US, HOUR_US, MINUTE_US, RollupConfig, make_block_rollup
from chronoxtract_ray.state import checkpoint as ckpt

__all__ = ["PipelineConfig", "run_rollup_pipeline", "backfill_partitions", "tier_dataset", "tier_table"]

TIERS = (("1m", MINUTE_US), ("1h", HOUR_US), ("1d", DAY_US))


@dataclass
class PipelineConfig:
    num_parts: int = 16  # hash(conv_id) partitions; raise for clusters / huge convs
    rollup: RollupConfig = field(default_factory=RollupConfig)
    cascade_spec: FeatureSpec = field(default_factory=FeatureSpec)
    with_gorilla: bool = True
    gorilla_points_per_chunk: int = 1024
    writer_concurrency: tuple[int, int] | None = None  # default: sized to session
    fused_cascade: bool = True  # cascade in the rollup actors (1 execution); False = separate stage
    resume: bool = True


def _gorilla_cfg(cfg: PipelineConfig, tier: str) -> dict | None:
    if not cfg.with_gorilla:
        return None
    widths = dict(TIERS)
    widths["1m"] = cfg.rollup.width_us  # finest tier follows the configured rollup width
    return {
        "width_us": widths[tier],
        "points_per_chunk": cfg.gorilla_points_per_chunk,
        "value_col": "mean",
    }


class RollupWriteStage:
    """Actor-pool UDF (stage 1): one partition-aligned block of derived rows
    → 1m tier rows + (fused) 1h/1d cascade rows + Gorilla chunks + manifests
    on disk, all from the in-memory block — the partition never round-trips
    through storage between tiers. Returns stats rows.

    The actor carries the Gorilla encoder state (PartitionWriter) across all
    partitions it processes."""

    def __init__(self, out_root: str, cfg: PipelineConfig, done: frozenset[int], run_id: str | None = None):
        self.cfg = cfg
        gor = {"1m": _gorilla_cfg(cfg, "1m")}
        if cfg.fused_cascade:
            gor.update({"1h": _gorilla_cfg(cfg, "1h"), "1d": _gorilla_cfg(cfg, "1d")})
        self.fn = make_block_rollup(cfg.rollup)
        self.writer = ckpt.PartitionWriter(out_root, cfg.num_parts, gor, run_id=run_id)
        self.done = np.fromiter(done, dtype=np.int64) if done else None

    def __call__(self, block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"tier": pa.array([], pa.string()), "part": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())})
        tier_rows = self.fn(block.drop_columns(["part"]))
        outs = [("1m", tier_rows)]
        if self.cfg.fused_cascade:
            cur = tier_rows
            # fine width of the first cascade step = the 1m tier's actual
            # window width (configurable; MINUTE_US by default) — the gap-fill
            # stride must match the grid the rollup floored on
            for tier_name, wf, wc in (("1h", self.cfg.rollup.width_us, HOUR_US), ("1d", HOUR_US, DAY_US)):
                cur = cascade_block(cur, wf, wc, self.cfg.cascade_spec)
                outs.append((tier_name, cur))
        # one writer pass per tier so each tier keeps its exact schema
        tiers_out, parts_out, rows_out = [], [], []
        for tier_name, rows in outs:
            part = ckpt.conv_partition(rows["conv_id"].to_numpy(zero_copy_only=False), self.cfg.num_parts)
            if self.done is not None:
                keep = ~np.isin(part, self.done)
                rows = rows.filter(pa.array(keep))
                part = part[keep]
            rows = rows.append_column("part", pa.array(part, pa.int64()))
            rows = rows.append_column("tier_name", pa.array([tier_name] * rows.num_rows, pa.string()))
            res = self.writer(rows)
            tiers_out.extend([tier_name] * res.num_rows)
            parts_out.extend(res["part"].to_pylist())
            rows_out.extend(res["rows"].to_pylist())
        return pa.table({"tier": pa.array(tiers_out, pa.string()), "part": pa.array(parts_out, pa.int64()), "rows": pa.array(rows_out, pa.int64())})


class CascadeWriteStage:
    """Actor-pool UDF (stage 2): reads ONE 1m-tier partition DIRECTORY per
    call — every segment file it holds — so a partition can never be split
    across blocks by a reader, cascades it to 1h + 1d rows, writes tier
    rows + chunks + manifests."""

    def __init__(self, out_root: str, cfg: PipelineConfig):
        self.cfg = cfg
        self.writer = ckpt.PartitionWriter(
            out_root,
            cfg.num_parts,
            {"1h": _gorilla_cfg(cfg, "1h"), "1d": _gorilla_cfg(cfg, "1d")},
        )

    CASCADE_COLUMNS = (
        "conv_id", "window_start", "n_turns", "mean", "sum", "energy",
        "sum3", "sum4", "min", "max", "text_checksum",
    )

    def __call__(self, paths: pa.Table) -> pa.Table:
        import glob

        import pyarrow.parquet as pq

        out_parts, out_rows = [], []
        for part_dir in paths["path"].to_pylist():
            # read EVERY segment file of the partition in one call: an
            # ingest-evolved store holds several seg-*.parquet per partition,
            # and cascading each file separately would gap-fill each segment
            # against itself instead of the conversation's full series
            files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
            if not files:
                continue
            # prune at the read: the cascade needs ~10 of the ~45 tier columns
            avail = set(pq.read_schema(files[0]).names)
            cols = [c for c in self.CASCADE_COLUMNS if c in avail]
            block = pa.concat_tables(
                [pq.read_table(f, columns=cols) for f in files], promote_options="default"
            )
            if block.num_rows == 0:
                continue
            spec = self.cfg.cascade_spec
            outs = []
            cur = block
            for tier_name, wf, wc in (("1h", self.cfg.rollup.width_us, HOUR_US), ("1d", HOUR_US, DAY_US)):
                cur = cascade_block(cur, wf, wc, spec)
                tagged = cur.append_column("tier_name", pa.array([tier_name] * cur.num_rows, pa.string()))
                outs.append(tagged)
            rows = pa.concat_tables(outs, promote_options="default")
            part = ckpt.conv_partition(rows["conv_id"].to_numpy(zero_copy_only=False), self.cfg.num_parts)
            rows = rows.append_column("part", pa.array(part, pa.int64()))
            res = self.writer(rows)
            out_parts.extend(res["part"].to_pylist())
            out_rows.extend(res["rows"].to_pylist())
        return pa.table({"part": pa.array(out_parts, pa.int64()), "rows": pa.array(out_rows, pa.int64())})


def tier_dataset(root: str, tier: str, columns: list[str] | None = None):
    """Read one tier back; hive-partition columns (tier/part) are dropped so
    downstream stages see pure tier rows. Pass ``columns`` to prune the scan
    at storage — a consumer of 2 of the ~48 tier columns should not ship the
    rest out of the row groups."""
    # locked construction: tier reads run concurrently with other component
    # queries (queries_merged._par) and Ray's path resolution is not
    # thread-safe in this env (fsspec http probe race)
    from chronoxtract_ray.stages.util import read_parquet_locked

    ds = read_parquet_locked(os.path.join(root, f"tier={tier}"), columns=columns)

    def strip(t: pa.Table) -> pa.Table:
        drop = [c for c in ("tier", "part") if c in t.column_names]
        return t.drop_columns(drop) if drop else t

    return ds.map_batches(strip, batch_format="pyarrow")


def tier_table(root: str, tier: str, columns: list[str] | None = None) -> pa.Table:
    """Small-result helper for tests: full tier as one sorted Arrow table
    (direct pyarrow read, no Ray session needed). Pass ``columns`` to read
    only the needed row-group columns — a 3-of-48-column consumer should
    not deserialize the rest."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(root, f"tier={tier}", "part=*", "*.parquet")))
    if not files:  # e.g. every partition dropped by retention
        return pa.table({})
    tbl = pa.concat_tables([pq.read_table(f, columns=columns) for f in files])
    keys = [k for k in ("conv_id", "window_start", "chunk_start") if k in tbl.column_names]
    return tbl.sort_by([(k, "ascending") for k in keys])


def _release_cpus(timeout_s: float = 10.0) -> None:
    """GC dead Dataset executors and wait until their actors give the CPUs
    back, so the next execution's actor pool can fill the session."""
    import gc

    import ray

    gc.collect()
    try:
        total = ray.cluster_resources().get("CPU", 0)
    except Exception:
        return
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if ray.available_resources().get("CPU", 0) >= total * 0.9:
            return
        time.sleep(0.2)


def _writer_pool(cfg: PipelineConfig, whole_session: bool = False) -> tuple[tuple[int, int], float]:
    """((min, max), num_cpus_per_actor) for the writer pool.

    Fixed-size pool (min == max): all actors spawn in parallel at execution
    start instead of ramping one by one behind the queue.

    ``whole_session``: stage 2 has no other operators competing for CPUs
    (the read happens inside the actors), so its pool takes every CPU.
    Stage 1 shares the session with derive tasks + shuffle aggregators: one
    actor per CPU, but the pool's total LOGICAL reservation is capped at
    ~40% of the session so upstream operators can always schedule (a pool
    reserving everything deadlocks the streaming executor); physically all
    cores engage once the upstream drains."""
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    if cfg.writer_concurrency:
        wc = cfg.writer_concurrency
        if not (isinstance(wc, (tuple, list)) and len(wc) == 2
                and 1 <= wc[1] and 0 <= wc[0] <= wc[1]):
            raise ValueError(
                f"writer_concurrency must be (min, max) with 0 <= min <= max and max >= 1, got {wc!r}"
            )
        # an explicit pool size still gets its logical num_cpus budgeted:
        # num_cpus=1.0 per actor at pool == session size would reserve every
        # CPU and deadlock stage 1's upstream (the exact failure the default
        # path guards against)
        budget = float(n_cpus) if whole_session else max(1.0, 0.4 * n_cpus)
        return cfg.writer_concurrency, max(0.1, round(min(1.0, budget / cfg.writer_concurrency[1]), 2))
    if whole_session:
        k = max(2, min(cfg.num_parts, n_cpus))
        return (k, k), 1.0
    k = max(2, min(cfg.num_parts, n_cpus))
    budget = max(1.0, 0.4 * n_cpus)
    return (k, k), max(0.1, round(budget / k, 2))


def backfill_partitions(out_root: str, parts: list[int], num_parts: int) -> None:
    """Reopen completed partitions for explicit backfill/late-data reruns:
    drops their manifests (and artifacts) for every tier so the next
    run_rollup_pipeline recomputes exactly those partitions from the raw
    input (SURVEY.md §2.12 late-data policy: windows below the watermark
    reopen only on explicit backfill)."""
    import shutil

    # validate the WHOLE list before touching anything: raising mid-loop
    # after earlier parts' manifests/data were deleted leaves the store
    # inconsistent (a later non-fused run would rebuild 1m for those parts
    # but skip the cascade, leaving 1h/1d silently stale against it)
    for p in parts:
        if not 0 <= p < num_parts:
            raise ValueError(f"partition {p} out of range 0..{num_parts - 1}")
    # complete any torn ingest swap first: deleting a partition that still
    # has a pending READY marker would otherwise be undone by the next
    # ingest/retention run rolling the stale staged state forward
    from chronoxtract_ray.stages.ingest import recover_all_partitions

    recover_all_partitions(out_root, gc_stale_staging=True)
    for tier, _ in TIERS:
        for p in parts:
            mp = ckpt.manifest_path(out_root, tier, p)
            if os.path.exists(mp):
                os.remove(mp)
            for root in (out_root, os.path.join(out_root, "chunks")):
                d = os.path.join(root, f"tier={tier}", f"part={p:04d}")
                shutil.rmtree(d, ignore_errors=True)
    # incremental-ingest state is derived from the tier data just deleted:
    # stale per-conv anchors (_convs) would be preferred over a bootstrap
    # re-scan by the next ingest, and a stale open buffer (_open) would
    # re-merge raw turns the backfilled recompute already owns
    for p in parts:
        for side in ("_open", "_convs"):
            shutil.rmtree(os.path.join(out_root, side, f"part={p:04d}"), ignore_errors=True)


def run_rollup_pipeline(source, out_root: str, cfg: PipelineConfig | None = None) -> dict:
    """``source``: a transcripts Dataset or a parquet path. Returns metrics.

    Sizing for clusters: each hash partition is processed as ONE in-memory
    block by one writer actor (derived rows ≈ 40 B/turn + tier rows +
    gap-filled intermediates ≈ 3-4x that). Choose ``num_parts`` so
    raw_bytes x 0.4 / num_parts stays well under a worker's heap — e.g.
    ~40k partitions for a 100 TB input with 1-2 GB partition budgets. All
    other scaling follows from Ray scheduling more partitions across more
    nodes; there is exactly one all-to-all exchange regardless of size."""
    import ray.data as rd

    from chronoxtract_ray.stages.util import ensure_hash_shuffle

    cfg = cfg or PipelineConfig()
    P = cfg.num_parts
    ensure_hash_shuffle(num_partitions=P)
    os.makedirs(out_root, exist_ok=True)
    ckpt.ensure_store_meta(
        out_root,
        P,
        cfg.with_gorilla,
        with_checksum=cfg.rollup.with_checksum,
        width_us=cfg.rollup.width_us,
    )
    # roll forward any torn incremental-ingest batch BEFORE writing: a
    # pending READY marker left by a crashed ingest would otherwise be
    # completed by the NEXT ingest/retention run — swapping its stale staged
    # state over whatever this batch run writes now
    from chronoxtract_ray.stages.ingest import recover_all_partitions

    recover_all_partitions(out_root, gc_stale_staging=True)
    if isinstance(source, str):
        from chronoxtract_ray.sources.transcripts import read_transcripts

        ds = read_transcripts(source)  # projected to TRANSCRIPT_SCHEMA
    else:
        ds = source
    ensure_hash_shuffle(ds, num_partitions=P)

    metrics: dict = {"tiers": {}, "num_parts": P}
    t_start = time.time()
    wconc, w_cpus = _writer_pool(cfg)

    done_1m = ckpt.completed_parts(out_root, "1m", P) if cfg.resume else frozenset()
    done_1h = ckpt.completed_parts(out_root, "1h", P) if cfg.resume else frozenset()
    done_1d = ckpt.completed_parts(out_root, "1d", P) if cfg.resume else frozenset()
    done_casc = done_1h & done_1d  # a cascade partition is done when both tiers are
    done_everywhere = done_1m & done_casc
    metrics["resumed_parts_skipped"] = sorted(done_everywhere)

    # ---- stage 1: raw → 1m (→ 1h → 1d when fused) ----
    # derive → ONE shuffle → rollup(+cascade)+write actors
    t0 = time.time()
    stage1_done = (done_1m & done_casc) if cfg.fused_cascade else done_1m
    derived = ds.map_batches(
        make_derive(
            cfg.rollup.bucket_us,
            with_crc=cfg.rollup.with_checksum,
            drop_parts=stage1_done or None,
            num_parts=P,
        ),
        batch_format="pyarrow",
    )
    keyed = derived.repartition(P, keys=["part"], sort=False)
    import uuid

    run_id = uuid.uuid4().hex
    results = keyed.map_batches(
        RollupWriteStage,
        fn_constructor_args=(out_root, cfg, stage1_done, run_id),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=wconc,
        num_cpus=w_cpus,
    ).take_all()
    # structural split-partition guard: each (tier, part) must be written by
    # exactly ONE writer call this run. If the hash shuffle ever splits a
    # partition across blocks, two calls report the same (tier, part) here —
    # including concurrent equal-row-count splits the manifest-based run_id
    # guard cannot see — and we fail loudly instead of silently losing rows.
    seen: dict[tuple, int] = {}
    for r in results:
        key = (r["tier"], r["part"])
        seen[key] = seen.get(key, 0) + 1
    dups = sorted(k for k, n in seen.items() if n > 1)
    if dups:
        raise RuntimeError(
            f"partition(s) {dups[:8]} written by more than one writer call in "
            f"one run: the hash shuffle split a partition across blocks — "
            f"raise num_parts so each partition fits one block"
        )
    stage1 = {
        # ALL rows this stage wrote (fused mode includes 1h/1d) — the label
        # claims all three tiers, so the count must too
        "rows_written": int(sum(r["rows"] for r in results)),
        "wall_s": time.time() - t0,
    }
    if cfg.fused_cascade:
        for tier in ("1m", "1h", "1d"):
            stage1[f"rows_{tier}"] = int(sum(r["rows"] for r in results if r["tier"] == tier))
    metrics["tiers"]["1m" if not cfg.fused_cascade else "1m+1h+1d"] = stage1
    if cfg.fused_cascade:
        metrics["total_wall_s"] = time.time() - t_start
        return metrics
    # release stage-1 operator state (shuffle aggregators + writer actors
    # hold their logical CPUs while their Dataset objects stay referenced)
    del derived, keyed, results
    _release_cpus()

    # ---- stage 2: 1m → 1h → 1d (partition-aligned read, NO shuffle) ----
    t0 = time.time()
    redo = sorted(set(range(P)) - done_casc)
    # one item per PARTITION DIRECTORY (not per file): segmented stores hold
    # several parquet files per partition and the cascade must see them all
    # together (CascadeWriteStage reads the whole dir per call)
    files = [
        os.path.join(out_root, "tier=1m", f"part={p:04d}")
        for p in redo
        if os.path.isdir(os.path.join(out_root, "tier=1m", f"part={p:04d}"))
    ]
    if files:
        paths_ds = rd.from_items([{"path": f} for f in files], override_num_blocks=len(files))
        results = paths_ds.map_batches(
            CascadeWriteStage,
            fn_constructor_args=(out_root, cfg),
            batch_size=1,
            batch_format="pyarrow",
            concurrency=_writer_pool(cfg, whole_session=True)[0],
        ).take_all()
        rows = int(sum(r["rows"] for r in results))
    else:
        rows = 0
    metrics["tiers"]["1h+1d"] = {"rows_written": rows, "wall_s": time.time() - t0}

    metrics["total_wall_s"] = time.time() - t_start
    return metrics
