"""Incremental ingest — continuous aggregates over the tier store.

``run_incremental_ingest`` appends a batch of new transcripts to an existing
store and updates every tier so the store is IDENTICAL to a from-scratch run
over the union of all batches (asserted bit-exactly in
tests/test_ingest_incremental.py). Cost scales with the partitions a batch
touches, never with store size: untouched partitions are never read.

Open-window buffer (the exactness mechanism)
--------------------------------------------
Tumbling windows at or after a partition's event-time watermark window can
still receive turns, so their RAW derived turns are kept in a per-partition
sidecar (``_open/part=NNNN``). An ingest recomputes exactly the windows from
``open_start`` on, feeding buffer + new turns through the SAME block-rollup
kernel as the batch path (same sort, same float order → bit-exact), keeps
every older 1m row untouched, and re-runs the cascade on the merged
partition block (gap-fill grids extend monotonically, so pre-existing coarse
windows reproduce exactly). Turns older than ``open_start`` are LATE under
the watermark contract: counted per partition (``late_rows_dropped``),
reported in metrics, never silently merged.

Exactly-once, crash-safe commits (read-modify-write needs more than the
batch path's idempotent overwrite):

1. compute the partition's new state from current state + new turns;
2. stage every artifact (1m/1h/1d rows, Gorilla chunks, open buffer) under
   ``_staged/<batch_id>/``, then write a READY marker — the durability
   point for the merge result;
3. swap staged dirs into place (replayable: already-swapped artifacts are
   simply absent from staging), then commit manifests carrying
   ``ingest_batch_id``.

Recovery is roll-forward: a partition whose manifest already carries this
``batch_id`` is skipped (re-run of a killed job is exactly-once); a READY
marker from ANY interrupted batch is completed before new work so a torn
swap can never be read. Crash before READY leaves the old state fully
intact. The dataflow is the flagship's: derive → ONE hash shuffle on
``part`` → partition-local actor work; at 100 TB an hourly batch touches
its own partitions only, each in one task.

Concurrency contract: ONE ingest job per store at a time (batches are
sequential by nature — each builds on the previous watermark). Partitions
WITHIN a batch commit independently and in parallel.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from chronoxtract_ray.pipelines.rollup_pipeline import (
    DAY_US,
    HOUR_US,
    MINUTE_US,
    PipelineConfig,
    _gorilla_cfg,
    _writer_pool,
)
from chronoxtract_ray.stages.cascade import cascade_block
from chronoxtract_ray.stages.derive import make_derive
from chronoxtract_ray.stages.rollup import make_block_rollup
from chronoxtract_ray.state import checkpoint as ckpt

__all__ = ["run_incremental_ingest", "IncrementalWriteStage"]

TIER_ORDER = ("1m", "1h", "1d")
DERIVED_COLS = ("conv_id", "turn_idx", "bucket", "ts_us", "value", "crc")


def _staged_dir(root: str, batch_id: str, part: int) -> str:
    return os.path.join(root, "_staged", batch_id, f"part={part:04d}")


def _ready_path(root: str, batch_id: str, part: int) -> str:
    return _staged_dir(root, batch_id, part) + ".READY"


def _artifact_paths(root: str, part: int) -> dict[str, str]:
    """Relative artifact name → final directory, for one partition."""
    out = {"open": os.path.join(root, "_open", f"part={part:04d}")}
    for tier in TIER_ORDER:
        out[f"tier_{tier}"] = os.path.join(root, f"tier={tier}", f"part={part:04d}")
        out[f"chunks_{tier}"] = os.path.join(root, "chunks", f"tier={tier}", f"part={part:04d}")
    return out


def _write_staged(stage_dir: str, name: str, table: pa.Table) -> None:
    d = os.path.join(stage_dir, name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "data.parquet"), row_group_size=max(table.num_rows, 1))


def _swap_in(root: str, batch_id: str, part: int) -> None:
    """Replayable swap: every artifact still present in staging replaces its
    final dir; artifacts absent from staging were either not produced or
    already swapped by an interrupted attempt."""
    stage_dir = _staged_dir(root, batch_id, part)
    finals = _artifact_paths(root, part)
    for name, final in finals.items():
        src = os.path.join(stage_dir, name)
        if os.path.exists(src):
            os.makedirs(os.path.dirname(final), exist_ok=True)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.rename(src, final)


def _finish_partition(root: str, batch_id: str, part: int, manifests: dict) -> None:
    """Swap + manifest commit + staging cleanup (the last two phases)."""
    _swap_in(root, batch_id, part)
    for tier, man in manifests.items():
        mp = ckpt.manifest_path(root, tier, part)
        os.makedirs(os.path.dirname(mp), exist_ok=True)
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.rename(tmp, mp)
    shutil.rmtree(_staged_dir(root, batch_id, part), ignore_errors=True)
    rp = _ready_path(root, batch_id, part)
    if os.path.exists(rp):
        os.remove(rp)


def recover_partition(root: str, part: int) -> list[str]:
    """Roll interrupted ingest batches forward for one partition: any READY
    marker means the staged merge result is durable — complete its swap and
    manifest commit. Returns the batch ids recovered."""
    staged_root = os.path.join(root, "_staged")
    done = []
    if not os.path.isdir(staged_root):
        return done
    for batch_id in sorted(os.listdir(staged_root)):
        rp = _ready_path(root, batch_id, part)
        if os.path.exists(rp):
            with open(rp) as f:
                manifests = json.load(f)
            _finish_partition(root, batch_id, part, manifests)
            done.append(batch_id)
    return done


class IncrementalWriteStage:
    """Actor-pool UDF: one partition-aligned block of NEW derived turns →
    merged 1m/1h/1d rows + chunks + open buffer, committed exactly-once.

    Same actor shape as the batch RollupWriteStage (the Gorilla encoder and
    rollup kernel live in ``__init__``); fed by ``repartition(P,
    keys=["part"])`` so each call owns whole partitions."""

    def __init__(self, out_root: str, cfg: PipelineConfig, batch_id: str, allowed_lateness_us: int = 0):
        self.root = out_root
        self.cfg = cfg
        self.batch_id = batch_id
        self.allowed_lateness_us = int(allowed_lateness_us)
        self.fn = make_block_rollup(cfg.rollup)
        self.gor = {t: _gorilla_cfg(cfg, t) for t in TIER_ORDER}
        # the writer is used ONLY for its chunk encoder (staged paths differ)
        self.encoder = ckpt.PartitionWriter(out_root, cfg.num_parts, self.gor)

    # ---- helpers -------------------------------------------------------
    def _read_final(self, name: str, part: int):
        path = os.path.join(_artifact_paths(self.root, part)[name], "data.parquet")
        return pq.read_table(path) if os.path.exists(path) else None

    def _tier_tables(self, merged_1m: pa.Table) -> dict[str, pa.Table]:
        out = {"1m": merged_1m}
        cur = merged_1m
        for tier, wf, wc in (("1h", MINUTE_US, HOUR_US), ("1d", HOUR_US, DAY_US)):
            cur = cascade_block(cur, wf, wc, self.cfg.cascade_spec)
            out[tier] = cur
        return out

    def _process(self, part: int, new_turns: pa.Table) -> dict:
        root, bid = self.root, self.batch_id
        recover_partition(root, part)  # roll forward any torn older batch
        man_1m_path = ckpt.manifest_path(root, "1m", part)
        old_man = {}
        if os.path.exists(man_1m_path):
            with open(man_1m_path) as f:
                old_man = json.load(f)
        if old_man.get("ingest_batch_id") == bid:
            return {"part": part, "skipped": True, "late_rows": 0, "dup_rows": 0, "rows_1m": old_man.get("rows", 0)}

        old_1m = self._read_final("tier_1m", part)
        buffer = self._read_final("open", part)
        open_start = old_man.get("open_start_us")
        if open_start is None:
            # bootstrap from a batch-written store: nothing buffered, so the
            # finalized region ends after the last written window (a fully
            # retention-dropped partition has no watermark → accept anything)
            wm_win = old_man.get("watermark_us") if old_man else None
            open_start = (wm_win + self.cfg.rollup.width_us) if wm_win is not None else -(1 << 62)
        # a retention pass may have pruned windows at/after open_start in a
        # stale partition; anything behind its cutoff is late BY POLICY, so
        # redelivered pruned turns can never resurrect pruned windows
        ret_cut = old_man.get("retention_cutoff_us")
        if ret_cut is not None:
            open_start = max(open_start, int(ret_cut))

        ts = new_turns["ts_us"].to_numpy()
        on_time_mask = ts >= open_start
        late = int((~on_time_mask).sum())
        work_parts = [new_turns.filter(pa.array(on_time_mask))] if late else [new_turns]
        if buffer is not None and buffer.num_rows:
            work_parts.insert(0, buffer)
        cols = [c for c in DERIVED_COLS if all(c in t.column_names for t in work_parts)]
        work = pa.concat_tables([t.select(cols) for t in work_parts], promote_options="default")
        # at-least-once producers can re-deliver turns that are still inside
        # the open window (on-time by timestamp): dedup on the transcript key
        # (conv_id, turn_idx), buffer first so originals win — the open set
        # is tiny, this never touches finalized data
        dups = 0
        if work.num_rows:
            import pandas as pd

            dup_mask = pd.DataFrame(
                {
                    "c": work["conv_id"].to_numpy(zero_copy_only=False),
                    "t": work["turn_idx"].to_numpy(),
                }
            ).duplicated().to_numpy()
            dups = int(dup_mask.sum())
            if dups:
                work = work.filter(pa.array(~dup_mask))
        if work.num_rows == 0:
            # every new turn was late and nothing is buffered: the store is
            # already the fixpoint — touch nothing, report the drops
            return {"part": part, "skipped": False, "late_rows": late, "dup_rows": dups,
                    "rows_1m": old_man.get("rows", 0), "buffered_turns": 0}

        # windows >= open_start recomputed from raw turns (bit-exact vs a
        # from-scratch run: same kernel, same sort); older rows untouched
        new_rows = self.fn(work)
        if old_1m is not None:
            keep = old_1m["window_start"].to_numpy() < open_start
            merged_1m = pa.concat_tables(
                [old_1m.filter(pa.array(keep)), new_rows], promote_options="default"
            )
        else:
            merged_1m = new_rows
        merged_1m = merged_1m.sort_by([("conv_id", "ascending"), ("window_start", "ascending")])

        tiers = self._tier_tables(merged_1m)
        wm_ts = int(work["ts_us"].to_numpy().max()) if work.num_rows else int(old_man.get("wm_ts_us", 0))
        if old_man.get("wm_ts_us"):
            wm_ts = max(wm_ts, int(old_man["wm_ts_us"]))
        # the open region extends back by the lateness allowance: any window
        # that can still legally receive a turn keeps its raw turns buffered,
        # so bounded-out-of-order delivery merges bit-exactly
        width = self.cfg.rollup.width_us
        new_open_start = ((wm_ts - self.allowed_lateness_us) // width) * width
        keep_buf = work.filter(pa.array(work["ts_us"].to_numpy() >= new_open_start))

        # ---- stage everything, then READY (durability point) ----
        stage_dir = _staged_dir(root, bid, part)
        shutil.rmtree(stage_dir, ignore_errors=True)
        manifests = {}
        for tier, rows in tiers.items():
            rows = rows.sort_by(
                [(c, "ascending") for c in ("conv_id", "window_start") if c in rows.column_names]
            )
            _write_staged(stage_dir, f"tier_{tier}", rows)
            gcfg = self.gor.get(tier)
            if gcfg is not None and rows.num_rows:
                _write_staged(stage_dir, f"chunks_{tier}", self.encoder._encode_chunks(rows, gcfg))
            manifests[tier] = {
                "complete": True,
                "tier": tier,
                "part": part,
                "rows": rows.num_rows,
                "watermark_us": int(rows["window_start"].to_numpy().max()) if rows.num_rows else None,
                "written_at": time.time(),
                "ingest_batch_id": bid,
                "wm_ts_us": wm_ts,
                "open_start_us": new_open_start if tier == "1m" else None,
                "late_rows_dropped": int(old_man.get("late_rows_dropped", 0)) + late,
            }
        _write_staged(stage_dir, "open", keep_buf)
        rp = _ready_path(root, bid, part)
        with open(rp + ".tmp", "w") as f:
            json.dump(manifests, f)
        os.rename(rp + ".tmp", rp)

        _finish_partition(root, bid, part, manifests)
        return {
            "part": part,
            "skipped": False,
            "late_rows": late,
            "dup_rows": dups,
            "rows_1m": tiers["1m"].num_rows,
            "buffered_turns": keep_buf.num_rows,
        }

    def __call__(self, block: pa.Table) -> pa.Table:
        recs = []
        if block.num_rows:
            part_col = block["part"].to_numpy()
            for part in np.unique(part_col):
                sub = block.filter(pa.array(part_col == part)).drop_columns(["part"])
                recs.append(self._process(int(part), sub))
        return pa.Table.from_pylist(
            recs,
            schema=pa.schema(
                [
                    ("part", pa.int64()),
                    ("skipped", pa.bool_()),
                    ("late_rows", pa.int64()),
                    ("dup_rows", pa.int64()),
                    ("rows_1m", pa.int64()),
                    ("buffered_turns", pa.int64()),
                ]
            ),
        )


def run_incremental_ingest(
    source,
    out_root: str,
    cfg: PipelineConfig | None = None,
    batch_id: str | None = None,
    pre_derived: bool = False,
    allowed_lateness_us: int = 0,
) -> dict:
    """Merge a batch of new transcripts into ``out_root``. ``source``: a
    transcripts Dataset or parquet path (or, with ``pre_derived``, a Dataset
    already in the derived-row schema conv_id/turn_idx/bucket/ts_us/value).
    ``batch_id`` keys exactly-once semantics — re-running a killed job with
    the SAME id never double-counts a turn; defaults to a fresh uuid (every
    call is a distinct batch). ``allowed_lateness_us`` widens the open
    region: a turn up to that far behind the partition watermark still
    merges exactly (its windows stay buffered); only older ones drop late.

    Returns metrics: partitions touched, late rows dropped, 1m rows after
    merge, buffered open-window turns."""
    import ray.data as rd

    from chronoxtract_ray.stages.util import ensure_hash_shuffle

    ensure_hash_shuffle()
    cfg = cfg or PipelineConfig()
    batch_id = batch_id or uuid.uuid4().hex
    os.makedirs(out_root, exist_ok=True)
    ds = rd.read_parquet(source) if isinstance(source, str) else source
    ensure_hash_shuffle(ds)

    t0 = time.time()
    if pre_derived:
        P = cfg.num_parts

        def add_part(batch: pa.Table) -> pa.Table:
            part = ckpt.conv_partition(batch["conv_id"].to_numpy(zero_copy_only=False), P)
            return batch.append_column("part", pa.array(part, pa.int64()))

        derived = ds.map_batches(add_part, batch_format="pyarrow")
    else:
        derived = ds.map_batches(
            make_derive(cfg.rollup.bucket_us, with_crc=cfg.rollup.with_checksum, num_parts=cfg.num_parts),
            batch_format="pyarrow",
        )
    keyed = derived.repartition(cfg.num_parts, keys=["part"], sort=False)
    wconc, w_cpus = _writer_pool(cfg)
    recs = keyed.map_batches(
        IncrementalWriteStage,
        fn_constructor_args=(out_root, cfg, batch_id, allowed_lateness_us),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=wconc,
        num_cpus=w_cpus,
    ).take_all()
    # every touched partition has committed; drop this batch's (now empty)
    # staging tree so crashed-and-rerun batches don't accumulate leftovers
    shutil.rmtree(os.path.join(out_root, "_staged", batch_id), ignore_errors=True)
    return {
        "batch_id": batch_id,
        "wall_s": time.time() - t0,
        "parts_touched": len(recs),
        "parts_skipped_exactly_once": int(sum(r["skipped"] for r in recs)),
        "late_rows_dropped": int(sum(r["late_rows"] for r in recs)),
        "dup_rows_dropped": int(sum(r["dup_rows"] or 0 for r in recs)),
        "rows_1m": int(sum(r["rows_1m"] for r in recs)),
        "buffered_turns": int(sum(r["buffered_turns"] or 0 for r in recs)),
    }
