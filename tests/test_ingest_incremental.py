"""Incremental ingest ≡ batch recompute, bit-exactly.

The contract (stages/ingest.py): splitting one transcript stream into K
time-ordered batches and ingesting them incrementally yields a store whose
tier rows AND Gorilla chunks are byte-identical to one from-scratch batch
run over the union — plus watermark/late-data accounting, exactly-once
batch ids, and roll-forward crash recovery."""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import assert_tables_bitwise_equal

from chronoxtract_ray.pipelines.rollup_pipeline import PipelineConfig, run_rollup_pipeline, tier_table
from chronoxtract_ray.sources.transcripts import generate_table
from chronoxtract_ray.stages import ingest
from chronoxtract_ray.state import checkpoint as ckpt

FULL = "/tmp/ctx_ing_full"
INC = "/tmp/ctx_ing_inc"
P = 4
TIERS = ("1m", "1h", "1d")


def _split_by_time(tbl: pa.Table, qs=(0.5,)):
    ts = tbl["ts"].cast(pa.int64()).to_numpy()
    cuts = np.quantile(ts, qs).astype(np.int64)
    edges = [ts.min() - 1, *cuts, ts.max() + 1]
    return [
        tbl.filter(pa.array((ts > lo) & (ts <= hi)))
        for lo, hi in zip(edges[:-1], edges[1:])
    ]


def _chunk_tables(root: str, tier: str) -> pa.Table:
    files = sorted(glob.glob(os.path.join(root, "chunks", f"tier={tier}", "part=*", "*.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return t.sort_by([("conv_id", "ascending"), ("chunk_start", "ascending")])


@pytest.fixture(scope="module")
def stores(ray_session):
    import ray.data as rd

    tbl = generate_table(10, base_turns=40, hot_every=4, hot_factor=6)
    for d in (FULL, INC):
        shutil.rmtree(d, ignore_errors=True)
    cfg = PipelineConfig(num_parts=P)
    run_rollup_pipeline(rd.from_arrow(tbl), FULL, cfg)
    batches = _split_by_time(tbl, qs=(1 / 3, 2 / 3))
    metrics = [
        ingest.run_incremental_ingest(rd.from_arrow(b), INC, cfg, batch_id=f"b{i}")
        for i, b in enumerate(batches)
    ]
    return tbl, batches, metrics


def test_three_batch_ingest_equals_batch_run(stores):
    for tier in TIERS:
        assert_tables_bitwise_equal(tier_table(FULL, tier), tier_table(INC, tier), f"tier {tier}")


def test_chunks_equal_batch_run(stores):
    for tier in TIERS:
        assert_tables_bitwise_equal(_chunk_tables(FULL, tier), _chunk_tables(INC, tier), f"chunks {tier}")


def test_no_late_rows_in_ordered_stream(stores):
    _, _, metrics = stores
    assert sum(m["late_rows_dropped"] for m in metrics) == 0


def test_exactly_once_same_batch_id(stores):
    import ray.data as rd

    _, batches, _ = stores
    before = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(INC, "**", "*.parquet"), recursive=True)}
    m = ingest.run_incremental_ingest(rd.from_arrow(batches[-1]), INC, PipelineConfig(num_parts=P), batch_id="b2")
    assert m["parts_skipped_exactly_once"] == m["parts_touched"] > 0
    for f, old in before.items():
        assert os.path.getmtime(f) == old, f"exactly-once violated: rewrote {f}"
    for tier in TIERS:
        assert_tables_bitwise_equal(tier_table(FULL, tier), tier_table(INC, tier), tier)


def test_replayed_batch_under_new_id_drops_as_late(stores):
    """Re-sending an old batch under a NEW id must not double-count: every
    turn older than the open window is dropped as late; rows at/after the
    open window are recomputed from the SAME buffered turns (fixpoint)."""
    import ray.data as rd

    _, batches, _ = stores
    m = ingest.run_incremental_ingest(rd.from_arrow(batches[0]), INC, PipelineConfig(num_parts=P), batch_id="replay")
    # turns behind the watermark drop as late; turns still inside an open
    # window are on-time duplicates and dedup against the buffer instead
    assert m["late_rows_dropped"] + m["dup_rows_dropped"] == batches[0].num_rows
    assert m["dup_rows_dropped"] > 0
    for tier in TIERS:
        assert_tables_bitwise_equal(tier_table(FULL, tier), tier_table(INC, tier), tier)


def test_watermarks_and_buffer_recorded(stores):
    mans = ckpt.load_manifests(INC, "1m", P)
    assert mans and all(m.get("open_start_us") is not None and m.get("wm_ts_us") for m in mans.values())
    for p, m in mans.items():
        buf = os.path.join(INC, "_open", f"part={p:04d}", "data.parquet")
        assert os.path.exists(buf)
        ts = pq.read_table(buf)["ts_us"].to_numpy()
        assert (ts >= m["open_start_us"]).all()
        assert m["wm_ts_us"] == (ts.max() if ts.size else m["wm_ts_us"])


def test_crash_recovery_rolls_forward(stores, ray_session):
    """A READY marker is the durability point: kill after READY, before the
    swap — the next touch of the partition completes the commit."""
    part = 0
    # fabricate a staged state: tier_1m with one sentinel row appended
    part_dir = os.path.join(INC, "tier=1m", f"part={part:04d}")
    cur = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(os.path.join(part_dir, "*.parquet")))]
    )
    sentinel = cur.slice(0, 1)
    staged = pa.concat_tables([cur, sentinel])
    stage_dir = ingest._staged_dir(INC, "crashed", part)
    ingest._write_staged(stage_dir, "tier_1m", staged)
    with open(ckpt.manifest_path(INC, "1m", part)) as f:
        man = json.load(f)
    man.update(rows=staged.num_rows, ingest_batch_id="crashed")
    rp = ingest._ready_path(INC, "crashed", part)
    with open(rp, "w") as f:
        json.dump({"1m": man}, f)

    recovered = ingest.recover_partition(INC, part)
    assert recovered == ["crashed"]
    after = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(os.path.join(part_dir, "*.parquet")))]
    )
    assert after.num_rows == staged.num_rows
    with open(ckpt.manifest_path(INC, "1m", part)) as f:
        assert json.load(f)["ingest_batch_id"] == "crashed"
    assert not os.path.exists(rp) and not os.path.exists(stage_dir)
    # restore the store for any later test: swap the original rows back
    ingest._write_staged(ingest._staged_dir(INC, "restore", part), "tier_1m", cur)
    with open(ingest._ready_path(INC, "restore", part), "w") as f:
        json.dump({"1m": dict(man, rows=cur.num_rows, ingest_batch_id="restore")}, f)
    ingest.recover_partition(INC, part)


def test_retention_completes_torn_swap_first(stores, ray_session):
    """A crash after READY but before the swap must never let a later
    roll-forward undo a retention pass (resurrecting pruned rows / erasing
    retention_cutoff_us). apply_retention completes ALL pending READY
    markers before pruning, so the recovered rows are pruned in the same
    pass and the READY marker is consumed."""
    import ray.data as rd

    from chronoxtract_ray.stages.retention import RetentionPolicy, apply_retention

    tbl, _, _ = stores
    root = "/tmp/ctx_ing_torn_ret"
    shutil.rmtree(root, ignore_errors=True)
    cfg = PipelineConfig(num_parts=P)
    ingest.run_incremental_ingest(rd.from_arrow(tbl), root, cfg, batch_id="base")

    # fabricate a torn commit on partition 0: staged rows (full pre-prune
    # span) + READY marker, crash before the swap
    part = 0
    part_dir = os.path.join(root, "tier=1m", f"part={part:04d}")
    cur = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(os.path.join(part_dir, "*.parquet")))]
    )
    ingest._write_staged(ingest._staged_dir(root, "torn", part), "tier_1m", cur)
    with open(ckpt.manifest_path(root, "1m", part)) as f:
        man = json.load(f)
    man.update(rows=cur.num_rows, ingest_batch_id="torn")
    with open(ingest._ready_path(root, "torn", part), "w") as f:
        json.dump({"1m": man}, f)

    summary = apply_retention(root, P, RetentionPolicy({"1m": 12 * 3_600_000_000}))
    cutoff = summary["tiers"]["1m"]["cutoff_us"]
    assert summary["tiers"]["1m"]["rows_dropped"] > 0

    # roll-forward happened BEFORE pruning: READY consumed, manifest holds
    # both the rolled-forward batch id and the enforced cutoff
    assert not os.path.exists(ingest._ready_path(root, "torn", part))
    with open(ckpt.manifest_path(root, "1m", part)) as f:
        man2 = json.load(f)
    assert man2["ingest_batch_id"] == "torn"
    assert man2["retention_cutoff_us"] == cutoff

    # no pruned window resurrects — not even after a later recovery pass
    # (the scenario that silently undid retention before the fix)
    ingest.recover_all_partitions(root)
    t = tier_table(root, "1m")
    assert int(t["window_start"].to_numpy().min()) >= cutoff


def test_bootstrap_from_batch_store_counts_late(stores):
    """Appending to a store built by the BATCH pipeline (no open buffer):
    the finalized region is everything already written; replayed turns all
    drop as late and the store is untouched."""
    import ray.data as rd

    tbl, _, _ = stores
    root = "/tmp/ctx_ing_boot"
    shutil.rmtree(root, ignore_errors=True)
    cfg = PipelineConfig(num_parts=P)
    run_rollup_pipeline(rd.from_arrow(tbl), root, cfg)
    before = {t: tier_table(root, t) for t in TIERS}
    m = ingest.run_incremental_ingest(rd.from_arrow(tbl), root, cfg, batch_id="boot")
    assert m["late_rows_dropped"] == tbl.num_rows
    for t in TIERS:
        assert_tables_bitwise_equal(tier_table(root, t), before[t], t)


def test_retention_then_ingest_composes(stores, ray_session):
    """Prune a store, then append strictly newer turns: pruned windows must
    not resurrect, kept history stays bit-identical, and the new windows
    appear — the compose case a tiered store lives in (hourly ingest batches
    + a nightly retention job)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from chronoxtract_ray.stages.retention import RetentionPolicy, apply_retention

    tbl, _, _ = stores
    root = "/tmp/ctx_ing_compose"
    shutil.rmtree(root, ignore_errors=True)
    cfg = PipelineConfig(num_parts=P)
    # history = everything except the final 2h of the stream; live = the rest
    ts = tbl["ts"].cast(pa.int64()).to_numpy()
    cut = int(ts.max()) - 2 * 3_600_000_000
    hist = tbl.filter(pa.array(ts <= cut))
    live = tbl.filter(pa.array(ts > cut))
    ingest.run_incremental_ingest(rd.from_arrow(hist), root, cfg, batch_id="hist")

    keep_us = 12 * 3_600_000_000
    summary = apply_retention(root, P, RetentionPolicy({"1m": keep_us}))
    cutoff = summary["tiers"]["1m"]["cutoff_us"]
    assert summary["tiers"]["1m"]["rows_dropped"] > 0
    kept_before = tier_table(root, "1m")

    m = ingest.run_incremental_ingest(rd.from_arrow(live), root, cfg, batch_id="live")
    assert m["late_rows_dropped"] == 0
    after = tier_table(root, "1m")
    ws = after["window_start"].to_numpy()
    # nothing resurrects behind the retention cutoff
    assert int(ws.min()) >= cutoff
    # pre-existing finalized windows are untouched by the append
    open_starts = {p: man["open_start_us"] for p, man in ckpt.load_manifests(root, "1m", P).items()}
    min_open = min(open_starts.values())
    old_final = kept_before.filter(pa.array(kept_before["window_start"].to_numpy() < min_open))
    still = after.filter(pa.array(ws < min_open))
    # the append can only ADD rows at/after each partition's open window
    assert old_final.num_rows <= still.num_rows
    merged = {(c, w) for c, w in zip(still["conv_id"].to_pylist(), still["window_start"].to_pylist())}
    for c, w in zip(old_final["conv_id"].to_pylist(), old_final["window_start"].to_pylist()):
        assert (c, w) in merged
    # and the live tail's windows are present
    live_ts = live["ts"].cast(pa.int64()).to_numpy()
    assert int(ws.max()) == (int(live_ts.max()) // 60_000_000) * 60_000_000


def test_stale_partition_cannot_resurrect_after_retention(ray_session):
    """A partition whose OPEN window falls behind the retention horizon:
    retention empties its rows, chunks, and open buffer; redelivering the
    original turns must drop them all as late-by-policy (no resurrection)."""
    import ray.data as rd

    from chronoxtract_ray.sources.transcripts import TRANSCRIPT_SCHEMA
    from chronoxtract_ray.stages.retention import RetentionPolicy, apply_retention

    root = "/tmp/ctx_ing_stale"
    shutil.rmtree(root, ignore_errors=True)
    base = 1_704_067_200_000_000
    n = 30
    tbl = pa.table(
        {
            "conv_id": pa.array(["conv-x"] * n, pa.string()),
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(["t" * (i % 7 + 1) for i in range(n)], pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array([base + i * 20_000_000 for i in range(n)], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    cfg = PipelineConfig(num_parts=2)
    ingest.run_incremental_ingest(rd.from_arrow(tbl), root, cfg, batch_id="a")
    assert tier_table(root, "1m").num_rows > 0

    # horizon entirely beyond the data: cutoff = watermark + 1h
    wm = max(m["watermark_us"] for m in ckpt.load_manifests(root, "1m", 2).values())
    apply_retention(root, 2, RetentionPolicy({"1m": -3_600_000_000}))  # negative keep → cutoff past the end
    assert tier_table(root, "1m").num_rows == 0
    for p in range(2):
        buf = os.path.join(root, "_open", f"part={p:04d}", "data.parquet")
        if os.path.exists(buf):
            assert pq.read_table(buf).num_rows == 0

    m = ingest.run_incremental_ingest(rd.from_arrow(tbl), root, cfg, batch_id="b")
    assert m["late_rows_dropped"] == n
    assert tier_table(root, "1m").num_rows == 0, "pruned windows resurrected"


def test_out_of_order_delivery_within_lateness_merges_exactly(stores, ray_session):
    """allowed_lateness widens the open region: turns displaced into the NEXT
    batch (arriving ~10-11 h behind the advanced watermark) still merge, and
    the final store is bit-identical to the one-shot batch run."""
    import ray.data as rd

    tbl, _, _ = stores
    root = "/tmp/ctx_ing_ooo"
    shutil.rmtree(root, ignore_errors=True)
    cfg = PipelineConfig(num_parts=P)
    HOUR = 3_600_000_000
    ts = tbl["ts"].cast(pa.int64()).to_numpy()
    q = np.quantile(ts, (1 / 3, 2 / 3)).astype(np.int64)
    disp1 = (ts > q[0] - HOUR) & (ts <= q[0])  # arrive one batch late
    disp2 = (ts > q[1] - HOUR) & (ts <= q[1])
    assert disp1.any() and disp2.any()
    b1 = tbl.filter(pa.array((ts <= q[0]) & ~disp1))
    b2 = tbl.filter(pa.array(((ts > q[0]) & (ts <= q[1]) & ~disp2) | disp1))
    b3 = tbl.filter(pa.array((ts > q[1]) | disp2))
    ms = [
        ingest.run_incremental_ingest(
            rd.from_arrow(b), root, cfg, batch_id=f"o{i}", allowed_lateness_us=12 * HOUR
        )
        for i, b in enumerate((b1, b2, b3))
    ]
    assert sum(m["late_rows_dropped"] for m in ms) == 0
    assert sum(m["dup_rows_dropped"] for m in ms) == 0
    for tier in TIERS:
        assert_tables_bitwise_equal(tier_table(FULL, tier), tier_table(root, tier), f"ooo {tier}")


def test_edge_batches_empty_single_and_many_splits(ray_session):
    """Degenerate batch shapes: an EMPTY batch is a no-op, a single-turn
    batch merges, and a 5-way split still equals the one-shot run."""
    import ray.data as rd

    tbl = generate_table(6, base_turns=30, hot_every=3, hot_factor=5)
    full_root, inc_root = "/tmp/ctx_ing_edge_full", "/tmp/ctx_ing_edge_inc"
    for d in (full_root, inc_root):
        shutil.rmtree(d, ignore_errors=True)
    cfg = PipelineConfig(num_parts=P)
    run_rollup_pipeline(rd.from_arrow(tbl), full_root, cfg)

    batches = _split_by_time(tbl, qs=(0.2, 0.4, 0.6, 0.8))
    # make the stream lumpy: an empty batch and a single-turn batch in between
    ts = tbl["ts"].cast(pa.int64()).to_numpy()
    order = np.argsort(ts, kind="stable")
    lone = tbl.take(order[-1:])  # the final turn alone
    rest4 = batches[4].filter(pa.array(batches[4]["ts"].cast(pa.int64()).to_numpy() < ts[order[-1]]))
    seq = [batches[0], tbl.slice(0, 0), batches[1], batches[2], batches[3], rest4, lone]
    for i, b in enumerate(seq):
        m = ingest.run_incremental_ingest(rd.from_arrow(b), inc_root, cfg, batch_id=f"e{i}")
        if b.num_rows == 0:
            assert m["parts_touched"] == 0 and m["rows_1m"] == 0
    for tier in TIERS:
        assert_tables_bitwise_equal(tier_table(full_root, tier), tier_table(inc_root, tier), f"edge {tier}")


def test_closed_segments_survive_by_hard_link(ray_session):
    """The write-amplification contract: an ingest batch rewrites only
    segment files overlapping its recompute region — every closed segment
    is hard-linked through the staged commit, so its INODE (not just its
    content) survives, and the store still equals a from-scratch run."""
    import ray.data as rd

    tbl = generate_table(8, base_turns=60, hot_every=4, hot_factor=5)
    full_root, inc_root = "/tmp/ctx_ing_link_full", "/tmp/ctx_ing_link_inc"
    for d in (full_root, inc_root):
        shutil.rmtree(d, ignore_errors=True)
    cfg = PipelineConfig(num_parts=P)
    run_rollup_pipeline(rd.from_arrow(tbl), full_root, cfg)
    batches = _split_by_time(tbl, qs=(0.4, 0.7, 0.9))
    for i, b in enumerate(batches[:-1]):
        ingest.run_incremental_ingest(rd.from_arrow(b), inc_root, cfg, batch_id=f"l{i}")

    def seg_inodes():
        out = {}
        for pat in ("tier=*/part=*/*.parquet", "chunks/tier=*/part=*/*.parquet"):
            for f in glob.glob(os.path.join(inc_root, pat)):
                out[f] = os.stat(f).st_ino
        return out

    before = seg_inodes()
    ingest.run_incremental_ingest(rd.from_arrow(batches[-1]), inc_root, cfg, batch_id="l-last")
    after = seg_inodes()
    preserved = [f for f, ino in before.items() if after.get(f) == ino]
    rewritten = [f for f in before if f not in after]
    # the final small batch must not have rewritten the whole store
    assert preserved, f"no segment survived the batch: rewrote {len(rewritten)} files"
    assert len(preserved) >= len(rewritten), (
        f"batch rewrote {len(rewritten)} of {len(before)} segments (kept {len(preserved)})"
    )
    for tier in TIERS:
        assert_tables_bitwise_equal(tier_table(full_root, tier), tier_table(inc_root, tier), f"link {tier}")
