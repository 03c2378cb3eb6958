"""The salted (conv, bucket)-keyed rollup stage — the extreme-skew variant —
must produce exactly the same tier rows as the partition-aligned pipeline
path."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from chronoxtract_ray.sources.transcripts import generate_table
from chronoxtract_ray.stages.derive import make_derive
from chronoxtract_ray.stages.rollup import HOUR_US, RollupConfig, rollup


@pytest.fixture(scope="module")
def tier_pair(ray_session):
    import ray.data as rd

    tbl = generate_table(8, base_turns=25, hot_every=3, hot_factor=20)
    derived = rd.from_arrow(tbl).map_batches(make_derive(HOUR_US, num_parts=4), batch_format="pyarrow")
    salted = rollup(derived, RollupConfig(), num_blocks=8).to_pandas()

    # partition-aligned comparison: same kernel over part-keyed blocks
    from chronoxtract_ray.stages.rollup import make_block_rollup
    from chronoxtract_ray.stages.util import ensure_hash_shuffle

    ensure_hash_shuffle(derived)
    fn = make_block_rollup(RollupConfig())
    aligned = (
        derived.repartition(4, keys=["part"], sort=False)
        .map_batches(lambda b: fn(b.drop_columns(["part"])), batch_size=None, batch_format="pyarrow")
        .to_pandas()
    )
    return salted, aligned


def test_same_rows(tier_pair):
    salted, aligned = tier_pair
    a = salted.sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    b = aligned.sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["conv_id"] == b["conv_id"]).all()
    for col in a.columns:
        if col in ("conv_id",):
            continue
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av, bv, rtol=1e-12, atol=1e-12, equal_nan=True), col
        else:
            assert (av == bv).all(), col


def test_custom_feature_registry(ray_session):
    """register_feature → RollupConfig.extra_features → tier column."""
    import ray.data as rd

    from chronoxtract_ray import kernels

    kernels.register_feature("p90_minus_p10", lambda v: float(np.percentile(v, 90) - np.percentile(v, 10)))
    tbl = generate_table(4, base_turns=20, hot_every=0)
    derived = rd.from_arrow(tbl).map_batches(make_derive(HOUR_US, num_parts=2), batch_format="pyarrow")
    out = rollup(derived, RollupConfig(extra_features=("p90_minus_p10",)), num_blocks=4).to_pandas()
    assert "p90_minus_p10" in out.columns
    assert np.isfinite(out["p90_minus_p10"]).all()
    assert (out["p90_minus_p10"] >= 0).all()


def test_nonfused_pipeline_matches_fused(ray_session):
    """fused_cascade=False (separate cascade stage reading written 1m
    partitions) must produce identical tiers to the fused default."""
    import shutil

    import ray.data as rd

    from chronoxtract_ray.pipelines.rollup_pipeline import PipelineConfig, run_rollup_pipeline, tier_table

    tbl = generate_table(6, base_turns=25, hot_every=3, hot_factor=8)
    outs = {}
    for mode, fused in (("fused", True), ("staged", False)):
        out = f"/tmp/ctx_mode_{mode}"
        shutil.rmtree(out, ignore_errors=True)
        run_rollup_pipeline(rd.from_arrow(tbl), out, PipelineConfig(num_parts=3, fused_cascade=fused))
        outs[mode] = out
    for tier in ("1m", "1h", "1d"):
        a = tier_table(outs["fused"], tier)
        b = tier_table(outs["staged"], tier)
        assert a.num_rows == b.num_rows, tier
        for col in a.column_names:
            if col in ("tier", "part") or col not in b.column_names:
                continue
            av = a[col].to_numpy(zero_copy_only=False)
            bv = b[col].to_numpy(zero_copy_only=False)
            if av.dtype.kind == "f":
                assert np.allclose(av, bv, rtol=1e-12, atol=1e-12, equal_nan=True), (tier, col)
            else:
                assert (av == bv).all(), (tier, col)


def test_cascade_stage_reads_segmented_partition(ray_session, tmp_path):
    """CascadeWriteStage must cascade a partition's SEGMENT FILES together:
    an ingest-evolved store holds several parquet files per partition, and
    cascading each file alone would gap-fill each segment against itself
    instead of the conversation's full series."""
    import pyarrow.parquet as pq

    from chronoxtract_ray.pipelines.rollup_pipeline import (
        CascadeWriteStage,
        PipelineConfig,
        tier_table,
    )
    from chronoxtract_ray.stages.derive import derive_batch
    from chronoxtract_ray.stages.rollup import make_block_rollup

    tbl = generate_table(3, base_turns=40, hot_every=0)
    cfg = PipelineConfig(num_parts=1)
    rows_1m = make_block_rollup(cfg.rollup)(derive_batch(tbl, cfg.rollup.bucket_us))

    def store_with_segments(root, n_segments):
        pdir = os.path.join(root, "tier=1m", "part=0000")
        os.makedirs(pdir)
        # split mid-conversation: row-range halves, NOT conv-aligned
        step = -(-rows_1m.num_rows // n_segments)
        for s in range(n_segments):
            seg = rows_1m.slice(s * step, step)
            if seg.num_rows:
                pq.write_table(seg, os.path.join(pdir, f"seg-{s}.parquet"))
        stage = CascadeWriteStage(str(root), cfg)
        stage(pa.table({"path": pa.array([pdir], pa.string())}))
        return root

    one = store_with_segments(tmp_path / "one", 1)
    two = store_with_segments(tmp_path / "two", 3)
    for tier in ("1h", "1d"):
        a = tier_table(str(one), tier)
        b = tier_table(str(two), tier)
        assert a.num_rows == b.num_rows, tier
        for col in a.column_names:
            av = a[col].to_numpy(zero_copy_only=False)
            bv = b[col].to_numpy(zero_copy_only=False)
            if av.dtype.kind == "f":
                assert np.array_equal(av, bv, equal_nan=True), (tier, col)
            else:
                assert (av == bv).all(), (tier, col)


def test_standalone_gorilla_stage(ray_session):
    """encode_tier (the standalone actor-pool stage) roundtrips a tier."""
    import shutil

    import ray.data as rd

    from chronoxtract_ray.pipelines.rollup_pipeline import PipelineConfig, run_rollup_pipeline, tier_dataset, tier_table
    from chronoxtract_ray.stages.gorilla_stage import decode_chunks, encode_tier

    out = "/tmp/ctx_mode_fused"  # reuse the fused output from the test above
    import os
    if not os.path.exists(out):
        tbl = generate_table(6, base_turns=25, hot_every=3, hot_factor=8)
        run_rollup_pipeline(rd.from_arrow(tbl), out, PipelineConfig(num_parts=3))
    import pyarrow as pa

    chunks = pa.Table.from_pylist(encode_tier(tier_dataset(out, "1m"), 60_000_000, concurrency=(1, 2)).take_all())
    pts = decode_chunks(chunks).sort_by([("conv_id", "ascending"), ("window_start", "ascending")])
    t = tier_table(out, "1m")
    assert pts.num_rows == t.num_rows
    assert np.array_equal(pts["value"].to_numpy(), t["mean"].to_numpy())


def test_dataset_level_cascade_matches_block(ray_session):
    """stages.cascade.cascade (public dataset-level op) ≡ cascade_block."""
    import ray.data as rd

    from chronoxtract_ray.pipelines.rollup_pipeline import tier_table
    from chronoxtract_ray.stages.cascade import cascade, cascade_block
    from chronoxtract_ray.kernels.windowed import FeatureSpec
    import pyarrow as pa
    import os

    out = "/tmp/ctx_mode_fused"
    t1m = tier_table(out, "1m")
    drop = [c for c in ("tier", "part") if c in t1m.column_names]
    t1m = t1m.drop_columns(drop) if drop else t1m
    direct = cascade_block(t1m, 60_000_000, 3_600_000_000, FeatureSpec()).to_pandas()
    via_ds = cascade(rd.from_arrow(t1m), 60_000_000, 3_600_000_000).to_pandas()
    a = direct.sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    b = via_ds.sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert np.allclose(a["mean"], b["mean"])
    assert np.allclose(a["merged_mean"], b["merged_mean"], equal_nan=True)


def test_collect_table_preserves_types_and_handles_empty(ray_session):
    """collect_table fetches result blocks as typed Arrow (uint64 survives;
    from_pylist would have re-inferred) and returns a schema'd empty table
    when every block filtered to zero rows."""
    import pyarrow as pa
    import ray.data as rd

    from chronoxtract_ray.stages.util import collect_table

    t = pa.table({"k": pa.array([1, 2, 3], pa.uint64()), "v": pa.array([1.0, 2.0, 3.0])})
    ds = rd.from_arrow(t)
    got = collect_table(ds)
    assert got.schema.field("k").type == pa.uint64()
    assert got.num_rows == 3

    # all-rows-filtered: 0 rows; columns may be absent when Ray returns no
    # blocks at all (same contract as the old from_pylist([]) path — callers
    # with possibly-empty results build their own typed empty tables)
    empty = collect_table(ds.filter(lambda r: False))
    assert empty.num_rows == 0
