"""Retention enforcement: per-tier keep horizons over a real tier store.

Invariants (FIXTURES.md model): after ``apply_retention`` the store equals
"run the pipeline, then filter every tier to window_start >= cutoff" — tier
rows AND decoded Gorilla chunks; wholly-expired partitions vanish from disk
without their data being read; the operation is idempotent and stamps
manifests so a killed run resumes; the cutoff derives from the store
watermark, never the wall clock."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import assert_tables_bitwise_equal

from chronoxtract_ray.pipelines.rollup_pipeline import PipelineConfig, run_rollup_pipeline, tier_table
from chronoxtract_ray.sources.transcripts import generate_table
from chronoxtract_ray.stages.retention import RetentionPolicy, apply_retention, store_watermark_us
from chronoxtract_ray.state import gorilla

ROOT = "/tmp/ctx_retention"
P = 4
HOUR = 3_600_000_000
DAY = 24 * HOUR


@pytest.fixture(scope="module")
def store(ray_session):
    import ray.data as rd

    tbl = generate_table(12, base_turns=30, hot_every=5, hot_factor=8)
    shutil.rmtree(ROOT, ignore_errors=True)
    run_rollup_pipeline(rd.from_arrow(tbl), ROOT, PipelineConfig(num_parts=P))
    baseline = {t: tier_table(ROOT, t).sort_by([("conv_id", "ascending"), ("window_start", "ascending")]) for t in ("1m", "1h", "1d")}
    wm = store_watermark_us(ROOT, ("1m", "1h", "1d"), P)
    policy = RetentionPolicy({"1m": 6 * HOUR, "1h": 2 * DAY, "1d": None})
    summary = apply_retention(ROOT, P, policy)
    return baseline, wm, policy, summary


def _surviving(tier):
    return tier_table(ROOT, tier).sort_by([("conv_id", "ascending"), ("window_start", "ascending")])


def test_trim_equals_filter(store):
    baseline, wm, policy, _ = store
    for tier in ("1m", "1h"):
        cutoff = policy.cutoff_us(tier, wm)
        expect = baseline[tier].filter(pa.array(baseline[tier]["window_start"].to_numpy() >= cutoff))
        assert_tables_bitwise_equal(_surviving(tier), expect, tier)


def test_infinite_tier_untouched(store):
    baseline, _, _, summary = store
    assert_tables_bitwise_equal(_surviving("1d"), baseline["1d"], "1d")
    assert "1d" not in summary["tiers"]


def test_summary_accounts_for_every_row(store):
    baseline, wm, policy, summary = store
    for tier in ("1m", "1h"):
        cutoff = policy.cutoff_us(tier, wm)
        ws = baseline[tier]["window_start"].to_numpy()
        assert summary["tiers"][tier]["rows_dropped"] == int((ws < cutoff).sum())
        s = summary["tiers"][tier]
        assert s["parts_dropped"] + s["parts_trimmed"] + s["parts_kept"] == P


def test_expired_partitions_leave_no_files(store):
    _, wm, policy, _ = store
    cutoff = policy.cutoff_us("1m", wm)
    for d in glob.glob(os.path.join(ROOT, "tier=1m", "part=*")):
        t = pq.read_table(os.path.join(d, "data.parquet"))
        if t.num_rows:
            assert int(t["window_start"].to_numpy().min()) >= cutoff


def test_chunks_match_tier_rows_after_trim(store):
    _, wm, policy, _ = store
    cutoff = policy.cutoff_us("1m", wm)
    for d in sorted(glob.glob(os.path.join(ROOT, "chunks", "tier=1m", "part=*"))):
        c = pq.read_table(os.path.join(d, "data.parquet"))
        part = os.path.basename(d)
        rows = pq.read_table(os.path.join(ROOT, "tier=1m", part, "data.parquet"))
        pts = []
        for i in range(c.num_rows):
            ts = gorilla.decode_timestamps(c["gorilla_timestamps"][i].as_py())
            assert ts.size == c["n_points"][i].as_py()
            assert ts.min() >= cutoff
            assert ts[0] == c["first_window"][i].as_py() and ts[-1] == c["last_window"][i].as_py()
            conv = c["conv_id"][i].as_py()
            vals = gorilla.decode_values(c["gorilla_values"][i].as_py())
            pts += [(conv, int(t), float(v)) for t, v in zip(ts, vals)]
        expect = sorted(
            zip(
                rows["conv_id"].to_pylist(),
                rows["window_start"].to_pylist(),
                rows["mean"].to_pylist(),
            )
        )
        assert sorted(pts) == expect


def test_idempotent_second_run(store):
    _, wm, policy, _ = store
    mtimes = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(ROOT, "**", "*.parquet"), recursive=True)}
    summary2 = apply_retention(ROOT, P, policy)
    for tier, s in summary2["tiers"].items():
        assert s["rows_dropped"] == 0 and s["parts_dropped"] == 0 and s["parts_trimmed"] == 0, tier
    for f, old in mtimes.items():
        assert os.path.getmtime(f) == old, f"retention re-run rewrote {f}"


def test_cutoff_is_watermark_derived(store):
    _, wm, _, summary = store
    assert summary["now_us"] == wm
    assert summary["tiers"]["1m"]["cutoff_us"] == wm - 6 * HOUR


def test_tighter_policy_advances(store):
    baseline, wm, _, _ = store
    tighter = RetentionPolicy({"1m": 3 * HOUR})
    s = apply_retention(ROOT, P, tighter)
    cutoff = s["tiers"]["1m"]["cutoff_us"]
    assert cutoff == wm - 3 * HOUR
    expect = baseline["1m"].filter(pa.array(baseline["1m"]["window_start"].to_numpy() >= cutoff))
    assert_tables_bitwise_equal(_surviving("1m"), expect, "1m tighter")


def test_trim_crash_windows_cannot_orphan_chunk_points(ray_session, tmp_path, monkeypatch):
    """Crash-resume hole (r4 review): the OLD order (tier rewrite → chunk
    trim) left a window where a kill after the rewrite made the resumed run
    take the metadata-only keep branch (lo >= cutoff) and never trim the
    chunks — permanently orphaning pre-cutoff chunk points. The fix trims
    chunks/sidecar FIRST; this test crashes a run exactly between (at the
    tier rewrite) and checks the resume converges to a consistent store."""
    import numpy as np
    import pytest

    import chronoxtract_ray.stages.retention as ret
    from chronoxtract_ray.pipelines.rollup_pipeline import PipelineConfig, run_rollup_pipeline, tier_table
    from chronoxtract_ray.sources.transcripts import transcripts_dataset
    from chronoxtract_ray.stages.gorilla_stage import decode_chunks
    from chronoxtract_ray.stages.retention import RetentionPolicy, apply_retention

    root = str(tmp_path / "store")
    run_rollup_pipeline(transcripts_dataset(20), root, PipelineConfig(num_parts=2))
    t = tier_table(root, "1h", columns=["window_start"])
    ws = np.sort(np.unique(t["window_start"].to_numpy()))
    assert ws.size >= 3
    cutoff = int(ws[ws.size // 2])  # mid-range: forces the trim path
    now_us = int(ws.max()) + 3_600_000_000
    keep_us = now_us - cutoff
    policy = RetentionPolicy({"1h": keep_us})

    orig_rewrite = ret._atomic_rewrite

    def boom(*a, **k):
        raise RuntimeError("simulated crash at the tier rewrite")

    monkeypatch.setattr(ret, "_atomic_rewrite", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_retention(root, 2, policy, now_us=now_us)
    monkeypatch.setattr(ret, "_atomic_rewrite", orig_rewrite)

    # mid-crash state: chunks of the crashed partition already trimmed, its
    # tier rows not yet — the resume must converge, not skip
    apply_retention(root, 2, policy, now_us=now_us)

    rows = tier_table(root, "1h", columns=["conv_id", "window_start", "mean"])
    pts = decode_chunks(tier_table(root + "/chunks", "1h"))
    # the invariant the old order broke: every surviving chunk point exists
    # as a tier row and nothing pre-cutoff survives anywhere
    assert pts.num_rows == rows.num_rows
    assert int(pts["window_start"].to_numpy().min()) >= cutoff
    assert int(rows["window_start"].to_numpy().min()) >= cutoff
