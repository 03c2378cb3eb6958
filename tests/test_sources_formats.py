"""Source-format parity: JSONL and CSV transcript readers normalize to the
exact table the parquet reader produces, and the full rollup pipeline yields
a bit-identical 1m tier regardless of the wire format the turns arrived in.

The reference has no I/O surface at all (SURVEY.md §2.1 — data arrives as
numpy arrays from the caller), so the format readers are engine-side design:
every reader streams block-by-block and normalizes with a vectorized Arrow
transform, never a Python row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import assert_tables_bitwise_equal

from chronoxtract_ray.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_table,
    normalize_transcripts,
    open_transcripts,
    read_transcripts_csv,
    read_transcripts_jsonl,
    write_transcripts_csv,
    write_transcripts_jsonl,
)


def _sorted(t: pa.Table) -> pa.Table:
    return t.combine_chunks().sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _collect(ds) -> pa.Table:
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


@pytest.fixture(scope="module")
def tiny() -> pa.Table:
    # 6 convs, ~4-11 turns each, no hot conv — enough to cover every column
    # shape (empty tool strings, holes, bursts) while keeping IO tiny
    return generate_table(6, base_turns=8, hot_every=0)


def test_jsonl_roundtrip_equals_parquet(ray_session, tmp_path, tiny):
    pq_dir, jl_dir = str(tmp_path / "pq"), str(tmp_path / "jl")
    (tmp_path / "pq").mkdir()
    pq.write_table(tiny, f"{pq_dir}/part-0.parquet")
    write_transcripts_jsonl(tiny, jl_dir)

    via_parquet = _sorted(_collect(open_transcripts(pq_dir)))
    via_jsonl = _sorted(_collect(read_transcripts_jsonl(jl_dir)))
    assert via_jsonl.schema.equals(TRANSCRIPT_SCHEMA)
    assert via_jsonl.equals(via_parquet.cast(TRANSCRIPT_SCHEMA))


def test_csv_roundtrip_equals_source(ray_session, tmp_path, tiny):
    cs_dir = str(tmp_path / "cs")
    write_transcripts_csv(tiny, cs_dir)
    via_csv = _sorted(_collect(read_transcripts_csv(cs_dir)))
    assert via_csv.schema.equals(TRANSCRIPT_SCHEMA)
    assert via_csv.equals(_sorted(tiny).cast(TRANSCRIPT_SCHEMA))


def test_normalize_aliases_defaults_and_errors():
    # ts_us int64 alias + missing role/tool columns -> defaults
    raw = pa.table({
        "conv_id": pa.array(["c"], pa.string()),
        "turn_idx": pa.array([0], pa.int64()),
        "ts_us": pa.array([1_704_067_200_000_000], pa.int64()),
        "text": pa.array([None], pa.string()),  # null -> ""
        "extra": pa.array([42], pa.int64()),  # dropped
    })
    out = normalize_transcripts(raw)
    assert out.schema.equals(TRANSCRIPT_SCHEMA)
    assert out.column("role").to_pylist() == [""]
    assert out.column("text").to_pylist() == [""]
    assert out.column("ts").cast(pa.int64()).to_pylist() == [1_704_067_200_000_000]
    # ISO string timestamps parse
    iso = raw.drop_columns(["ts_us"]).append_column(
        "timestamp", pa.array(["2024-01-01 00:00:00.000001"], pa.string()))
    assert normalize_transcripts(iso).column("ts").cast(pa.int64()).to_pylist() == [
        1_704_067_200_000_001]
    with pytest.raises(ValueError, match="missing required"):
        normalize_transcripts(raw.drop_columns(["conv_id"]))


def test_open_transcripts_sniffs_and_rejects(tmp_path):
    (tmp_path / "mixed").mkdir()
    (tmp_path / "mixed" / "a.csv").write_text("x\n1\n")
    (tmp_path / "mixed" / "b.jsonl").write_text('{"x": 1}\n')
    with pytest.raises(ValueError, match="cannot sniff"):
        open_transcripts(str(tmp_path / "mixed"))
    with pytest.raises(ValueError, match="unsupported"):
        open_transcripts(str(tmp_path / "mixed"), "xml")


def test_rollup_tier_parity_across_formats(ray_session, tmp_path, tiny):
    """The 1m tier is bit-identical whether turns arrived as parquet or JSONL."""
    from chronoxtract_ray.pipelines.rollup_pipeline import (
        PipelineConfig,
        run_rollup_pipeline,
        tier_table,
    )

    pq_dir = str(tmp_path / "pq")
    (tmp_path / "pq").mkdir()
    pq.write_table(tiny, f"{pq_dir}/part-0.parquet")
    jl_dir = str(tmp_path / "jl")
    write_transcripts_jsonl(tiny, jl_dir)

    cfg = PipelineConfig(num_parts=4, resume=False, with_gorilla=False)
    out_a, out_b = str(tmp_path / "out_pq"), str(tmp_path / "out_jl")
    run_rollup_pipeline(open_transcripts(pq_dir), out_a, cfg)
    run_rollup_pipeline(open_transcripts(jl_dir), out_b, cfg)
    ta = tier_table(out_a, "1m")
    assert ta.num_rows > 0
    assert_tables_bitwise_equal(ta, tier_table(out_b, "1m"), "1m tier")
