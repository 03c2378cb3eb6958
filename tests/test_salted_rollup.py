"""The salted (conv, bucket)-keyed rollup stage — the extreme-skew variant —
must produce exactly the same tier rows as the partition-aligned pipeline
path."""

from __future__ import annotations

import numpy as np
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
