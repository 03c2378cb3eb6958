"""Shared test fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


def assert_tables_bitwise_equal(a, b, label=""):
    """Column-order + bit-level value equality (NaN == NaN iff same bits) —
    stricter than pa.Table.equals, which treats any NaN as unequal."""
    import numpy as np

    assert a.column_names == b.column_names, f"{label}: column sets differ"
    assert a.num_rows == b.num_rows, f"{label}: row counts {a.num_rows} != {b.num_rows}"
    for c in a.column_names:
        x = a[c].to_numpy(zero_copy_only=False)
        y = b[c].to_numpy(zero_copy_only=False)
        if x.dtype.kind == "f":
            x, y = x.view(np.uint64), y.view(np.uint64)
        if x.dtype.kind == "O":
            ok = all(p == q for p, q in zip(x, y))
        else:
            ok = bool(np.array_equal(x, y))
        assert ok, f"{label}: column {c} differs"
