"""Gorilla codec roundtrip tests (bit-exact per FIXTURES.md §3)."""

from __future__ import annotations

import numpy as np
import pytest

from chronoxtract_ray.state import gorilla as g


@pytest.mark.parametrize(
    "values",
    [
        np.array([], dtype=np.float64),
        np.array([1.5]),
        np.array([1.5, 1.5, 1.5]),
        np.array([0.0, -0.0, np.inf, -np.inf, 1e300, -1e-300, 3.14159, np.nan]),
        np.random.default_rng(3).normal(50, 20, 1000).round(2),
        np.cumsum(np.random.default_rng(4).normal(0, 1, 5000)),
        np.repeat(7.25, 500),
        np.random.default_rng(5).uniform(-1e9, 1e9, 300),
    ],
    ids=["empty", "single", "constant", "specials", "rounded", "walk", "repeat", "uniform"],
)
def test_value_roundtrip_bit_exact(values):
    dec = g.decode_values(g.encode_values(values))
    assert dec.size == values.size
    if values.size:
        assert (dec.view(np.uint64) == values.view(np.uint64)).all()


@pytest.mark.parametrize(
    "ts",
    [
        np.array([], dtype=np.int64),
        np.array([1000], dtype=np.int64),
        np.array([0, 60_000_000], dtype=np.int64),
        np.arange(0, 60_000_000 * 1000, 60_000_000, dtype=np.int64),
        np.cumsum(np.random.default_rng(6).integers(1, 10_000_000, 2000)).astype(np.int64),
        np.array([0, 10, 5, 100, 2, 1_000_000_000_000], dtype=np.int64),  # non-monotonic + big jumps
    ],
    ids=["empty", "single", "pair", "regular", "random", "jumps"],
)
def test_timestamp_roundtrip_exact(ts):
    dec = g.decode_timestamps(g.encode_timestamps(ts))
    assert dec.size == ts.size
    if ts.size:
        assert (dec == ts).all()


def test_regular_timestamps_compress_hard():
    ts = np.arange(0, 60_000_000 * 2000, 60_000_000, dtype=np.int64)
    enc = g.encode_timestamps(ts)
    assert len(enc) < ts.nbytes / 20  # dod==0 → ~1 bit/point


def test_constant_values_compress_hard():
    v = np.repeat(3.75, 2000)
    enc = g.encode_values(v)
    assert len(enc) < v.nbytes / 20


def test_batch_encoders_byte_identical():
    rng = np.random.default_rng(17)
    sizes = [1, 2, 3] + list(rng.integers(4, 60, 60))
    vals, tss, starts, off = [], [], [], 0
    for s in sizes:
        starts.append(off)
        vals.append(rng.normal(50, 5, s).round(2))
        tss.append(int(rng.integers(0, 10**12)) + np.cumsum(rng.integers(1, 10**7, s)).astype(np.int64))
        off += s
    v, t, st = np.concatenate(vals), np.concatenate(tss), np.asarray(starts)
    assert g.encode_values_batch(v, st) == [g.encode_values(c) for c in vals]
    assert g.encode_timestamps_batch(t, st) == [g.encode_timestamps(c) for c in tss]
