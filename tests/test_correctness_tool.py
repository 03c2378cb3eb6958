"""The local sweep must catch the representation classes the driver's value
hash distinguishes (CORRECTNESS_r03: -0.0 vs +0.0, int64 vs float64) —
np.array_equal passed both red rows for two rounds."""

import importlib.util
import os

import numpy as np
import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "cc_tool", os.path.join(os.path.dirname(__file__), "..", "tools", "correctness_check.py")
)
cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cc)


def test_negative_zero_is_a_mismatch():
    ok, detail = cc.col_equal(pd.Series([0.0, 1.5]), pd.Series([-0.0, 1.5]))
    assert not ok and "row 0" in detail


def test_int_vs_float_dtype_is_a_mismatch():
    ok, detail = cc.col_equal(pd.Series([32], dtype="int64"), pd.Series([32.0]))
    assert not ok and "dtype" in detail


def test_int_width_is_a_mismatch():
    ok, detail = cc.col_equal(
        pd.Series([1], dtype="int32"), pd.Series([1], dtype="int64")
    )
    assert not ok and "dtype" in detail


def test_nan_payloads_canonicalized_equal():
    a = np.array([1.0, np.nan])
    b = a.copy()
    # different NaN payload, same semantic value
    b.view(np.uint64)[1] = np.uint64(0x7FF8000000000001)
    assert np.isnan(b[1])
    ok, _ = cc.col_equal(pd.Series(a), pd.Series(b))
    assert ok


def test_inf_and_exact_floats_equal():
    a = pd.Series([np.inf, -np.inf, 0.3])
    assert cc.col_equal(a, a.copy())[0]


def test_object_type_mismatch():
    ok, detail = cc.col_equal(pd.Series(["1"], dtype=object), pd.Series([1], dtype=object))
    assert not ok
