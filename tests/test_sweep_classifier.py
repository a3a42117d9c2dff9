"""The sweep tool's mismatch auto-classifier (tools/sweep_sf.py):
float-boundary (order-dependent double summation at ROUND precision)
must be told apart from REAL mismatches, conservatively — anything
not provably a 1-ULP float wobble reports 'real'."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from sweep_sf import _cell_close, classify_mismatch  # noqa: E402


def test_one_ulp_at_round_precision_is_float_boundary():
    # the q9_product_profit signature: ROUND(sum, 2) off by 0.01 on a
    # handful of rows, keys identical
    s = pd.DataFrame(
        {"nation": ["A", "B", "C"], "profit": [10.01, 20.02, 30.03]}
    )
    d = pd.DataFrame(
        {"nation": ["A", "B", "C"], "profit": [10.01, 20.03, 30.03]}
    )
    assert classify_mismatch(s, d) == "float-boundary"


def test_round6_wobble_is_float_boundary():
    # the hourly_rollup_hypertable signature: ROUND(avg, 6) +-1e-6
    s = pd.DataFrame({"h": [1, 2], "avg_v": [0.123456, 0.999999]})
    d = pd.DataFrame({"h": [1, 2], "avg_v": [0.123457, 0.999999]})
    assert classify_mismatch(s, d) == "float-boundary"


def test_larger_float_delta_is_real():
    s = pd.DataFrame({"k": [1], "v": [10.00]})
    d = pd.DataFrame({"k": [1], "v": [10.05]})
    assert classify_mismatch(s, d) == "real"


def test_integer_or_key_diff_is_real():
    s = pd.DataFrame({"k": [1, 2], "n": [10, 20]})
    d = pd.DataFrame({"k": [1, 3], "n": [10, 20]})
    assert classify_mismatch(s, d) == "real"
    s2 = pd.DataFrame({"k": ["A"], "v": [1.01]})
    d2 = pd.DataFrame({"k": ["B"], "v": [1.01]})
    assert classify_mismatch(s2, d2) == "real"


def test_row_count_diff_is_real():
    s = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    d = pd.DataFrame({"k": [1], "v": [1.0]})
    assert classify_mismatch(s, d) == "real"


def test_boundary_flipped_row_order_still_aligns():
    # rows arrive in different orders; alignment is by non-float key
    s = pd.DataFrame({"k": ["x", "y"], "v": [5.01, 7.02]})
    d = pd.DataFrame({"k": ["y", "x"], "v": [7.03, 5.01]})
    assert classify_mismatch(s, d) == "float-boundary"


def test_cell_close_scientific_falls_back_to_relative():
    assert _cell_close("1e+20", "1.0000000000000001e+20")
    assert not _cell_close("1e+20", "1.01e+20")
    assert not _cell_close("abc", "abd")
