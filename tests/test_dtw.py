"""Banded-DTW operator: hand-computed cases + invariants, and the
q_dtw_similarity inventory entry's contract (rows-only entry — this
file is its correctness evidence, per the SURVEY §2 rows-only tag)."""

from __future__ import annotations

import math

import pytest

from redmap_spark.operators.dtw import dtw_distance, dtw_pairs


def test_identical_series_zero():
    a = [0.0, 1.0, 2.0, 1.0, 0.0]
    assert dtw_distance(a, a, band=2) == 0.0


def test_hand_computed_small_case():
    # cost matrix for a=[0,1,2], b=[0,2]:
    #   |0-0|=0  |0-2|=2          D = 0 2
    #   |1-0|=1  |1-2|=1              1 1
    #   |2-0|=2  |2-2|=0              3 1
    # optimal path 0 -> 1 -> 0 (diag, then match 2 with 2) = 1
    assert dtw_distance([0.0, 1.0, 2.0], [0.0, 2.0], band=3) == 1.0


def test_shifted_impulse_cheaper_than_euclidean():
    # an impulse shifted by one step: lockstep distance is 2, DTW
    # warps around it for 0
    a = [0.0, 1.0, 0.0, 0.0]
    b = [0.0, 0.0, 1.0, 0.0]
    assert dtw_distance(a, b, band=2) == 0.0


def test_symmetry_and_nonnegativity():
    a = [0.3, 1.7, -0.4, 2.2, 0.0]
    b = [1.1, -0.2, 0.8]
    d1 = dtw_distance(a, b, band=2)
    d2 = dtw_distance(b, a, band=2)
    assert d1 == pytest.approx(d2)
    assert d1 >= 0


def test_band_wider_never_increases_distance():
    a = [0.0, 2.0, 1.0, 3.0, 0.5, 1.5]
    b = [1.0, 0.0, 2.5, 1.0, 2.0, 0.0]
    d_narrow = dtw_distance(a, b, band=1)
    d_wide = dtw_distance(a, b, band=5)
    assert d_wide <= d_narrow


def test_empty_series_nan():
    assert math.isnan(dtw_distance([], [1.0], band=1))


def test_dtw_pairs_frame(spark):
    rows = []
    for i, v in enumerate([0.0, 1.0, 2.0]):
        rows.append(("a", i, v))
    for i, v in enumerate([0.0, 2.0]):
        rows.append(("b", i, v))
    for i, v in enumerate([0.0, 1.0, 2.0]):
        rows.append(("c", i, v))
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {
        (r.key_a, r.key_b): r
        for r in dtw_pairs(df, "k", "t", "v", band=3).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")].dtw == pytest.approx(1.0)
    assert out[("a", "c")].dtw == pytest.approx(0.0)  # identical series
    assert out[("a", "b")].n_a == 3 and out[("a", "b")].n_b == 2
    assert out[("a", "b")].dtw_per_step == pytest.approx(1.0 / 5)


def test_inventory_entry_shape(spark):
    from redmap_spark.inventory import QUERIES
    from tests.conftest import SF_DIR

    df = QUERIES["q_dtw_similarity"](spark, SF_DIR)
    rows = df.collect()
    # 5 event types -> 10 unordered pairs, keys ordered
    assert len(rows) == 10
    for r in rows:
        assert r.key_a < r.key_b
        assert r.dtw >= 0
        assert r.n_a > 0 and r.n_b > 0
