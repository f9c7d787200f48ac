"""As-of join (operators/asof.py). Oracle: pandas merge_asof."""

from __future__ import annotations

import pandas as pd
import pytest

from fess_ds_s3_spark.operators.asof import asof_join


def _spark_asof(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "k string, us long, lv long")
    right = spark.createDataFrame(right_rows, "k string, us long, rv long")
    got = asof_join(left, right, on="k", **kw).collect()
    return {(r.k, r.us): (r.rv_asof, r.us_asof) for r in got}


class TestAsofJoin:
    def test_basic_before_and_tie(self, spark):
        left = [("a", 100, 1), ("a", 200, 2), ("a", 50, 3)]
        right = [("a", 100, 10), ("a", 150, 15)]
        got = _spark_asof(spark, left, right)
        assert got == {
            ("a", 100): (10, 100),   # tie: at-or-before includes it
            ("a", 200): (15, 150),
            ("a", 50): (None, None),  # nothing precedes
        }

    def test_keys_do_not_leak(self, spark):
        left = [("a", 100, 1), ("b", 100, 2)]
        right = [("a", 90, 10)]
        got = _spark_asof(spark, left, right)
        assert got == {("a", 100): (10, 90), ("b", 100): (None, None)}

    def test_tolerance(self, spark):
        left = [("a", 1000, 1), ("a", 2000, 2)]
        right = [("a", 900, 9)]
        got = _spark_asof(spark, left, right, tolerance=150)
        assert got == {("a", 1000): (9, 900), ("a", 2000): (None, None)}

    def test_null_right_value_stays_atomic(self, spark):
        # the matched row's NULL value must come through as NULL, not be
        # replaced by an older row's non-null value
        left = spark.createDataFrame([("a", 300, 1)],
                                     "k string, us long, lv long")
        right = spark.createDataFrame([("a", 100, 10), ("a", 200, None)],
                                      "k string, us long, rv long")
        r = asof_join(left, right, on="k").first()
        assert r.rv_asof is None and r.us_asof == 200

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_pandas_merge_asof(self, spark, seed):
        import random
        rng = random.Random(seed)
        keys = ["a", "b", "c"]
        left = sorted({(rng.choice(keys), rng.randrange(0, 5000))
                       for _ in range(120)})
        right = sorted({(rng.choice(keys), rng.randrange(0, 5000))
                        for _ in range(60)})
        lrows = [(k, t, i) for i, (k, t) in enumerate(left)]
        rrows = [(k, t, 1000 + i) for i, (k, t) in enumerate(right)]
        got = _spark_asof(spark, lrows, rrows)
        ld = pd.DataFrame(lrows, columns=["k", "us", "lv"]) \
            .sort_values("us", kind="stable")
        rd = pd.DataFrame(rrows, columns=["k", "us", "rv"]) \
            .sort_values("us", kind="stable")
        ref = pd.merge_asof(ld, rd, on="us", by="k",
                            direction="backward")
        for row in ref.itertuples(index=False):
            want = None if pd.isna(row.rv) else int(row.rv)
            assert got[(row.k, row.us)][0] == want


class TestAsofSalted:
    """time_slices > 1: the range-partitioned skew path must be
    bit-identical to the unsalted window (VERDICT r4 ask #3)."""

    def test_validation(self, spark):
        left = spark.createDataFrame([("a", 1, 1)],
                                     "k string, us long, lv long")
        with pytest.raises(ValueError, match="time_slices"):
            asof_join(left, left, on="k", time_slices=0)

    @pytest.mark.parametrize("slices", [2, 7, 64])
    def test_whale_key_bit_identical(self, spark, slices):
        # 1 key carries 90% of rows — the documented whale shape
        import random
        rng = random.Random(42)
        lrows, rrows = [], []
        for i in range(540):
            lrows.append(("whale", rng.randrange(0, 10_000), i))
        for i in range(60):
            k = rng.choice(["m1", "m2", "m3"])
            lrows.append((k, rng.randrange(0, 10_000), 1000 + i))
        for i in range(200):
            rrows.append(("whale", rng.randrange(0, 10_000), 5000 + i))
        for i in range(30):
            rrows.append((rng.choice(["m1", "m2", "m3"]),
                          rng.randrange(0, 10_000), 6000 + i))
        plain = _spark_asof(spark, lrows, rrows)
        salted = _spark_asof(spark, lrows, rrows, time_slices=slices)
        assert salted == plain

    def test_empty_slices_cascade_seed(self, spark):
        # all right rows in the first tenth of the time axis: later
        # slices have NO right rows and must inherit the cascaded seed
        lrows = [("a", t, t) for t in range(0, 10_000, 500)]
        rrows = [("a", 10, 1), ("a", 20, 2)]
        plain = _spark_asof(spark, lrows, rrows)
        salted = _spark_asof(spark, lrows, rrows, time_slices=16)
        assert salted == plain
        assert salted[("a", 9500)] == (2, 20)

    def test_tolerance_and_ties_match(self, spark):
        lrows = [("a", 100, 1), ("a", 200, 2), ("a", 5000, 3)]
        rrows = [("a", 100, 10), ("a", 100, 11), ("a", 150, 15)]
        for kw in ({}, {"tolerance": 150}):
            plain = _spark_asof(spark, lrows, rrows, **kw)
            salted = _spark_asof(spark, lrows, rrows,
                                 time_slices=8, **kw)
            assert salted == plain

    def test_window_partitions_by_slice(self, spark):
        # the salted plan's big window must hash-partition on
        # (key, slice), not key alone — that IS the skew fix
        left = spark.createDataFrame([("a", i, i) for i in range(50)],
                                     "k string, us long, lv long")
        right = spark.createDataFrame([("a", 5, 9)],
                                      "k string, us long, rv long")
        plan = asof_join(left, right, on="k",
                         time_slices=4)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "_slice" in plan
        import re
        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        assert any("k" in p and "_slice" in p for p in parts)
