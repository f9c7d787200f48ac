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
