"""Deterministic hash sampling (functions/sampling.py) and per-group caps
(operators/caps.py), plus their integration into the curation funnel."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from fess_ds_s3_spark.functions.sampling import (hash_sample,
                                                 sample_threshold_hex)
from fess_ds_s3_spark.operators.caps import top_n_per_group
from fess_ds_s3_spark.plans.curate import curate_corpus


def _py_sample(key: str, num: int, den: int, seed: str = "") -> bool:
    """Reference implementation: same rule, plain hashlib."""
    h = hashlib.md5((key + seed).encode()).hexdigest()[:8]
    return h < sample_threshold_hex(num, den)


class TestHashSample:
    def test_threshold_hex(self):
        assert sample_threshold_hex(0, 1) == "00000000"
        assert sample_threshold_hex(1, 2) == "80000000"
        assert sample_threshold_hex(3, 4) == "c0000000"
        assert sample_threshold_hex(1, 16) == "10000000"
        with pytest.raises(ValueError):
            sample_threshold_hex(-1, 4)
        with pytest.raises(ValueError):
            sample_threshold_hex(5, 4)
        with pytest.raises(ValueError):
            sample_threshold_hex(1, 0)

    def test_matches_reference_hash(self, spark):
        df = spark.range(500).select(F.col("id").cast("long").alias("k"))
        kept = {r.k for r in
                df.filter(hash_sample("k", 1, 3, seed="s")).collect()}
        expect = {i for i in range(500) if _py_sample(str(i), 1, 3, "s")}
        assert kept == expect

    def test_rate_and_boundaries(self, spark):
        df = spark.range(4000).withColumnRenamed("id", "k")
        n_half = df.filter(hash_sample("k", 1, 2)).count()
        assert abs(n_half / 4000 - 0.5) < 0.05
        assert df.filter(hash_sample("k", 0, 7)).count() == 0
        assert df.filter(hash_sample("k", 7, 7)).count() == 4000

    def test_partition_invariant_and_complement(self, spark):
        df = spark.range(1000).withColumnRenamed("id", "k")
        a = {r.k for r in df.filter(hash_sample("k", 2, 5)).collect()}
        b = {r.k for r in df.repartition(13)
             .filter(hash_sample("k", 2, 5)).collect()}
        assert a == b
        rest = {r.k for r in df.filter(~hash_sample("k", 2, 5)).collect()}
        assert a | rest == set(range(1000)) and not (a & rest)

    def test_seed_draws_independent_sample(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "k")
        s1 = {r.k for r in df.filter(hash_sample("k", 1, 2, "a")).collect()}
        s2 = {r.k for r in df.filter(hash_sample("k", 1, 2, "b")).collect()}
        assert s1 != s2
        # independent halves overlap in ~ a quarter of the space
        assert 0.15 < len(s1 & s2) / 2000 < 0.35

    def test_null_keys_never_kept(self, spark):
        df = spark.createDataFrame([(None,), ("x",)], "k string")
        assert df.filter(hash_sample("k", 1, 1)).count() == 1
        kept = df.filter(hash_sample("k", 1, 2)).count()
        assert kept <= 1  # the NULL row can never pass


@pytest.fixture(scope="module")
def skewed(spark):
    # group g0 holds 600 rows (the hot domain), g1..g9 hold 5 each
    rows = [(f"g{0 if i < 600 else 1 + (i - 600) % 9}", i, i % 37)
            for i in range(645)]
    return spark.createDataFrame(rows, "g string, id long, v long")


class TestTopNPerGroup:
    def test_exact_top_n(self, spark, skewed):
        out = top_n_per_group(skewed, ["g"], 3,
                              [F.col("v").asc(), F.col("id").asc()])
        got = {(r.g, r.id) for r in out.collect()}
        rows = sorted(skewed.collect(), key=lambda r: (r.v, r.id))
        expect, seen = set(), {}
        for r in rows:
            if seen.get(r.g, 0) < 3:
                expect.add((r.g, r.id))
                seen[r.g] = seen.get(r.g, 0) + 1
        assert got == expect

    def test_salted_equals_unsalted(self, spark, skewed):
        order = [F.col("v").desc(), F.col("id").asc()]
        plain = top_n_per_group(skewed, ["g"], 4, order)
        salted = top_n_per_group(skewed, ["g"], 4, order, salt_buckets=7)
        assert (sorted(map(tuple, plain.collect()))
                == sorted(map(tuple, salted.collect())))

    def test_rank_col_and_validation(self, spark, skewed):
        out = top_n_per_group(skewed, ["g"], 2,
                              [F.col("id").asc()], rank_col="rk",
                              salt_buckets=4)
        by_group = {}
        for r in out.collect():
            by_group.setdefault(r.g, []).append((r.rk, r.id))
        for g, pairs in by_group.items():
            assert sorted(rk for rk, _ in pairs) == list(
                range(1, len(pairs) + 1))
        with pytest.raises(ValueError):
            top_n_per_group(skewed, ["g"], 0, [F.col("id")])

    def test_plan_shape(self, spark, skewed):
        # "Window [" counts the exec window nodes; WindowGroupLimit (the
        # Spark >= 3.5 map-side partial top-n) must guard each of them —
        # losing that rewrite would un-bound the shuffle input per group
        plan = (top_n_per_group(skewed, ["g"], 2, [F.col("id").asc()],
                                salt_buckets=4)
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Window [") == 2, plan
        assert plan.count("WindowGroupLimit") == 4, plan  # partial+final ×2
        plain = (top_n_per_group(skewed, ["g"], 2, [F.col("id").asc()])
                 ._jdf.queryExecution().executedPlan().toString())
        assert plain.count("Window [") == 1, plain
        assert plain.count("WindowGroupLimit") == 2, plain


@pytest.fixture(scope="module")
def sourced_corpus(spark):
    en = ("the cat and the dog ran to the house of the old man and it "
          "was good for all of them to rest in the shade is what we say")
    rows = []
    for i in range(30):
        # distinct texts (varying tail), source A for 0-19, B for 20-29
        rows.append((i, en + f" tail {i} " + "pad " * (i % 5),
                     "srcA" if i < 20 else "srcB"))
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")


class TestCurateSampleCap:
    def test_cap_per_source(self, spark, sourced_corpus):
        out = curate_corpus(sourced_corpus, max_per_source=5,
                            cap_salt_buckets=3)
        rows = out.collect()
        per = {}
        for r in rows:
            per[r.source] = per.get(r.source, 0) + 1
        assert all(v <= 5 for v in per.values())
        assert per == {"srcA": 5, "srcB": 5}
        # longest docs win: pad count (i % 5 == 4) ranks first
        kept_a = sorted(r.doc_id for r in rows if r.source == "srcA")
        assert kept_a == [3, 4, 9, 14, 19]  # the 4 longest + id tiebreak
        assert "source" in out.columns

    def test_sample_stage_composes(self, spark, sourced_corpus):
        full = {r.doc_id for r in curate_corpus(sourced_corpus).collect()}
        samp = {r.doc_id for r in
                curate_corpus(sourced_corpus, sample=(1, 2),
                              sample_seed="t").collect()}
        expect = {i for i in full if _py_sample(str(i), 1, 2, "t")}
        assert samp == expect

    def test_uncapped_output_schema_unchanged(self, spark, sourced_corpus):
        out = curate_corpus(sourced_corpus)
        assert out.columns == ["fp", "doc_id", "lang_guess", "ws_tokens",
                               "stopword_ratio", "dup_count"]
