"""Token-budget sequence packing (operators/packing.py) and multi-way
hash splits (functions/sampling.hash_split)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from fess_ds_s3_spark.functions.sampling import (hash_split,
                                                 sample_threshold_hex)
from fess_ds_s3_spark.operators.packing import pack_sequences


def _py_pack(rows, budget, n_shards):
    """Reference: lay out (id, tokens) per shard=id%n_shards in id order;
    seq = cum_before // budget, offset = cum_before % budget."""
    out = {}
    per_shard = {}
    for i, tok in sorted(rows):
        s = i % n_shards
        cum = per_shard.get(s, 0)
        out[i] = (s, cum // budget, cum % budget)
        per_shard[s] = cum + tok
    return out


@pytest.fixture(scope="module")
def sized(spark):
    rows = [(i, (i * 37) % 190 + 10) for i in range(400)]  # 10..199 tokens
    return spark.createDataFrame(rows, "doc_id long, tokens long")


class TestPackSequences:
    def test_matches_reference(self, spark, sized):
        got = pack_sequences(sized, "tokens", budget=256,
                             shard=(F.col("doc_id") % 8))
        expect = _py_pack([(r.doc_id, r.tokens) for r in sized.collect()],
                          256, 8)
        for r in got.collect():
            assert (r.shard, r.seq_id, r.seq_offset) == expect[r.doc_id], \
                r.doc_id

    def test_partition_invariant(self, spark, sized):
        a = pack_sequences(sized, "tokens", budget=128, shards=4).collect()
        b = pack_sequences(sized.repartition(11), "tokens",
                           budget=128, shards=4).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_straddle_stays_in_starting_seq(self, spark):
        # budget 100: doc B starts at offset 90 and overshoots — it stays
        # in seq 0; doc C starts after it at cum 190 → seq 1
        df = spark.createDataFrame(
            [(1, 90), (2, 80), (3, 50)], "doc_id long, tokens long")
        rows = {r.doc_id: r for r in
                pack_sequences(df, "tokens", budget=100,
                               shard=F.lit(0)).collect()}
        assert (rows[1].seq_id, rows[1].seq_offset) == (0, 0)
        assert (rows[2].seq_id, rows[2].seq_offset) == (0, 90)
        assert (rows[3].seq_id, rows[3].seq_offset) == (1, 70)

    def test_default_shard_is_bounded_and_stable(self, spark, sized):
        out = pack_sequences(sized, "tokens", budget=256, shards=16)
        shards = {r.shard for r in out.collect()}
        assert shards <= set(range(16)) and len(shards) > 1

    def test_within_scopes_sequences(self, spark, sized):
        lbl = sized.withColumn(
            "split", F.when(F.col("doc_id") % 5 == 0, "eval")
            .otherwise("train"))
        out = pack_sequences(lbl, "tokens", budget=200,
                             shard=(F.col("doc_id") % 4),
                             within=["split"]).collect()
        # within each (split, shard), the layout matches the reference
        # fold over that subset ALONE — i.e. a split's sequences are
        # packed as if the other split did not exist (sequence identity
        # is (split, shard, seq_id); numbering restarts per split)
        expect = {}
        for split in ("train", "eval"):
            sub = [(r.doc_id, r.tokens) for r in out if r.split == split]
            for i, (s, q, o) in _py_pack(sub, 200, 4).items():
                expect[i] = (s, q, o)
        for r in out:
            assert (r.shard, r.seq_id, r.seq_offset) == expect[r.doc_id]

    def test_validation(self, spark, sized):
        with pytest.raises(ValueError):
            pack_sequences(sized, "tokens", budget=0)
        with pytest.raises(ValueError):
            pack_sequences(sized, "tokens", budget=10, shards=0)

    def test_single_shuffle_plan(self, spark, sized):
        plan = (pack_sequences(sized, "tokens", budget=256, shards=8)
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1, plan


def _py_split(key, weights, seed=""):
    h = hashlib.md5((key + seed).encode()).hexdigest()[:8]
    total = sum(weights.values())
    cum = 0
    labels = list(weights)
    for label in labels[:-1]:
        cum += weights[label]
        if h < sample_threshold_hex(cum, total):
            return label
    return labels[-1]


class TestHashSplit:
    def test_matches_reference_and_is_exhaustive(self, spark):
        df = spark.range(600).withColumnRenamed("id", "k")
        w = {"train": 8, "eval": 1, "test": 1}
        got = {r.k: r.lbl for r in
               df.select("k", hash_split("k", w, seed="s").alias("lbl"))
               .collect()}
        assert got == {i: _py_split(str(i), w, "s") for i in range(600)}
        # roughly proportional
        n_train = sum(1 for v in got.values() if v == "train")
        assert 0.7 < n_train / 600 < 0.9

    def test_single_label_and_null(self, spark):
        df = spark.createDataFrame([("a",), (None,)], "k string")
        out = {r.k: r.lbl for r in
               df.select("k", hash_split("k", {"all": 1}).alias("lbl"))
               .collect()}
        assert out == {"a": "all", None: None}

    def test_zero_weight_label_empty(self, spark):
        df = spark.range(300).withColumnRenamed("id", "k")
        lbls = {r.lbl for r in
                df.select(hash_split("k", {"a": 1, "b": 0, "c": 1})
                          .alias("lbl")).collect()}
        assert "b" not in lbls and lbls == {"a", "c"}

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            hash_split("k", {})
        with pytest.raises(ValueError):
            hash_split("k", {"a": -1, "b": 2})
        with pytest.raises(ValueError):
            hash_split("k", {"a": 0})
