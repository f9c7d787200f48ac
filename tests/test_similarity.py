"""Similarity search: brute-force exactness, LSH/IVF recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, LongType, StructField,
                               StructType)

from fess_ds_s3_spark.operators import similarity

DIM = 16


@pytest.fixture()
def corpus(spark):
    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(200, DIM)).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(200)]
    schema = StructType([StructField("vec_id", LongType(), False),
                         StructField("embedding", ArrayType(FloatType()),
                                     False)])
    return spark.createDataFrame(rows, schema)


def _queries(corpus, n=5):
    return (corpus.filter(F.col("vec_id") < n)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec")))


def _numpy_topk(corpus_rows, k=10, n_queries=5):
    ids = np.array([r.vec_id for r in corpus_rows])
    mat = np.array([r.embedding for r in corpus_rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    expected = {}
    for qi in range(n_queries):
        q = mat[list(ids).index(qi)]
        sims = mat @ q
        order = sorted(
            ((round(s, 6), -i) for i, s in zip(ids, sims) if i != qi),
            reverse=True)
        expected[qi] = [int(-ni) for _, ni in order[:k]]
    return expected


class TestBruteForce:
    def test_matches_numpy(self, spark, corpus):
        rows = corpus.collect()
        expected = _numpy_topk(rows, k=10)
        got = similarity.brute_force_topk(
            _queries(corpus), corpus, k=10).collect()
        by_q = {}
        for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
            by_q.setdefault(r.query_id, []).append(r.vec_id)
        assert by_q == expected

    def test_deterministic_under_partitioning(self, spark, corpus):
        a = similarity.brute_force_topk(_queries(corpus), corpus, k=5)
        b = similarity.brute_force_topk(
            _queries(corpus.repartition(13)), corpus.repartition(13), k=5)
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect()))


class TestAnnLsh:
    def test_recall_vs_brute_force(self, spark, corpus):
        brute = similarity.brute_force_topk(_queries(corpus), corpus, k=5)
        ann = similarity.ann_lsh_topk(_queries(corpus), corpus, DIM, k=5,
                                      bits=6, tables=12)
        b = {(r.query_id, r.vec_id) for r in brute.collect()}
        a = {(r.query_id, r.vec_id) for r in ann.collect()}
        recall = len(a & b) / len(b)
        assert recall >= 0.6  # 12 tables × 6 bits on 16-dim gaussian data

    def test_candidates_subset_scored_exactly(self, spark, corpus):
        """ANN scores must equal brute-force scores for returned pairs."""
        brute = {(r.query_id, r.vec_id): r.cos
                 for r in similarity.brute_force_topk(
                     _queries(corpus), corpus, k=200).collect()}
        ann = similarity.ann_lsh_topk(_queries(corpus), corpus, DIM, k=5,
                                      bits=6, tables=12).collect()
        for r in ann:
            assert brute[(r.query_id, r.vec_id)] == pytest.approx(
                r.cos, abs=1e-6)


class TestIvf:
    def test_ivf_returns_k_and_reasonable_recall(self, spark, corpus):
        cents = similarity.train_centroids(corpus, 8, iters=2)
        assert cents.count() == 8
        brute = similarity.brute_force_topk(_queries(corpus), corpus, k=5)
        ivf = similarity.ivf_topk(_queries(corpus), corpus, cents, k=5,
                                  nprobe=4)
        b = {(r.query_id, r.vec_id) for r in brute.collect()}
        a = {(r.query_id, r.vec_id) for r in ivf.collect()}
        assert len(a & b) / len(b) >= 0.5
        per_q = ivf.groupBy("query_id").count().collect()
        assert all(r["count"] == 5 for r in per_q)


class TestQuantized:
    def test_codes_bounded_and_extreme_maps_to_127(self, spark, corpus):
        qz = similarity.quantize_embeddings(corpus).collect()
        for r in qz:
            assert max(abs(c) for c in r.codes) == 127
            assert all(-127 <= c <= 127 for c in r.codes)

    def test_reconstruction_error_bound(self, spark, corpus):
        qz = {r.vec_id: r for r in
              similarity.quantize_embeddings(corpus).collect()}
        for r in corpus.collect():
            q = qz[r.vec_id]
            step = q.q_scale / 127.0
            for v, c in zip(r.embedding, q.codes):
                assert abs(v - c * step) <= step / 2 + 1e-9

    def test_zero_vector(self, spark):
        df = spark.createDataFrame(
            [(0, [0.0] * DIM), (1, [1.0] + [0.0] * (DIM - 1))],
            "vec_id long, embedding array<float>")
        qz = {r.vec_id: r for r in
              similarity.quantize_embeddings(df).collect()}
        assert qz[0].q_scale == 0.0 and set(qz[0].codes) == {0}
        assert qz[1].codes[0] == 127
        # zero vector scores 0.0 (explicit branch, no NaN)
        q = df.select(F.col("vec_id").alias("query_id"),
                      F.col("embedding").alias("query_vec"))
        out = similarity.quantized_topk(q, df, k=2).collect()
        assert all(r.qcos == 0.0 for r in out if 0 in (r.query_id,
                                                       r.vec_id))

    def test_recall_vs_brute_force(self, spark, corpus):
        k = 10
        bf = similarity.brute_force_topk(_queries(corpus), corpus,
                                         k=k).collect()
        qt = similarity.quantized_topk(_queries(corpus), corpus,
                                       k=k).collect()
        exact = {(r.query_id, r.vec_id) for r in bf}
        quant = {(r.query_id, r.vec_id) for r in qt}
        recall = len(exact & quant) / len(exact)
        assert recall >= 0.85, recall

    def test_deterministic_under_repartition(self, spark, corpus):
        a = sorted((r.query_id, r.vec_id, r.rank, r.qdot, r.qcos)
                   for r in similarity.quantized_topk(
                       _queries(corpus), corpus, k=5).collect())
        b = sorted((r.query_id, r.vec_id, r.rank, r.qdot, r.qcos)
                   for r in similarity.quantized_topk(
                       _queries(corpus.repartition(11)),
                       corpus.repartition(13), k=5).collect())
        assert a == b

    def test_quantize_is_pure_projection(self, spark, corpus):
        plan = similarity.quantize_embeddings(corpus) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestPrunedTopkEquivalence:
    """The r6 numpy-pruned top-k paths must be bit-identical to the
    all-pairs reference plans (prune=False) — including score ties broken
    by vec_id, zero vectors, and arbitrary partitioning."""

    def test_quantized_prune_equals_allpairs(self, spark, corpus):
        a = sorted(map(tuple, similarity.quantized_topk(
            _queries(corpus), corpus, k=7, prune=True).collect()))
        b = sorted(map(tuple, similarity.quantized_topk(
            _queries(corpus), corpus, k=7, prune=False).collect()))
        assert a == b

    def test_brute_prune_equals_allpairs(self, spark, corpus):
        a = sorted(map(tuple, similarity.brute_force_topk(
            _queries(corpus), corpus, k=7, prune=True).collect()))
        b = sorted(map(tuple, similarity.brute_force_topk(
            _queries(corpus), corpus, k=7, prune=False).collect()))
        assert a == b

    def test_ties_and_zero_vectors(self, spark, corpus):
        # clones create exact score ties (broken by vec_id) straddling the
        # k boundary; a zero vector exercises quantized's explicit 0-score
        # branch (brute force's cosine divides by zero for zero vectors in
        # BOTH paths under ANSI mode — equally unsupported, so ties only)
        clones = corpus.select((F.col("vec_id") + 1000).alias("vec_id"),
                               "embedding")
        zero = spark.createDataFrame([(5000, [0.0] * DIM)],
                                     "vec_id long, embedding array<float>")
        tied = corpus.unionByName(clones).repartition(9)
        a = sorted(map(tuple, similarity.brute_force_topk(
            _queries(corpus), tied, k=5, prune=True).collect()))
        b = sorted(map(tuple, similarity.brute_force_topk(
            _queries(corpus), tied, k=5, prune=False).collect()))
        assert a == b
        tied_z = tied.unionByName(zero).repartition(7)
        a = sorted(map(tuple, similarity.quantized_topk(
            _queries(corpus), tied_z, k=5, prune=True).collect()))
        b = sorted(map(tuple, similarity.quantized_topk(
            _queries(corpus), tied_z, k=5, prune=False).collect()))
        assert a == b

    def test_empty_and_null_query_side_falls_back(self, spark, corpus):
        empty = _queries(corpus).filter(F.col("query_id") < 0)
        assert similarity.quantized_topk(empty, corpus, k=3).count() == 0
        assert similarity.brute_force_topk(empty, corpus, k=3).count() == 0
