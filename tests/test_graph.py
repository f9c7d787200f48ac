"""Fixed-point integer host authority (operators/graph.py).

Oracle: the same truncating-division iteration in plain Python dicts.
"""

from __future__ import annotations

import random

import pytest

from fess_ds_s3_spark.operators import graph


def _authority_py(edges, iterations=3, num=7, den=8, scale=10 ** 12):
    edges = sorted(set(edges))
    nodes = sorted({x for e in edges for x in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: scale for n in nodes}
    base = (scale // den) * (den - num)
    for _ in range(iterations):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += rank[s] // deg[s]
        rank = {n: base + (num * inc[n]) // den for n in nodes}
    return rank


def _authority_spark(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.host: r.rank
            for r in graph.host_authority(df, **kw).collect()}


class TestHostAuthority:
    def test_two_node_cycle(self, spark):
        edges = [("a", "b"), ("b", "a")]
        got = _authority_spark(spark, edges)
        assert got == _authority_py(edges)
        # symmetric graph → equal ranks
        assert got["a"] == got["b"]

    def test_hub_outranks_leaves(self, spark):
        # everyone links to h; h links back to one leaf
        edges = [(f"l{i}", "h") for i in range(5)] + [("h", "l0")]
        got = _authority_spark(spark, edges)
        assert got == _authority_py(edges)
        assert got["h"] > got["l0"] > got["l1"]

    def test_dangling_host_keeps_base_term(self, spark):
        # d has no out-links: receives, never contributes
        edges = [("a", "d"), ("b", "d")]
        got = _authority_spark(spark, edges)
        assert got == _authority_py(edges)
        # a, b receive nothing → pure base term each round
        assert got["a"] == got["b"] == (10 ** 12 // 8) * 1

    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_graph_matches_python(self, spark, seed):
        rng = random.Random(seed)
        hosts = [f"h{i}" for i in range(30)]
        edges = list({(rng.choice(hosts), rng.choice(hosts))
                      for _ in range(80)})
        assert _authority_spark(spark, edges, iterations=4) == \
            _authority_py(edges, iterations=4)

    def test_bit_exact_across_parallelism(self, spark):
        # the fixed-point claim: identical ranks regardless of partitioning
        rng = random.Random(7)
        hosts = [f"h{i}" for i in range(40)]
        edges = list({(rng.choice(hosts), rng.choice(hosts))
                      for _ in range(150)})
        df1 = spark.createDataFrame(edges, "src string, dst string") \
            .repartition(1)
        df16 = spark.createDataFrame(edges, "src string, dst string") \
            .repartition(16)
        r1 = {r.host: r.rank for r in graph.host_authority(df1).collect()}
        r16 = {r.host: r.rank for r in graph.host_authority(df16).collect()}
        assert r1 == r16

    def test_authority_priority_orders_admission(self, spark):
        # hub gets the most negative priority; unknown host trails at 0
        edges = [("a", "h"), ("b", "h"), ("h", "a")]
        ranks = graph.host_authority(
            spark.createDataFrame(edges, "src string, dst string"))
        frontier = spark.createDataFrame(
            [("h", "u1"), ("a", "u2"), ("zz", "u3")],
            "host string, url string")
        got = {r.host: r.priority
               for r in graph.authority_priority(frontier, ranks).collect()}
        assert got["h"] < got["a"] < got["zz"] == 0

    def test_authority_priority_mega_hub_clamps(self, spark):
        """ADVICE r4: a hub fed by >~2000 hosts at scale 10^12 pushes
        rank past 2^51 and shiftright(rank, 20) past INT_MAX — the ANSI
        int cast then failed the round. The bucket must clamp."""
        ranks = spark.createDataFrame(
            [("hub", 3_000 * 10 ** 12), ("tiny", 10 ** 12)],
            "host string, rank long")
        frontier = spark.createDataFrame(
            [("hub", "u1"), ("tiny", "u2")], "host string, url string")
        got = {r.host: r.priority
               for r in graph.authority_priority(frontier, ranks).collect()}
        assert got["hub"] == -(2 ** 31 - 1)
        assert got["hub"] < got["tiny"] < 0

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError, match="divisible"):
            graph.host_authority(df, scale=10 ** 12 + 1)
        with pytest.raises(ValueError, match="damping"):
            graph.host_authority(df, damping=(9, 8))
        with pytest.raises(ValueError, match="overflows"):
            graph.host_authority(df, n_hosts=10 ** 9, scale=10 ** 12)
