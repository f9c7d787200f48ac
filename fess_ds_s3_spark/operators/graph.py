"""Host-graph authority scoring for crawl prioritization.

A web-scale crawler orders its frontier by more than politeness: hosts
that many other hosts link to should be crawled earlier (OPIC / PageRank
-style frontier scheduling, Abiteboul et al. WWW'03; Page et al. 1999).
This module computes a PageRank-shaped authority score over the host
link graph with **fixed-point integer arithmetic** so the result is
bit-exact and reproducible: floating-point PageRank depends on summation
order, which differs run-to-run under Spark's partial aggregation — a
crawl admission order must not. All math is 64-bit integer (`div`,
`sum`, `*`), so the scores are oracle-checkable and identical at any
parallelism.

Semantics (per iteration, damping d = num/den, scale S):

    contrib(u→v) = rank(u) div out_degree(u)
    rank'(v)     = (S div den)·(den−num) + (num · Σ contrib) div den

i.e. standard PageRank with truncating division instead of real
division. Dangling hosts (no out-links) keep receiving the base term;
their mass is dropped, not redistributed — documented divergence from
the textbook formulation, standard in crawl schedulers where relative
order is what matters.

Scale notes (10^9 hosts, 10^11 edges):
- per iteration: one equi-join of ranks to edges on ``src`` + one
  groupBy ``dst`` — both map-side-combinable; AQE handles hub skew.
- the edge set (with out-degrees) is computed once and persisted;
  iterations reuse it. The rank frame stays (host, rank) — narrow.
- iterations build ONE lazy plan (no per-iteration action); for large
  ``iterations`` pass ``materialize_every`` to persist intermediate
  ranks and keep plan depth bounded.
- overflow bound: ``num · n_hosts · scale < 2^63`` (total mass never
  exceeds n·S and only ever shrinks). The constructor enforces it when
  ``n_hosts`` is supplied; pick scale = 10^12 up to ~10^6 hosts,
  10^9 above.

Reference scope: no analog in fess-ds-s3 (north-rule addition).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["host_authority", "authority_priority", "link_host_edges"]


def link_host_edges(pages: DataFrame, *, url_col: str = "url",
                    html_col: str = "contents",
                    resolve: bool = True) -> DataFrame:
    """Harvest the host link graph from fetched pages — the input
    :func:`host_authority` consumes, closing the crawl loop (fetch →
    links → authority → next round's admission priority). One explode
    (the edge set's own cardinality) + a distinct; self-links kept.
    Returns distinct ``(src, dst)``.

    ``resolve`` (default): relative hrefs resolve against the page URL
    (functions/urls.resolve_url) before host extraction, so root- and
    path-relative links contribute their (self-host) edges like a real
    crawler counts them; ``resolve=False`` drops every non-absolute
    href instead."""
    from fess_ds_s3_spark.functions.text import html_links, url_host
    from fess_ds_s3_spark.functions.urls import resolve_url
    exploded = pages.select(
        F.col(url_col).alias("_base"),
        url_host(F.col(url_col)).alias("src"),
        F.explode(html_links(F.col(html_col))).alias("_href"))
    target = (resolve_url(F.col("_base"), F.col("_href")) if resolve
              else F.col("_href"))
    return (exploded
            .select("src", url_host(target).alias("dst"))
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct())


def host_authority(edges: DataFrame, *, src: str = "src",
                   dst: str = "dst", iterations: int = 3,
                   damping: tuple[int, int] = (7, 8),
                   scale: int = 10 ** 12,
                   n_hosts: int | None = None,
                   materialize_every: int | None = None) -> DataFrame:
    """Fixed-point integer PageRank over a host link graph.

    ``edges``: (src, dst) host pairs — deduplicated internally;
    self-loops participate like any edge. Returns ``(host, rank)`` for
    every host appearing as src or dst, ``rank`` a BIGINT on the
    ``scale`` fixed-point grid (initial rank = scale).

    ``damping=(num, den)``: d = num/den. ``scale`` must be divisible by
    ``den`` so the base term (1−d)·S is exact.

    ``materialize_every``: persist the rank frame every K iterations
    (caps lazy-plan depth on long runs); None = one fully lazy plan.

    Cache lifetime: the internal edge/node frames (and any
    ``materialize_every`` rank frames) stay persisted after return —
    they must, since the returned plan references them lazily. They are
    evicted LRU with executor memory pressure; a caller that wants them
    gone immediately can ``spark.catalog.clearCache()`` after its action.
    """
    num, den = damping
    if not (0 < num < den):
        raise ValueError("damping must satisfy 0 < num < den")
    if scale % den != 0:
        raise ValueError(f"scale must be divisible by den={den}")
    if n_hosts is not None and num * n_hosts * scale >= 2 ** 63:
        raise ValueError(
            f"num*n_hosts*scale = {num * n_hosts * scale} overflows "
            "int64 — lower scale")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct())
    # both static frames are persisted — every iteration references
    # them, and without the cache each of the K plan layers re-derives
    # them from the raw edges. e is additionally pre-partitioned on the
    # join key, so the cached layout satisfies the per-iteration join's
    # distribution and only the (changing) rank side shuffles.
    nodes = (e.select(F.col("src").alias("host"))
             .unionByName(e.select(F.col("dst").alias("host")))
             .distinct().persist())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = e.join(deg, "src").repartition("src").persist()
    base = (scale // den) * (den - num)
    ranks = nodes.select("host", F.lit(scale).cast("long").alias("rank"))
    for it in range(iterations):
        contrib = (e.join(ranks, e["src"] == ranks["host"])
                   .select(F.col("dst").alias("host"),
                           F.expr("rank div deg").alias("c")))
        incoming = contrib.groupBy("host").agg(F.sum("c").alias("inc"))
        ranks = (nodes.join(incoming, "host", "left")
                 .select("host",
                         (F.lit(base)
                          + F.expr(f"({num} * coalesce(inc, 0L)) "
                                   f"div {den}"))
                         .cast("long").alias("rank")))
        if materialize_every and (it + 1) % materialize_every == 0:
            ranks = ranks.persist()
    return ranks


def authority_priority(frontier: DataFrame, ranks: DataFrame, *,
                       host_col: str = "host",
                       out_col: str = "priority") -> DataFrame:
    """Feed authority into the politeness ranking: the canonical crawl
    order is ``(priority ASC, ...)`` (operators/politeness.py), so
    higher-authority hosts get MORE NEGATIVE priority and admit first.
    The rank (fixed-point scale ~10^12) is bucketed by a 2^20 shift so
    the value fits the frontier's INT priority column (ANSI cast-safe);
    near-equal ranks tie and fall back to the (discovery_time, url)
    order. Hosts absent from the link graph get priority 0 (rank 0):
    crawled after every ranked host. The ranks side is one row per host
    — small next to the frontier; left to the optimizer/AQE to
    broadcast (it rides the normal auto-broadcast threshold, same as
    host budgets)."""
    r = ranks.select(F.col("host").alias(host_col),
                     F.col("rank").alias("_auth_rank"))
    bucket = F.shiftright(F.coalesce(F.col("_auth_rank"), F.lit(0)), 20)
    # rank is bounded by ~n_hosts*scale, so a hub host fed by >~2000
    # hosts at the default scale 10^12 pushes rank past 2^51 and the
    # bucket past INT_MAX — clamp so the ANSI int cast can never fail
    # the round (mega-hubs tie at the front of the queue, which is the
    # intended order anyway)
    bucket = F.least(bucket, F.lit(2 ** 31 - 1).cast("long"))
    return (frontier.join(r, host_col, "left")
            .withColumn(out_col, (-bucket).cast("int"))
            .drop("_auth_rank"))


def anchor_texts(pages: DataFrame, *, url_col: str = "url",
                 html_col: str = "contents",
                 resolve: bool = True) -> DataFrame:
    """Anchor-text index from fetched pages: ``(dst_url, anchor,
    n_refs)`` — how the web describes each target URL, aggregated over
    every ``<a>`` element that points at it.  A search/training corpus
    built from a 100 TB crawl attaches this as off-page evidence per
    document (anchor text is the classic relevance signal the
    reference's per-object indexer handoff cannot see).

    ``resolve`` (default) resolves relative hrefs against the page URL
    (functions/urls.resolve_url) so root-/path-relative links index
    their absolute target; non-http(s) targets (mailto:, javascript:,
    unresolvable) are dropped via the ``url_host`` gate, mirroring
    :func:`link_host_edges`.  Empty anchors (image links, whitespace
    bodies) are kept as ``''`` — callers filter if unwanted.

    Scale shape: one explode (the anchor set's own cardinality — the
    harvest regex is a JVM projection), one map-side-combinable
    groupBy on (dst_url, anchor).  No driver actions, no UDF.
    """
    from fess_ds_s3_spark.functions.text import html_anchor_pairs, url_host
    from fess_ds_s3_spark.functions.urls import resolve_url
    exploded = pages.select(
        F.col(url_col).alias("_base"),
        F.explode(html_anchor_pairs(F.col(html_col))).alias("_a"))
    target = (resolve_url(F.col("_base"), F.col("_a.href")) if resolve
              else F.col("_a.href"))
    return (exploded
            .select(target.alias("dst_url"),
                    F.col("_a.anchor").alias("anchor"))
            .filter(url_host(F.col("dst_url")).isNotNull())
            .groupBy("dst_url", "anchor")
            .agg(F.count(F.lit(1)).alias("n_refs")))
