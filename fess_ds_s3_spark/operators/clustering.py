"""Duplicate clustering: connected components over near-dup pair edges.

The dedup tiers (`operators/dedup.py`) emit verified near-duplicate PAIRS
(a < b). Production dedup needs one more step: group the pairs into
duplicate CLUSTERS (transitive closure) and keep one canonical document
per cluster. A greedy "drop every b-side" rule over-drops on chains —
A~B, B~C with A≁C drops both B and C even though dropping B alone
already breaks the A–C link; keep-one-per-component keeps A only, which
is the semantics every large-scale pipeline (URL dedup, SimHash/MinHash
corpus dedup) actually wants.

The component algorithm is alternating large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond",
ACM SoCC 2014) — O(log n) rounds regardless of component diameter,
each round two shuffles (a groupBy-min and a join back). Label
propagation, the naive alternative, needs O(diameter) rounds and a web
graph's duplicate chains can be long. Everything is integer column math
(min over node ids), so results are exactly oracle-checkable.

Scale notes (100 TB / 10^11 edges):
- each round is `groupBy(node).min` + an equi-join on the same key —
  map-side partial min applies, and AQE handles the (typical) heavy
  skew toward the component minimum in late rounds.
- per-round results are persisted and the previous round unpersisted,
  so lineage depth stays O(1) per round for recompute but the PLAN
  still grows one layer per round; on a real cluster pass
  ``checkpoint_dir`` (reliable checkpoint) every few rounds. In-sandbox
  the default ``localCheckpoint`` truncation is used instead and its
  executor-loss caveat documented on the parameter.
- convergence is detected from a (count, xor-of-hash) fingerprint of
  the edge set — one tiny aggregate per round, no driver-side edge
  materialization. The alternating-star fixpoint is exactly the
  star-forest (every node → its component min), so an unchanged edge
  set IS convergence; a 128-bit-ish fingerprint collision (~2^-64) is
  the only failure mode and would only DELAY detection by a round if
  the set were still moving.

Reference scope: the reference engine (fess-ds-s3) has no clustering —
this is a north-rule addition for the training-data pipeline tier.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["alternating_cc", "components", "keep_canonical"]


def _canon(edges: DataFrame) -> DataFrame:
    """Normalize to distinct undirected pairs stored as (u > v)."""
    return (edges
            .select(F.greatest("u", "v").alias("u"),
                    F.least("u", "v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _large_star(edges: DataFrame) -> DataFrame:
    """For every node u: connect each LARGER neighbor v to
    m = min(N(u) ∪ {u}). Emitted as (v, m) pairs."""
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (und.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", F.col("u")).alias("m")))
    return (und.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges (u > v); for every u connect each smaller neighbor —
    and u itself — to m = min of u's smaller neighbors."""
    directed = _canon(edges)
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    linked = (directed.join(mins, "u")
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .unionByName(
                  mins.select(F.col("u"), F.col("m").alias("v"))))
    return (linked.filter(F.col("u") != F.col("v")).distinct())


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-independent and overflow-free (the edge set is
    # distinct, so xor-cancellation of duplicates cannot occur)
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def alternating_cc(edges: DataFrame, *, max_rounds: int = 30,
                   checkpoint_dir: str | None = None,
                   checkpoint_every: int = 3) -> DataFrame:
    """Connected components of the undirected graph given as a pair
    DataFrame with columns ``(u, v)`` (any orientation, self-loops and
    duplicates tolerated). Returns ``(node, component)`` with one row per
    NON-SINGLETON node — component = min node id in its component; the
    component minimum maps to itself. Use :func:`components` to also
    carry edge-less nodes.

    ``max_rounds``: hard bound on alternating rounds; the algorithm
    needs O(log n). Exceeding it raises (no silent partial clustering).

    ``checkpoint_dir``: when set, ``spark.sparkContext.setCheckpointDir``
    must already point there and every ``checkpoint_every`` rounds the
    edge set is reliably checkpointed (survives executor loss). When
    None, the session's configured checkpoint dir
    (``sparkContext.setCheckpointDir`` / ``getCheckpointDir``) is used
    if one exists — an executor loss mid-CC on a cluster then recovers
    instead of failing the job. Only with NO checkpoint dir anywhere
    does it fall back to ``localCheckpoint`` — blocks live on executors
    without lineage, so an executor loss fails the job instead of
    recomputing; fine single-node.
    """
    cur = _canon(edges)
    if not cur.head(1):
        # preserve the caller's id type (string doc ids stay string) so
        # downstream joins/coalesce in components() never compare the
        # empty path's hardcoded long against the non-empty path's type
        return cur.select(F.col("u").alias("node"),
                          F.col("v").alias("component")).limit(0)
    reliable = checkpoint_dir is not None or (
        edges.sparkSession.sparkContext.getCheckpointDir() is not None)
    cur = cur.persist()
    prev_fp = _fingerprint(cur)
    prev_df = cur
    for rnd in range(max_rounds):
        nxt = _small_star(_large_star(prev_df))
        if (rnd + 1) % checkpoint_every == 0:
            nxt = (nxt.checkpoint(eager=False) if reliable
                   else nxt.localCheckpoint(eager=False))
        nxt = nxt.persist()
        fp = _fingerprint(nxt)
        prev_df.unpersist()
        if fp == prev_fp:
            prev_df = nxt
            break
        prev_df, prev_fp = nxt, fp
    else:
        prev_df.unpersist()
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} "
            "rounds — raise max_rounds (needs O(log n))")
    # fixpoint is a star forest oriented (u > v = component min);
    # add the roots' self-rows so every clustered node has one.
    stars = _canon(prev_df)
    out = (stars.select(F.col("u").alias("node"),
                        F.col("v").alias("component"))
           .unionByName(stars.select(F.col("v").alias("node"),
                                     F.col("v").alias("component"))
                        .distinct()))
    return out


def components(edges: DataFrame, nodes: DataFrame,
               id_col: str = "doc_id", *,
               a: str = "a", b: str = "b",
               max_rounds: int = 30,
               checkpoint_dir: str | None = None) -> DataFrame:
    """Component id for EVERY node in ``nodes`` — clustered nodes get the
    component minimum, edge-less nodes themselves. ``edges`` uses columns
    ``a``/``b`` (the dedup-pair shape); ``nodes`` needs ``id_col``.
    Returns ``(id_col, component)``."""
    cc = alternating_cc(
        edges.select(F.col(a).alias("u"), F.col(b).alias("v")),
        max_rounds=max_rounds, checkpoint_dir=checkpoint_dir)
    return (nodes.select(id_col).distinct()
            .join(cc.withColumnRenamed("node", id_col), id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("component", F.col(id_col))
                    .alias("component")))


def keep_canonical(df: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id", *,
                   a: str = "a", b: str = "b",
                   max_rounds: int = 30,
                   checkpoint_dir: str | None = None) -> DataFrame:
    """Cluster-aware near-dup drop: keep exactly one document per
    duplicate component — the minimum ``id_col`` (deterministic; swap in
    a quality ordering by pre-mapping ids if needed). Unlike the greedy
    b-side drop, chains keep exactly one survivor: A~B~C keeps A only,
    never zero, never two. Returns ``df`` filtered to canonical rows."""
    comp = components(pairs.select(a, b), df.select(id_col), id_col,
                      a=a, b=b, max_rounds=max_rounds,
                      checkpoint_dir=checkpoint_dir)
    keep = comp.filter(F.col(id_col) == F.col("component")).select(id_col)
    return df.join(keep, id_col, "left_semi")
