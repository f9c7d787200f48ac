"""Similarity search over embedding columns (array<float>).

Two paths:

- **Brute-force cosine top-k** — exact baseline: a crossJoin of queries ×
  corpus with a JVM-side dot product (``F.zip_with`` + ``F.aggregate``),
  window top-k per query. Correct at any scale where |queries| × |corpus|
  pairs fit a shuffle; the oracle-checkable variant.
- **LSH-bucketed ANN (random hyperplanes)** — the scale path: sign-random-
  projection buckets (b bits per table, t tables); candidates = bucket
  collisions in any table; exact re-rank of candidates only. Recall tunes
  with (b, t); cost drops from |Q|×|C| to sum of bucket sizes.
- **IVF (k-means-lite)** — coarse quantizer via deterministic seeded
  centroid init + a few Lloyd iterations (all DataFrame ops), probe the
  ``nprobe`` nearest centroids per query.

All vector math stays in the JVM (higher-order functions) or numpy inside
Arrow batches — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

#: candidate-pruning slack around the 6-dp rounded score (see
#: ``_topk_prune_margin`` proof in :func:`quantized_topk`): twice the
#: half-up rounding radius (5e-7 each side) plus generous room for the
#: one-ulp-level representation error of the comparison values. Any pair
#: whose unrounded score trails the k-th best by more than this margin
#: cannot outrank it after rounding.
_ROUND6_MARGIN = 2.5e-6


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<float|double> columns (float64 acc)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------------------
# numpy candidate pruning for the exact top-k baselines (optimization r6)
# ---------------------------------------------------------------------------
# The all-pairs top-k queries spend their time evaluating one interpreted
# ``aggregate(zip_with(...))`` fold per (query, corpus) pair under a
# BroadcastNestedLoopJoin (guide §4.2: JVM row-at-a-time bulk math is
# slow; §8: decide with a lightweight proxy, attach the decision back).
# The rewrite below computes all pairwise scores as ONE numpy matmul per
# Arrow batch inside ``mapInArrow`` and emits, per query, only the rows
# that can still reach the rounded top-k — a provable superset:
#
#   Containment proof. Let y be the unrounded score used for pruning and
#   x the engine's unrounded score, with |y - x| <= e (bit-equal for the
#   quantized path, <= ~3e-14 for float cosine; see the callers). The
#   final ordering is by round(x, 6) desc, id asc, and half-up rounding
#   moves a value by <= 5e-7 (+ ulp). Within any subset of rows (batch /
#   chunk — containment composes over any partitioning of the corpus),
#   let t be the k-th largest y. If a pair p is dropped, i.e.
#   y_p < t - M with margin M = 2.5e-6, then for each of the >= k pairs q
#   with y_q >= t:
#     round(x_q) - round(x_p) >= (y_q - y_p) - 2e - 2*(5e-7 + ulp) > 0,
#   so at least k pairs outrank p strictly and p cannot be in the global
#   top-k. Conversely every element ranked above a top-k member is itself
#   in the top-(k-1), hence kept, so row_number() over the pruned set
#   assigns identical ranks. Ties at the threshold are kept (>= t - M
#   keeps them all), and the final score/rank math runs through the SAME
#   Spark expressions as the unpruned plan — output is identical.


def _list_matrix(arr: pa.Array) -> np.ndarray:
    """(n, dim) float64 matrix from an arrow ``list<float|double>`` column.

    Zero-copy flatten + reshape for the uniform-dim case (embedding
    columns are fixed-width in practice). Nulls/ragged rows are outside
    the pruned path's contract — callers fall back to the all-pairs plan.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("null embeddings: use prune=False")
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if len(widths) == 0:
        return np.empty((0, 0), dtype=np.float64)
    if not (widths == widths[0]).all():
        raise ValueError("ragged embeddings: use prune=False")
    values = arr.flatten().to_numpy(zero_copy_only=False)
    return values.astype(np.float64).reshape(len(widths), int(widths[0]))


def _quantize_np(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Bit-exact numpy twin of :func:`quantize_embeddings`: the same
    fixed-shape IEEE double sequence ``floor((x * 127.0) / max|x| + 0.5)``
    per element (identical operand order → identical correctly-rounded
    results), zero vectors → all-zero codes. Returns ``(codes, sq_norm)``
    with codes held as exact small integers in float64 (|code| <= 127, so
    a float64 matmul of code matrices accumulates integers far below 2^53
    — every partial sum is exact regardless of summation order)."""
    if mat.size == 0:
        return mat, np.zeros(len(mat), dtype=np.int64)
    m = np.abs(mat).max(axis=1)
    safe = np.where(m == 0.0, 1.0, m)
    codes = np.floor((mat * 127.0) / safe[:, None] + 0.5)
    codes[m == 0.0] = 0.0
    sq = (codes * codes).sum(axis=1)
    return codes, sq.astype(np.int64)


def _prune_mask(y: np.ndarray, k: int) -> np.ndarray:
    """Boolean keep-mask over a (rows, queries) score block: per query,
    everything within ``_ROUND6_MARGIN`` of the k-th largest score.
    ``-inf`` marks excluded (self) pairs; NaN scores (0/0 cosine of zero
    vectors) sort FIRST in Spark's double ordering, so they are mapped to
    +inf and always kept."""
    yr = np.where(np.isnan(y), np.inf, y)
    n = yr.shape[0]
    if n > k:
        thr = np.partition(yr, n - k, axis=0)[n - k] - _ROUND6_MARGIN
        keep = yr >= thr[None, :]
    else:
        keep = np.ones_like(yr, dtype=bool)
    return keep & (yr > -np.inf)


def _collect_query_side(queries: DataFrame, q_id: str, q_vec: str,
                        exclude_self: bool):
    """Driver-side collect of the query side — the side the unpruned plan
    already ships whole through the driver as a broadcast relation, so
    this is the same bounded data movement, not a new driver hot spot.
    Returns ``(ids, float64 matrix)`` or None when the pruned path's
    preconditions don't hold (nulls / ragged dims) and the caller should
    fall back to the all-pairs plan."""
    rows = queries.select(q_id, q_vec).collect()
    if exclude_self and any(r[0] is None for r in rows):
        return None  # null-rejecting join semantics: fall back
    if any(r[1] is None for r in rows):
        return None
    if not rows:
        return None
    dims = {len(r[1]) for r in rows}
    if len(dims) != 1:
        return None
    mat = np.asarray([r[1] for r in rows], dtype=np.float64)
    return [r[0] for r in rows], mat


def _id_field(df: DataFrame, name: str) -> StructField:
    f = df.schema[name]
    return StructField(name, f.dataType, f.nullable)


def brute_force_topk(queries: DataFrame, corpus: DataFrame, *, k: int = 10,
                     q_id: str = "query_id", c_id: str = "vec_id",
                     q_vec: str = "query_vec", c_vec: str = "embedding",
                     exclude_self: bool = True,
                     prune: bool = True) -> DataFrame:
    """Exact cosine top-k per query → (query_id, vec_id, rank).

    ``prune=True`` (default) short-circuits the all-pairs fold: a numpy
    matmul per Arrow batch scores every pair and keeps, per query, only
    the rows provably able to reach the rounded top-k (containment proof
    above — the matmul score differs from the engine's sequential fold
    by <= ~2·dim·eps, orders of magnitude under the margin); the kept
    pairs carry their ORIGINAL vectors and the final ``cos``/rank math
    runs through the same Spark expressions as the unpruned plan, so the
    output is bit-identical. ``prune=False`` keeps the plain crossJoin
    shape (the oracle-replayable reference plan). Rank ties break by
    vec_id (total order → deterministic output).
    """
    if prune:
        q_side = _collect_query_side(queries, q_id, q_vec, exclude_self)
    else:
        q_side = None
    if q_side is not None:
        from pyspark.sql.pandas.types import to_arrow_type
        q_ids, qmat = q_side
        spark = corpus.sparkSession
        bc = spark.sparkContext.broadcast((q_ids, qmat))
        out_schema = StructType([
            _id_field(queries, q_id), _id_field(corpus, c_id),
            StructField(q_vec, queries.schema[q_vec].dataType, True),
            StructField(c_vec, corpus.schema[c_vec].dataType, True)])
        q_vec_t = to_arrow_type(queries.schema[q_vec].dataType)
        kk = k
        if exclude_self:
            # the unpruned plan's join condition NOT(q_id = c_id) is
            # null-rejecting — the pushed IsNotNull filter, made explicit
            corpus = corpus.filter(F.col(c_id).isNotNull())

        def _kernel(batches):
            ids_l, qm = bc.value
            q_norm = np.sqrt((qm * qm).sum(axis=1))
            q_idarr = np.asarray(ids_l)
            for batch in batches:
                cid_arr = batch.column(0)
                cmat = _list_matrix(batch.column(1))
                cids = cid_arr.to_numpy(zero_copy_only=False)
                step = max(1, 4_000_000 // max(len(ids_l), 1))
                for s in range(0, len(cmat), step):
                    cm = cmat[s:s + step]
                    ci = cids[s:s + step]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        y = (cm @ qm.T) / (
                            np.sqrt((cm * cm).sum(axis=1))[:, None]
                            * q_norm[None, :])
                    if exclude_self:
                        y = np.where(
                            ci[:, None] == q_idarr[None, :], -np.inf, y)
                    ri, qj = np.nonzero(_prune_mask(y, kk))
                    if len(ri) == 0:
                        continue
                    take = pa.array(ri + s, type=pa.int64())
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([ids_l[j] for j in qj]),
                         cid_arr.take(take),
                         pa.array([qm[j].tolist() for j in qj],
                                  type=q_vec_t),
                         batch.column(1).take(take)],
                        names=[q_id, c_id, q_vec, c_vec])

        cand = corpus.select(c_id, c_vec).mapInArrow(_kernel, out_schema)
        scored = cand.select(
            q_id, c_id,
            F.round(cosine(F.col(q_vec), F.col(c_vec)), 6).alias("cos"))
    else:
        joined = queries.crossJoin(corpus)
        if exclude_self:
            joined = joined.filter(F.col(q_id) != F.col(c_id))
        scored = joined.select(
            q_id, c_id,
            F.round(cosine(F.col(q_vec), F.col(c_vec)), 6).alias("cos"))
    w = Window.partitionBy(q_id).orderBy(F.col("cos").desc(),
                                         F.col(c_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, c_id, "rank", "cos"))


# ---------------------------------------------------------------------------
# LSH (sign random projection)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(tables, bits, dim)).astype(np.float64)


def srp_bucket_udf(dim: int, *, bits: int = 12, tables: int = 4,
                   seed: int = 42):
    """Returns a pandas UDF: embedding → array of ``tables`` bucket keys."""
    planes = _hyperplanes(dim, bits, tables, seed)
    weights = (1 << np.arange(bits, dtype=np.int64))

    @pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = []
        keys = np.empty((len(mat), tables), dtype=np.int64)
        for t in range(tables):
            signs = (mat @ planes[t].T) > 0  # (n, bits)
            keys[:, t] = signs @ weights + (t << 48)  # disjoint per table
        for row in keys:
            out.append([int(v) for v in row])
        return pd.Series(out)

    return _buckets


def ann_lsh_topk(queries: DataFrame, corpus: DataFrame, dim: int, *,
                 k: int = 10, bits: int = 12, tables: int = 4,
                 seed: int = 42, q_id: str = "query_id",
                 c_id: str = "vec_id", q_vec: str = "query_vec",
                 c_vec: str = "embedding",
                 exclude_self: bool = True) -> DataFrame:
    """Approximate top-k: SRP bucket join → exact cosine re-rank of
    candidates. Each side is hashed once; the join key is (bucket)."""
    bucketize = srp_bucket_udf(dim, bits=bits, tables=tables, seed=seed)
    qb = (queries.withColumn("_b", F.explode(bucketize(F.col(q_vec)))))
    cb = (corpus.withColumn("_b", F.explode(bucketize(F.col(c_vec)))))
    cand = (qb.join(cb, "_b")
            .select(q_id, c_id, q_vec, c_vec).distinct())
    if exclude_self:
        cand = cand.filter(F.col(q_id) != F.col(c_id))
    scored = cand.select(
        q_id, c_id,
        F.round(cosine(F.col(q_vec), F.col(c_vec)), 6).alias("cos"))
    w = Window.partitionBy(q_id).orderBy(F.col("cos").desc(),
                                         F.col(c_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, c_id, "rank", "cos"))


# ---------------------------------------------------------------------------
# IVF (coarse-quantizer probe)
# ---------------------------------------------------------------------------

def ivf_assign(corpus: DataFrame, centroids: DataFrame, *,
               c_id: str = "vec_id", c_vec: str = "embedding",
               cent_id: str = "centroid_id",
               cent_vec: str = "centroid") -> DataFrame:
    """Assign each vector to its nearest centroid (by cosine)."""
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        c_id, cent_id, cosine(F.col(c_vec), F.col(cent_vec)).alias("cos"))
    w = Window.partitionBy(c_id).orderBy(F.col("cos").desc(),
                                         F.col(cent_id).asc())
    return (scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1).select(c_id, cent_id))


def train_centroids(corpus: DataFrame, n_centroids: int, *, iters: int = 3,
                    seed: int = 42, c_id: str = "vec_id",
                    c_vec: str = "embedding") -> DataFrame:
    """Deterministic k-means-lite: seed centroids by hashed sample, then
    ``iters`` Lloyd steps, all as DataFrame aggregations. Centroid ids come
    from a row_number over the (deterministic) hash order — never
    monotonically_increasing_id, whose values depend on partition layout."""
    w = Window.orderBy("_h", c_id)  # n_centroids rows only — single task OK
    cents = (corpus
             .withColumn("_h", F.pmod(F.xxhash64(F.lit(seed), F.col(c_id)),
                                      F.lit(1_000_000)))
             .orderBy("_h", c_id).limit(n_centroids)
             .select((F.row_number().over(w) - 1).alias("centroid_id"),
                     F.col(c_vec).alias("centroid")))
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, c_id=c_id, c_vec=c_vec)
        agg = (corpus.join(assigned, c_id)
               .select("centroid_id", F.posexplode(c_vec)
                       .alias("pos", "val"))
               .groupBy("centroid_id", "pos")
               .agg(F.avg("val").alias("mean")))
        cents = (agg.groupBy("centroid_id")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "mean")))
                      .alias("pm"))
                 .select("centroid_id",
                         F.transform("pm", lambda s: s["mean"].cast("float"))
                         .alias("centroid")))
    return cents


def ivf_topk(queries: DataFrame, corpus: DataFrame, centroids: DataFrame, *,
             k: int = 10, nprobe: int = 2, q_id: str = "query_id",
             c_id: str = "vec_id", q_vec: str = "query_vec",
             c_vec: str = "embedding",
             exclude_self: bool = True) -> DataFrame:
    """IVF probe: nearest ``nprobe`` centroids per query → exact re-rank
    within those inverted lists only."""
    assigned = ivf_assign(corpus, centroids, c_id=c_id, c_vec=c_vec)
    listed = corpus.join(assigned, c_id)
    q_scored = queries.crossJoin(F.broadcast(centroids)).select(
        q_id, q_vec, "centroid_id",
        cosine(F.col(q_vec), F.col("centroid")).alias("ccos"))
    w = Window.partitionBy(q_id).orderBy(F.col("ccos").desc(),
                                         F.col("centroid_id").asc())
    probes = (q_scored.withColumn("_r", F.row_number().over(w))
              .filter(F.col("_r") <= nprobe).select(q_id, q_vec,
                                                    "centroid_id"))
    cand = probes.join(listed, "centroid_id")
    if exclude_self:
        cand = cand.filter(F.col(q_id) != F.col(c_id))
    scored = cand.select(
        q_id, c_id,
        F.round(cosine(F.col(q_vec), F.col(c_vec)), 6).alias("cos"))
    w2 = Window.partitionBy(q_id).orderBy(F.col("cos").desc(),
                                          F.col(c_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k).select(q_id, c_id, "rank", "cos"))


# ---------------------------------------------------------------------------
# int8 symmetric quantization (scalar quantizer — the 100 TB memory path)
# ---------------------------------------------------------------------------

def quantize_embeddings(df: DataFrame, *, vec: str = "embedding",
                        id_col: str = "vec_id",
                        codes_col: str = "codes",
                        scale_col: str = "q_scale") -> DataFrame:
    """Symmetric int8 scalar quantization: per vector, ``scale = max|v|``
    and ``code_i = floor(v_i * 127 / scale + 0.5)`` ∈ [-127, 127] — a 4×
    memory cut on float32 embeddings (the difference between an ANN
    corpus fitting executor memory at 100 TB or spilling).  Zero vectors
    quantize to all-zero codes (explicit branch — no 0/0).

    Reconstruction error is ≤ ``scale / 254`` per element (half a
    quantization step).  Every arithmetic step is a fixed-shape IEEE
    double op (cast → * 127.0 → / scale → + 0.5 → floor), so any engine
    produces bit-identical codes — the DuckDB gate oracle replays it
    verbatim.  Pure JVM higher-order functions; no UDF, no shuffle.
    """
    v = F.col(vec)
    m = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    code = F.transform(
        v, lambda x: F.floor(x.cast("double") * F.lit(127.0) / m
                             + F.lit(0.5)).cast("int"))
    zeros = F.transform(v, lambda x: F.lit(0))
    return df.select(
        F.col(id_col), m.alias(scale_col),
        F.when(m == 0.0, zeros).otherwise(code).alias(codes_col))


def quantized_dot(a: Column, b: Column) -> Column:
    """Integer inner product of two int8-code arrays (int64 accumulator —
    exact: |dot| ≤ 127² · dim, nowhere near overflow)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def quantized_topk(queries: DataFrame, corpus: DataFrame, *, k: int = 10,
                   q_id: str = "query_id", c_id: str = "vec_id",
                   q_vec: str = "query_vec", c_vec: str = "embedding",
                   exclude_self: bool = True,
                   prune: bool = True) -> DataFrame:
    """Top-k by quantized cosine: quantize both sides to int8 codes,
    score with ``dot(codes) / (√‖qc‖² · √‖cc‖²)`` — the dot and both
    squared norms are EXACT int64, and the only float steps (two
    correctly-rounded IEEE sqrt, one multiply, one divide, the 6-dp
    round) are fixed-shape, so every engine ranks identically and the
    gate oracle reproduces the output bit-for-bit.  Zero vectors score
    0 through an explicit branch (Spark's ``0/0 → NaN`` vs DuckDB's
    ``NULL`` never enters the plan).

    Scoring the codes' cosine rather than the raw inner product makes
    the quantizer's per-vector scale cancel out — the ranking tracks
    true cosine up to quantization error (recall vs
    :func:`brute_force_topk` pinned in tests).  At 100 TB this is the
    scan/re-rank kernel: the corpus side reads 4× less than float32,
    and it composes with the bucketed candidate generators
    (:func:`ann_lsh_topk`, :func:`ivf_topk`) instead of the full-corpus
    crossJoin, which is the same labeled exactness-baseline shape as
    :func:`brute_force_topk`.

    ``prune=True`` (default, optimization r6) replaces the per-pair
    interpreted folds with one exact numpy matmul per Arrow batch and a
    provable rounded-top-k candidate cut (containment proof above) —
    identical output, orders of magnitude less work; ``prune=False``
    keeps the all-pairs crossJoin reference plan.
    """
    if prune:
        q_side = _collect_query_side(queries, q_id, q_vec, exclude_self)
    else:
        q_side = None
    if q_side is not None:
        # Pruned path (optimization r6): quantize + score every pair with
        # one exact numpy matmul per Arrow batch (codes are small
        # integers, so the float64 matmul is EXACT — see _quantize_np),
        # keep the provable rounded-top-k superset per query (containment
        # proof at the top of this section; here the pruning score is
        # BIT-EQUAL to the engine's unrounded qcos: same IEEE ops in the
        # same order), and hand the exact integer (qdot, ‖q‖², ‖c‖²) to
        # the SAME final Spark expressions as the unpruned plan.
        q_ids, qmat = q_side
        q_codes, q_na = _quantize_np(qmat)
        spark = corpus.sparkSession
        bc = spark.sparkContext.broadcast((q_ids, q_codes, q_na))
        out_schema = StructType([
            _id_field(queries, q_id), _id_field(corpus, c_id),
            StructField("qdot", LongType(), True),
            StructField("_na", LongType(), True),
            StructField("_nb", LongType(), True)])
        kk = k
        if exclude_self:
            corpus = corpus.filter(F.col(c_id).isNotNull())

        def _kernel(batches):
            ids_l, qc, qna = bc.value
            sq_na = np.sqrt(qna.astype(np.float64))
            q_idarr = np.asarray(ids_l)
            na_zero = qna == 0
            for batch in batches:
                cid_arr = batch.column(0)
                cmat = _list_matrix(batch.column(1))
                cids = cid_arr.to_numpy(zero_copy_only=False)
                step = max(1, 4_000_000 // max(len(ids_l), 1))
                for s in range(0, len(cmat), step):
                    cc, c_nb = _quantize_np(cmat[s:s + step])
                    dots = cc @ qc.T  # exact: integer float64 matmul
                    with np.errstate(divide="ignore", invalid="ignore"):
                        y = dots / (np.sqrt(c_nb.astype(np.float64))
                                    [:, None] * sq_na[None, :])
                    y[c_nb == 0, :] = 0.0
                    y[:, na_zero] = 0.0
                    if exclude_self:
                        y = np.where(cids[s:s + step][:, None]
                                     == q_idarr[None, :], -np.inf, y)
                    ri, qj = np.nonzero(_prune_mask(y, kk))
                    if len(ri) == 0:
                        continue
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([ids_l[j] for j in qj]),
                         cid_arr.take(pa.array(ri + s, type=pa.int64())),
                         pa.array(dots[ri, qj].astype(np.int64)),
                         pa.array(qna[qj]),
                         pa.array(c_nb[ri])],
                        names=[q_id, c_id, "qdot", "_na", "_nb"])

        scored = corpus.select(c_id, c_vec).mapInArrow(_kernel, out_schema)
    else:
        # per-row squared norms BEFORE the join: computed n + q times, not
        # n·q times — at 100 TB the norm column rides the scan for free
        qq = quantize_embeddings(queries, vec=q_vec, id_col=q_id,
                                 codes_col="_qc", scale_col="_qs") \
            .withColumn("_na", quantized_dot(F.col("_qc"), F.col("_qc")))
        cq = quantize_embeddings(corpus, vec=c_vec, id_col=c_id,
                                 codes_col="_cc", scale_col="_cs") \
            .withColumn("_nb", quantized_dot(F.col("_cc"), F.col("_cc")))
        joined = cq.crossJoin(F.broadcast(qq))
        if exclude_self:
            joined = joined.filter(F.col(q_id) != F.col(c_id))
        dot = quantized_dot(F.col("_qc"), F.col("_cc"))
        scored = joined.select(q_id, c_id, dot.alias("qdot"), "_na", "_nb")
    qcos = (F.when((F.col("_na") == 0) | (F.col("_nb") == 0), F.lit(0.0))
            .otherwise(F.round(
                F.col("qdot").cast("double")
                / (F.sqrt(F.col("_na").cast("double"))
                   * F.sqrt(F.col("_nb").cast("double"))), 6)))
    scored = scored.select(q_id, c_id, "qdot", qcos.alias("qcos"))
    w = Window.partitionBy(q_id).orderBy(F.col("qcos").desc(),
                                         F.col(c_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, c_id, "rank", "qdot", "qcos"))
