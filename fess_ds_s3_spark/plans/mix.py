"""Corpus mixing: deterministic token-budget sampling to target source
proportions — the "data mixture" stage of an LLM training pipeline.

The reference hands every extracted document to the indexer with equal
standing (AmazonS3DataStore.java:258-276, the per-object callback).  A
training corpus assembled from a 100 TB crawl is NOT consumed uniformly:
the recipe says "Wikipedia-ish sources are 5% of training tokens, web
crawl is 60%, code is 15%, ..." and the pipeline must SUBSAMPLE each
source so the delivered token mass matches those proportions under a
global token budget.  This module computes that plan and applies it as
one declarative pipeline:

1. **Measure** — per-source token totals (one small aggregate; the
   result has one row per source, thousands at most).
2. **Plan** — per source ``s`` with weight ``w_s`` (target proportion
   ``w_s / W``) and measured tokens ``T_s``, the keep rate is
   ``min(1, w_s * budget / (W * T_s))`` — never upsampled, so a source
   short of its allocation contributes everything it has (the standard
   "cap at one epoch" rule; re-weighting the shortfall is the caller's
   iteration).  The rate is quantized to a 32-bit threshold
   ``floor(rate * 2^32)`` so the keep decision is a pure integer
   comparison.
3. **Apply** — content-keyed hash sampling (functions/sampling.py): keep
   a document iff the first 8 hex chars of ``md5(doc_id || seed)`` fall
   below the source's threshold.  The sample is a pure function of the
   data — identical across runs, partitionings, engines and cluster
   sizes, which is what lets a DuckDB oracle reproduce it bit-for-bit.

Determinism note: the rate itself is computed in float64 with a FIXED
expression shape — ``numer / (CAST(T_s AS DOUBLE) * W)`` where ``numer =
double(w_s * budget * 2^32)`` is a compile-time literal — so every
IEEE-754 engine performs the same two correctly-rounded operations and
lands on the same threshold.  Zero-token sources are handled explicitly
(keep-all) rather than through ``x / 0.0``, because engines disagree on
float division by zero (Spark → Infinity, DuckDB → NULL).

Scale shape at 100 TB: the measure step is one map-side-combinable
aggregate to ~#sources rows; the plan is pure column math over that tiny
frame; the apply step broadcast-joins the plan back (no second shuffle)
and filters — the corpus is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fess_ds_s3_spark.functions.text import token_count_ws

#: the threshold space: first 8 hex chars of md5 = 32 bits
_SPACE = 2 ** 32


def _weight_case(source: Column, mapping: dict[str, float],
                 default: float = 0.0) -> Column:
    """Chained CASE mapping source → per-source double literal (compile-
    time constants; sources outside the map get ``default``)."""
    out = None
    for src, val in mapping.items():
        cond = source == F.lit(src)
        out = F.when(cond, F.lit(val)) if out is None else \
            out.when(cond, F.lit(val))
    tail = F.lit(default)
    return tail if out is None else out.otherwise(tail)


def mix_plan(docs: DataFrame, weights: dict[str, int], token_budget: int,
             *, source_col: str = "source", token_col: str | None = None,
             text: str = "text") -> DataFrame:
    """Per-source sampling plan: ``(source, weight, src_tokens,
    sample_threshold)`` with ``sample_threshold`` in ``[0, 2^32]``
    (``2^32`` = keep everything).

    ``weights`` maps source value → integer target weight; proportions
    are ``weight / sum(weights)``.  Sources absent from ``weights`` get
    threshold 0 (dropped — list a source explicitly to keep it).
    ``token_col`` names a precomputed token count; otherwise whitespace
    tokens of ``text`` (functions/text.token_count_ws) are counted.
    """
    if not weights:
        raise ValueError("mix_plan needs at least one source weight")
    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    total_w = sum(weights.values())
    if total_w <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be >= 0 with a positive sum")
    tok = F.col(token_col) if token_col else token_count_ws(text)
    totals = (docs.groupBy(F.col(source_col).alias("source"))
              .agg(F.sum(tok).alias("src_tokens")))
    # numer = w * budget * 2^32 as an exact-int-to-double literal;
    # ratio = numer / (double(T_s) * double(W)) — two IEEE ops, engine-
    # independent. Threshold = floor(ratio) capped at 2^32; the floor
    # only runs on the < 2^32 branch so it can never overflow BIGINT.
    numer = _weight_case(F.col("source"), {
        s: float(w * token_budget * _SPACE) for s, w in weights.items()})
    weight = _weight_case(F.col("source"),
                          {s: float(w) for s, w in weights.items()}) \
        .cast("long")
    ratio = numer / (F.col("src_tokens").cast("double")
                     * F.lit(float(total_w)))
    thr = (F.when(F.col("src_tokens") <= 0,
                  F.lit(_SPACE).cast("long"))
           .when(ratio >= F.lit(float(_SPACE)), F.lit(_SPACE).cast("long"))
           .otherwise(F.floor(ratio).cast("long")))
    return totals.select(
        "source", weight.alias("weight"),
        F.col("src_tokens").cast("long").alias("src_tokens"),
        thr.alias("sample_threshold"))


def mix_corpus(docs: DataFrame, weights: dict[str, int],
               token_budget: int, *, source_col: str = "source",
               token_col: str | None = None, text: str = "text",
               id_col: str = "doc_id", seed: str = "") -> DataFrame:
    """Sample ``docs`` so each source's expected token mass approaches
    ``weight/sum(weights) * token_budget`` (capped at the source's full
    content — no upsampling).  Returns the surviving rows as ``(id_col,
    source, tokens, src_tokens, sample_threshold)``.

    The keep decision is ``hex8(md5(id || seed)) < %08x(threshold)``
    per source — content-keyed, so reruns, repartitions and other
    engines (the DuckDB oracle) select the identical document set.
    NULL ids are never kept (md5(NULL) is NULL; the keep-all branch
    checks ``id IS NOT NULL`` to match).

    Plan shape: one partial-agg shuffle to ~#sources rows, a broadcast
    join back, one filter — the corpus is scanned once and never
    re-shuffled.
    """
    tok = F.col(token_col) if token_col else token_count_ws(text)
    plan = mix_plan(docs, weights, token_budget, source_col=source_col,
                    token_col=token_col, text=text)
    keyed = F.col(id_col).cast("string")
    if seed:
        keyed = F.concat(keyed, F.lit(seed))
    hex8 = F.substring(F.md5(keyed), 1, 8)
    thr = F.col("sample_threshold")
    keep = (F.when(thr >= F.lit(_SPACE), F.col(id_col).isNotNull())
            .otherwise(hex8 < F.format_string("%08x", thr)))
    return (docs
            .select(F.col(id_col), F.col(source_col).alias("source"),
                    tok.cast("long").alias("tokens"))
            .join(F.broadcast(plan), on="source", how="inner")
            .filter(keep)
            .select(id_col, "source", "tokens", "src_tokens",
                    "sample_threshold"))


def mix_corpus_epochs(docs: DataFrame, weights: dict[str, int],
                      token_budget: int, *, max_epochs: int = 4,
                      source_col: str = "source",
                      token_col: str | None = None, text: str = "text",
                      id_col: str = "doc_id", seed: str = "") -> DataFrame:
    """Mixing WITH up-sampling: a source whose target allocation exceeds
    its content repeats — the standard recipe move for small
    high-quality sources (weights say "wiki is 10% of training tokens"
    even when wiki is 0.1% of the crawl).  Per source the epoch rate is
    ``r = min(max_epochs, w·budget / (W·T))``; every document emits
    ``⌊r⌋`` unconditional copies plus one more kept by a content-keyed
    hash sample at rate ``r - ⌊r⌋``.  Expected tokens per source =
    ``T · min(max_epochs, r)``; ``max_epochs`` caps repetition (the
    memorization guard).  Output: one row per copy, ``(id_col, source,
    copy_idx, tokens)`` with ``copy_idx`` in ``1..copies``.

    Determinism: the scaled rate reuses :func:`mix_plan`'s fixed-shape
    IEEE math (``ratio = numer / (T·W)`` — already ``rate · 2^32``);
    ``full = ⌊min(ratio, E·2^32)/2^32⌋`` and the fractional threshold
    ``⌊t_cap − full·2^32⌋`` are two more fixed-shape double ops, so the
    DuckDB oracle reproduces every copy bit-for-bit.  Zero-token
    sources pin to exactly one copy (explicit branch).  The per-doc
    fractional decision reuses ``hex8(md5(id‖seed))`` — same keyed
    sampler as everything else in the pipeline.

    Plan shape: one tiny per-source aggregate broadcast back, one
    bounded explode (≤ max_epochs+1 per row) — the corpus scans once.
    """
    if max_epochs < 1:
        raise ValueError("max_epochs must be >= 1")
    if not weights:
        raise ValueError("mix needs at least one source weight")
    total_w = sum(weights.values())
    if total_w <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be >= 0 with a positive sum")
    tok = F.col(token_col) if token_col else token_count_ws(text)
    totals = (docs.groupBy(F.col(source_col).alias("source"))
              .agg(F.sum(tok).alias("src_tokens")))
    numer = _weight_case(F.col("source"), {
        s: float(w * token_budget * _SPACE) for s, w in weights.items()})
    has_weight = _weight_case(F.col("source"),
                              {s: 1.0 for s in weights}) > 0.0
    ratio = numer / (F.col("src_tokens").cast("double")
                     * F.lit(float(total_w)))
    t_cap = F.least(ratio, F.lit(float(max_epochs * _SPACE)))
    full = F.floor(t_cap / F.lit(float(_SPACE))).cast("int")
    frac = F.floor(t_cap - full.cast("double") * F.lit(float(_SPACE))) \
        .cast("long")
    plan = totals.select(
        "source",
        F.when(~has_weight, F.lit(0))
        .when(F.col("src_tokens") <= 0, F.lit(1))
        .otherwise(full).alias("full_copies"),
        F.when(~has_weight | (F.col("src_tokens") <= 0),
               F.lit(0).cast("long"))
        .otherwise(frac).alias("frac_threshold"))
    keyed = F.col(id_col).cast("string")
    if seed:
        keyed = F.concat(keyed, F.lit(seed))
    hex8 = F.substring(F.md5(keyed), 1, 8)
    extra = (F.when(F.col("frac_threshold") >= F.lit(_SPACE),
                    F.lit(1))
             .when(hex8 < F.format_string("%08x", F.col("frac_threshold")),
                   F.lit(1)).otherwise(F.lit(0)))
    copies = (F.col("full_copies") + extra).alias("_copies")
    base = (docs
            .select(F.col(id_col), F.col(source_col).alias("source"),
                    tok.cast("long").alias("tokens"))
            .join(F.broadcast(plan), on="source", how="inner")
            .select(id_col, "source", "tokens", copies))
    # sequence(1, 0) would DESCEND in Spark — guard the zero-copy case
    idx = F.when(F.col("_copies") >= 1,
                 F.sequence(F.lit(1), F.col("_copies"))) \
        .otherwise(F.array().cast("array<int>"))
    return (base.select(id_col, "source", "tokens",
                        F.explode(idx).alias("copy_idx"))
            .select(id_col, "source", "copy_idx", "tokens"))
