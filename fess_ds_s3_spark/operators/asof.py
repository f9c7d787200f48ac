"""As-of join: for each left row, the latest right row at-or-before it.

The J5 family (SURVEY.md §2.4) is absent from the reference, but a
training-data/analytics engine meets it constantly: join events to the
most recent config/model/price snapshot, align two telemetry streams,
attach the last-known robots fetch to a request. Spark has no built-in
as-of join (pandas has ``merge_asof``); the standard distributed
formulation is the UNION-window trick used here:

1. tag both sides and union them on the key with a common integer
   ordering column (microsecond-exact — operators/sessions.py idiom);
   each right row carries its payload as ONE struct, so a match is
   always a whole right row (never a column-wise mix, even when right
   values contain NULLs),
2. one window pass per key ordered by (time, side, payload) fills
   ``last(payload, ignorenulls)`` over the preceding frame,
3. keep the left rows: each now carries the latest right row at or
   before it (right sorts BEFORE left at equal timestamps, so
   "at-or-before" includes exact matches).

One shuffle on the key, one sort — the same cost envelope as a regular
join, no per-row lookups, no broadcast requirement on either side.

Skew (the 100 TB concern): a whale key serializes its window partition.
``time_slices=S`` activates the RANGE-partitioned variant — as-of
semantics are order-dependent, so unlike an agg you cannot hash-salt;
instead each key's TIME AXIS is cut into S contiguous ranges and the
window runs per (key, slice), shrinking the whale's task input ~S×:

a. slice = floor((t - min_t) * S / span) from one global (min, max)
   aggregate broadcast back as a 1-row frame (no driver action),
b. per (key, slice) the last right row is a tiny aggregate (max of the
   ordering struct) → a cascade window over ≤S rows per key computes
   each slice's SEED: the last right row of any earlier slice,
c. the within-slice window fill falls back to the seed
   (``coalesce(filled, seed)``) — exactly "latest right row at or
   before" across the slice boundary.

Bit-identical to the unsalted path (property-tested), costing one extra
small shuffle (the per-slice seed agg + its broadcast-sized join).

Reference scope: no analog in fess-ds-s3 (north-rule addition).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              left_ts: str = "us", right_ts: str = "us",
              value_cols: tuple[str, ...] | None = None,
              tolerance: int | None = None,
              suffix: str = "_asof",
              time_slices: int = 1) -> DataFrame:
    """For every ``left`` row: the most recent ``right`` row with the
    same ``on`` key and ``right_ts`` <= ``left_ts``.

    ``left_ts`` / ``right_ts``: integer ordering columns (e.g. epoch
    micros). ``value_cols``: right-side columns to attach (default: all
    but key+ts), each suffixed with ``suffix``; plus ``{right_ts}{suffix}``
    (the matched row's time, NULL when no right row qualifies).

    ``tolerance``: max allowed ``left_ts - right_ts``; matches older
    than it become NULL (pandas ``merge_asof(tolerance=)`` semantics).

    ``time_slices``: >1 activates the skew-safe range-partitioned path
    (see module docstring) — same output bit-for-bit, max window-task
    input reduced ~``time_slices``× on a whale key. Size it so
    whale_rows / time_slices fits one task comfortably (e.g. 32-256).

    Deterministic: at equal timestamps the right side wins ("at or
    before" includes ties), and multiple right rows on the same
    (key, ts) resolve to the greatest payload struct in column order.
    """
    if time_slices < 1:
        raise ValueError("time_slices must be >= 1")
    if value_cols is None:
        value_cols = tuple(c for c in right.columns
                           if c not in (on, right_ts))
    payload = F.struct(
        F.col(right_ts).cast("long").alias("rts"),
        *[F.col(c).alias(c) for c in value_cols])
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).cast("long").alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"))
    left_cols = left.columns
    l_tag = left.select(
        "*",
        F.col(left_ts).cast("long").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(dict(r_tag.dtypes)["_p"]).alias("_p"))
    for c in left_cols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(
                c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    u = l_tag.unionByName(r_tag.select(*l_tag.columns))
    p_type = dict(r_tag.dtypes)["_p"]

    if time_slices == 1:
        # right rows sort before left at equal _t ("at or before"
        # includes ties); equal-(key, ts) right rows resolve by the
        # payload struct
        w = (Window.partitionBy(on)
             .orderBy(F.col("_t").asc(), F.col("_side").asc(),
                      F.col("_p").asc_nulls_first())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        filled = (u.withColumn("_f",
                               F.last("_p", ignorenulls=True).over(w))
                  .filter(F.col("_side") == 1))
    else:
        # ---- skew-safe range-partitioned path -------------------------
        # (a) global time bounds, broadcast back as a 1-row dimension
        bounds = u.agg(F.min("_t").alias("_lo"), F.max("_t").alias("_hi"))
        span = F.greatest(F.col("_hi") - F.col("_lo") + 1, F.lit(1))
        u = (u.crossJoin(F.broadcast(bounds))
             .withColumn(
                 "_slice",
                 F.least(
                     F.greatest(
                         ((F.coalesce(F.col("_t"), F.col("_lo"))
                           - F.col("_lo"))
                          * time_slices / span).cast("int"),
                         F.lit(0)),
                     F.lit(time_slices - 1)))
             .drop("_lo", "_hi"))
        # (b) per-(key, slice) last right row, cascaded into each
        # slice's seed: the last right row of ANY earlier slice. The
        # cascade window spans <= time_slices rows per key — never a
        # whale. struct(_t, _p) max == the window fill's winner at the
        # slice's end (same (_t, payload) order).
        last_right = (u.filter(F.col("_side") == 0)
                      .groupBy(on, "_slice")
                      .agg(F.max(F.struct(F.col("_t"), F.col("_p")))
                           .alias("_lr")))
        wc = (Window.partitionBy(on).orderBy(F.col("_slice").asc())
              .rowsBetween(Window.unboundedPreceding, -1))
        # slices with NO right rows are absent from last_right; their
        # left rows still need the seed — densify over every slice the
        # union actually has, then cascade across those
        all_slices = u.select(on, "_slice").distinct()
        dense = (all_slices.join(last_right, [on, "_slice"], "left")
                 .withColumn("_seed",
                             F.last("_lr", ignorenulls=True).over(wc))
                 .select(on, "_slice", F.col("_seed._p").alias("_seed")))
        # (c) window within (key, slice); fall back to the seed
        w = (Window.partitionBy(on, "_slice")
             .orderBy(F.col("_t").asc(), F.col("_side").asc(),
                      F.col("_p").asc_nulls_first())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        filled = (u.join(dense, [on, "_slice"], "left")
                  .withColumn("_w",
                              F.last("_p", ignorenulls=True).over(w))
                  .withColumn("_f", F.coalesce(F.col("_w"),
                                               F.col("_seed")))
                  .filter(F.col("_side") == 1))

    stale = (F.col("_f").isNull()
             if tolerance is None else
             F.col("_f").isNull()
             | ((F.col("_t") - F.col("_f.rts")) > F.lit(int(tolerance))))
    matched = F.when(stale, F.lit(None).cast(p_type)) \
        .otherwise(F.col("_f"))
    sel = [F.col(c) for c in left_cols]
    sel += [matched[c].alias(f"{c}{suffix}") for c in value_cols]
    sel.append(matched["rts"].alias(f"{right_ts}{suffix}"))
    return filled.select(*sel)
