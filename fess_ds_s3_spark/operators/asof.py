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
Skew note: a whale key serializes its window partition; as-of semantics
are order-dependent, so the salting escape hatch is RANGE partitioning
the time axis per key (each range carries the previous range's last
right row as a seed) — not implemented here; documented for 100×.

Reference scope: no analog in fess-ds-s3 (north-rule addition).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              left_ts: str = "us", right_ts: str = "us",
              value_cols: tuple[str, ...] | None = None,
              tolerance: int | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For every ``left`` row: the most recent ``right`` row with the
    same ``on`` key and ``right_ts`` <= ``left_ts``.

    ``left_ts`` / ``right_ts``: integer ordering columns (e.g. epoch
    micros). ``value_cols``: right-side columns to attach (default: all
    but key+ts), each suffixed with ``suffix``; plus ``{right_ts}{suffix}``
    (the matched row's time, NULL when no right row qualifies).

    ``tolerance``: max allowed ``left_ts - right_ts``; matches older
    than it become NULL (pandas ``merge_asof(tolerance=)`` semantics).

    Deterministic: at equal timestamps the right side wins ("at or
    before" includes ties), and multiple right rows on the same
    (key, ts) resolve to the greatest payload struct in column order.
    """
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
    # right rows sort before left at equal _t ("at or before" includes
    # ties); equal-(key, ts) right rows resolve by the payload struct
    w = (Window.partitionBy(on)
         .orderBy(F.col("_t").asc(), F.col("_side").asc(),
                  F.col("_p").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (u.withColumn("_f", F.last("_p", ignorenulls=True).over(w))
              .filter(F.col("_side") == 1))
    stale = (F.col("_f").isNull()
             if tolerance is None else
             F.col("_f").isNull()
             | ((F.col("_t") - F.col("_f.rts")) > F.lit(int(tolerance))))
    matched = F.when(stale, F.lit(None).cast(dict(r_tag.dtypes)["_p"])) \
        .otherwise(F.col("_f"))
    sel = [F.col(c) for c in left_cols]
    sel += [matched[c].alias(f"{c}{suffix}") for c in value_cols]
    sel.append(matched["rts"].alias(f"{right_ts}{suffix}"))
    return filled.select(*sel)
