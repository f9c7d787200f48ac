"""Exact per-group top-n with optional skew-aware salting.

The curation analog of the politeness scheduler's admission window
(operators/politeness.py): a training corpus caps how many documents any
one source/domain may contribute (anti-spam, anti-over-representation —
the "domain cap" every large-scale crawl-curation recipe applies). The
group whose cap matters most is by definition the most skewed one, so the
plan must not drag every row of the hottest domain into a single task.

Spark >= 3.5 already does half the work: a ``row_number() <= n`` filter
triggers the ``WindowGroupLimit`` rewrite, which runs a PARTIAL per-group
top-n on the map side, below the exchange — so even the naive single
window bounds the hot group's reduce input at ``n × M`` rows (M = map
partitions), not the group's full size. That bound is enough when the cap
is small; it is NOT when both the cap and the scan are large (a 10k-doc
domain cap over a 100k-partition scan still funnels 10^9 rows into one
task).

Two-pass salted structure (same superset argument as
``admit_per_host_salted``, politeness.py:80):

  pass 1 — window over (group, salt): keep rank <= n within each salt.
           Any row in the true global top-n of its group ranks <= n
           inside its own salt too (ranks only shrink when rows are
           removed), so pass-1 survivors are ALWAYS a superset of the
           answer, for ANY salt assignment. Max task input drops by ~k.
  pass 2 — window over (group) on the <= k*n survivors: exact top-n.
           Tightens the hot group's reduce input from n × M to n × k,
           independent of scan width — the bound that survives 100 TB.

Unlike politeness (per-host budgets vary, so it broadcasts a hot-host dim
and salts only the hot tail), a cap op salts EVERY group by default — the
cap is itself the anti-skew guard, ``n`` is a constant, and the pass-2
window is bounded by construction, so the uniform two-pass shape needs no
extra counting aggregation. Pass ``salt_buckets=0`` for the single-window
plan when the group cardinality is known to be tame.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(df: DataFrame, group_cols: Sequence[str], n: int,
                    order_by: Sequence[Column], *,
                    salt_buckets: int = 0,
                    salt_key: Column | None = None,
                    rank_col: str | None = None) -> DataFrame:
    """Keep the first ``n`` rows of each group under ``order_by``.

    ``order_by`` must be a TOTAL order within each group (end it with a
    unique id) — otherwise which tied row survives is partition-dependent
    and the output is nondeterministic.

    ``salt_buckets > 1`` switches to the two-pass salted plan (see module
    docstring); output is bit-identical either way. ``salt_key`` overrides
    the salt hash input (default: xxhash64 over all columns — any
    assignment is correct, a content-derived one is deterministic).

    ``rank_col`` optionally retains the final within-group rank (1-based).
    """
    if n < 1:
        raise ValueError("top_n_per_group needs n >= 1")
    groups = list(group_cols)
    keep_rank = rank_col or "_rank"

    if salt_buckets > 1:
        if salt_key is None:
            salt_key = F.xxhash64(*[F.col(c) for c in df.columns])
        salted = df.withColumn(
            "_salt", F.pmod(salt_key, F.lit(salt_buckets)).cast("int"))
        pre = Window.partitionBy(*groups, "_salt").orderBy(*order_by)
        df = (salted.withColumn("_pre_rank", F.row_number().over(pre))
              .filter(F.col("_pre_rank") <= n)
              .drop("_salt", "_pre_rank"))

    final = Window.partitionBy(*groups).orderBy(*order_by)
    out = (df.withColumn(keep_rank, F.row_number().over(final))
           .filter(F.col(keep_rank) <= n))
    return out if rank_col else out.drop(keep_rank)
