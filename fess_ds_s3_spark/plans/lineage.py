"""Per-round metrics + per-partition lineage (north rule requirement).

The reference's analog is CrawlerStatsHelper (S7): begin/PREPARED/EVALUATED/
FINISHED/discard/ACCESS_EXCEPTION/EXCEPTION per stats key ``bucket@key``
(AmazonS3DataStore.java:194-288). The engine records the same taxonomy as
columnar stats, two ways:

- **observe()** — zero-cost counters piggybacked on the round's action
  (no extra job): admitted/stored/discarded/failed counts, byte totals.
- **partition_lineage()** — per-partition row counts + min/max admission
  keys, giving each committed snapshot a verifiable per-partition manifest
  (which partition produced which slice of the round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from fess_ds_s3_spark.operators.filters import (STATUS_DISCARDED,
                                                STATUS_FAILED, STATUS_STORED,
                                                STATUS_UNCHANGED)


def observe_round(processed: DataFrame,
                  name: str = "round_metrics") -> tuple[DataFrame, Observation]:
    """Attach an Observation to the processed batch. Read
    ``observation.get`` after the first action on the returned frame."""
    obs = Observation(name)
    observed = processed.observe(
        obs,
        F.count(F.lit(1)).alias("admitted"),
        F.sum(F.when(F.col("status") == STATUS_STORED, 1).otherwise(0))
        .alias("stored"),
        F.sum(F.when(F.col("status") == STATUS_DISCARDED, 1).otherwise(0))
        .alias("discarded"),
        F.sum(F.when(F.col("status") == STATUS_FAILED, 1).otherwise(0))
        .alias("failed"),
        F.sum(F.when(F.col("status") == STATUS_UNCHANGED, 1).otherwise(0))
        .alias("unchanged"),
        F.sum(F.coalesce(F.col("size"), F.lit(0))).alias("bytes_admitted"),
    )
    return observed, obs


def partition_lineage(df: DataFrame, round_id: int) -> DataFrame:
    """Per-partition lineage rows: (round, partition_id, rows, min/max url).

    One narrow aggregation over the admitted batch; written to the ``stats``
    table alongside the round snapshot so every snapshot is auditable
    partition-by-partition.
    """
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("rows"),
             F.min("url").alias("min_url"),
             F.max("url").alias("max_url"))
        .select(F.lit(round_id).alias("round"),
                F.col("_pid").alias("partition_id"),
                "rows", "min_url", "max_url")
    )


def stats_events(processed: DataFrame, round_id: int) -> DataFrame:
    """S7 stats rows: one (stats_key, action, round) per document, in the
    reference's taxonomy — key is ``bucket@key`` (AmazonS3DataStore.java:196),
    action ∈ {FINISHED, discard, ACCESS_EXCEPTION, EXCEPTION}: crawling-
    access failures (missing key, max-length) record ACCESS_EXCEPTION while
    generic throwables — extraction errors escalated by ``ignore_error=
    false`` — record EXCEPTION, matching the reference's two catch arms
    (AmazonS3DataStore.java:279-287)."""
    from fess_ds_s3_spark.operators.extract import ERROR_EXTRACT
    failed = F.col("status") == STATUS_FAILED
    action = (
        F.when(F.col("status") == STATUS_STORED, F.lit("FINISHED"))
        .when(F.col("status") == STATUS_DISCARDED, F.lit("discard"))
        # engine extension: conditional-fetch 304s are their own action
        # (neither a finished index write nor an access failure)
        .when(F.col("status") == STATUS_UNCHANGED, F.lit("unchanged"))
        .when(failed & (F.col("error_name") == ERROR_EXTRACT),
              F.lit("EXCEPTION"))
        .otherwise(F.lit("ACCESS_EXCEPTION")))
    return processed.select(
        F.concat_ws("@", "bucket_name", "key").alias("stats_key"),
        action.alias("action"),
        F.lit(round_id).alias("round"))
