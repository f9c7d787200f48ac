"""Filter chain + error routing.

Reference semantics being preserved (SURVEY.md §2.3, §2.13):

- F1 include/exclude URL regex filter (Fess UrlFilter; built at
  AmazonS3DataStore.java:475-495, applied at :203-210): pass iff
  (no includes OR url full-matches an include) AND NOT full-matches any
  exclude. A miss is an E1 **discard** — stat 'discard', no failure row.
- F2 MIME allowlist (AmazonS3DataStore.java:215-221): keep iff the *response*
  content type full-matches ≥1 configured regex; miss is an E1 discard.
  Runs after fetch in the reference because it needs the GET response.
- F3 max-size guard (AmazonS3DataStore.java:223-226): exceeding rows are E2
  **failures** (error row, not silently dropped), error name
  'MaxLengthExceededException'. The reference checks contentType BEFORE the
  size guard, so in fetched mode the round applies F2 first (a row that is
  both MIME-unsupported and oversize is a discard, not a failure —
  plans/round.py:process); in listing-only mode the guard runs pre-fetch on
  the listing size.
- F4 bucket membership (AmazonS3Client.java:124-127): literal-set isin.

Full-match anchoring: the reference uses Java ``matches()``; Spark ``rlike``
is find-anywhere, so CrawlConfig pre-anchors patterns as ``^(?:...)$``.

Status model (E1/E2/E3): every row carries
``status ∈ {pending, stored, discarded, failed}`` + ``discard_reason`` /
``error_name`` / ``error_message`` columns; filters *route*, never drop, so
one pass over the frontier yields all three sinks (indexed/failures/stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fess_ds_s3_spark.config import CrawlConfig

STATUS_PENDING = "pending"
STATUS_STORED = "stored"
STATUS_DISCARDED = "discarded"
STATUS_FAILED = "failed"
#: conditional-fetch outcome (engine extension, no reference analog): the
#: object's ETag matched the prior one — no body transferred, the
#: previously indexed document stays current
STATUS_UNCHANGED = "unchanged"

DISCARD_URL_FILTER = "url_filter"
DISCARD_MIMETYPE = "mimetype"
ERROR_MAX_LENGTH = "MaxLengthExceededException"


def with_status_columns(df: DataFrame) -> DataFrame:
    """Initialize routing columns on a raw frontier batch."""
    return (
        df.withColumn("status", F.lit(STATUS_PENDING))
        .withColumn("discard_reason", F.lit(None).cast("string"))
        .withColumn("error_name", F.lit(None).cast("string"))
        .withColumn("error_message", F.lit(None).cast("string"))
    )


def url_filter_predicate(cfg: CrawlConfig, url: Column | str = "url") -> Column:
    """F1 predicate: True = passes the include/exclude chain."""
    url = F.col(url) if isinstance(url, str) else url
    passes = F.lit(True)
    if cfg.include_rlike is not None:
        passes = url.rlike(cfg.include_rlike)
    if cfg.exclude_rlike is not None:
        passes = passes & ~url.rlike(cfg.exclude_rlike)
    return passes


def apply_url_filter(df: DataFrame, cfg: CrawlConfig,
                     url: str = "url") -> DataFrame:
    """F1 routing: non-matching pending rows → discarded(url_filter)."""
    miss = (F.col("status") == STATUS_PENDING) & ~url_filter_predicate(cfg, url)
    return (
        df.withColumn("discard_reason",
                      F.when(miss, F.lit(DISCARD_URL_FILTER))
                      .otherwise(F.col("discard_reason")))
        .withColumn("status",
                    F.when(miss, F.lit(STATUS_DISCARDED))
                    .otherwise(F.col("status")))
    )


def mimetype_predicate(cfg: CrawlConfig,
                       resp_content_type: Column | str = "resp_content_type",
                       ) -> Column:
    """F2 predicate over the *response* content type (not the sniffed one)."""
    col = (F.col(resp_content_type) if isinstance(resp_content_type, str)
           else resp_content_type)
    return col.rlike(cfg.mimetypes_rlike)


def apply_mimetype_filter(df: DataFrame, cfg: CrawlConfig,
                          resp_content_type: str = "resp_content_type",
                          ) -> DataFrame:
    """F2 routing: non-matching pending rows → discarded(mimetype)."""
    miss = ((F.col("status") == STATUS_PENDING)
            & ~mimetype_predicate(cfg, resp_content_type))
    return (
        df.withColumn("discard_reason",
                      F.when(miss, F.lit(DISCARD_MIMETYPE))
                      .otherwise(F.col("discard_reason")))
        .withColumn("status",
                    F.when(miss, F.lit(STATUS_DISCARDED))
                    .otherwise(F.col("status")))
    )


def apply_max_size_guard(df: DataFrame, cfg: CrawlConfig,
                         size: str = "size") -> DataFrame:
    """F3 routing: oversize pending rows → failed(MaxLengthExceededException).

    Uses the listing-provided size, so it runs before fetch — strictly
    cheaper than the reference's post-GET check with identical outcomes
    (AmazonS3DataStoreTest.java:211-233: max_size=1 ⇒ 0 docs stored, all
    rows become failure rows).
    """
    over = (F.col("status") == STATUS_PENDING) & (F.col(size) > cfg.max_size)
    message = F.format_string(
        "The content length (%d byte) is over %d byte.",
        F.col(size), F.lit(cfg.max_size))
    return (
        df.withColumn("error_name",
                      F.when(over, F.lit(ERROR_MAX_LENGTH))
                      .otherwise(F.col("error_name")))
        .withColumn("error_message",
                    F.when(over, message).otherwise(F.col("error_message")))
        .withColumn("status",
                    F.when(over, F.lit(STATUS_FAILED))
                    .otherwise(F.col("status")))
    )


def bucket_filter(df: DataFrame, cfg: CrawlConfig,
                  bucket: str = "bucket") -> DataFrame:
    """F4/S2: keep only configured buckets; empty config = all buckets.

    Output order remains listing order, not parameter order
    (AmazonS3DataStore.java:176-182 iterates listed buckets and checks
    membership, not the reverse).
    """
    if not cfg.buckets:
        return df
    return df.filter(F.col(bucket).isin(*cfg.buckets))
