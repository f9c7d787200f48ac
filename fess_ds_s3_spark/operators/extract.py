"""Fetch, content extraction (P9), MIME sniff (P7), link extraction.

- **Fetch** (S4, AmazonS3Client.java:150-152): in this engine the GET is a
  join of the admitted frontier against a ``payloads`` table on
  ``(bucket, key)`` — in production that table is the object store read via
  a vectorized fetch stage (``mapInPandas`` issuing ranged GETs per Arrow
  batch); in tests it is the fixture table. A missing payload row is an E2
  access failure (``NoSuchKeyException``), mirroring the reference's catch
  of AmazonServiceException (AmazonS3DataStore.java:279-284).

- **Extraction** (P9, getObjectContents, AmazonS3DataStore.java:380-400):
  bytes → text. Error handling is E3: with ``ignore_error=true`` (the
  default!) extraction errors yield ``contents=""`` and the doc IS stored;
  with ``false`` they escalate to E2 failures.

- **MIME sniff** (P7, getMimeType :366-371): content-based re-detection that
  *overwrites* the stored mimetype while the allowlist filter keeps using
  the response value — hence two columns (SURVEY.md §1.3). Implemented as a
  deterministic magic-bytes + extension sniffer (pandas UDF); the real
  Tika-grade detector would slot into the same UDF.

- **Span handling** (input_hint): interleaved text+media docs carry
  ``spans:array<struct<kind,text,media_ref,offset>>``; extraction = text of
  text-spans joined in offset order; link extraction = media_refs in offset
  order. ``F.array_sort`` by offset guards order across any shuffle —
  the span-sequence invariant (kind, text, media_ref, order).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from fess_ds_s3_spark.config import CrawlConfig
from fess_ds_s3_spark.operators.filters import (STATUS_FAILED, STATUS_PENDING,
                                                STATUS_STORED)

ERROR_NO_SUCH_KEY = "NoSuchKeyException"
ERROR_EXTRACT = "ExtractException"

#: deterministic magic-byte table for the sniffer (extensible)
_MAGIC = [
    (b"%PDF", "application/pdf"),
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"PK\x03\x04", "application/zip"),
    (b"<?xml", "application/xml"),
]

_EXT_MIME = {
    "txt": "text/plain", "html": "text/html", "htm": "text/html",
    "csv": "text/csv", "json": "application/json", "pdf": "application/pdf",
    "png": "image/png", "jpg": "image/jpeg", "jpeg": "image/jpeg",
    "gif": "image/gif", "zip": "application/zip", "xml": "application/xml",
    "mp3": "audio/mpeg", "mp4": "video/mp4", "bin": "application/octet-stream",
}


def sniff_mime_py(content: bytes | None, filename: str | None) -> str:
    """Deterministic MIME sniff: magic bytes, then extension, then text
    heuristic — the engine's stand-in for Tika detection (P7)."""
    if content:
        head = bytes(content[:8])
        for magic, mime in _MAGIC:
            if head.startswith(magic):
                return mime
    ext = (filename or "").rsplit(".", 1)[-1].lower() if filename else ""
    if ext in _EXT_MIME:
        return _EXT_MIME[ext]
    if content is not None:
        try:
            bytes(content[:512]).decode("utf-8")
            return "text/plain"
        except UnicodeDecodeError:
            return "application/octet-stream"
    return "application/octet-stream"


@pandas_udf(StringType())
def sniff_mime(content: pd.Series, filename: pd.Series) -> pd.Series:
    return pd.Series([sniff_mime_py(c, f)
                      for c, f in zip(content, filename)])


@pandas_udf(StructType([StructField("contents", StringType(), True),
                        StructField("error", StringType(), True)]))
def extract_text(content: pd.Series) -> pd.DataFrame:
    """P9 byte→text extraction with error capture (never raises — errors
    become a column so E2/E3 routing stays declarative)."""
    texts, errors = [], []
    for blob in content:
        if blob is None:
            texts.append(None)
            errors.append(None)
            continue
        try:
            texts.append(bytes(blob).decode("utf-8"))
            errors.append(None)
        except UnicodeDecodeError as exc:
            texts.append(None)
            errors.append(f"{ERROR_EXTRACT}: {exc}")
    return pd.DataFrame({"contents": texts, "error": errors})


def fetch_payloads(admitted: DataFrame, payloads: DataFrame) -> DataFrame:
    """S4 fetch as a join on (bucket, key); missing rows get _fetched=false.

    At production scale the right side is the object store; here it is a
    table, so Catalyst picks SMJ/shuffled-hash on (bucket,key). The left
    side was already shrunk by admission — fetch only what was admitted.
    """
    right = payloads.withColumn("_fetched", F.lit(True))
    return admitted.join(right, on=["bucket", "key"], how="left")


def route_fetch_miss(df: DataFrame) -> DataFrame:
    """E2 fetch-miss routing after :func:`fetch_payloads` /
    ``fetch_objects``: a pending row with no payload → failed
    (NoSuchKeyException), and a row whose GET raised some OTHER store error
    (``_fetch_error`` from the production fetch stage: throttle,
    permission, transient 5xx past client retries) → failed under that
    exception's name — the crawl continues, exactly the reference's
    per-object catch (AmazonS3DataStore.java:279-284). Runs BEFORE the
    MIME and size checks, matching the getObject-throws-first order
    (:212)."""
    pending = F.col("status") == STATUS_PENDING
    miss = pending & F.col("_fetched").isNull()
    err = (F.col("_fetch_error") if "_fetch_error" in df.columns
           else F.lit(None).cast("string"))
    return (
        df.withColumn("error_name",
                      F.when(miss, F.coalesce(err,
                                              F.lit(ERROR_NO_SUCH_KEY)))
                      .otherwise(F.col("error_name")))
        .withColumn("status", F.when(miss, F.lit(STATUS_FAILED))
                    .otherwise(F.col("status")))
    )


def route_extract(df: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """E3 extraction routing; pending rows that survive become 'stored'.
    Runs last in the fetched-row chain (after MIME and size routing)."""
    pending = F.col("status") == STATUS_PENDING
    ext = extract_text(F.col("content"))
    df = df.withColumn("_ext", F.when(pending, ext))
    extract_failed = pending & F.col("_ext.error").isNotNull()
    if cfg.ignore_error:
        # E3: store with empty contents (AmazonS3DataStore.java:389-399)
        df = df.withColumn(
            "contents",
            F.when(pending & F.col("_ext.error").isNull(),
                   F.col("_ext.contents"))
            .when(extract_failed, F.lit(""))
            .otherwise(F.lit(None).cast("string")))
    else:
        df = (
            df.withColumn("error_name",
                          F.when(extract_failed, F.lit(ERROR_EXTRACT))
                          .otherwise(F.col("error_name")))
            .withColumn("error_message",
                        F.when(extract_failed, F.col("_ext.error"))
                        .otherwise(F.col("error_message")))
            .withColumn("status",
                        F.when(extract_failed, F.lit(STATUS_FAILED))
                        .otherwise(F.col("status")))
            .withColumn("contents",
                        F.when(F.col("status") == STATUS_PENDING,
                               F.col("_ext.contents"))
                        .otherwise(F.lit(None).cast("string")))
        )
    return (df.withColumn("status",
                          F.when(F.col("status") == STATUS_PENDING,
                                 F.lit(STATUS_STORED))
                          .otherwise(F.col("status")))
            .drop("_ext", "_fetched", "_fetch_error"))


# ---------------------------------------------------------------------------
# Span-preserving text + link extraction (input_hint payloads)
# ---------------------------------------------------------------------------

def spans_sorted(spans: Column | str = "spans") -> Column:
    """Re-assert span order by ``offset`` (cheap no-op if already ordered;
    mandatory guard after any op that could disturb array order)."""
    spans = F.col(spans) if isinstance(spans, str) else spans
    return F.array_sort(
        spans, lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1).otherwise(0))


def text_from_spans(spans: Column | str = "spans",
                    sep: str = " ") -> Column:
    """Extraction over interleaved docs: text spans concatenated in offset
    order (the P9 analog for the input_hint payload shape)."""
    ordered = spans_sorted(spans)
    texts = F.filter(ordered, lambda s: s["kind"] == F.lit("text"))
    return F.array_join(F.transform(texts, lambda s: s["text"]), sep)


def links_from_spans(spans: Column | str = "spans") -> Column:
    """Link extraction: media_ref URLs of media spans, in offset order —
    feeds newly-discovered URLs back into the frontier (plans/crawl.py)."""
    ordered = spans_sorted(spans)
    media = F.filter(
        ordered, lambda s: (s["kind"] == F.lit("media"))
        & s["media_ref"].isNotNull())
    return F.transform(media, lambda s: s["media_ref"])


def extract_links(stored_docs: DataFrame,
                  spans: str = "spans") -> DataFrame:
    """Explode stored docs' media refs into candidate frontier URLs:
    (url, source_doc, link_pos[, parent_priority]).

    ``parent_priority`` is carried when the stored rows have a ``priority``
    column, so discovered links can be scheduled AFTER their parents
    (priority = parent + 1, plans/crawl._frontier_candidates)."""
    carry = ([F.col("priority").alias("parent_priority")]
             if "priority" in stored_docs.columns else [])
    return (
        stored_docs
        .select(F.col("doc_id"), *carry,
                F.posexplode(links_from_spans(spans)).alias("link_pos", "url"))
        .select("url", F.col("doc_id").alias("source_doc"), "link_pos",
                *(["parent_priority"] if carry else []))
    )
