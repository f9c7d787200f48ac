"""Projections: the 38-field objectMap (P5) and script-map projection (P11).

- **objectMap** (getObjectMap, AmazonS3DataStore.java:295-364): the wide
  per-document row. Field names are the constants at
  AmazonS3DataStore.java:89-134. Built as one ``select`` over
  frontier ⋈ fetch-response columns. The two-content-type rule
  (SURVEY.md §1.3): ``content_type``/``mimetype`` carry the *sniffed* value
  (:360-361) while ``resp_content_type`` keeps the response value the F2
  filter used (:215).

- **script-map projection** (:240-246): config-driven ``{out_field: expr}``
  evaluated per row; the reference evaluates Groovy over a ``resultMap``
  envelope where fields are addressed as ``object.url``. Here exprs are
  Spark SQL (``F.expr``) over a struct column named ``object`` — the same
  dotted addressing, no arbitrary-code surface. The reference *omits* fields
  whose expr yields null (:243-245); a columnar schema is fixed, so nulls
  stay as SQL nulls (tests compare null-tolerantly; SURVEY.md §1.1.4).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fess_ds_s3_spark.config import CrawlConfig
from fess_ds_s3_spark.functions.urls import (build_management_url,
                                             build_object_url,
                                             filename_from_key)
from fess_ds_s3_spark.operators.extract import sniff_mime

#: the 38 objectMap fields (AmazonS3DataStore.java:89-134) — name → source
#: expression over the joined frontier+payload row.
_RESPONSE_PASSTHROUGH = [
    # (column, spark type) — GetObjectResponse attrs read at :315-339
    ("accept_ranges", "string"), ("cache_control", "string"),
    ("content_disposition", "string"), ("content_encoding", "string"),
    ("content_language", "string"), ("content_length", "long"),
    ("content_range", "string"), ("delete_marker", "boolean"),
    ("expiration", "string"), ("expires", "timestamp"),
    ("missing_meta", "int"), ("object_lock_legal_hold_status", "string"),
    ("object_lock_mode", "string"),
    ("object_lock_retain_until_date", "timestamp"),
    ("parts_count", "int"), ("replication_status", "string"),
    ("request_charged", "string"), ("restore", "string"),
    ("server_side_encryption", "string"), ("sse_customer_algorithm", "string"),
    ("sse_customer_key_md5", "string"), ("ssekms_key_id", "string"),
    ("tag_count", "int"), ("version_id", "string"),
    ("website_redirect_location", "string"),
]


def build_object_map(df: DataFrame, cfg: CrawlConfig, *,
                     encode_urls: bool = True,
                     filetype_map: Mapping[str, str] | None = None,
                     ) -> DataFrame:
    """P5: project the joined (frontier ⋈ payload) rows into the wide
    documents row. Null-safe everywhere (P6: owner fields may be null —
    AmazonS3DataStoreTest.java:302-322)."""
    # An S3 object has no intrinsic URL, so the reference always constructs
    # it (getUrl, :402-410); our frontier rows may carry a real crawl URL —
    # keep it when present, construct otherwise.
    built_url = build_object_url("bucket", "key", cfg.region, cfg.endpoint,
                                 encode=encode_urls)
    def _opt(name: str, typ: str) -> F.Column:
        """Column if present, typed null otherwise (listing fields vary)."""
        return (F.col(name).cast(typ) if name in df.columns
                else F.lit(None).cast(typ))

    cols = dict(
        url=(F.coalesce(F.col("url"), built_url)
             if "url" in df.columns else built_url),
        management_url=build_management_url("bucket", "key", cfg.region,
                                            encode=encode_urls),
        filename=filename_from_key("key"),
        bucket_name=F.col("bucket"),
        creation_date=_opt("creation_date", "timestamp"),
        key=F.col("key"),
        e_tag=_opt("etag", "string"),
        last_modified=_opt("last_modified", "timestamp"),
        owner_id=_opt("owner_id", "string"),
        owner_display_name=_opt("owner_display_name", "string"),
        size=F.col("size").cast("long"),
        storage_class=_opt("storage_class", "string"),
    )
    for name, typ in _RESPONSE_PASSTHROUGH:
        cols[name] = (F.col(name).cast(typ) if name in df.columns
                      else F.lit(None).cast(typ))
    # sniffed type drives mimetype/content_type/filetype (:346,360-362);
    # the raw response value is preserved separately for F2 and debugging.
    sniffed = (sniff_mime(F.col("content"), cols["filename"])
               if "content" in df.columns
               else F.col("resp_content_type"))
    cols["mimetype"] = sniffed
    cols["content_type"] = sniffed
    cols["resp_content_type"] = F.col("resp_content_type")
    if filetype_map:
        mapping = F.create_map(
            *[F.lit(x) for kv in filetype_map.items() for x in kv])
        cols["filetype"] = mapping[cols["mimetype"]]
    else:
        # default: minor MIME part, e.g. text/plain → plain? The reference's
        # FileTypeHelper maps via config (test_app.xml:13-18: text/plain→txt);
        # default mirrors that test map.
        default_map = {"text/plain": "txt", "text/html": "html",
                       "application/json": "json", "application/pdf": "pdf",
                       "image/png": "png", "image/jpeg": "jpg"}
        mapping = F.create_map(
            *[F.lit(x) for kv in default_map.items() for x in kv])
        cols["filetype"] = F.coalesce(mapping[cols["mimetype"]],
                                      F.lit("others"))
    passthrough = [c for c in ("doc_id", "spans", "contents", "status",
                               "discard_reason", "error_name",
                               "error_message", "host", "canonical_url",
                               "url_hash", "round", "host_rank", "priority")
                   if c in df.columns]
    return df.select(*[expr.alias(name) for name, expr in cols.items()],
                     *passthrough)


def script_map_project(df: DataFrame,
                       script_map: Mapping[str, str]) -> DataFrame:
    """P11: config-driven projection ``{out_field: sql_expr}`` with the
    reference's ``object.x`` addressing — every source column is exposed
    under a struct named ``object`` first, so exprs like ``object.url`` and
    ``object.key`` work verbatim (AmazonS3DataStoreTest.java:146-153)."""
    enveloped = df.withColumn("object", F.struct(*df.columns))
    return enveloped.select(
        *[F.expr(expr).alias(out) for out, expr in script_map.items()])
