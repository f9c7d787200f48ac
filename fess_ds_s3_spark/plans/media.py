"""Multimodal fetch + decode pipeline: interleaved corpus → one GET per
distinct media object → decoded features → per-document fan-out keys.

Composes the engine's existing stages into the media half of a
training-data pipeline:

1. :func:`~fess_ds_s3_spark.operators.spans.media_manifest` — ONE row
   per distinct ``media_ref`` across the corpus (fetch-once planning).
2. :func:`~fess_ds_s3_spark.operators.spans.plan_media_fetch` — anti-join
   against already-fetched refs (incremental runs re-GET nothing).
3. :func:`~fess_ds_s3_spark.sources.object_store.fetch_objects` — the S4
   production stage (batched GETs in ``mapInPandas``, bounded per-task
   concurrency, per-object error routing).
4. :func:`~fess_ds_s3_spark.operators.multimodal.decode_media` — Arrow
   feature extraction with per-row error capture (pluggable kernel).
5. ``doc_media`` — the ``(doc_id, media_ref, link_pos)`` fan-out keys a
   trainer joins features back through (features stay one-row-per-object;
   the join multiplies them out only where consumed).

Scale shape at 100 TB: the whole pipeline is sized by DISTINCT media
objects, not references — the manifest's groupBy collapses reference
fan-in before any byte moves, the decode stage sees (ref, content) only
(late materialization), and per-doc fan-out is a join on the manifest's
own key. Content bytes never transit the driver.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fess_ds_s3_spark.operators.extract import links_from_spans
from fess_ds_s3_spark.operators.multimodal import decode_media
from fess_ds_s3_spark.operators.spans import media_manifest, plan_media_fetch
from fess_ds_s3_spark.sources.object_store import fetch_objects


class MediaPipelineResult(NamedTuple):
    """The three surfaces of a media pipeline run (all lazy plans)."""
    #: (media_ref, ref_count, first_doc, bucket, key) — the fetch plan
    manifest: DataFrame
    #: (media_ref, media_type, width, height, feature, decode_error) —
    #: one row per fetched object; store failures carry the exception
    #: name in decode_error and NULL features
    features: DataFrame
    #: (doc_id, media_ref, link_pos) — fan-out keys in span order
    doc_media: DataFrame


def s3_ref_location(ref: Column) -> tuple[Column, Column]:
    """Default ref parser: ``s3://bucket/key`` → (bucket, key) columns.
    Non-matching refs yield empty strings — the fetch stage then routes
    them as missing keys (E2), never a task failure."""
    return (F.regexp_extract(ref, r"^s3://([^/]+)/", 1),
            F.regexp_extract(ref, r"^s3://[^/]+/(.+)$", 1))


def run_media_pipeline(docs: DataFrame, root, *,
                       spans: str = "spans", id_col: str = "doc_id",
                       fetched: DataFrame | None = None,
                       fetch_concurrency: int = 1,
                       decoder: Callable[[bytes], dict] | None = None,
                       ref_location: Callable[[Column], tuple[Column, Column]]
                       = s3_ref_location) -> MediaPipelineResult:
    """Plan the manifest → fetch → decode pipeline over an interleaved
    corpus. ``root`` is anything :func:`as_store_spec` accepts (local-fs
    path, StoreSpec, boto3 adapter). ``fetched`` (optional) is any
    DataFrame with a ``media_ref`` column of already-processed refs —
    those objects are not re-fetched. ``decoder`` plugs the decode
    kernel (default: the deterministic no-image-libs stub).

    Fetch failures are data, not errors: a manifest row whose GET fails
    appears in ``features`` with NULL feature columns and the exception
    name (or ``'NoSuchKey'``) in ``decode_error`` — the multimodal E2
    analog of the crawl's per-object failure routing."""
    manifest = media_manifest(docs, spans, id_col)
    todo = (plan_media_fetch(manifest, fetched)
            if fetched is not None else manifest)
    bucket, key = ref_location(F.col("media_ref"))
    addressed = todo.withColumn("bucket", bucket).withColumn("key", key)
    got = fetch_objects(addressed, root,
                        fetch_concurrency=fetch_concurrency)
    ok = got.filter(F.col("_fetched").eqNullSafe(F.lit(True)))
    failed = got.filter(~F.col("_fetched").eqNullSafe(F.lit(True)))
    decoded = (decode_media(
        ok.select(F.col("media_ref").alias("media_id"), "content"),
        decoder=decoder)
        .withColumnRenamed("media_id", "media_ref"))
    null_i = F.lit(None).cast("int")
    failures = failed.select(
        "media_ref",
        F.lit(None).cast("string").alias("media_type"),
        null_i.alias("width"), null_i.alias("height"),
        F.lit(None).cast(decoded.schema["feature"].dataType)
        .alias("feature"),
        F.coalesce(F.col("_fetch_error"), F.lit("NoSuchKey"))
        .alias("decode_error"))
    features = decoded.unionByName(failures)
    doc_media = docs.select(
        F.col(id_col),
        F.posexplode(links_from_spans(spans)).alias("link_pos", "media_ref"))
    return MediaPipelineResult(addressed, features, doc_media)
