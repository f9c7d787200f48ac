"""Object-store source: distributed listing + batched-GET fetch stage.

The production shape of the reference's two S3 calls:

- **listing** (S3, ``AmazonS3Client.java:137-148``): ``listObjectsV2`` pages
  of ≤ ``max_keys`` keys, keyset-paginated with ``startAfter = lastKey``
  until exhaustion. Here: :func:`list_objects_df` fans the listing out as
  one task per (bucket, prefix) shard via ``mapInPandas``; each task runs
  the same page loop against the store. ``cfg.max_keys`` is consumed in its
  TRUE reference role — the listing page size — not as a crawl cap.
- **fetch** (S4, ``AmazonS3Client.java:150-152``): ``getObject`` per key.
  Here: :func:`fetch_objects` issues the GETs from inside ``mapInPandas``,
  one Arrow batch of admitted rows at a time — the stage a real deployment
  runs against an object store, with the same output contract as the
  payload-table join (``operators.extract.fetch_payloads``): ``content``,
  ``resp_content_type``, ``_fetched``; a missing key leaves ``_fetched``
  null and routes to E2 via ``route_fetch_miss``
  (NoSuchKeyException, ``AmazonS3DataStore.java:279-284``).

The store itself (:class:`FsObjectStore`) is a local-filesystem stand-in —
directory layout ``root/bucket/key`` with an optional content-type sidecar —
because this sandbox has no network/S3. Swapping in a real client means
replacing the two methods ``get_object`` / ``list_objects`` (boto3's are
drop-in shaped); every Spark-side operator is client-agnostic.

Scale notes: listing parallelism = number of (bucket, prefix) shards — at
10^10 keys, shard by prefix (e.g. 256 hex prefixes per bucket) so no single
task pages a whole bucket. Fetch parallelism = partitioning of the admitted
batch (see plans/round.process: ``number_of_threads`` is a floor). Content
bytes never pass through the driver in either stage.
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BinaryType, BooleanType, LongType, StringType,
                               StructField, StructType, TimestampType)

from fess_ds_s3_spark.config import CrawlConfig

#: S3's default when no Content-Type was set on upload
DEFAULT_CONTENT_TYPE = "application/octet-stream"

_META_SUFFIX = ".#meta.json"


class NoSuchKeyError(KeyError):
    """Missing object (analog of S3 NoSuchKeyException)."""


class FsObjectStore:
    """Local-filesystem object store: ``root/bucket/key`` (+ sidecar meta).

    Keys may contain ``/`` (mapped to directories). A sidecar file
    ``<key>.#meta.json`` holds the Content-Type; sidecars are invisible to
    listing and GET.
    """

    def __init__(self, root: str):
        self.root = root

    # ----- paths ------------------------------------------------------------

    def _bucket_dir(self, bucket: str) -> str:
        return os.path.join(self.root, bucket)

    def _object_path(self, bucket: str, key: str) -> str:
        if ".." in key.split("/"):
            raise ValueError(f"invalid key: {key!r}")
        return os.path.join(self._bucket_dir(bucket), *key.split("/"))

    # ----- write (fixture setup) -------------------------------------------

    def put_object(self, bucket: str, key: str, content: bytes,
                   content_type: str | None = None) -> None:
        path = self._object_path(bucket, key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(content)
        if content_type is not None:
            with open(path + _META_SUFFIX, "w") as fh:
                json.dump({"content_type": content_type}, fh)

    # ----- read -------------------------------------------------------------

    def get_object(self, bucket: str, key: str) -> tuple[bytes, str]:
        """GET: (content bytes, content type). Raises NoSuchKeyError."""
        path = self._object_path(bucket, key)
        if not os.path.isfile(path):
            raise NoSuchKeyError(f"{bucket}/{key}")
        with open(path, "rb") as fh:
            data = fh.read()
        ctype = DEFAULT_CONTENT_TYPE
        if os.path.isfile(path + _META_SUFFIX):
            with open(path + _META_SUFFIX) as fh:
                ctype = json.load(fh).get("content_type", ctype)
        return data, ctype

    def buckets(self) -> list[str]:
        """All bucket names (getBuckets, AmazonS3Client.java:124-132)."""
        if not os.path.isdir(self.root):
            return []
        return sorted(e for e in os.listdir(self.root)
                      if os.path.isdir(os.path.join(self.root, e)))

    def _all_keys(self, bucket: str) -> list[str]:
        """Every key in the bucket, ascending UTF-8 binary order (S3's
        listing collation)."""
        base = self._bucket_dir(bucket)
        keys = []
        for dirpath, _dirs, files in os.walk(base):
            for name in files:
                if name.endswith(_META_SUFFIX):
                    continue
                full = os.path.join(dirpath, name)
                keys.append(os.path.relpath(full, base).replace(os.sep, "/"))
        keys.sort(key=lambda k: k.encode("utf-8"))
        return keys

    def list_objects(self, bucket: str, prefix: str = "",
                     start_after: str = "",
                     max_keys: int = 1000) -> tuple[list[dict], str | None]:
        """One listing page: ≤ ``max_keys`` entries after ``start_after``;
        returns ``(entries, next_start_after)`` with ``None`` when the
        listing is exhausted — the keyset-pagination contract of
        listObjectsV2 (AmazonS3Client.java:139-147)."""
        matched = [k for k in self._all_keys(bucket)
                   if k.startswith(prefix)
                   and k.encode("utf-8") > start_after.encode("utf-8")]
        page = matched[:max_keys]
        entries = []
        for key in page:
            path = self._object_path(bucket, key)
            with open(path, "rb") as fh:
                data = fh.read()
            entries.append({
                "key": key,
                "size": len(data),
                "etag": hashlib.md5(data).hexdigest(),
                "last_modified": datetime.fromtimestamp(
                    int(os.path.getmtime(path)), tz=timezone.utc),
                "storage_class": "STANDARD",
            })
        next_after = page[-1] if len(matched) > max_keys else None
        return entries, next_after


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

LISTING_SCHEMA = StructType([
    StructField("bucket", StringType(), False),
    StructField("key", StringType(), False),
    StructField("size", LongType(), False),
    StructField("etag", StringType(), False),
    StructField("last_modified", TimestampType(), False),
    StructField("storage_class", StringType(), False),
])


def list_objects_df(spark: SparkSession, root: str, cfg: CrawlConfig, *,
                    buckets: list[str] | None = None,
                    prefixes: list[str] | None = None) -> DataFrame:
    """Distributed listing: one task per (bucket, prefix) shard; each task
    pages its shard by ``cfg.max_keys`` to exhaustion — the reference's
    page loop (AmazonS3Client.java:139-147) run in parallel across shards.

    ``buckets`` defaults to the store's buckets filtered by ``cfg.buckets``
    (F4 membership). ``prefixes`` shards each bucket's keyspace; default is
    one shard per bucket (fine up to ~10^6 keys/bucket; at frontier scale
    pass e.g. 256 prefix shards so no task walks a whole bucket).
    """
    store = FsObjectStore(root)
    names = buckets if buckets is not None else store.buckets()
    if cfg.buckets:
        names = [b for b in names if b in cfg.buckets]
    shards = [(b, p) for b in names for p in (prefixes or [""])]
    if not shards:
        return spark.createDataFrame([], LISTING_SCHEMA)
    tasks = spark.createDataFrame(shards, "bucket string, prefix string") \
        .repartition(len(shards))
    max_keys = cfg.max_keys

    def _list(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = FsObjectStore(root)
        for pdf in batches:
            for bucket, prefix in zip(pdf["bucket"], pdf["prefix"]):
                after = ""
                while True:
                    entries, nxt = local.list_objects(
                        bucket, prefix=prefix, start_after=after,
                        max_keys=max_keys)
                    if entries:
                        out = pd.DataFrame(entries)
                        out.insert(0, "bucket", bucket)
                        yield out[[f.name for f in LISTING_SCHEMA.fields]]
                    if nxt is None:
                        break
                    after = nxt

    return tasks.mapInPandas(_list, LISTING_SCHEMA)


#: per-bucket robots object key (crawler convention mapped onto the store:
#: the virtual-hosted bucket is the "site", so its robots live at the root)
ROBOTS_KEY = "robots.txt"


def fetch_robots_bodies(spark: SparkSession, root: str,
                        cfg: CrawlConfig) -> DataFrame:
    """Fetch each bucket's ``robots.txt`` object into the ``(host, body)``
    bodies table that ``operators.robots`` consumes; hosts are the same
    virtual-hosted URL hosts the frontier carries
    (``functions.urls.object_url_py``), so the broadcast join lines up.

    Buckets are a small dim, so the GET loop runs driver-side — the same
    shape as the reference's bucket iteration
    (AmazonS3DataStore.java:146-148). A bucket without a robots object
    contributes no rules (RFC 9309: no robots.txt ⇒ everything allowed).
    Note the robots object itself is a listable object and will appear in
    listings like any other key; exclude it via ``exclude_pattern`` if it
    should not be indexed."""
    from urllib.parse import urlsplit

    from fess_ds_s3_spark.functions.urls import object_url_py
    store = FsObjectStore(root)
    names = store.buckets()
    if cfg.buckets:
        names = [b for b in names if b in cfg.buckets]
    rows = []
    for bucket in names:
        # .hostname, not .netloc: the engine's canonical host column is
        # parse_url(url, 'HOST') — port-less and lowercased — and the
        # robots broadcast join keys on it; a ported endpoint override
        # (e.g. minio.local:9000) must still line up
        host = urlsplit(
            object_url_py(bucket, "", cfg.region, cfg.endpoint)).hostname
        try:
            body, _ = store.get_object(bucket, ROBOTS_KEY)
        except NoSuchKeyError:
            continue
        rows.append((host, body.decode("utf-8", "replace")))
    return spark.createDataFrame(rows, "host string, body string")


def fetch_objects(admitted: DataFrame, root: str) -> DataFrame:
    """S4 production fetch: batched GETs from inside ``mapInPandas``.

    Output contract matches :func:`~fess_ds_s3_spark.operators.extract.
    fetch_payloads`: every input column is preserved (any stale
    ``resp_content_type``/``content`` from the listing frontier is replaced
    — the response type comes from the GET, not the listing, exactly like
    the reference reads ``response.contentType()``,
    AmazonS3DataStore.java:215) plus:

    - ``content`` (binary) — the object bytes, null on miss;
    - ``resp_content_type`` — the store's Content-Type;
    - ``_fetched`` — true on success, null on a missing key so
      ``route_fetch_miss`` routes the row to E2 (NoSuchKeyException).

    The per-batch loop is I/O (one GET per admitted row, as in the
    reference); CPU-side work stays vectorized downstream. The admitted
    batch is budget-bounded, so total GETs per round = admissions.
    """
    base = [f for f in admitted.schema.fields
            if f.name not in ("content", "resp_content_type", "_fetched")]
    carry = [f.name for f in base]
    out_schema = StructType(base + [
        StructField("content", BinaryType(), True),
        StructField("resp_content_type", StringType(), True),
        StructField("_fetched", BooleanType(), True),
    ])

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        store = FsObjectStore(root)
        for pdf in batches:
            contents: list[bytes | None] = []
            ctypes: list[str | None] = []
            fetched: list[bool | None] = []
            for bucket, key in zip(pdf["bucket"], pdf["key"]):
                try:
                    data, ctype = store.get_object(bucket, key)
                    contents.append(data)
                    ctypes.append(ctype)
                    fetched.append(True)
                except NoSuchKeyError:
                    contents.append(None)
                    ctypes.append(None)
                    fetched.append(None)
            out = pdf[carry].copy()
            out["content"] = contents
            out["resp_content_type"] = ctypes
            out["_fetched"] = pd.array(fetched, dtype="boolean")
            yield out

    return admitted.mapInPandas(_fetch, out_schema)
