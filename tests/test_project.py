"""Projection operators: 38-field objectMap (P5) + script-map (P11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fess_ds_s3_spark.config import CrawlConfig
from fess_ds_s3_spark.operators.project import (build_object_map,
                                                script_map_project)

OBJECT_MAP_FIELDS = {
    # AmazonS3DataStore.java:89-134 field inventory
    "url", "management_url", "filename", "bucket_name", "creation_date",
    "key", "e_tag", "last_modified", "owner_id", "owner_display_name",
    "size", "storage_class", "accept_ranges", "cache_control",
    "content_disposition", "content_encoding", "content_language",
    "content_length", "content_range", "content_type", "delete_marker",
    "expiration", "expires", "missing_meta", "object_lock_legal_hold_status",
    "object_lock_mode", "object_lock_retain_until_date", "parts_count",
    "replication_status", "request_charged", "restore",
    "server_side_encryption", "sse_customer_algorithm",
    "sse_customer_key_md5", "ssekms_key_id", "tag_count", "version_id",
    "website_redirect_location", "mimetype", "filetype",
}


@pytest.fixture()
def joined_row(spark):
    """Minimal frontier ⋈ payload row."""
    return spark.createDataFrame(
        [("fess-0", "files/sample 1.txt", 8, "etag-1",
          None, None,  # null owner (AmazonS3DataStoreTest.java:302-322)
          "STANDARD", b"hogehoge", "application/octet-stream", 8)],
        "bucket string, key string, size long, etag string, "
        "owner_id string, owner_display_name string, storage_class string, "
        "content binary, resp_content_type string, content_length long")


class TestObjectMap:
    def test_all_38_plus_fields_present(self, spark, joined_row):
        cfg = CrawlConfig(region="us-east-1")
        out = build_object_map(joined_row, cfg)
        missing = OBJECT_MAP_FIELDS - set(out.columns)
        assert not missing, f"objectMap missing: {missing}"

    def test_field_values_and_encoding(self, spark, joined_row):
        cfg = CrawlConfig(region="us-east-1")
        row = build_object_map(joined_row, cfg).collect()[0]
        assert row.url == ("https://fess-0.s3.us-east-1.amazonaws.com/"
                           "files/sample%201.txt")
        assert row.filename == "sample 1.txt"  # basename NOT encoded
        assert row.bucket_name == "fess-0"
        assert row.e_tag == "etag-1"
        assert row.size == 8
        # null-owner tolerance (P6)
        assert row.owner_id is None and row.owner_display_name is None
        # sniffed vs response type (two-column rule, SURVEY §1.3)
        assert row.mimetype == "text/plain"
        assert row.content_type == "text/plain"
        assert row.resp_content_type == "application/octet-stream"
        assert row.filetype == "txt"

    def test_custom_filetype_map(self, spark, joined_row):
        cfg = CrawlConfig(region="us-east-1")
        out = build_object_map(joined_row, cfg,
                               filetype_map={"text/plain": "plaintext"})
        assert out.collect()[0].filetype == "plaintext"

    def test_endpoint_style_urls(self, spark, joined_row):
        cfg = CrawlConfig(region="r", endpoint="http://localhost:9000")
        row = build_object_map(joined_row, cfg).collect()[0]
        assert row.url == ("http://fess-0.localhost:9000/"
                           "files/sample%201.txt")


class TestScriptMap:
    def test_object_dot_addressing(self, spark):
        # usage shape from AmazonS3DataStoreTest.java:146-153
        df = spark.createDataFrame(
            [("u1", "k1", 10)], "url string, key string, size long")
        out = script_map_project(df, {
            "url": "object.url",
            "title": "object.key",
            "double_size": "object.size * 2",
        })
        row = out.collect()[0]
        assert (row.url, row.title, row.double_size) == ("u1", "k1", 20)

    def test_null_expr_results_stay_null(self, spark):
        # reference omits null fields (:243-245); columnar keeps SQL null
        df = spark.createDataFrame([("u1", None)], "url string, key string")
        out = script_map_project(df, {"k": "object.key"})
        assert out.collect()[0].k is None
