"""Filter-chain semantics: F1 include/exclude, F2 MIME, F3 max-size, F4
buckets — mirroring AmazonS3DataStoreTest.java:170-233 behaviors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fess_ds_s3_spark.config import CrawlConfig, ConfigError
from fess_ds_s3_spark.operators import filters


@pytest.fixture()
def cfg():
    return CrawlConfig(region="us-east-1")


def _urls_df(spark, urls):
    df = spark.createDataFrame([(u, 8) for u in urls], "url string, size long")
    return filters.with_status_columns(df)


URLS = [
    "https://fess-0.s3.us-east-1.amazonaws.com/files/sample-0.txt",
    "https://fess-0.s3.us-east-1.amazonaws.com/files/sample-1.txt",
    "https://fess-1.s3.us-east-1.amazonaws.com/files/sample-0.txt",
]


class TestUrlFilter:
    def test_include_full_match_semantics(self, spark):
        # Fess UrlFilter uses matcher.matches() — a bare substring pattern
        # must NOT pass unless it matches the whole URL.
        cfg = CrawlConfig(region="us-east-1", include_pattern="sample-0")
        out = filters.apply_url_filter(_urls_df(spark, URLS), cfg)
        assert out.filter(F.col("status") == "pending").count() == 0

    def test_include_pattern(self, spark):
        # AmazonS3DataStoreTest.java:170-196: include .*sample-0.*
        cfg = CrawlConfig(region="us-east-1", include_pattern=".*sample-0.*")
        out = filters.apply_url_filter(_urls_df(spark, URLS), cfg)
        kept = [r.url for r in
                out.filter(F.col("status") == "pending").collect()]
        assert kept == [URLS[0], URLS[2]]
        dropped = out.filter(F.col("status") == "discarded").collect()
        assert {r.discard_reason for r in dropped} == {"url_filter"}

    def test_exclude_pattern(self, spark):
        cfg = CrawlConfig(region="us-east-1", exclude_pattern=".*sample-1.*")
        out = filters.apply_url_filter(_urls_df(spark, URLS), cfg)
        kept = [r.url for r in
                out.filter(F.col("status") == "pending").collect()]
        assert kept == [URLS[0], URLS[2]]

    def test_include_and_exclude(self, spark):
        cfg = CrawlConfig(region="us-east-1",
                          include_pattern=".*fess-0.*",
                          exclude_pattern=".*sample-1.*")
        out = filters.apply_url_filter(_urls_df(spark, URLS), cfg)
        kept = [r.url for r in
                out.filter(F.col("status") == "pending").collect()]
        assert kept == [URLS[0]]

    def test_discard_not_failure(self, spark):
        # E1: a filter miss is a discard — no error columns set
        cfg = CrawlConfig(region="us-east-1", include_pattern="nothing")
        out = filters.apply_url_filter(_urls_df(spark, URLS), cfg)
        rows = out.collect()
        assert all(r.status == "discarded" and r.error_name is None
                   for r in rows)


class TestMimeFilter:
    def _df(self, spark, types):
        df = spark.createDataFrame([(t,) for t in types],
                                   "resp_content_type string")
        return filters.with_status_columns(df)

    def test_default_allows_all(self, spark, cfg):
        out = filters.apply_mimetype_filter(
            self._df(spark, ["application/octet-stream", "text/plain"]), cfg)
        assert out.filter(F.col("status") == "pending").count() == 2

    def test_allowlist(self, spark):
        # AmazonS3DataStoreTest.java:199-209: "application/pdf, text/plain"
        cfg = CrawlConfig.from_params(
            {"region": "us-east-1",
             "supported_mimetypes": "application/pdf, text/plain"})
        out = filters.apply_mimetype_filter(
            self._df(spark, ["application/octet-stream", "text/plain",
                             "application/pdf", "text/plain2"]), cfg)
        kept = [r.resp_content_type for r in
                out.filter(F.col("status") == "pending").collect()]
        # full-match: "text/plain2" must NOT pass "text/plain"
        assert sorted(kept) == ["application/pdf", "text/plain"]
        assert out.filter((F.col("status") == "discarded")
                          & (F.col("discard_reason") == "mimetype")
                          ).count() == 2


class TestMaxSize:
    def test_max_size_routes_to_failed(self, spark):
        # AmazonS3DataStoreTest.java:211-233: max_size=1 ⇒ 0 stored, all fail
        cfg = CrawlConfig(region="us-east-1", max_size=1)
        out = filters.apply_max_size_guard(_urls_df(spark, URLS), cfg)
        rows = out.collect()
        assert all(r.status == "failed" for r in rows)
        assert all(r.error_name == "MaxLengthExceededException" for r in rows)
        assert all("8 byte" in r.error_message and "1 byte" in r.error_message
                   for r in rows)

    def test_default_passes(self, spark, cfg):
        out = filters.apply_max_size_guard(_urls_df(spark, URLS), cfg)
        assert out.filter(F.col("status") == "pending").count() == 3


class TestBucketFilter:
    def test_subset(self, spark):
        cfg = CrawlConfig.from_params(
            {"region": "r", "buckets": "fess-0, missing"})
        df = spark.createDataFrame(
            [("fess-0",), ("fess-1",), ("fess-2",)], "bucket string")
        got = [r.bucket for r in filters.bucket_filter(df, cfg).collect()]
        assert got == ["fess-0"]

    def test_empty_means_all(self, spark, cfg):
        df = spark.createDataFrame([("a",), ("b",)], "bucket string")
        assert filters.bucket_filter(df, cfg).count() == 2


class TestConfig:
    def test_region_required(self):
        # AmazonS3Client.java:75-77 fail-fast analog
        with pytest.raises(ConfigError):
            CrawlConfig(region="")

    def test_param_parsing_defaults(self):
        cfg = CrawlConfig.from_params({"region": "r", "max_keys": "bogus"})
        assert cfg.max_keys == 1000 and cfg.max_size == 10_000_000
        assert cfg.ignore_error is True
        assert cfg.supported_mimetypes == (".*",)

    def test_csv_trimming(self):
        cfg = CrawlConfig.from_params(
            {"region": "r", "buckets": " a , b ,, c "})
        assert cfg.buckets == ("a", "b", "c")


class TestClientValidation:
    """S8 fail-fast parity — the five reference client-ctor failure cases
    (AmazonS3ClientTest.java:112-159)."""

    def test_missing_region(self):
        from fess_ds_s3_spark.session import validate_client_params
        with pytest.raises(ConfigError, match="region"):
            CrawlConfig.from_params(
                {"region": "", "access_key_id": "t", "secret_key": "t"})

    def test_missing_access_key(self):
        # AmazonS3Client.java:166-172: either credential missing → error
        with pytest.raises(ConfigError, match="access_key_id"):
            CrawlConfig.from_params({"region": "r", "secret_key": "t"})

    def test_missing_secret_key(self):
        with pytest.raises(ConfigError, match="secret_key"):
            CrawlConfig.from_params({"region": "r", "access_key_id": "t"})

    def test_client_open_requires_both_credentials(self):
        from fess_ds_s3_spark.session import validate_client_params
        cfg = CrawlConfig(region="r")  # valid engine-only config
        with pytest.raises(ConfigError, match="access_key_id"):
            validate_client_params(cfg)  # but a client open needs creds
        validate_client_params(cfg, require_credentials=False)  # ok
        validate_client_params(
            CrawlConfig(region="r", access_key_id="a", secret_key="s"))

    def test_proxy_host_without_port(self):
        # AmazonS3Client.java:87-91
        with pytest.raises(ConfigError, match="proxy_port required"):
            CrawlConfig.from_params(
                {"region": "r", "access_key_id": "t", "secret_key": "t",
                 "proxy_host": "localhost"})

    def test_invalid_proxy_port(self):
        # AmazonS3Client.java:92-98 (NumberFormatException path)
        with pytest.raises(ConfigError, match="proxy_port.*invalid"):
            CrawlConfig.from_params(
                {"region": "r", "access_key_id": "t", "secret_key": "t",
                 "proxy_host": "localhost", "proxy_port": "invalid"})

    def test_valid_proxy(self):
        cfg = CrawlConfig.from_params(
            {"region": "r", "access_key_id": "t", "secret_key": "t",
             "proxy_host": "localhost", "proxy_port": "8080"})
        assert cfg.proxy_port == "8080"
