"""Multimodal fetch+decode pipeline (plans/media.py): interleaved docs →
one GET per distinct media object → decoded features → fan-out keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fess_ds_s3_spark.plans.media import run_media_pipeline
from fess_ds_s3_spark.sources.object_store import FsObjectStore

from tests.test_spans_ops import DOC_SCHEMA, span


@pytest.fixture()
def store(tmp_path):
    st = FsObjectStore(str(tmp_path / "media-store"))
    st.put_object("m", "img/a.png", b"png-bytes-a", content_type="image/png")
    st.put_object("m", "img/b.png", b"png-bytes-b", content_type="image/png")
    return st


@pytest.fixture()
def corpus(spark):
    rows = [
        ("d0", [span("text", "alpha", offset=0),
                span("media", media_ref="s3://m/img/a.png", offset=1),
                span("media", media_ref="s3://m/img/b.png", offset=2)]),
        ("d1", [span("media", media_ref="s3://m/img/a.png", offset=0),
                span("text", "beta", offset=1)]),
        ("d2", [span("media", media_ref="s3://m/img/missing.png",
                     offset=0)]),
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


class TestMediaPipeline:
    def test_end_to_end(self, spark, corpus, store):
        res = run_media_pipeline(corpus, store.root)
        manifest = {r["media_ref"]: r for r in res.manifest.collect()}
        # one plan row per distinct object, refs parsed to (bucket, key)
        assert set(manifest) == {"s3://m/img/a.png", "s3://m/img/b.png",
                                 "s3://m/img/missing.png"}
        assert manifest["s3://m/img/a.png"]["ref_count"] == 2
        assert manifest["s3://m/img/a.png"]["bucket"] == "m"
        assert manifest["s3://m/img/a.png"]["key"] == "img/a.png"

        feats = {r["media_ref"]: r for r in res.features.collect()}
        assert set(feats) == set(manifest)
        ok = feats["s3://m/img/a.png"]
        assert ok["decode_error"] is None
        assert ok["width"] is not None and ok["height"] is not None
        # a missing object is DATA: NULL features + error name, no crash
        miss = feats["s3://m/img/missing.png"]
        assert miss["width"] is None
        assert miss["decode_error"] == "NoSuchKey"

        fan = sorted((r["doc_id"], r["link_pos"], r["media_ref"])
                     for r in res.doc_media.collect())
        assert fan == [("d0", 0, "s3://m/img/a.png"),
                       ("d0", 1, "s3://m/img/b.png"),
                       ("d1", 0, "s3://m/img/a.png"),
                       ("d2", 0, "s3://m/img/missing.png")]

    def test_incremental_skips_fetched(self, spark, corpus, store):
        already = spark.createDataFrame([("s3://m/img/a.png",)],
                                        "media_ref: string")
        res = run_media_pipeline(corpus, store.root, fetched=already)
        refs = {r["media_ref"] for r in res.features.collect()}
        assert refs == {"s3://m/img/b.png", "s3://m/img/missing.png"}

    def test_decode_determinism_matches_direct_kernel(self, spark, corpus,
                                                      store):
        from fess_ds_s3_spark.operators.multimodal import _fake_decode
        res = run_media_pipeline(corpus, store.root)
        got = {r["media_ref"]: (r["width"], r["height"])
               for r in res.features.collect() if r["decode_error"] is None}
        want = {f"s3://m/img/{k}.png":
                tuple(_fake_decode(body)[f] for f in ("width", "height"))
                for k, body in (("a", b"png-bytes-a"), ("b", b"png-bytes-b"))}
        assert got == want
