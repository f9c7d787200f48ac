"""Training-shard export (plans/export.py)."""

from __future__ import annotations

import hashlib
import os
import shutil

import pytest
from pyspark.sql import functions as F

from fess_ds_s3_spark.plans import export


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"))


class TestAssignShards:
    def test_matches_python_md5_formula(self, spark):
        got = {r.doc_id: r.shard
               for r in export.assign_shards(
                   _docs(spark, 50), n_shards=8, seed="s").collect()}
        for doc_id in range(50):
            h = int(hashlib.md5(f"{doc_id}s".encode())
                    .hexdigest()[:8], 16)
            assert got[doc_id] == (h * 8) >> 32

    def test_partitioning_invariant(self, spark):
        d = _docs(spark, 300)
        a = export.assign_shards(d.repartition(1), n_shards=16)
        b = export.assign_shards(d.repartition(13), n_shards=16)
        assert {(r.doc_id, r.shard) for r in a.collect()} == \
            {(r.doc_id, r.shard) for r in b.collect()}

    def test_every_shard_in_range_and_roughly_balanced(self, spark):
        counts = (export.assign_shards(_docs(spark, 2000), n_shards=4)
                  .groupBy("shard").count().collect())
        got = {r.shard: r["count"] for r in counts}
        assert set(got) == {0, 1, 2, 3}
        assert min(got.values()) > 2000 / 4 * 0.7

    def test_validation(self, spark):
        with pytest.raises(ValueError, match="n_shards"):
            export.assign_shards(_docs(spark), n_shards=0)


class TestWriteVerify:
    def test_roundtrip_manifest_and_verify(self, spark, tmp_path):
        path = str(tmp_path / "export")
        man = export.write_training_shards(
            _docs(spark, 120), path, n_shards=4, seed="x")
        assert man["total_rows"] == 120
        assert sorted(man["shards"]) == ["0", "1", "2", "3"]
        assert sum(v["n_rows"] for v in man["shards"].values()) == 120
        # manifest on disk equals the returned dict
        import json
        with open(os.path.join(path, "manifest.json")) as f:
            assert json.load(f) == man
        # one directory per shard
        dirs = sorted(d for d in os.listdir(os.path.join(path, "data"))
                      if d.startswith("shard="))
        assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
        assert export.verify_training_shards(spark, path)["ok"]

    def test_verify_catches_lost_shard(self, spark, tmp_path):
        path = str(tmp_path / "export")
        export.write_training_shards(_docs(spark, 120), path, n_shards=4)
        shutil.rmtree(os.path.join(path, "data", "shard=2"))
        got = export.verify_training_shards(spark, path)
        assert not got["ok"]
        assert got["missing"] == [2]

    def test_rewrite_is_reproducible(self, spark, tmp_path):
        p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
        m1 = export.write_training_shards(_docs(spark, 90), p1, n_shards=3)
        m2 = export.write_training_shards(
            _docs(spark, 90).repartition(7), p2, n_shards=3)
        assert m1["shards"] == m2["shards"]
