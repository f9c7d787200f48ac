"""URL-seen set: exact anti-join oracle, bloom pre-filter equivalence,
false-positive bound, cuckoo insert/delete, determinism across parallelism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fess_ds_s3_spark.config import CrawlConfig
from fess_ds_s3_spark.operators import seen as seen_ops


@pytest.fixture()
def cfg():
    return CrawlConfig(region="r", bloom_expected=10_000, bloom_fpp=0.01,
                       seen_partitions=8)


def _urls(spark, n, prefix="u", parts=4):
    return spark.range(0, n, numPartitions=parts).select(
        F.format_string(f"https://h%03d.com/{prefix}/%d",
                        F.pmod(F.col("id"), F.lit(50)), F.col("id"))
        .alias("canonical_url"))


class TestExactLedger:
    def test_anti_join(self, spark, cfg):
        frontier = _urls(spark, 100)
        seen = _urls(spark, 40)  # first 40 urls seen
        out = seen_ops.anti_join_seen_exact(frontier, seen)
        assert out.count() == 60

    def test_bloom_params_sane(self):
        m, k = seen_ops.bloom_params(10_000, 0.01)
        assert m % 8 == 0 and 6 <= k <= 8
        assert 9 * 10_000 <= m <= 11 * 10_000


class TestBloom:
    def test_no_false_negatives(self, spark, cfg):
        urls = _urls(spark, 1000)
        blooms = seen_ops.build_bloom(urls, cfg)
        probed = seen_ops.bloom_maybe_seen(urls, blooms, cfg)
        # every inserted URL must be maybe_seen
        assert probed.filter(~F.col("maybe_seen")).count() == 0

    def test_false_positive_rate_bounded(self, spark, cfg):
        inserted = _urls(spark, 5000, prefix="in")
        others = _urls(spark, 5000, prefix="out")
        blooms = seen_ops.build_bloom(inserted, cfg)
        fp = (seen_ops.bloom_maybe_seen(others, blooms, cfg)
              .filter(F.col("maybe_seen")).count())
        assert fp / 5000 < 0.03  # 3× slack over the 1% design point

    def test_multiple_blob_rows_per_part_are_or_merged(self, spark, cfg):
        """A blooms table holding several blob rows per partition (appended
        deltas instead of the driver's overwrite) must behave like the
        merged filter — never silently drop state → false 'unseen'."""
        a = _urls(spark, 400, prefix="a")
        b = _urls(spark, 400, prefix="b")
        bloom_a = seen_ops.build_bloom(a, cfg)
        bloom_b = seen_ops.build_bloom(b, cfg)
        stacked = bloom_a.unionByName(bloom_b)  # 2 rows per part_id
        merged = seen_ops.merge_blooms(bloom_a, bloom_b)
        both = a.unionByName(b)
        for blooms in (stacked, merged):
            # cogrouped probe path
            assert (seen_ops.bloom_maybe_seen(both, blooms, cfg)
                    .filter(~F.col("maybe_seen")).count() == 0)
            # broadcast probe path
            assert (seen_ops.bloom_maybe_seen_broadcast(
                        both, blooms.collect(), cfg)
                    .filter(~F.col("maybe_seen")).count() == 0)

    def test_filter_unseen_equals_exact(self, spark, cfg):
        frontier = _urls(spark, 2000)
        seen = _urls(spark, 700)
        blooms = seen_ops.build_bloom(seen, cfg)
        via_bloom = set(
            r[0] for r in seen_ops.filter_unseen(
                frontier, seen, blooms, cfg).select("canonical_url")
            .collect())
        exact = set(
            r[0] for r in seen_ops.anti_join_seen_exact(frontier, seen)
            .select("canonical_url").collect())
        assert via_bloom == exact

    def test_merge_blooms(self, spark, cfg):
        a = _urls(spark, 500, prefix="a")
        b = _urls(spark, 500, prefix="b")
        merged = seen_ops.merge_blooms(seen_ops.build_bloom(a, cfg),
                                       seen_ops.build_bloom(b, cfg))
        probed = seen_ops.bloom_maybe_seen(
            a.unionByName(b), merged, cfg)
        assert probed.filter(~F.col("maybe_seen")).count() == 0

    def test_blob_determinism_across_parallelism(self, spark, cfg):
        """Bloom blobs must be bit-identical regardless of input partitioning
        (SURVEY.md §7 hard part 4)."""
        u1 = _urls(spark, 1000, parts=1)
        u8 = _urls(spark, 1000, parts=8)
        blobs1 = {r.part_id: r.bits for r in
                  seen_ops.build_bloom(u1, cfg).collect()}
        blobs8 = {r.part_id: r.bits for r in
                  seen_ops.build_bloom(u8, cfg).collect()}
        assert blobs1 == blobs8


class TestCuckoo:
    def test_contains_after_build(self, spark, cfg):
        urls = _urls(spark, 1000)
        blobs = seen_ops.build_cuckoo(urls, cfg)
        probed = seen_ops.cuckoo_maybe_seen(urls, blobs, cfg)
        assert probed.filter(~F.col("maybe_seen")).count() == 0

    def test_delete_then_probe(self, spark, cfg):
        urls = _urls(spark, 200)
        blobs = seen_ops.build_cuckoo(urls, cfg)
        to_delete = urls.limit(50).withColumn("op", F.lit("del"))
        updated = seen_ops.cuckoo_update(blobs, to_delete, cfg)
        probe_deleted = seen_ops.cuckoo_maybe_seen(
            urls.limit(50), updated, cfg)
        # deletions must take effect (cuckoo guarantee, bloom cannot do this)
        assert probe_deleted.filter(F.col("maybe_seen")).count() == 0
        rest = _urls(spark, 200).subtract(urls.limit(50))
        probe_rest = seen_ops.cuckoo_maybe_seen(rest, updated, cfg)
        assert probe_rest.filter(~F.col("maybe_seen")).count() == 0
