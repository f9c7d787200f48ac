"""Host-bucketed frontier (plans/bucketed.py): exchange-free scheduling.

Pins the three claims the module makes:
- output equality with the shuffle path (plans.round.schedule) — same dedup
  winners, same unseen set, same admission ranks;
- the executed scheduling plan contains ZERO Exchange nodes (the whole
  point: per-round network cost is storage-partitioning, paid at ingest);
- durability of the layout: appends keep the bucketing, compaction keeps
  the schedule, DDL re-registration after a catalog wipe keeps both.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fess_ds_s3_spark.config import CrawlConfig
from fess_ds_s3_spark.plans import bucketed as B
from fess_ds_s3_spark.plans import round as round_plan

N_BUCKETS = 8


def _frontier(spark, n=20_000, hosts=23, dup_every=7):
    """Synthetic frontier with heavy canonical duplicates (id % dup chooses
    the key) so in-batch dedup is actually exercised."""
    return (spark.range(n)
            .withColumn("bucket", F.concat(F.lit("src"),
                                           (F.col("id") % hosts).cast("string")))
            .withColumn("key", F.concat(F.lit("docs/k"),
                                        (F.col("id") % (n // dup_every))
                                        .cast("string")))
            .withColumn("size", (F.col("id") % 5000).cast("long"))
            .withColumn("priority", (F.col("id") % 7).cast("int"))
            .withColumn("discovery_time", (F.col("id") % 997).cast("long"))
            .drop("id"))


@pytest.fixture(scope="module")
def cfg():
    return CrawlConfig(region="us-east-1", default_host_budget=40)


@pytest.fixture(scope="module")
def table(spark, cfg, tmp_path_factory):
    """Bucketed frontier table with pending rows + committed seen markers."""
    path = str(tmp_path_factory.mktemp("bucketed") / "frontier")
    df = _frontier(spark)
    spark.sql("DROP TABLE IF EXISTS t_bucketed_frontier")
    B.ingest_frontier(df, cfg, table="t_bucketed_frontier", path=path,
                      n_buckets=N_BUCKETS, mode="overwrite")
    prep = round_plan.prepare_frontier(df, cfg)
    seen = (prep.filter(F.xxhash64("canonical_url") % 3 == 0)
            .select("host", "canonical_url").distinct())
    B.mark_committed(seen, table="t_bucketed_frontier", path=path,
                     n_buckets=N_BUCKETS)
    return {"name": "t_bucketed_frontier", "path": path, "df": df,
            "seen": seen}


def _admissions(df):
    return {(r.url, r.host_rank)
            for r in df.select("url", "host_rank").collect()}


class TestScheduleBucketed:
    def test_zero_exchanges_in_plan(self, spark, cfg, table):
        adm = B.schedule_bucketed(spark.table(table["name"]), cfg)
        plan = adm._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
        assert "Bucketed: true" in plan

    def test_equals_shuffle_path(self, spark, cfg, table):
        adm = B.schedule_bucketed(spark.table(table["name"]), cfg)
        ref = round_plan.schedule(
            table["df"], cfg,
            seen_exact=table["seen"].select("canonical_url"),
            use_salting=False, narrow=False)
        assert _admissions(adm) == _admissions(ref)

    def test_seen_groups_are_filtered(self, spark, cfg, table):
        adm = B.schedule_bucketed(spark.table(table["name"]), cfg)
        leaked = (adm.join(table["seen"], on=["host", "canonical_url"],
                           how="left_semi").count())
        assert leaked == 0

    def test_host_budgets_and_global_cap(self, spark, cfg, table):
        budgets = (spark.table(table["name"]).select("host").distinct()
                   .withColumn("budget_per_round",
                               (F.length("host") % 3 + 1).cast("int")))
        adm = B.schedule_bucketed(spark.table(table["name"]), cfg,
                                  host_budgets=budgets, global_cap=17)
        rows = adm.collect()
        assert len(rows) == 17
        per_host = budgets.collect()
        bmap = {r.host: r.budget_per_round for r in per_host}
        assert all(r.host_rank <= bmap[r.host] for r in rows)


class TestScheduleAuto:
    def test_stats_match_manual_counts(self, spark, cfg, table):
        stats = B.frontier_stats(spark.table(table["name"]))
        pend = spark.table(table["name"]).filter(~F.col("committed"))
        per_host = {r.host: r["count"] for r in
                    pend.groupBy("host").count().collect()}
        assert stats.pending_rows == sum(per_host.values())
        assert stats.n_hosts == len(per_host)
        assert stats.max_host_rows == max(per_host.values())

    def test_stats_job_is_narrow(self, spark, cfg, table):
        """The per-host count aggregates exchange-free off the bucketing;
        only the O(n_hosts) count rows cross a (single-partition)
        exchange."""
        per_host = (spark.table(table["name"])
                    .filter(~F.col("committed")).groupBy("host").count()
                    .agg(F.sum("count"), F.count("*"), F.max("count")))
        plan = per_host._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1, plan

    def test_paths_pick_and_agree(self, spark, cfg, table):
        low = B.schedule_auto(spark, table["name"], cfg,
                              skew_threshold_rows=0)
        high = B.schedule_auto(spark, table["name"], cfg,
                               skew_threshold_rows=10**9,
                               stats=low.stats)
        assert low.path == "shuffle_salted"
        assert high.path == "bucketed"
        assert low.admitted.columns == high.admitted.columns
        assert _admissions(low.admitted) == _admissions(high.admitted)


class TestLayoutDurability:
    def test_append_preserves_bucketing(self, spark, cfg, table):
        extra = _frontier(spark, n=1000, hosts=23).withColumn(
            "key", F.concat(F.lit("late/"), F.col("key")))
        B.ingest_frontier(extra, cfg, table=table["name"],
                          path=table["path"], n_buckets=N_BUCKETS)
        adm = B.schedule_bucketed(spark.table(table["name"]), cfg)
        plan = adm._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0
        # late keys are now schedulable
        assert adm.filter(F.col("url").contains("/late/")).count() > 0

    def test_compact_then_schedule_is_stable(self, spark, cfg, table,
                                             tmp_path):
        before = B.schedule_bucketed(spark.table(table["name"]), cfg)
        spark.sql("DROP TABLE IF EXISTS t_bucketed_frontier_c")
        B.compact_frontier_bucketed(
            spark, table["name"], dst_table="t_bucketed_frontier_c",
            dst_path=str(tmp_path / "compacted"), n_buckets=N_BUCKETS)
        compacted = spark.table("t_bucketed_frontier_c")
        after = B.schedule_bucketed(compacted, cfg)
        assert _admissions(after) == _admissions(before)
        # one row per canonical URL survives
        assert (compacted.groupBy("canonical_url").count()
                .filter(F.col("count") > 1).count()) == 0
        # seen URLs keep exactly their marker
        assert (compacted.filter(F.col("committed"))
                .join(table["seen"], on=["host", "canonical_url"],
                      how="left_anti").count()) == 0

    def test_multiround_equals_shuffle_loop(self, spark, cfg, tmp_path):
        """3 bucketed admit→commit rounds ≡ the shuffle path with manual
        seen-set accumulation: same (round, url, host_rank) everywhere."""
        small = CrawlConfig(region="us-east-1", default_host_budget=5)
        df = _frontier(spark, n=3000, hosts=11)
        name, path = "t_bucketed_mr", str(tmp_path / "mr_frontier")
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        B.ingest_frontier(df, small, table=name, path=path,
                          n_buckets=N_BUCKETS, mode="overwrite")
        log = B.crawl_rounds_bucketed(
            spark, table=name, path=path, n_buckets=N_BUCKETS, cfg=small,
            n_rounds=3, log_path=str(tmp_path / "mr_log"))
        got = {(r.round, r.url, r.host_rank)
               for r in log.select("round", "url", "host_rank").collect()}

        seen = None
        want = set()
        for rnd in range(3):
            adm = round_plan.schedule(df, small, seen_exact=seen,
                                      use_salting=False, narrow=False)
            rows = adm.select("url", "canonical_url", "host_rank").collect()
            want |= {(rnd, r.url, r.host_rank) for r in rows}
            delta = adm.select("canonical_url")
            seen = delta if seen is None else seen.union(delta)
        assert got == want
        # every admitted URL exactly once across rounds (seen-set works)
        urls = [u for (_, u, _) in got]
        assert len(urls) == len(set(urls))

    def test_reregister_after_catalog_wipe(self, spark, cfg, table):
        before = B.schedule_bucketed(spark.table(table["name"]), cfg)
        want = _admissions(before)
        spark.sql(f"DROP TABLE {table['name']}")  # files survive (external)
        B.register_frontier_table(spark, table["name"], table["path"],
                                  N_BUCKETS)
        adm = B.schedule_bucketed(spark.table(table["name"]), cfg)
        plan = adm._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0
        assert _admissions(adm) == want
