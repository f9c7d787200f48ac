"""Example spark-submit job: seed a synthetic frontier and run a crawl.

    scripts/make_pyfiles.sh
    spark-submit --py-files dist/fess_ds_s3_spark.zip \
        examples/crawl_job.py --rows 100000 --rounds 3 \
        --warehouse /tmp/crawl-wh

On a cluster, drop the --master local default via spark-submit's own
--master/--num-executors flags; the job code is identical.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from fess_ds_s3_spark.config import CrawlConfig
from fess_ds_s3_spark.plans.crawl import CrawlDriver
from fess_ds_s3_spark.sources.synthetic import synth_frontier


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=100_000)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--hosts", type=int, default=500)
    parser.add_argument("--budget", type=int, default=100)
    # optional per-round admission cap (engine knob; default None = admit
    # everything budgets allow and loop rounds until the frontier drains,
    # outcome-equivalent to the reference's page-to-exhaustion loop)
    parser.add_argument("--per-round-cap", type=int, default=None)
    parser.add_argument("--warehouse", default="/tmp/crawl-wh")
    args = parser.parse_args()

    spark = SparkSession.builder.appName("fess-ds-s3-spark-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cfg = CrawlConfig(region="us-east-1",
                      default_host_budget=args.budget,
                      bloom_expected=max(args.rows // 64, 1000))
    driver = CrawlDriver(spark, args.warehouse, cfg,
                         per_round_cap=args.per_round_cap)
    if driver.last_round() < 0:
        driver.seed(synth_frontier(spark, args.rows, n_hosts=args.hosts))
    summaries = driver.run(args.rounds)
    for s in summaries:
        print(json.dumps({"round": s.round_id, "admitted": s.admitted,
                          "stored": s.stored, "discarded": s.discarded,
                          "failed": s.failed}))
    spark.stop()


if __name__ == "__main__":
    main()
