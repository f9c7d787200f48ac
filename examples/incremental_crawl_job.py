"""Example spark-submit job: continuous incremental re-crawl with adaptive
priority.

    scripts/make_pyfiles.sh
    spark-submit --py-files dist/fess_ds_s3_spark.zip \
        examples/incremental_crawl_job.py --store /data/object-store \
        --warehouse /data/crawl-wh --cycles 4

Each cycle lists the store, diffs the listing against the previous
snapshot (operators/incremental.py), seeds ONLY the changed fraction —
so steady-state cost is one listing scan + change-rate x per-object crawl
cost, not a full re-crawl like the reference's storeData walk — and folds
the diff into the change-rate schedule: objects that change often are
admitted first within each host's politeness budget, and the live index
is resolved as latest-round-per-key minus newer tombstones.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from fess_ds_s3_spark.config import CrawlConfig
from fess_ds_s3_spark.plans.crawl import CrawlDriver
from fess_ds_s3_spark.sources.object_store import list_objects_df


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--store", required=True,
                        help="object-store root (fs path or S3StoreSpec "
                             "per examples/s3_crawl_job.py)")
    parser.add_argument("--warehouse", required=True)
    parser.add_argument("--cycles", type=int, default=1)
    parser.add_argument("--rounds-per-cycle", type=int, default=50)
    parser.add_argument("--region", default="us-east-1")
    parser.add_argument("--budget", type=int, default=100)
    args = parser.parse_args()

    spark = SparkSession.builder.appName("incremental-crawl").getOrCreate()
    cfg = CrawlConfig(region=args.region,
                      default_host_budget=args.budget)
    driver = CrawlDriver(spark, args.warehouse, cfg,
                         object_store_root=args.store)

    for _ in range(args.cycles):
        listing = list_objects_df(spark, args.store, cfg)
        cycle = driver.begin_incremental_cycle(listing,
                                               adaptive_priority=True)
        rounds = driver.run(args.rounds_per_cycle, stop_when_empty=True)
        print(json.dumps({
            "cycle": cycle.cycle,
            "candidates": cycle.candidates,
            "deleted": cycle.deleted,
            "rounds": len(rounds),
            "admitted": sum(r.admitted for r in rounds),
            "live_docs": driver.read_live_index().count(),
        }))


if __name__ == "__main__":
    main()
