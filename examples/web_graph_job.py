"""Example spark-submit job: authority-scheduled web-shaped crawl.

Demonstrates the round-4 crawl loop end to end on synthetic pages:

1. seed a frontier over N hosts and crawl round 0 under a per-round cap
2. harvest host link edges from the stored pages (every page links a
   deterministic hub host plus a random peer)
3. ``refresh_authority()`` — fixed-point integer PageRank over the edges
4. later rounds fill their cap from the highest-authority hosts first

    scripts/make_pyfiles.sh
    spark-submit --py-files dist/fess_ds_s3_spark.zip \
        examples/web_graph_job.py --rows 20000 --rounds 4 \
        --cap 2000 --warehouse /tmp/web-wh
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fess_ds_s3_spark.config import CrawlConfig
from fess_ds_s3_spark.plans.crawl import CrawlDriver
from fess_ds_s3_spark.sources.synthetic import synth_frontier


def synth_docs(frontier):
    """Per stored page: one media span linking the hub (host-00000) and
    one linking a hash-picked peer host — the page set every crawl round
    harvests edges from."""
    peer = F.pmod(F.xxhash64("url"), F.lit(50))
    return (frontier.select("url")
            .withColumn("doc_id", F.col("url"))
            .withColumn("spans", F.array(
                F.struct(F.lit("media").alias("kind"),
                         F.lit(None).cast("string").alias("text"),
                         F.concat(F.lit("https://host-00000.example.com/l/"),
                                  F.md5("url")).alias("media_ref"),
                         F.lit(0).alias("offset")),
                F.struct(F.lit("media").alias("kind"),
                         F.lit(None).cast("string").alias("text"),
                         F.concat(F.format_string(
                             "https://host-%05d.example.com/p/", peer),
                             F.md5("url")).alias("media_ref"),
                         F.lit(1).alias("offset")))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=20_000)
    parser.add_argument("--rounds", type=int, default=4)
    parser.add_argument("--hosts", type=int, default=50)
    parser.add_argument("--cap", type=int, default=2_000)
    parser.add_argument("--warehouse", default="/tmp/web-graph-wh")
    args = parser.parse_args()

    spark = (SparkSession.builder.appName("web-graph-crawl")
             .config("spark.sql.shuffle.partitions", "32").getOrCreate())
    cfg = CrawlConfig(region="us-east-1", default_host_budget=10_000,
                      bloom_expected=1_000_000, seen_partitions=16)
    driver = CrawlDriver(spark, args.warehouse, cfg,
                         use_authority=True, per_round_cap=args.cap)

    frontier = synth_frontier(spark, args.rows, n_hosts=args.hosts)
    docs = synth_docs(frontier)
    driver.seed(frontier)

    out = []
    for r in range(args.rounds):
        summary = driver.run_round(r, docs=docs)
        ranked = driver.refresh_authority()
        top = (driver.read_committed("indexed")
               .filter(F.col("round") == r)
               .groupBy("host").count()
               .orderBy(F.col("count").desc()).first())
        out.append({"round": r, "admitted": summary.admitted,
                    "stored": summary.stored, "new_links": summary.new_links,
                    "ranked_hosts": ranked,
                    "top_host": top.host if top else None})
    print(json.dumps(out, default=int))
    spark.stop()


if __name__ == "__main__":
    main()
