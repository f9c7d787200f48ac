"""Example spark-submit job: crawled interleaved documents → training data.

The post-crawl half of the engine, end to end:

    1. curate_interleaved — text-quality + media-structure gates over
       (doc_id, spans) documents, exact dedup on the extracted text
    2. hash_sample        — optional deterministic corpus subsample
    3. top_n_per_group    — per-source domain cap (salted two-pass)
    3b. mix_corpus        — optional data-mixture stage: per-source token
        budgets via content-keyed sampling (--mix-budget)
    3c. token_histogram   — corpus length report (printed)
    4. hash_split         — train/eval/test labels (content-keyed)
    5. pack_sequences     — token-budget sequence layout per split

Run:

    scripts/make_pyfiles.sh
    spark-submit --py-files dist/fess_ds_s3_spark.zip \
        examples/train_data_pipeline.py --docs 20000 \
        --budget 2048 --out /tmp/train-corpus

Every stage is a pure function of the input data (content-keyed hashes,
integer-exact thresholds, window math) — re-running the job on a
re-partitioned or resumed corpus yields byte-identical shard/split/seq
assignments, which is what makes incremental corpus refreshes safe.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fess_ds_s3_spark.functions.sampling import hash_sample, hash_split
from fess_ds_s3_spark.functions import text as T
from fess_ds_s3_spark.operators.caps import top_n_per_group
from fess_ds_s3_spark.operators.packing import pack_sequences
from fess_ds_s3_spark.plans.curate import curate_interleaved, \
    token_histogram
from fess_ds_s3_spark.plans.mix import mix_corpus


def synth_interleaved(spark: SparkSession, n: int):
    """Deterministic interleaved fixture: text halves + doc_id%3 media
    spans (same shape the driver-gate entry uses)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the quick brown fox jumps over the lazy dog and "
                       "it is a fine day for all of us to be out doc "),
                 F.col("id").cast("string"),
                 F.lit(" with some more words to vary the length "),
                 F.repeat(F.lit("pad "), (F.col("id") % 17).cast("int")))
        .alias("text"),
        F.concat(F.lit("src"), (F.col("id") % 23).cast("string"))
        .alias("source"))
    words = F.split(F.trim("text"), r"\s+")
    half = (F.size(words) / 2).cast("int")
    t1 = F.array_join(F.slice(words, F.lit(1), half), " ")
    t2 = F.array_join(F.slice(words, half + 1, F.size(words) - half), " ")

    def span(kind, text_col, ref_col, off):
        return F.struct(F.lit(kind).alias("kind"), text_col.alias("text"),
                        ref_col.alias("media_ref"),
                        F.lit(off).alias("offset"))

    none_s = F.lit(None).cast("string")
    media = F.array(*[span("media", none_s,
                           F.concat(F.lit("https://media.example.com/"),
                                    F.col("doc_id").cast("string"),
                                    F.lit(f"-{j}.png")), 1 + j)
                      for j in range(2)])
    spans = F.concat(F.slice(media, F.lit(1), (F.col("doc_id") % 3)
                             .cast("int")),
                     F.array(span("text", t2, none_s, 10),
                             span("text", t1, none_s, 0)))
    return base.select("doc_id", "source", spans.alias("spans"))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=20_000)
    parser.add_argument("--budget", type=int, default=2048)
    parser.add_argument("--max-per-source", type=int, default=200)
    parser.add_argument("--sample-num", type=int, default=1)
    parser.add_argument("--sample-den", type=int, default=1)
    parser.add_argument("--shards", type=int, default=64)
    parser.add_argument("--mix-budget", type=int, default=0,
                        help="data-mixture token budget (0 = skip)")
    parser.add_argument("--out", default=None,
                        help="optional parquet output dir")
    args = parser.parse_args()

    spark = (SparkSession.builder.appName("train-data-pipeline")
             .config("spark.sql.shuffle.partitions", "32").getOrCreate())

    docs = synth_interleaved(spark, args.docs)

    # 1. curate on both modalities; keep source for the cap stage
    curated = (curate_interleaved(docs, max_media=(1, 2), min_tokens=10)
               .join(docs.select("doc_id", "source"), "doc_id"))

    # 2. optional deterministic subsample (content-keyed — stable)
    if (args.sample_num, args.sample_den) != (1, 1):
        curated = curated.filter(
            hash_sample("doc_id", args.sample_num, args.sample_den,
                        seed="corpus-v1"))

    # 3. domain cap: longest docs win, salted two-pass window
    capped = top_n_per_group(
        curated, ["source"], args.max_per_source,
        [F.col("ws_tokens").desc(), F.col("doc_id").asc()],
        salt_buckets=8, salt_key=F.xxhash64("doc_id"))

    # 3b. data mixture: src0 over-weighted 8:1, the rest uniform —
    # per-source token budgets via the same content-keyed sampler
    if args.mix_budget:
        weights = {f"src{i}": (8 if i == 0 else 1) for i in range(23)}
        kept = mix_corpus(capped, weights, args.mix_budget,
                          token_col="ws_tokens", id_col="doc_id",
                          seed="mix-v1").select("doc_id")
        capped = capped.join(kept, "doc_id", "left_semi")

    # 3c. corpus report: power-of-two length histogram (exact int math)
    hist = (token_histogram(capped, token_col="ws_tokens")
            .groupBy("bucket")
            .agg(F.sum("n_docs").alias("docs"),
                 F.sum("tokens").alias("tokens"))
            .orderBy("bucket"))
    print(json.dumps({"length_histogram":
                      [r.asDict() for r in hist.collect()]}, default=int))

    # 4. split, 5. pack — within="split" scopes the layout so a sequence
    # can never mix train and eval documents
    labeled = capped.withColumn(
        "split", hash_split("doc_id", {"train": 98, "eval": 1, "test": 1},
                            seed="split-v1"))
    packed = pack_sequences(
        labeled, "ws_tokens", budget=args.budget, shards=args.shards,
        within=["split"])

    summary = (packed.groupBy("split")
               .agg(F.count("*").alias("docs"),
                    F.sum("ws_tokens").alias("tokens"),
                    F.countDistinct("shard", "seq_id").alias("sequences"))
               .orderBy("split"))
    print(json.dumps([r.asDict() for r in summary.collect()],
                     default=int))
    if args.out:
        # 6. checksummed delivery: content-keyed shards + a manifest the
        # training job verifies before trusting the export
        from fess_ds_s3_spark.plans.export import (
            verify_training_shards, write_training_shards)
        manifest = write_training_shards(
            packed, args.out, n_shards=args.shards, key="doc_id",
            seed="export-v1")
        check = verify_training_shards(spark, args.out)
        print(json.dumps({"export_rows": manifest["total_rows"],
                          "export_ok": check["ok"]}))
    spark.stop()


if __name__ == "__main__":
    main()
