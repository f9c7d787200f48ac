"""Training-shard export: deterministic sharding + checksummed manifest.

The end of the curation pipeline is a DELIVERY problem: a training job
wants the corpus as N stable shards it can assign to data-loader workers,
with a manifest it can use to (a) verify the export completed and is
uncorrupted and (b) resume/re-export reproducibly. Spark's default write
gives neither — file counts follow the job's partitioning and file names
change per run.

Sharding is CONTENT-keyed (same rationale as functions/sampling.py: a
shard assignment must be a pure function of the data, never of the
partitioning): shard(doc) = floor(hex8(md5(key||seed)) · N / 16^8) — the
first 8 md5 hex chars as an integer, range-bucketed into N equal slices.
O(1) per row at ANY shard count (no when-chain), exactly reproducible in
ANSI SQL, and balanced to the md5 uniformity (~binomial deviation).

The manifest is computed by READING BACK what was written — it certifies
the files on disk, not the DataFrame that was supposed to become them.
Per shard: row count and an order-independent content checksum
(bit_xor of xxhash64 over the JSON rendering of each row). Manifest
commits atomically (tmp + rename) AFTER the data write, so a crash
mid-export leaves data files but no manifest — the export visibly did
not complete (same commit discipline as sources/snapshots.py).

Scale notes (10^9 docs → 10^4-10^5 shards):
- one shuffle (repartition by shard) + one read-back scan for the
  manifest; both columnar. ``partitionBy("shard")`` keeps one directory
  per shard so loader workers address shards by path.
- the read-back doubles I/O by design — it is the verification. Skip it
  only by calling :func:`assign_shards` + your own writer.

Reference scope: no analog in fess-ds-s3 (north-rule addition).
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["assign_shards", "write_training_shards",
           "verify_training_shards"]

_SPACE = 16 ** 8


def assign_shards(df: DataFrame, *, n_shards: int, key: str = "doc_id",
                  seed: str = "", shard_col: str = "shard") -> DataFrame:
    """Append ``shard_col`` ∈ [0, n_shards): deterministic content-keyed
    shard id. NULL keys raise at runtime (ANSI) rather than silently
    landing in shard 0 — a corpus id column must not be null."""
    if not 0 < n_shards <= (1 << 20):
        raise ValueError("n_shards must be in (0, 2^20]")
    keyed = F.col(key).cast("string")
    if seed:
        keyed = F.concat(keyed, F.lit(seed))
    hexval = F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")
    # 16^8 = 2^32, so the floor division is an exact unsigned shift;
    # hexval < 2^32 and n_shards <= 2^20 keep the product well under 2^63
    return df.withColumn(
        shard_col,
        F.shiftrightunsigned(hexval * F.lit(n_shards), 32).cast("int"))


def _shard_checksums(df: DataFrame, shard_col: str = "shard") -> DataFrame:
    cols = [c for c in df.columns if c != shard_col]
    row_json = F.to_json(F.struct(*[F.col(c) for c in sorted(cols)]))
    return (df.withColumn("_rj", row_json)
            .groupBy(shard_col)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.expr("bit_xor(xxhash64(_rj))").alias("checksum")))


def write_training_shards(df: DataFrame, path: str, *, n_shards: int,
                          key: str = "doc_id", seed: str = "") -> dict:
    """Shard ``df`` and write ``path/data/shard=<i>/`` parquet dirs plus
    an atomic ``path/manifest.json``. Returns the manifest dict:
    ``{"n_shards": N, "seed": ..., "key": ..., "shards": {"<i>":
    {"n_rows": n, "checksum": c}}, "total_rows": t}`` — counts and
    checksums computed from the files as written."""
    sharded = assign_shards(df, n_shards=n_shards, key=key, seed=seed)
    data_dir = os.path.join(path, "data")
    (sharded.repartition(n_shards, "shard")
     .write.mode("overwrite").partitionBy("shard").parquet(data_dir))
    spark = df.sparkSession
    written = spark.read.parquet(data_dir)
    stats = {int(r["shard"]): (int(r["n_rows"]), int(r["checksum"]))
             for r in _shard_checksums(written).collect()}
    manifest = {
        "n_shards": n_shards,
        "key": key,
        "seed": seed,
        "total_rows": sum(n for n, _ in stats.values()),
        "shards": {str(s): {"n_rows": n, "checksum": c}
                   for s, (n, c) in sorted(stats.items())},
    }
    tmp = os.path.join(path, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, "manifest.json"))
    return manifest


def verify_training_shards(spark: SparkSession, path: str) -> dict:
    """Re-scan an export and compare against its manifest. Returns
    ``{"ok": bool, "mismatched": [shard, ...], "missing": [...],
    "unexpected": [...]}`` — loader-side integrity check before a
    training run trusts the shards."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    written = spark.read.parquet(os.path.join(path, "data"))
    got = {int(r["shard"]): (int(r["n_rows"]), int(r["checksum"]))
           for r in _shard_checksums(written).collect()}
    want = {int(s): (v["n_rows"], v["checksum"])
            for s, v in manifest["shards"].items()}
    mismatched = sorted(s for s in got.keys() & want.keys()
                        if got[s] != want[s])
    missing = sorted(want.keys() - got.keys())
    unexpected = sorted(got.keys() - want.keys())
    return {"ok": not (mismatched or missing or unexpected),
            "mismatched": mismatched, "missing": missing,
            "unexpected": unexpected}
