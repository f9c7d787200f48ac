"""Benchmark entry point (driver contract).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "scaling": {"n_cores": ..., "urls_per_sec_n": ...,
               "n4_cores": ..., "urls_per_sec_4n": ..., "efficiency": ...}}

Two parts:

1. **Headline queries** at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
   ``local[$SPARK_GRAFT_CPUS]`` — the flagship scheduling round + the
   heavier training-data ops.
2. **North-rule scaling evidence** (BASELINE.md): the same schedule+dedup
   job (canonicalize → bloom+exact seen anti-join → in-batch dedup →
   salted politeness admission) over an identical deterministic synthetic
   frontier (hash-sparse 10^10 keyspace) at N and 4N cores, each in a
   FRESH subprocess JVM; reports URLs/s at both and
   efficiency = (throughput_4N / throughput_N) / 4.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_BENCH_ROWS (default 2_000_000), SPARK_GRAFT_SKIP_SCALING=1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))

HEADLINE = ["admission_round1", "politeness", "seen_antijoin", "host_agg",
            "dedup_exact", "token_count", "cosine_topk", "minhash_lsh"]


def _session(cores: int, shuffle_partitions: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder
            .master(f"local[{cores}]")
            .appName(f"bench-{cores}")
            .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "24g")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
            .getOrCreate())


# ---------------------------------------------------------------------------
# scaling worker (runs in its own JVM/subprocess)
# ---------------------------------------------------------------------------

def _scaling_job(cores: int) -> dict:
    """Schedule+dedup one round over a synthetic frontier; returns timing."""
    from pyspark.sql import functions as F
    from fess_ds_s3_spark.config import CrawlConfig
    from fess_ds_s3_spark.operators import seen as seen_ops
    from fess_ds_s3_spark.plans import round as round_plan
    from fess_ds_s3_spark.sources.synthetic import synth_frontier

    spark = _session(cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CrawlConfig(region="us-east-1", default_host_budget=2000,
                      salt_threshold=50_000, salt_buckets=8,
                      bloom_expected=max(BENCH_ROWS // 64, 1000),
                      seen_partitions=64)
    n_hosts = 2000
    frontier = synth_frontier(spark, BENCH_ROWS, n_hosts=n_hosts,
                              n_buckets=200, seed=42,
                              partitions=cores * 2)
    # pre-existing seen set: 10% of the keyspace rows (deterministic)
    seen_urls = (synth_frontier(spark, BENCH_ROWS // 10, n_hosts=n_hosts,
                                n_buckets=200, seed=42,
                                partitions=cores * 2)
                 .select(F.col("url").alias("canonical_url")))
    # warm-up: materialize inputs to parquet so we time the pipeline, not
    # the generator
    wh = f"/tmp/bench-wh-{cores}-{os.getpid()}"
    frontier.write.mode("overwrite").parquet(f"{wh}/frontier")
    seen_urls.write.mode("overwrite").parquet(f"{wh}/seen")
    frontier = spark.read.parquet(f"{wh}/frontier")
    seen_urls = spark.read.parquet(f"{wh}/seen")

    t0 = time.time()
    blooms = seen_ops.build_bloom(seen_urls, cfg)
    admitted = round_plan.schedule(
        frontier, cfg, seen_exact=seen_urls, blooms=blooms,
        use_salting=True)
    n_admitted = admitted.count()
    wall = time.time() - t0
    n_input = BENCH_ROWS
    spark.stop()
    import shutil
    shutil.rmtree(wh, ignore_errors=True)
    return {"cores": cores, "input_urls": n_input,
            "admitted": n_admitted, "wall_sec": round(wall, 2),
            "urls_per_sec": round(n_input / wall, 1)}


def _run_scaling_subprocess(cores: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--scaling-worker",
         str(cores)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"scaling worker {cores} failed: "
                           f"{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


# ---------------------------------------------------------------------------
# headline queries
# ---------------------------------------------------------------------------

def _run_headline() -> tuple[dict, float]:
    import __spark_entry__ as entry_mod
    spark = _session(CPUS, shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    timings = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
    spark.stop()
    return timings, total


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-worker":
        print(json.dumps(_scaling_job(int(sys.argv[2]))))
        return

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings, total = _run_headline()

    result = {
        "metric": "headline query wall time at sf (see queries) + "
                  "URLs scheduled+deduped per second (see scaling)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        n = max(CPUS // 4, 1)
        lo = _run_scaling_subprocess(n)
        hi = _run_scaling_subprocess(CPUS)
        efficiency = (hi["urls_per_sec"] / lo["urls_per_sec"]) / (CPUS / n)
        result["scaling"] = {
            "n_cores": lo["cores"],
            "urls_per_sec_n": lo["urls_per_sec"],
            "wall_sec_n": lo["wall_sec"],
            "n4_cores": hi["cores"],
            "urls_per_sec_4n": hi["urls_per_sec"],
            "wall_sec_4n": hi["wall_sec"],
            "efficiency": round(efficiency, 3),
            "input_urls": lo["input_urls"],
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
