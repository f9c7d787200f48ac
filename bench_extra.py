"""Per-query isolation harness for the optimization round (guide §1).

NOT the driver contract — ``bench.py`` is frozen for measurement. This
file exists to (a) time individual declared queries with the same session
config and ``.count()`` methodology as ``bench.py``'s headline loop,
(b) capture ``.explain("formatted")`` plans into ``plans/r06/``, and
(c) optionally time with the noop sink (guide §1.4) which computes every
column instead of letting ``count()`` prune.

Usage:
  python bench_extra.py <query> [<query> ...] [--sf SFDIR] [--runs N]
                        [--plan OUT.txt] [--noop]
  python bench_extra.py --headline            # all 15 headline queries
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = ["admission_round1", "politeness", "seen_antijoin", "host_agg",
            "dedup_exact", "token_count", "cosine_topk", "minhash_lsh",
            "corpus_curate", "curate_sample_cap", "pack_sequences",
            "asof_salted", "mix_corpus", "quantized_topk", "admission_fair"]


def _session(cores: int):
    from pyspark.sql import SparkSession
    builder = (SparkSession.builder
               .master(f"local[{cores}]")
               .appName(f"bench-extra-{cores}")
               .config("spark.sql.shuffle.partitions", str(cores * 2))
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.session.timeZone", "UTC")
               .config("spark.ui.enabled", "false")
               .config("spark.driver.memory", "24g"))
    if os.path.isdir("/dev/shm"):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    return builder.getOrCreate()


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    plan_out = None
    use_noop = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--plan":
            plan_out = args[i + 1]; i += 2
        elif a == "--noop":
            use_noop = True; i += 1
        elif a == "--headline":
            names = list(HEADLINE); i += 1
        else:
            names.append(a); i += 1

    import __spark_entry__ as entry_mod
    spark = _session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    if plan_out:
        assert len(names) == 1
        df = qs[names[0]](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(plan_out, "w") as fh:
            fh.write(plan)
        print(f"# plan -> {plan_out} ({len(plan)} chars)")

    # untimed warmup at the smallest SF (JIT/Arrow/python workers)
    t0 = time.time()
    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").count()
    print(f"# warmup: {time.time() - t0:.2f}s", file=sys.stderr)

    results = {}
    for r in range(runs):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} run{r + 1}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = time.time() - t0
            results.setdefault(name, []).append(round(dt, 3))
            print(f"# run {r + 1} {name}: {n} rows in {dt:.2f}s",
                  file=sys.stderr)
    for name, ts in results.items():
        print(f"{name}: min={min(ts):.3f} runs={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
