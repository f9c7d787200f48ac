"""Local stand-in for the driver's correctness gate: runs every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over
the same parquet dir, compares row count, column names, and an
order-insensitive value hash. Usage:

    PYTHONPATH=/root/repo python scripts/check_entry.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = ["\x1f".join(norm_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    from pyspark.sql import SparkSession
    import __spark_entry__ as entry_mod

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: SPARK ERROR {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:200]}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows, cols="
                  f"{sorted(sdf.columns)} [no oracle] ({t1-t0:.1f}s)")
            if len(sdf) == 0 and name != "noop":
                print(f"      WARNING {name}: 0 rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: DUCKDB ERROR: "
                  f"{str(exc).splitlines()[0][:200]}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs "
                            f"{sorted(odf.columns)}")
        else:
            # The driver's hasher is type-strict (1.0 != 1), but norm_cell
            # folds integral floats.  Catch the class norm_cell masks: an
            # int column on one side vs a float column on the other (e.g.
            # DuckDB HUGEINT -> float64 from SUM over INT while Spark emits
            # BIGINT).  A float column that is float only because it holds
            # NULLs appears on both sides symmetrically, so int-vs-float
            # here is a real oracle type divergence.
            for c in sorted(sdf.columns):
                ks, ko = sdf[c].dtype.kind, odf[c].dtype.kind
                if {ks, ko} <= {"i", "u", "f"} and ("f" in (ks, ko)) and (
                        ks not in "f" or ko not in "f"):
                    problems.append(
                        f"dtype-kind mismatch col={c}: spark={sdf[c].dtype}"
                        f" vs oracle={odf[c].dtype} (driver hasher is"
                        f" type-strict)")
        if not problems and value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            # show a diff sample
            s = sdf[sorted(sdf.columns)].astype(str).apply(
                "|".join, axis=1).sort_values().reset_index(drop=True)
            o = odf[sorted(odf.columns)].astype(str).apply(
                "|".join, axis=1).sort_values().reset_index(drop=True)
            ss, oo = set(s), set(o)
            print("   spark-only:", list(ss - oo)[:3])
            print("   duck-only :", list(oo - ss)[:3])
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(sdf)} rows ({t1-t0:.1f}s)")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
