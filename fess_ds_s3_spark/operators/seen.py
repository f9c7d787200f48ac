"""URL-seen set (F5): exact ledger + partitioned bloom filter + cuckoo fallback.

Absent in the reference — an S3 listing is duplicate-free per bucket, so
fess-ds-s3 never deduplicates (its only "identity" is the crawler-stats key
``bucket@key``, AmazonS3DataStore.java:196). The north rule requires a
URL-seen set that scales to a 10^10-URL frontier, so this module provides:

1. **Exact ledger** — a ``seen`` table ``(url_hash:long, canonical_url:string)``;
   membership test is a plain ``left_anti`` join. This is the correctness
   oracle and the confirm step behind the bloom pre-filter.

2. **Partitioned bloom filter** — ``P = cfg.seen_partitions`` independent
   bitset blobs (P fixed in config, *independent of parallelism*, so results
   are deterministic across cluster sizes). A URL belongs to partition
   ``pmod(murmur3(url), P)`` and is hashed into the blob by double hashing
   ``pos_i = (h1 + i*h2) mod m`` with h1 = Murmur3-32 (``F.hash``) and
   h2 = xxhash64 (``F.xxhash64``), both computed JVM-side; the Python side
   only does vectorized numpy bit arithmetic inside Arrow-batched
   cogrouped/grouped pandas UDFs. No per-row Python.

3. **Cuckoo filter fallback** — same partitioning, but blobs are cuckoo
   tables (bucketed 16-bit fingerprints, 4 slots/bucket) supporting
   **deletion** (e.g. forced re-crawl of expired URLs), which blooms cannot.

Scale notes: blob size per partition is sized from ``bloom_expected`` /
``bloom_fpp``; membership at scale uses a **cogroup** on the partition id so
each task streams only its own partition's frontier rows + one blob —
no broadcast of the full filter, no blob duplication through a join.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (BinaryType, BooleanType, IntegerType, LongType,
                               StructField, StructType)

from fess_ds_s3_spark.config import CrawlConfig

BLOOM_SCHEMA = StructType([
    StructField("part_id", IntegerType(), False),
    StructField("bits", BinaryType(), False),
    StructField("m_bits", LongType(), False),
    StructField("k_hashes", IntegerType(), False),
])

CUCKOO_SCHEMA = StructType([
    StructField("part_id", IntegerType(), False),
    StructField("table", BinaryType(), False),   # uint16 fingerprints
    StructField("n_buckets", LongType(), False),
])

_CUCKOO_SLOTS = 4
_CUCKOO_MAX_KICKS = 500


def bloom_params(expected: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes); m rounded up to a byte multiple."""
    m = math.ceil(-expected * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / expected * math.log(2)))
    return m, k


def with_seen_keys(df: DataFrame, cfg: CrawlConfig,
                   url: str = "canonical_url") -> DataFrame:
    """Attach (part_id, h1, h2) — all JVM-side, whole-stage-codegen friendly."""
    return (
        df.withColumn("url_hash", F.xxhash64(url))
        .withColumn("part_id",
                    F.pmod(F.hash(url), F.lit(cfg.seen_partitions))
                    .cast("int"))
        .withColumn("h1", F.hash(url).cast("long"))
        # force h2 odd (SQL bitwise |) so double hashing cycles all m positions
        .withColumn("h2", F.expr(f"xxhash64(`{url}`) | 1L"))
    )


# ---------------------------------------------------------------------------
# numpy bit kernels (vectorized; shared by build and probe)
# ---------------------------------------------------------------------------

def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) int64 bit positions via double hashing; deterministic."""
    i = np.arange(k, dtype=np.int64)[None, :]
    with np.errstate(over="ignore"):
        pos = h1[:, None] + i * h2[:, None]  # int64 wraparound is fine
    return np.mod(pos, m)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.ravel()
    np.bitwise_or.at(bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """row-wise AND over k probes → bool[n] (all bits set = maybe seen)."""
    probes = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probes.all(axis=1)


# ---------------------------------------------------------------------------
# Bloom build / merge / probe
# ---------------------------------------------------------------------------

def build_bloom(df: DataFrame, cfg: CrawlConfig,
                url: str = "canonical_url") -> DataFrame:
    """Build per-partition bloom blobs from a URL DataFrame.

    One grouped-map pandas UDF per partition id; emits exactly one blob row
    per non-empty partition. This is the engine's only UDAF-like op
    (SURVEY.md §2.11).
    """
    m, k = bloom_params(cfg.bloom_expected, cfg.bloom_fpp)
    keyed = with_seen_keys(df, cfg, url).select("part_id", "h1", "h2")

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        pos = _positions(pdf["h1"].to_numpy(np.int64),
                         pdf["h2"].to_numpy(np.int64), k, m)
        _set_bits(bits, pos)
        return pd.DataFrame({
            "part_id": [int(pdf["part_id"].iloc[0])],
            "bits": [bits.tobytes()],
            "m_bits": [m], "k_hashes": [k],
        })

    return keyed.groupBy("part_id").applyInPandas(_build, BLOOM_SCHEMA)


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two bloom blob tables (same m/k) partition-wise.

    Raises if the rows being merged for one partition disagree on
    ``m_bits`` OR ``k_hashes``: an OR of bitsets built with different hash
    counts is NOT a bloom filter of their union — probing it with either k
    yields false negatives, re-admitting previously-seen URLs (the exact
    invariant the merge exists to protect)."""
    def _merge(_key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        frames = [x for x in (left, right) if len(x)]
        first = frames[0]
        m0 = int(first["m_bits"].iloc[0])
        k0 = int(first["k_hashes"].iloc[0])
        bits = np.zeros(len(first["bits"].iloc[0]), dtype=np.uint8)
        for frame in frames:
            for blob, m, k in zip(frame["bits"], frame["m_bits"],
                                  frame["k_hashes"]):
                if int(m) != m0 or int(k) != k0:
                    raise ValueError(
                        f"bloom part {int(first['part_id'].iloc[0])}: blob "
                        f"rows disagree on (m_bits, k_hashes): "
                        f"({m0}, {k0}) vs ({int(m)}, {int(k)}) — "
                        "cannot OR-merge filters with different parameters")
                bits |= np.frombuffer(blob, dtype=np.uint8)
        return pd.DataFrame({
            "part_id": [int(first["part_id"].iloc[0])],
            "bits": [bits.tobytes()],
            "m_bits": [m0],
            "k_hashes": [k0],
        })

    return (a.groupBy("part_id").cogroup(b.groupBy("part_id"))
            .applyInPandas(_merge, BLOOM_SCHEMA))


#: broadcast the whole filter when its payload is below this (driver+executor
#: memory trade-off; at 10^10-URL scale blobs exceed this and cogroup is used)
BLOOM_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def bloom_maybe_seen_broadcast(frontier: DataFrame, blobs: list,
                               cfg: CrawlConfig,
                               url: str = "canonical_url",
                               flag: str = "maybe_seen") -> DataFrame:
    """Shuffle-free probe: blobs (collected rows) are broadcast to executors
    and tested in a scalar pandas UDF — one narrow projection, stays in the
    same stage as the scan. The fast path whenever the filter fits in
    memory (a 10^8-URL seen-set at 1% fpp is ~120 MB — broadcastable).
    """
    spark = frontier.sparkSession
    # OR-merge duplicate part_id rows (appended deltas / unioned tables):
    # dropping any blob row would silently lose filter state and admit
    # duplicates — a malformed table must still probe correctly.
    blob_map: dict[int, tuple] = {}
    for r in blobs:
        pid = int(r["part_id"])
        bits = np.frombuffer(r["bits"], dtype=np.uint8)
        if pid in blob_map:
            prev = blob_map[pid]
            if (len(prev[0]) != len(bits)
                    or prev[1] != int(r["m_bits"])
                    or prev[2] != int(r["k_hashes"])):
                raise ValueError(
                    f"bloom part {pid}: blob rows disagree on "
                    "(m_bits, k_hashes) — cannot OR-merge filters with "
                    "different parameters")
            bits = prev[0] | bits
        blob_map[pid] = (bits, int(r["m_bits"]), int(r["k_hashes"]))
    bc = spark.sparkContext.broadcast(blob_map)

    @pandas_udf(BooleanType())
    def _probe(part_id: pd.Series, h1: pd.Series, h2: pd.Series) -> pd.Series:
        blobs_local = bc.value
        pid = part_id.to_numpy(np.int64)
        h1n = h1.to_numpy(np.int64)
        h2n = h2.to_numpy(np.int64)
        out = np.zeros(len(pid), dtype=bool)
        for p in np.unique(pid):
            entry = blobs_local.get(int(p))
            if entry is None:
                continue
            bits, m, k = entry
            mask = pid == p
            pos = _positions(h1n[mask], h2n[mask], k, m)
            out[mask] = _test_bits(bits, pos)
        return pd.Series(out)

    # The probe is a pure function of the URL, but it is declared
    # NONDETERMINISTIC on purpose: filter_unseen branches on the flag
    # (definitely-new / needs-confirm), and because the flag depends only
    # on the upstream aggregate's GROUPING KEY, Catalyst may push each
    # branch's filter below the dedup aggregate — legal row-wise, but it
    # specializes the exchange input per branch, defeating ReuseExchange
    # and re-executing the whole scan+partial-agg+probe subtree per branch
    # (measured: a second full-scale 32-task stage, +185 CPU-s at 32M
    # rows). Blocking reordering keeps one shared Exchange; per-row
    # results are unchanged (pure function), which the equivalence tests
    # pin. Same class of bug as the r1 canonicalize double-eval
    # (filter-through-window); the plan shape is asserted in
    # tests/test_invariance.py.
    _probe = _probe.asNondeterministic()

    keyed = with_seen_keys(frontier, cfg, url)
    return (keyed.withColumn(flag, _probe(F.col("part_id"), F.col("h1"),
                                          F.col("h2")))
            .drop("h1", "h2"))


def bloom_maybe_seen(frontier: DataFrame, blooms: DataFrame, cfg: CrawlConfig,
                     url: str = "canonical_url",
                     flag: str = "maybe_seen") -> DataFrame:
    """Probe: frontier + blob tables cogrouped on part_id → frontier rows
    with a ``maybe_seen`` boolean. False ⇒ definitely unseen (bloom
    guarantee); True ⇒ confirm against the exact ledger.

    This is the at-scale path (no driver collection); prefer
    :func:`maybe_seen_auto` which broadcasts when the filter is small.
    """
    keyed = with_seen_keys(frontier, cfg, url)
    out_schema = StructType(
        [f for f in keyed.schema.fields if f.name not in ("h1", "h2")]
        + [StructField(flag, BooleanType(), False)])
    carry = [c for c in keyed.columns if c not in ("h1", "h2")]

    def _probe(_key, rows: pd.DataFrame, blobs: pd.DataFrame) -> pd.DataFrame:
        if not len(rows):
            return pd.DataFrame(columns=carry + [flag])
        if not len(blobs):
            out = rows[carry].copy()
            out[flag] = False
            return out
        # OR-merge every blob row for this partition (see broadcast path)
        m = int(blobs["m_bits"].iloc[0])
        k = int(blobs["k_hashes"].iloc[0])
        bits = np.frombuffer(blobs["bits"].iloc[0], dtype=np.uint8)
        for idx in range(1, len(blobs)):
            more = np.frombuffer(blobs["bits"].iloc[idx], dtype=np.uint8)
            if (len(more) != len(bits) or int(blobs["m_bits"].iloc[idx]) != m
                    or int(blobs["k_hashes"].iloc[idx]) != k):
                raise ValueError(
                    "bloom blob rows disagree on (m_bits, k_hashes) — "
                    "cannot OR-merge filters with different parameters")
            bits = bits | more
        pos = _positions(rows["h1"].to_numpy(np.int64),
                         rows["h2"].to_numpy(np.int64), k, m)
        out = rows[carry].copy()
        out[flag] = _test_bits(bits, pos)
        return out

    return (keyed.groupBy("part_id").cogroup(blooms.groupBy("part_id"))
            .applyInPandas(_probe, out_schema))


def bloom_size_bytes(cfg: CrawlConfig) -> int:
    """Total blob payload for a full filter at this config (metadata-only)."""
    m, _ = bloom_params(cfg.bloom_expected, cfg.bloom_fpp)
    return cfg.seen_partitions * (m // 8)


def maybe_seen_auto(frontier: DataFrame, blooms: DataFrame, cfg: CrawlConfig,
                    url: str = "canonical_url",
                    flag: str = "maybe_seen",
                    size_bytes: int | None = None) -> DataFrame:
    """Pick the probe strategy by filter size: collect+broadcast when the
    blob payload is ≤ BLOOM_BROADCAST_MAX_BYTES (shuffle-free, branch-safe),
    else the cogrouped streaming probe.

    ``size_bytes``: known total blob payload. When the caller can supply it
    (the crawl driver carries it in the ``seen_bloom`` snapshot metadata;
    any caller can derive it from config via :func:`bloom_size_bytes`), the
    strategy choice costs ZERO Spark jobs. When absent, it falls back to
    ``cfg`` sizing (still job-free) — the per-round ``first()+count()``
    probe this function used to run added fixed driver latency × n_rounds.

    The estimate is re-checked against the ACTUAL collected payload: a
    blooms table built under a different config than ``cfg`` (e.g. a resume
    after changing ``bloom_expected``/``seen_partitions``) can dwarf the
    estimate, and the collect has already paid the driver-memory cost — but
    re-broadcasting it to every executor would multiply the damage, so an
    estimate that undershoots falls back to the cogrouped streaming probe."""
    if size_bytes is None:
        size_bytes = bloom_size_bytes(cfg)
    if size_bytes <= BLOOM_BROADCAST_MAX_BYTES:
        rows = blooms.collect()
        actual = sum(len(r["bits"]) for r in rows)
        if actual <= BLOOM_BROADCAST_MAX_BYTES:
            return bloom_maybe_seen_broadcast(frontier, rows, cfg, url, flag)
    return bloom_maybe_seen(frontier, blooms, cfg, url, flag)


def anti_join_seen_exact(frontier: DataFrame, seen: DataFrame,
                         url: str = "canonical_url") -> DataFrame:
    """J4 exact anti-join: keep frontier rows whose URL is NOT in ``seen``.

    ``seen`` needs only a ``canonical_url`` column. This is the correctness
    oracle; at scale, call :func:`filter_unseen` instead (bloom pre-filter
    shrinks the join's left side to bloom-positive rows only).
    """
    return frontier.join(
        seen.select(F.col(url)).distinct(), on=url, how="left_anti")


def filter_unseen(frontier: DataFrame, seen_exact: DataFrame,
                  blooms: DataFrame | None, cfg: CrawlConfig,
                  url: str = "canonical_url",
                  bloom_size_bytes: int | None = None) -> DataFrame:
    """Scale path: bloom pre-filter → exact confirm, union definite-new rows.

    Identical output to :func:`anti_join_seen_exact` (bloom has no false
    negatives); the exact join's left side shrinks to ``fpp × |frontier|``
    + true duplicates.

    Plan-shape note: this branches (definitely-new / needs-confirm) and
    unions. Call it AFTER the pipeline's first shuffle so both branches hang
    off the same Exchange and Spark's ReuseExchange computes the upstream
    (scan + canonicalize UDF) once — measured 10× cheaper than persisting
    the flagged frame (columnar cache build of wide string rows dominates).
    plans/round.py orders the round accordingly (dedup shuffle first).
    """
    if blooms is None:
        return anti_join_seen_exact(frontier, seen_exact, url)
    flagged = maybe_seen_auto(frontier, blooms, cfg, url,
                              size_bytes=bloom_size_bytes)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    needs_confirm = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = anti_join_seen_exact(needs_confirm, seen_exact, url)
    return definitely_new.unionByName(confirmed_new)


def filter_unseen_cuckoo(frontier: DataFrame, seen_exact: DataFrame,
                         cuckoo_blobs: DataFrame, cfg: CrawlConfig,
                         url: str = "canonical_url") -> DataFrame:
    """Cuckoo-filter variant of :func:`filter_unseen` (the deletable
    seen-set, F5 fallback): cuckoo pre-filter → exact confirm of the
    maybe-seen rows, union definite-new rows. Identical output to the
    exact anti-join — cuckoo filters, like blooms, have no false negatives
    (fingerprint+bucket of a stored key always probes positive)."""
    flagged = cuckoo_maybe_seen(frontier, cuckoo_blobs, cfg, url)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    needs_confirm = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = anti_join_seen_exact(needs_confirm, seen_exact, url)
    return definitely_new.unionByName(confirmed_new)


# ---------------------------------------------------------------------------
# Cuckoo filter fallback (supports delete)
# ---------------------------------------------------------------------------

def _cuckoo_fingerprint(h1: np.ndarray) -> np.ndarray:
    fp = (h1.astype(np.uint64) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _cuckoo_index2(i1: np.ndarray, fp: np.ndarray, n: int) -> np.ndarray:
    # partner bucket: i2 = (i1 ^ (fp * 0x5bd1e995)) mod n  (murmur-mix)
    mix = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(2**63 - 1)
    return np.mod(i1.astype(np.uint64) ^ mix, np.uint64(n)).astype(np.int64)


class _CuckooTable:
    """In-UDF cuckoo table over a uint16 array of n_buckets × 4 slots."""

    def __init__(self, table: np.ndarray, n_buckets: int):
        self.t = table.reshape(n_buckets, _CUCKOO_SLOTS)
        self.n = n_buckets

    def _try_put(self, bucket: int, fp: int) -> bool:
        row = self.t[bucket]
        empty = np.where(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def insert(self, i1: int, fp: int) -> bool:
        i2 = int(_cuckoo_index2(np.array([i1]), np.array([fp], np.uint16),
                                self.n)[0])
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            return True
        # kick: deterministic slot choice (no RNG → reproducible blobs)
        bucket, cur = i1, fp
        for kick in range(_CUCKOO_MAX_KICKS):
            slot = kick % _CUCKOO_SLOTS
            cur, self.t[bucket, slot] = int(self.t[bucket, slot]), cur
            bucket = int(_cuckoo_index2(
                np.array([bucket]), np.array([cur], np.uint16), self.n)[0])
            if self._try_put(bucket, cur):
                return True
        return False  # table over-full; caller sizes tables to avoid this

    def delete(self, i1: int, fp: int) -> bool:
        i2 = int(_cuckoo_index2(np.array([i1]), np.array([fp], np.uint16),
                                self.n)[0])
        for b in (i1, i2):
            row = self.t[b]
            hit = np.where(row == fp)[0]
            if len(hit):
                row[hit[0]] = 0
                return True
        return False

    def contains(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        i2 = _cuckoo_index2(i1, fp, self.n)
        in1 = (self.t[i1] == fp[:, None]).any(axis=1)
        in2 = (self.t[i2] == fp[:, None]).any(axis=1)
        return in1 | in2


def cuckoo_capacity(expected: int) -> int:
    """Buckets for ~95% load headroom, power of two for cheap mod."""
    need = math.ceil(expected / (_CUCKOO_SLOTS * 0.84))
    return 1 << max(4, (need - 1).bit_length())


def build_cuckoo(df: DataFrame, cfg: CrawlConfig,
                 url: str = "canonical_url") -> DataFrame:
    """Build per-partition cuckoo blobs (deletable seen-set)."""
    n_buckets = cuckoo_capacity(cfg.bloom_expected)
    keyed = with_seen_keys(df, cfg, url).select("part_id", "h1")

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros(n_buckets * _CUCKOO_SLOTS, dtype=np.uint16)
        ck = _CuckooTable(table, n_buckets)
        h1 = pdf["h1"].to_numpy(np.int64)
        fp = _cuckoo_fingerprint(h1)
        i1 = np.mod(h1.astype(np.uint64), np.uint64(n_buckets)).astype(np.int64)
        for a, b in zip(i1.tolist(), fp.tolist()):
            ck.insert(a, b)
        return pd.DataFrame({
            "part_id": [int(pdf["part_id"].iloc[0])],
            "table": [table.tobytes()],
            "n_buckets": [n_buckets],
        })

    return keyed.groupBy("part_id").applyInPandas(_build, CUCKOO_SCHEMA)


def cuckoo_update(blobs: DataFrame, changes: DataFrame, cfg: CrawlConfig,
                  url: str = "canonical_url", op: str = "op") -> DataFrame:
    """Apply ±deltas (op ∈ {'add','del'}) to cuckoo blobs, cogrouped."""
    keyed = with_seen_keys(changes, cfg, url).select("part_id", "h1", F.col(op))
    n_default = cuckoo_capacity(cfg.bloom_expected)

    def _apply(_key, ops: pd.DataFrame, blob: pd.DataFrame) -> pd.DataFrame:
        if len(blob):
            n = int(blob["n_buckets"].iloc[0])
            table = np.frombuffer(blob["table"].iloc[0], dtype=np.uint16).copy()
        else:
            n = n_default
            table = np.zeros(n * _CUCKOO_SLOTS, dtype=np.uint16)
        ck = _CuckooTable(table, n)
        pid = (int(ops["part_id"].iloc[0]) if len(ops)
               else int(blob["part_id"].iloc[0]))
        if len(ops):
            h1 = ops["h1"].to_numpy(np.int64)
            fp = _cuckoo_fingerprint(h1)
            i1 = np.mod(h1.astype(np.uint64), np.uint64(n)).astype(np.int64)
            for a, b, o in zip(i1.tolist(), fp.tolist(), ops[op].tolist()):
                (ck.delete if o == "del" else ck.insert)(a, b)
        return pd.DataFrame({"part_id": [pid], "table": [table.tobytes()],
                             "n_buckets": [n]})

    return (keyed.groupBy("part_id").cogroup(blobs.groupBy("part_id"))
            .applyInPandas(_apply, CUCKOO_SCHEMA))


def cuckoo_maybe_seen(frontier: DataFrame, blobs: DataFrame, cfg: CrawlConfig,
                      url: str = "canonical_url",
                      flag: str = "maybe_seen") -> DataFrame:
    """Probe cuckoo blobs; same contract as :func:`bloom_maybe_seen`."""
    keyed = with_seen_keys(frontier, cfg, url)
    carry = [c for c in keyed.columns if c not in ("h1", "h2")]
    out_schema = StructType(
        [f for f in keyed.schema.fields if f.name not in ("h1", "h2")]
        + [StructField(flag, BooleanType(), False)])

    def _probe(_key, rows: pd.DataFrame, blob: pd.DataFrame) -> pd.DataFrame:
        if not len(rows):
            return pd.DataFrame(columns=carry + [flag])
        out = rows[carry].copy()
        if not len(blob):
            out[flag] = False
            return out
        h1 = rows["h1"].to_numpy(np.int64)
        fp = _cuckoo_fingerprint(h1)
        # cuckoo tables can't be bit-merged — probe EVERY blob row and OR
        # the verdicts, so appended deltas never silently lose state
        hits = np.zeros(len(rows), dtype=bool)
        for idx in range(len(blob)):
            n = int(blob["n_buckets"].iloc[idx])
            table = np.frombuffer(blob["table"].iloc[idx], dtype=np.uint16)
            ck = _CuckooTable(table.copy(), n)
            i1 = np.mod(h1.astype(np.uint64), np.uint64(n)).astype(np.int64)
            hits |= ck.contains(i1, fp).astype(bool)
        out[flag] = hits
        return out

    return (keyed.groupBy("part_id").cogroup(blobs.groupBy("part_id"))
            .applyInPandas(_probe, out_schema))
