"""Deterministic hash sampling for corpus curation.

A training-data pipeline subsamples a crawled corpus constantly — to cut
cost, to build held-out splits, to ablate. ``F.rand(seed)`` is unusable
for that at scale: its value depends on row order within a partition, so
a repartition (or AQE re-plan) silently changes the sample. The standard
fix is CONTENT-keyed sampling: hash a stable key (the document id), keep
the row iff the hash falls below a rate threshold. The sample is then a
pure function of the data — identical across runs, partitionings, engines
and cluster sizes, and the complement is exactly the rejected set.

Implementation: compare the first 8 hex chars of ``md5(key || seed)``
lexicographically against ``floor(num/den * 16^8)`` rendered as 8-hex.
Lowercase-hex strings order exactly like their numeric values, and every
engine renders md5 identically, so a DuckDB oracle reproduces the sample
bit-for-bit (the driver's correctness gate relies on this). The rate is
quantized to a multiple of 16^-8 (~4e-10) — exact whenever ``den``
divides 16^8, off by < 1 key in 4 billion otherwise.

The same keyed-hash trick is what the seen-set uses for partitioning
(operators/seen.py) — here it buys reproducible *selection* rather than
reproducible *placement*.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: hex digits compared; 8 → thresholds live in [0, 16^8] = [0, 2^32]
_HEX_DIGITS = 8
_SPACE = 16 ** _HEX_DIGITS


def sample_threshold_hex(num: int, den: int) -> str:
    """``floor(num/den * 16^8)`` as zero-padded lowercase hex.

    The keep predicate is ``hex8(md5(key)) < threshold``; ``num == den``
    keeps everything and ``num == 0`` keeps nothing (both exact).
    """
    if den <= 0:
        raise ValueError("sample rate denominator must be positive")
    if not 0 <= num <= den:
        raise ValueError("sample rate must satisfy 0 <= num <= den")
    return format((num * _SPACE) // den, f"0{_HEX_DIGITS}x")


def hash_sample(key: Column | str, num: int, den: int,
                seed: str = "") -> Column:
    """Boolean keep-predicate: deterministic ``num/den`` sample keyed on
    ``key`` (cast to string; NULL keys are never kept — md5(NULL) is NULL
    and the comparison is null-rejecting, same as the SQL oracle).

    ``seed`` is appended to the key before hashing, so different seeds
    draw independent samples from the same corpus (e.g. a train/eval
    split uses two seeds, or one seed with complementary thresholds).

    Oracle equivalent (DuckDB / ANSI SQL)::

        substr(md5(CAST(key AS VARCHAR) || 'seed'), 1, 8)
            < '<sample_threshold_hex(num, den)>'
    """
    col = F.col(key) if isinstance(key, str) else key
    keyed = col.cast("string")
    if seed:
        keyed = F.concat(keyed, F.lit(seed))
    threshold = sample_threshold_hex(num, den)
    if (num * _SPACE) // den >= _SPACE:
        # 'ffffffff' < '10000000' would be False lexicographically even
        # though 16^8 is the full space — short-circuit the keep-all rate
        return col.isNotNull()
    return F.substring(F.md5(keyed), 1, _HEX_DIGITS) < F.lit(threshold)


def hash_split(key: Column | str, weights: dict[str, int],
               seed: str = "") -> Column:
    """Label column for a deterministic multi-way split (train/eval/test):
    each key's hash lands in exactly one contiguous hex range, sized
    ``weight / sum(weights)``. Being keyed on content, the split is a
    partition of the corpus — exhaustive, disjoint, reproducible across
    runs, engines and cluster sizes — and a document can never migrate
    between train and eval when the pipeline is re-run or re-partitioned
    (the leakage mode ``randomSplit`` invites). NULL keys get a NULL
    label.

    ``weights`` maps label → integer weight, iterated in insertion order
    (cumulative thresholds, so the FIRST labels own the LOW hash ranges;
    keep the dict order stable across runs).

    Oracle equivalent: chained ``CASE WHEN hex8 < '<t1>' THEN l1 WHEN
    hex8 < '<t2>' THEN l2 ... END`` with the same cumulative thresholds.
    """
    if not weights:
        raise ValueError("hash_split needs at least one label")
    total = sum(weights.values())
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("hash_split weights must be >= 0 with a "
                         "positive sum")
    col = F.col(key) if isinstance(key, str) else key
    keyed = col.cast("string")
    if seed:
        keyed = F.concat(keyed, F.lit(seed))
    hex8 = F.substring(F.md5(keyed), 1, _HEX_DIGITS)
    labels = list(weights)
    out = None
    cum = 0
    for label in labels[:-1]:
        cum += weights[label]
        cond = hex8 < F.lit(sample_threshold_hex(cum, total))
        out = F.when(cond, F.lit(label)) if out is None \
            else out.when(cond, F.lit(label))
    last = F.when(col.isNotNull(), F.lit(labels[-1]))
    return last if out is None else out.otherwise(last)
