"""Token-budget sequence packing: assign curated documents to fixed-size
training sequences.

The last hop of a training-data pipeline turns a bag of documents into
sequences of ~``budget`` tokens. The classic greedy packer ("close the
bin when the next doc doesn't fit") is a SEQUENTIAL, non-associative
fold — it cannot be expressed as a distributed aggregate without giving
up determinism or single-pass execution. This operator deliberately uses
the other standard recipe — fixed-stride packing: documents are laid out
contiguously in a deterministic order and a sequence boundary falls every
``budget`` tokens; a document that straddles a boundary belongs to the
sequence where it STARTS (sequences can overshoot by at most one doc —
the trainer's own chunking handles the tail, exactly as it does for
documents longer than the context window).

That definition is a pure window expression:

    seq_id = floor(cum_tokens_before / budget)

so Catalyst plans it as ONE shuffle (on the shard key) + an in-partition
running sum — no driver fold, no iteration, and bit-identical output for
any partitioning of the input.

Sharding: a global layout order would need a single total sort — the
anti-scale shape — so packing is per-shard: documents are hashed into
``shards`` independent layout groups and packed within each. At 100 TB,
``shards`` sizes the sort tasks (corpus_tokens / shards per task) and
sequences never cross shards, so executors pack in parallel and a shard
re-pack touches only that shard. Shard assignment defaults to
``xxhash64(id) % shards`` (uniform, content-keyed); pass ``shard=`` to
override — e.g. an oracle-friendly ``id % shards``, or a curriculum key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fess_ds_s3_spark.functions.text import token_count_ws


def pack_sequences(df: DataFrame, tokens_col: str,
                   id_col: str = "doc_id", *,
                   budget: int, shards: int = 1024,
                   shard: Column | None = None,
                   within: Sequence[str] = (),
                   out_shard: str = "shard",
                   out_seq: str = "seq_id",
                   out_offset: str = "seq_offset") -> DataFrame:
    """Add ``(shard, seq_id, seq_offset)`` to every document row.

    ``seq_id`` numbers sequences within a shard (0-based); ``seq_offset``
    is the document's token offset inside its sequence. Documents are
    laid out in ascending ``id_col`` order within each shard — ``id_col``
    must be unique per shard for the layout to be a total order.

    ``within`` names columns that additionally scope the layout — e.g.
    the train/eval split label: sequences then never span two ``within``
    values (an eval doc can never be packed into a train sequence), at
    zero extra shuffles (the scope columns just join the partition key).

    The mapping is a pure function of ``(id, tokens, shard)``: stable
    under repartitioning, resumable, and reproducible by any engine with
    window aggregates (the correctness gate's DuckDB oracle runs the
    same SUM OVER).
    """
    if budget < 1:
        raise ValueError("pack_sequences needs budget >= 1")
    if shard is None:
        if shards < 1:
            raise ValueError("pack_sequences needs shards >= 1")
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    shard = shard.cast("int")
    out = df.withColumn(out_shard, shard)
    w = (Window.partitionBy(*within, out_shard)
         .orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    # integer-exact split of cum_before into (seq, offset): pmod then an
    # exactly-divisible division — no float boundary at any magnitude
    off = F.pmod(cum_before, F.lit(budget)).cast("long")
    seq = ((cum_before - off) / F.lit(budget)).cast("long")
    return (out.withColumn(out_seq, seq).withColumn(out_offset, off))


def interleaved_token_cost(spans: Column | str = "spans", *,
                           media_tokens: int = 64) -> Column:
    """Training-token cost of an interleaved document: whitespace tokens
    of every text span plus a flat ``media_tokens`` per media span (the
    stand-in for the fixed patch/frame budget a multimodal trainer
    charges per image — e.g. a ViT tokenizer emitting a constant token
    count per tile). One per-row array fold, no explode, no shuffle.

    NULL-text text spans cost 0; media spans cost ``media_tokens``
    regardless of their (NULL) text."""
    def step(acc: Column, s: Column) -> Column:
        text_cost = F.coalesce(token_count_ws(s["text"]), F.lit(0))
        return acc + F.when(s["kind"] == F.lit("media"),
                            F.lit(media_tokens)).otherwise(text_cost)
    spans = F.col(spans) if isinstance(spans, str) else spans
    return F.aggregate(spans, F.lit(0).cast("long"), step)


def pack_interleaved(docs: DataFrame, spans: str = "spans",
                     id_col: str = "doc_id", *,
                     budget: int, media_tokens: int = 64,
                     shards: int = 1024,
                     shard: Column | None = None,
                     within: Sequence[str] = (),
                     out_tokens: str = "tokens") -> DataFrame:
    """:func:`pack_sequences` over interleaved text + media documents:
    the per-doc cost is :func:`interleaved_token_cost` (text tokens +
    ``media_tokens`` per media span), appended as ``out_tokens``; layout
    semantics (fixed stride, shard-scoped, ``within``-scoped) are
    exactly those of :func:`pack_sequences`. Same single shuffle on the
    shard key — the cost column is computed map-side in the same stage."""
    costed = docs.withColumn(
        out_tokens, interleaved_token_cost(spans, media_tokens=media_tokens))
    return pack_sequences(costed, out_tokens, id_col, budget=budget,
                          shards=shards, shard=shard, within=within)
