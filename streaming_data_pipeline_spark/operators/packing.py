"""Sequence packing: documents → fixed-token-budget training windows.

The step between a curated shard and a training run: concatenate the
stratum's documents head-to-tail in a deterministic order and slice
the token stream into fixed-size context windows (the GPT-family
"concat and chunk" recipe). Each document is tagged with the sequence
it STARTS in and its offset there — a document whose tail crosses the
boundary simply continues into the next window, so no budget is ever
wasted on padding (reference has no counterpart; this serves the
north-star training-mix export).

Scale shape: one window aggregation per group — each group is packed
sequentially BY DEFINITION (sequences are a running prefix sum), so
groups must be executor-sized. Callers at corpus scale pass the same
(lang, hash-file-group) spec the export's shard writer uses
(plans/export.py `shard_repartition`): packing is then per shard
file, which is exactly how training loaders consume it, and the
window runs G-way parallel per stratum. Everything is codegen'd
column expressions over ONE shuffle (the window partitioning); no
Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import tokens_col


def pack_sequences(
    df: DataFrame,
    budget: int,
    *,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("lang",),
    order_cols: tuple[str, ...] = ("doc_id",),
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each document its training-sequence coordinates.

    Within each ``group_cols`` partition, documents ordered by
    ``order_cols`` form one token stream; ``seq_id`` is the
    ``budget``-sized window the document starts in, ``tok_start`` its
    absolute offset in the group stream, ``offset_in_seq`` its offset
    inside the window. Deterministic — same input, same packing — so
    re-exports reproduce byte-identical sequence assignments.

    ``keep_cols``: extra passthrough columns appended to the output
    (the export sidecar keeps (repo, path) so packed files stay sorted
    and debuggable by key without a join back to the index).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks: Column = tokens_col(F.col(text_col))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tokens = F.size(toks).cast("long").alias("n_tokens")
    cum = F.sum(F.size(toks).cast("long")).over(w)
    tok_start = (cum - F.size(toks)).cast("long")
    return df.select(
        id_col,
        *group_cols,
        *keep_cols,
        n_tokens,
        tok_start.alias("tok_start"),
        F.floor(tok_start / F.lit(budget)).cast("long").alias("seq_id"),
        (tok_start % F.lit(budget)).cast("long").alias("offset_in_seq"),
    )


def packing_stats(
    packed: DataFrame,
    budget: int,
    *,
    group_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Per-group packing summary. ``n_sequences`` counts the windows the
    group's token stream occupies (the last one partial);
    ``n_straddlers`` counts documents whose tail crosses a window
    boundary — the loader-side cost of padding-free packing, and the
    number a curator watches when choosing the budget (a straddler
    share near 1.0 means documents dwarf the context window)."""
    straddles = (
        F.col("tok_start") + F.col("n_tokens") > (F.col("seq_id") + 1) * F.lit(budget)
    )
    return packed.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.ceil(F.sum("n_tokens") / F.lit(budget)).cast("long").alias("n_sequences"),
        F.sum(straddles.cast("long")).alias("n_straddlers"),
    )
