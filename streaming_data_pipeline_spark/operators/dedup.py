"""(key, LSN) last-writer-wins dedup — the reference has NO dedup at all
(duplicates are written twice; SURVEY.md §2.1 "Streaming-only semantics"),
so this operator is new capability required by the north star.

Implementation: `groupBy(key).agg(max_by(struct(*), order))` — a single
hash aggregate with map-side partial aggregation, NOT a window
(`row_number` would force a full sort per key; `max_by` is
O(n) with partial combine — SURVEY.md §2.1 "Aggregations").

Hot-key salting: one (repo, path) key receiving a large fraction of a
batch (a bot rewriting one file) funnels into a single reducer. The
two-phase variant salts the first aggregation with
`pmod(xxhash64(lsn, commit), k)` so the hot key's rows combine across
k reducers, then a second (tiny) aggregation resolves the winner. The
salt is applied ONLY to the shuffle — never to the merge key
(SURVEY.md §7 "salting that preserves MERGE correctness").

Order key is `(lsn, commit)` — a total order even for exact duplicate
re-deliveries (same lsn ⇒ same row, so the tiebreak is inert but keeps
the aggregation deterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    key: Sequence[str] = ("repo", "path"),
    order: Sequence[str] = ("lsn", "commit"),
    salt_buckets: int = 8,
) -> DataFrame:
    """Return one row per key: the one with the greatest (lsn, commit).

    Output column order == input column order.

    Single-phase since r6: ``max_by`` is a declarative aggregate with a
    map-side PARTIAL phase (plan-pinned by test_plans.py's
    test_lww_resolve_is_partial_aggregated), so a hot key's rows are
    combined to ONE row per map task BEFORE the shuffle — per-reducer
    input for any key is bounded by the map-task count regardless of
    how skewed the batch is. The former two-phase salted variant
    (groupBy(key, salt) then groupBy(key)) addressed exactly that
    reducer flood, which partial aggregation already prevents; what it
    actually did was shuffle + sort the full-width batch TWICE
    (mostly-unique keys mean phase 1 barely reduces), doubling the most
    expensive exchange on the merge path — measured ~2x the dedup cost
    at 1M events. Salting remains the right tool only for aggregates
    WITHOUT a partial phase (collect_list-style buffers), which this is
    not. ``salt_buckets`` is retained for API compatibility and ignored.
    """
    del salt_buckets  # see docstring: partial aggregation makes it moot
    cols = df.columns
    row = F.struct(*[F.col(c) for c in cols])
    ordk = F.struct(*[F.col(c) for c in order])

    winners = df.groupBy(*key).agg(F.max_by(row, ordk).alias("_r"))
    return winners.select(*[F.col(f"_r.{c}").alias(c) for c in cols])


def exact_dedup(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal via hash-groupBy (maps to Spark's
    `dropDuplicates`, kept explicit for plan control). With ``cols``
    the first row per group by natural aggregation is NOT deterministic,
    so callers wanting determinism should use :func:`lww_dedup`.

    The default column set excludes MapType columns: maps are not
    groupable in Spark, so an all-columns dropDuplicates over any
    CHANGE_EVENT-shaped frame (payload map) would throw — on the
    engine's own primary record type."""
    if cols is None:
        # maps are not groupable anywhere in a column's type tree
        # (top-level, in structs, in arrays) — simpleString shows them all
        cols = [
            f.name for f in df.schema.fields if "map<" not in f.dataType.simpleString()
        ]
        if not cols:
            # dropDuplicates([]) would treat EVERY row as a duplicate and
            # silently return one arbitrary row
            raise ValueError(
                "exact_dedup: every column contains a map type; pass cols "
                "explicitly (e.g. key columns) or drop the map columns first"
            )
    return df.dropDuplicates(list(cols))
