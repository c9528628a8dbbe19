"""Event-time windowed aggregations over the change stream.

The reference has NO event-time semantics — no watermarks, no windows,
no late-data handling (SURVEY.md §2.1 'Streaming-only semantics'); its
only aggregates are in-memory counters. These operators add the
standard Structured Streaming shapes over the change-event envelope:

- windowed_change_rates: tumbling/sliding change counts per op with a
  watermark bounding state for late events;
- repo_activity_sessions: session windows (gap-based) per repo —
  'bursts of commits' analytics;
- windowed_change_rates_batch: the same aggregation expressed on a
  batch DataFrame (identical plan shape minus the watermark), used by
  the DuckDB-oracle correctness gate since streaming sinks can't be
  value-hash compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_change_rates(
    stream: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "5 minutes",
) -> DataFrame:
    """Streaming: change counts + distinct-repo estimate per (window, op).
    The watermark bounds aggregation state: events later than it are
    dropped from the aggregate (and would be routed to the DLQ by an
    upstream filter if auditing is required)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.approx_count_distinct("repo").alias("approx_repos"),
        )
    )


def windowed_change_rates_batch(df: DataFrame, window: str = "1 minute") -> DataFrame:
    """Batch twin of `windowed_change_rates` (oracle-checkable): tumbling
    window as epoch-truncated start time."""
    return (
        df.groupBy(F.window("ts", window).alias("win"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.approx_count_distinct("repo").alias("approx_repos"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("op"),
            F.col("n_changes"),
            F.col("approx_repos"),
        )
    )


def repo_activity_sessions(
    stream: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session windows per repo: consecutive changes within `gap` fuse
    into one session (burst detection). Streaming-native via
    session_window; batch-expressible via the lag/cumsum idiom."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("session"), F.col("repo"))
        .agg(F.count(F.lit(1)).alias("n_changes"), F.max("lsn").alias("max_lsn"))
    )


def repo_activity_sessions_batch(df: DataFrame, gap_seconds: int = 600) -> DataFrame:
    """Batch sessionization (oracle-checkable): lag(ts) per repo, new
    session when the gap exceeds the threshold, cumulative session ids."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("repo").orderBy("ts", "lsn")
    # cast via TIMESTAMP first: NTZ inputs (e.g. driver parquet) can't
    # cast straight to a numeric; session tz is pinned UTC so this
    # matches DuckDB's naive-as-UTC epoch(). DOUBLE, not long: whole-
    # second truncation made this "twin" disagree with the streaming
    # session_window on sub-second gaps straddling the threshold (e.g.
    # a 600.2s gap truncated to 600 = no new session at gap 600).
    ep = F.col("ts").cast("timestamp").cast("double")
    gap = ep - F.lag(ep).over(w)
    marked = df.withColumn(
        "_new_session", F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    )
    sess = marked.withColumn(
        "session_id", F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("repo", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_changes"),
            F.max("lsn").alias("max_lsn"),
        )
    )
