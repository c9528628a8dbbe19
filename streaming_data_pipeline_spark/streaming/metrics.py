"""Per-epoch metrics, health checks, and lineage queries.

Replaces the reference's in-memory counters + monitor thread
(reference: src/pipeline.py:31-219 — PipelineMetrics dataclass,
check_*_health every 30 s, error-rate > 10% ⇒ warning) with durable,
queryable tables derived from the engine's own commit metadata:

- epoch metrics come from the commit markers (exactly_once.py) — they
  survive restarts and are replay-consistent, unlike counters;
- stream-level throughput/lag come from StreamingQueryProgress
  (numInputRows, processedRowsPerSecond) via a StreamingQueryListener;
- health is an aggregation view applying the reference's thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .exactly_once import EpochLog

ERROR_RATE_WARNING_PCT = 10.0  # reference: src/pipeline.py:87-91

EPOCH_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType()),
        T.StructField("snapshot_version", T.LongType()),
        T.StructField("input_files", T.IntegerType()),
        T.StructField("files_written", T.IntegerType()),
        T.StructField("rows_out", T.LongType()),
        T.StructField("rows_valid", T.LongType()),
        T.StructField("rows_applied", T.LongType()),
        T.StructField("tombstones", T.LongType()),
        T.StructField("dlq_rows", T.LongType()),
        T.StructField("touched_buckets", T.IntegerType()),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType()),
        T.StructField("input_file", T.StringType()),
        T.StructField("snapshot_version", T.LongType()),
        T.StructField("file_written", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("rows", T.LongType()),
    ]
)


def epoch_metrics(spark: SparkSession, table_root: str) -> DataFrame:
    """One row per committed epoch, from the commit markers (A1/A2
    analogs: consumed/valid/invalid counts, derived rates)."""
    rows = []
    for rec in EpochLog(table_root).lineage():
        s = rec.get("summary", {})
        rows.append(
            (
                int(rec["epoch"]),
                rec.get("snapshot_version"),
                len(rec.get("source_offsets", {}).get("input_files", [])),
                len(rec.get("files_written", [])),
                s.get("rows_out", 0),
                # rows_valid: valid rows CONSUMED (both apply modes record
                # this as source_rows); rows_applied: the LWW-winning
                # subset — COW summaries record it separately, and on a
                # replayed epoch the two diverge (N consumed, 0 applied)
                s.get("source_rows", 0),
                s.get("rows_applied", s.get("source_rows", 0)),
                s.get("tombstones", 0),
                s.get("dlq_rows", 0),
                len(s.get("touched_buckets", [])),
            )
        )
    df = spark.createDataFrame(rows, EPOCH_METRICS_SCHEMA)
    consumed = F.col("rows_valid") + F.col("dlq_rows")
    return df.withColumns(
        {
            "consumed": consumed,
            "success_rate": F.round(
                F.col("rows_valid") * 100.0 / F.greatest(consumed, F.lit(1)), 2
            ),
            "error_rate": F.round(
                F.col("dlq_rows") * 100.0 / F.greatest(consumed, F.lit(1)), 2
            ),
        }
    )


def health_report(spark: SparkSession, table_root: str) -> DataFrame:
    """Reference health semantics (src/pipeline.py:69-219): per-epoch
    error rate over 10% ⇒ 'warning', else 'healthy'; overall = worst-of."""
    m = epoch_metrics(spark, table_root)
    per_epoch = m.select(
        "epoch",
        "error_rate",
        F.when(F.col("error_rate") > ERROR_RATE_WARNING_PCT, "warning")
        .otherwise("healthy")
        .alias("status"),
    )
    return per_epoch


def overall_health(spark: SparkSession, table_root: str) -> str:
    statuses = {r["status"] for r in health_report(spark, table_root).collect()}
    return "warning" if "warning" in statuses else "healthy"


def lineage_table(spark: SparkSession, table_root: str) -> DataFrame:
    """Exploded lineage: (epoch, input_file) × (file_written, bucket,
    rows) — answers both 'which files did offset range X produce' and
    'which source range produced file Y'."""
    rows = []
    for rec in EpochLog(table_root).lineage():
        epoch = int(rec["epoch"])
        sv = rec.get("snapshot_version")
        inputs = rec.get("source_offsets", {}).get("input_files", []) or [None]
        outputs = rec.get("files_written", []) or [{}]
        for i in inputs:
            for o in outputs:
                rows.append((epoch, i, sv, o.get("path"), o.get("bucket"), o.get("rows")))
    return spark.createDataFrame(rows, LINEAGE_SCHEMA)


def files_for_offsets(spark: SparkSession, table_root: str, input_file: str) -> list[str]:
    """Lineage query API: source offset (file) → data files written."""
    df = lineage_table(spark, table_root)
    return [
        r["file_written"]
        for r in df.filter(F.col("input_file") == input_file)
        .select("file_written")
        .distinct()
        .collect()
        if r["file_written"]
    ]


class EpochProgressListener:
    """StreamingQueryListener capturing per-batch throughput/lag from
    StreamingQueryProgress (A2 analog: events_per_second). Registered
    via spark.streams.addListener(listener.as_listener(spark))."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def as_listener(self, spark: SparkSession):
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                p = event.progress
                outer.progress.append(
                    {
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "processed_rows_per_second": p.processedRowsPerSecond,
                        "duration_ms": dict(p.durationMs or {}),
                    }
                )

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                pass

        return _L()
