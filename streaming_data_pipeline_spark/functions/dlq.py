"""Dead-letter analysis + enrichment — vectorized `when` chains.

Re-expresses the reference's DeadLetterHandler as whole-column
expressions (reference: src/dead_letter_handler.py):
  D1 `_categorize_error`   (97-143)  — 11 categories, substring rules,
                                       RULE ORDER PRESERVED (required/
                                       missing is checked first, then
                                       enum, type, network, storage,
                                       schema, stage-specific, unknown)
  D2 `_can_retry_event`    (145-181) — retryability classifier
  D3 `_suggest_remediation`(183-207) — canned suggestion lookup
  D4 `process_dead_letter_event` (33-95) — enrichment pipeline

The reference writes one pretty-printed JSON file per failed event
(src/sink_writer.py:262-291 — K6); at 10^10-event scale that is a
small-files death spiral, so the DLQ here is an append-only Parquet
TABLE partition-batched per epoch. The DLQ is terminal — never
re-consumed — preserving the reference's loop-prevention decision
(DESIGN_DOCUMENT.md:174-177, O3).

`analyzed_at`/`failed_at` derive from event time / epoch rather than
`datetime.now()` (src/dead_letter_handler.py:94) so replays are
byte-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import JSON_OPTS

REMEDIATION = {
    "missing_required_field": "Add missing required fields to event data",
    "invalid_enum_value": "Use valid enum values from schema definition",
    "data_type_error": "Ensure data types match schema requirements",
    "network_error": "Check network connectivity and retry",
    "storage_error": "Check disk space and file permissions",
    "schema_validation_error": "Validate event against schema before processing",
}
REMEDIATION_DEFAULT = "Review error details and fix underlying issue"


def error_category_col(
    error_type: Column, error_message: Column, stage: Column
) -> Column:
    """D1 — order-preserving categorizer (dead_letter_handler.py:97-143)."""
    msg = F.lower(F.coalesce(error_message, F.lit("")))
    etype = F.coalesce(error_type, F.lit(""))
    return (
        F.when(msg.contains("required") | msg.contains("missing"), "missing_required_field")
        .when(msg.contains("enum") | msg.contains("not one of"), "invalid_enum_value")
        .when(msg.contains("type") | etype.contains("TypeError"), "data_type_error")
        .when(msg.contains("connection") | msg.contains("timeout"), "network_error")
        .when(msg.contains("disk") | msg.contains("storage"), "storage_error")
        .when(etype.contains("ValidationError") | msg.contains("schema"), "schema_validation_error")
        .when(stage == "producer_validation", "producer_validation_error")
        .when(stage == "consumer_validation", "consumer_validation_error")
        .when(stage == "transformation", "transformation_error")
        .when(stage == "sink_write", "sink_write_error")
        .otherwise("unknown_error")
    )


def can_retry_col(error_type: Column, stage: Column) -> Column:
    """D2 — retryability (dead_letter_handler.py:145-181). Note the
    reference checks connection/timeout/storage/disk against error_TYPE
    (not message) — parity preserved."""
    etype = F.coalesce(error_type, F.lit(""))
    etype_l = F.lower(etype)
    return (
        F.when(etype.contains("ValidationError"), F.lit(False))
        .when(etype.contains("TypeError"), F.lit(False))
        .when(etype.contains("required"), F.lit(False))
        .when(etype_l.contains("connection") | etype_l.contains("timeout"), F.lit(True))
        .when(etype_l.contains("storage") | etype_l.contains("disk"), F.lit(True))
        .when(stage == "transformation", F.lit(True))
        .otherwise(F.lit(False))
    )


def remediation_col(error_category: Column) -> Column:
    """D3 — suggestion lookup (dead_letter_handler.py:183-207)."""
    expr = None
    for k, v in REMEDIATION.items():
        expr = F.when(error_category == k, v) if expr is None else expr.when(error_category == k, v)
    return expr.otherwise(F.lit(REMEDIATION_DEFAULT))


def enrich_dead_letters(
    invalid: DataFrame,
    *,
    stage: str = "consumer_validation",
    error_type: str = "ValidationError",
    epoch: int = 0,
    error_message_col: str = "_error_message",
    keep_content: bool = False,
) -> DataFrame:
    """D4 — build the DLQ envelope + analysis columns from the invalid
    split of a microbatch (envelope shape: event_schema.yaml:131-165 +
    analysis: dead_letter_handler.py:90-95)."""
    # original_event carries every field EXCEPT the (potentially large)
    # content body, which is by default replaced by its sha256 + length —
    # at code-repo scale, duplicating file bodies into the DLQ multiplies
    # write volume for no diagnostic value (the sha ties back to the
    # source). ``keep_content=True`` embeds the body too, making the DLQ
    # self-contained for batch REPLAY (streaming/replay.py) at the cost
    # of that write volume — a per-pipeline trade.
    data_cols = [
        F.col(c) for c in invalid.columns if c not in (error_message_col, "content")
    ]
    if "content" in invalid.columns:
        if keep_content:
            data_cols.append(F.col("content"))
        data_cols += [
            F.sha2(F.col("content"), 256).alias("content_sha"),
            F.length(F.col("content")).alias("content_len"),
        ]
    stage_c = F.lit(stage)
    etype_c = F.lit(error_type)
    cat = error_category_col(etype_c, F.col(error_message_col), stage_c)
    return invalid.select(
        # JSON_OPTS: microsecond timestamps must survive the DLQ->replay
        # round trip (the default format truncates to millis, so a
        # replayed event's ts — hence the replayed table state — would
        # differ from the no-failure run)
        F.to_json(F.struct(*data_cols), JSON_OPTS).alias("original_event"),
        etype_c.alias("error_type"),
        F.col(error_message_col).alias("error_message"),
        F.coalesce(
            F.col("ts") if "ts" in invalid.columns else F.lit(None).cast("timestamp"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.lit(epoch)),
        ).alias("failed_at"),
        stage_c.alias("processing_stage"),
        cat.alias("error_category"),
        can_retry_col(etype_c, stage_c).alias("can_retry"),
        remediation_col(cat).alias("remediation_suggestion"),
        F.lit(epoch).cast("long").alias("epoch"),
    )


def error_statistics(dlq: DataFrame) -> DataFrame:
    """`get_error_statistics` equivalent (dead_letter_handler.py:209-240)
    as an aggregation view instead of in-memory counters."""
    return (
        dlq.groupBy("error_category", "processing_stage", "can_retry")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), "error_category", "processing_stage", "can_retry")
    )
