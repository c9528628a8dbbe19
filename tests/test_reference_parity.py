"""Replay of the reference's golden test cases as engine assertions.

Each case cites the reference test it ports (SURVEY.md §5 — the
reference pins CODE behavior, not the divergent YAML enum):
  tests/test_transform.py:26-91, 127-135
  tests/test_schema_validator.py:12-28, 73-99, 129-158
  tests/test_dead_letter_handler.py:46-113
  tests/test_pipeline.py:440-462 (metrics math)
"""

from __future__ import annotations

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.functions.dlq import (
    can_retry_col,
    error_category_col,
    remediation_col,
)
from streaming_data_pipeline_spark.functions.transform import (
    event_type_mapping_col,
    transform_user_events,
)


def _user_events(spark, rows):
    cols = "event_id string, user_id string, event_type string, timestamp string, amount double"
    return spark.createDataFrame(rows, cols)


def test_transform_goldens(spark):
    """reference tests/test_transform.py:26-91: purchase→(PURCHASE,
    conversion), page_view→engagement, login→authentication,
    unknown→other; :127-135: None/'' → UNKNOWN."""
    df = _user_events(
        spark,
        [
            ("e1", "u1", "purchase", "2024-01-01T00:00:00", 10.0),
            ("e2", "u1", "page_view", "2024-01-01T00:00:01", None),
            ("e3", "u1", "login", "2024-01-01T00:00:02", None),
            ("e4", "u1", "mystery", "2024-01-01T00:00:03", None),
            ("e5", "u1", None, "2024-01-01T00:00:04", None),
            ("e6", "u1", "", "2024-01-01T00:00:05", None),
        ],
    )
    got = {
        r["event_id"]: r
        for r in transform_user_events(df)
        .select("event_id", "normalized_event_type", "event_category", "is_conversion", "processing_version")
        .collect()
    }
    assert got["e1"]["normalized_event_type"] == "PURCHASE"
    assert got["e1"]["event_category"] == "conversion"
    assert got["e1"]["is_conversion"] is True
    assert got["e2"]["event_category"] == "engagement"
    assert got["e3"]["event_category"] == "authentication"
    assert got["e4"]["event_category"] == "other"
    assert got["e4"]["is_conversion"] is False
    assert got["e5"]["normalized_event_type"] == "UNKNOWN"
    assert got["e6"]["normalized_event_type"] == "UNKNOWN"
    assert all(r["processing_version"] == "1.0" for r in got.values())


def test_event_type_mapping_goldens(spark):
    """reference tests/test_schema_validator.py:73-99 (YAML mapping +
    'unknown' default)."""
    df = spark.createDataFrame(
        [("page_view",), ("click",), ("purchase",), ("nope",), (None,)], "event_type string"
    )
    got = [
        r[0]
        for r in df.select(event_type_mapping_col(F.col("event_type"))).collect()
    ]
    assert got == ["view", "interaction", "conversion", "unknown", "unknown"]


def test_dlq_categorizer_goldens(spark):
    """reference tests/test_dead_letter_handler.py:46-113 — category +
    retryability per (error_type, message, stage)."""
    rows = [
        # (error_type, error_message, stage, want_category, want_retry)
        ("ValidationError", "'x' is a required property", "producer_validation", "missing_required_field", False),
        ("ValidationError", "'bad' is not one of ['a','b']", "producer_validation", "invalid_enum_value", False),
        ("TypeError", "expected string", "transformation", "data_type_error", False),
        ("ConnectionError", "connection refused", "sink_write", "network_error", True),
        ("StorageError", "disk full", "sink_write", "storage_error", True),
        ("ValidationError", "schema mismatch", "consumer_validation", "schema_validation_error", False),
        ("RuntimeError", "boom", "transformation", "transformation_error", True),
        ("RuntimeError", "boom", "sink_write", "sink_write_error", False),
        ("RuntimeError", "boom", "elsewhere", "unknown_error", False),
    ]
    df = spark.createDataFrame(
        [(t, m, s) for t, m, s, _, _ in rows], "error_type string, error_message string, stage string"
    )
    cat = error_category_col(F.col("error_type"), F.col("error_message"), F.col("stage"))
    out = df.select(
        cat.alias("cat"),
        can_retry_col(F.col("error_type"), F.col("stage")).alias("retry"),
        remediation_col(cat).alias("rem"),
    ).collect()
    for (_, _, _, want_cat, want_retry), r in zip(rows, out):
        assert r["cat"] == want_cat, (want_cat, r["cat"])
        assert r["retry"] is want_retry, (want_cat, want_retry, r["retry"])
    # remediation golden (dead_letter_handler.py:194-195)
    assert out[0]["rem"] == "Add missing required fields to event data"
    assert out[-1]["rem"] == "Review error details and fix underlying issue"


def test_metrics_math(spark):
    """reference tests/test_pipeline.py:440-462: 7 written / 8 consumed →
    success 87.5%, error 12.5% — as an aggregation, not counters."""
    df = spark.createDataFrame([(i, i != 3) for i in range(8)], "id long, ok boolean")
    m = df.agg(
        F.count(F.lit(1)).alias("consumed"),
        F.sum(F.col("ok").cast("long")).alias("written"),
    ).select(
        (F.col("written") * 100.0 / F.col("consumed")).alias("success_rate"),
        ((F.col("consumed") - F.col("written")) * 100.0 / F.col("consumed")).alias("error_rate"),
    ).collect()[0]
    assert m["success_rate"] == 87.5
    assert m["error_rate"] == 12.5
