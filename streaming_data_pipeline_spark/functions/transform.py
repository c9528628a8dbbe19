"""Transform stage — normalization, categorical mapping, metadata.

Spark-first re-expression of the reference's EventTransformer
(reference: src/transform.py:27-126):
  T1 `_normalize_event_type` (52-59)  → upper()
  T2 `_get_event_category`   (61-70)  → chained when()/otherwise()
  T3 `_add_processing_metadata` (72-77) → withColumns(lit/derived ts)
  T5 `is_conversion_event` (schema_validator.py:142-145) → isin()
  T6 `get_event_type_mapping` (schema_validator.py:132-135) → create_map lookup

Two surfaces:
- `transform_changes` — the CDC envelope (op-based, used by the engine).
- `transform_user_events` — reference-parity transform over the
  user_event shape, pinning the CODE behavior (upper + 4-way category),
  not the divergent YAML enum (SURVEY.md §2.2; tests/test_transform.py
  in the reference pins the same).

Determinism: the reference stamps `processed_at = now()`
(src/transform.py:75) which breaks replay-equality; we derive
`processed_at` from event time (deliberate, documented divergence —
SURVEY.md §7.5).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PROCESSING_VERSION = "1.0"

# reference code mapping, src/transform.py:61-70
EVENT_CATEGORY = {
    "purchase": "conversion",
    "signup": "conversion",
    "page_view": "engagement",
    "click": "engagement",
    "login": "authentication",
    "logout": "authentication",
}

# YAML normalized mapping, schema/event_schema.yaml:169-175 (T6)
EVENT_TYPE_MAPPING = {
    "page_view": "view",
    "click": "interaction",
    "purchase": "conversion",
    "signup": "conversion",
    "login": "authentication",
    "logout": "authentication",
}

CONVERSION_EVENTS = ("purchase", "signup")  # event_schema.yaml:177-179 (T5)


def event_category_col(event_type: Column) -> Column:
    """T2 as a chained when(); constant-folded by Catalyst. For
    data-driven maps use `mapping_lookup_df` (broadcast join) instead."""
    expr = None
    for k, v in EVENT_CATEGORY.items():
        expr = F.when(event_type == k, v) if expr is None else expr.when(event_type == k, v)
    return expr.otherwise(F.lit("other"))


def event_type_mapping_col(event_type: Column) -> Column:
    """T6 — create_map constant lookup with 'unknown' default."""
    m = F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in EVENT_TYPE_MAPPING.items()))
    return F.coalesce(m[event_type], F.lit("unknown"))


def transform_user_events(df: DataFrame) -> DataFrame:
    """Reference-parity transform (T1+T2+T3+T5) over user_event rows.

    Golden behavior pinned by the reference's tests
    (tests/test_transform.py:26-91): purchase → ("PURCHASE",
    "conversion"), page_view → engagement, login → authentication,
    unknown → other; None/"" event_type → "UNKNOWN".
    """
    et = F.col("event_type")
    return df.withColumns(
        {
            # reference treats falsy event_type ('' or None) as UNKNOWN
            # (src/transform.py:55-56: `.upper() if event_type else 'UNKNOWN'`)
            "normalized_event_type": F.when(
                et.isNull() | (et == ""), F.lit("UNKNOWN")
            ).otherwise(F.upper(et)),
            "event_category": event_category_col(et),
            # coalesce: `x in (...)` is NULL (not False) in SQL when x is
            # NULL — the reference's boolean is_conversion_event returns
            # False for None, and a NULL here silently escapes both
            # branches of any is_conversion filter
            "is_conversion": F.coalesce(et.isin(*CONVERSION_EVENTS), F.lit(False)),
            "processed_at": F.coalesce(
                F.to_timestamp(F.col("timestamp")), F.timestamp_seconds(F.lit(0))
            ),
            "processing_version": F.lit(PROCESSING_VERSION),
        }
    )


def transform_changes(df: DataFrame) -> DataFrame:
    """CDC-envelope transform: normalize op, stamp deterministic
    processing metadata (T1/T3 analogs)."""
    return df.withColumns(
        {
            "op": F.lower(F.trim(F.col("op"))),
            "processed_at": F.col("ts"),  # event-time derived, replayable
            "processing_version": F.lit(PROCESSING_VERSION),
        }
    )


def mapping_lookup_df(spark, mapping: dict[str, str], key_name: str, value_name: str) -> DataFrame:
    """Tiny mapping table for the broadcast-join variant of T2/T6 —
    the scale path when the map is data-driven rather than constant."""
    return spark.createDataFrame(list(mapping.items()), [key_name, value_name])
