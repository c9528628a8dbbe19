"""Vectorized validation + defaults + valid/invalid routing.

Replaces the reference's per-row `jsonschema.validate`
(reference: schema/schema_validator.py:44-65 — V1), `_apply_defaults`
(schema_validator.py:113-130 — V2), `get_schema_errors`
(schema_validator.py:147-169 — V3) and the producer's validity router
(src/producer.py:165-214 — R1) with whole-column expressions: every
predicate is JVM-side and codegen'd, no per-row Python
(BASELINE.json input_hint). The reference validates twice (producer
src/producer.py:177 and consumer src/consumer.py:118); we validate
exactly once per event by construction (SURVEY.md R2).

Rules are DATA, not code: the change-event rule set lives in
schema_docs/event_rules.yaml (the analog of the reference's
schema/event_schema.yaml:5-63 — required fields, op enum like the
event_type enum, lsn >= 0 like amount >= 0, content required unless
op = delete) and is compiled once into whole-column predicates by
functions/schema_compile.py. New field rules ship as a YAML edit with
no code change, matching the reference's config-driven surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schema_compile import compiled_errors, compiled_valid

VALID_FLAG = "_valid"
ERROR_COL = "_error_message"


def validation_errors() -> Column:
    """Per-row semicolon-joined error string (empty ⇒ valid).

    Mirrors `get_schema_errors` (reference: schema_validator.py:147-169):
    one `concat_ws` of `when` predicates compiled from the checked-in
    rule document — rule order preserved so the first/most-specific
    failure leads the message, which the DLQ categorizer
    (functions/dlq.py) keys off.
    """
    return compiled_errors("change_event")


def commit_hash_col(repo="repo", path="path", lsn="lsn"):
    """Deterministic commit id for events that lack one:
    sha256(repo|path|lsn)[:12]. ONE definition — replay determinism and
    DuckDB-oracle parity depend on every derivation site agreeing (this
    default, the events adapter, and the adapter's SQL twin
    CHANGES_FROM_EVENTS_SQL, which must mirror it textually)."""
    r, p, l = (F.col(c) if isinstance(c, str) else c for c in (repo, path, lsn))
    return F.substring(F.sha2(F.concat_ws("|", r, p, l.cast("string")), 256), 1, 12)


def apply_defaults(df: DataFrame) -> DataFrame:
    """V2 — schema defaults, applied BEFORE validation like the reference
    (schema_validator.py:113-130: defaults filled, then validated).

    The reference synthesizes `event_id` (uuid4) and `timestamp` (now());
    both are non-deterministic and would break replay-equality, so our
    analogs derive from the event itself: a missing `commit` becomes a
    content hash prefix, a missing `ts` derives from `lsn`. A missing
    `lang` defaults to 'other' (analog of source='web'/version='1.0',
    event_schema.yaml:56-63).
    """
    return df.withColumns(
        {
            "commit": F.coalesce(F.col("commit"), commit_hash_col()),
            "ts": F.coalesce(F.col("ts"), F.timestamp_seconds(F.lit(1_700_000_000) + F.col("lsn"))),
            "lang": F.coalesce(
                F.col("lang"), F.when(F.col("op") != "delete", F.lit("other"))
            ),
        }
    )


def validate_and_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """R1 — single-pass router: returns (valid, invalid_with_error).

    Twin filters over one boolean predicate; inside `foreachBatch` the
    caller persists the flagged frame so the source is scanned once
    (SURVEY.md R1: "split, not two scans").

    The VALID side filters on the compiled boolean predicate — exactly
    `validation_errors() == ''` by construction (schema_compile's
    compiled_valid), but with no per-row message-string concatenation
    on the path every epoch's every row takes; the error string is
    built only for rows that already failed (the small invalid split).
    """
    ok = compiled_valid("change_event")
    valid = df.filter(ok)
    invalid = df.filter(~ok).withColumn(ERROR_COL, validation_errors())
    return valid, invalid
