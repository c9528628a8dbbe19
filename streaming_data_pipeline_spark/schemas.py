"""Explicit schemas for the CDC engine.

The reference infers types per batch from the first non-null value
(reference: src/sink_writer.py:173-209) so two files in the same output
dir can disagree on columns and types (src/sink_writer.py:143-155).
We replace that whole class of problem with explicit StructTypes; the
only sanctioned drift channel is the change-event ``payload``
map<string,string>, whose keys are promoted to real table columns by
the per-microbatch schema-evolution step (streaming/apply.py).

Schemas defined here:
- CHANGE_EVENT: the binlog/WAL-style envelope (analog of the
  reference's ``user_event``, schema/event_schema.yaml:5-63, with the
  enum `event_type` generalized to `op` and `(repo, path)` as the key
  like its required `user_id`).
- LAKE_BASE: the target lake table per BASELINE.json input_hint
  (repo, path, commit, lang, content) plus engine bookkeeping columns.
- DLQ: the dead-letter envelope + analysis columns (reference:
  schema/event_schema.yaml:131-165 and src/dead_letter_handler.py:90-95).
- USER_EVENT: reference-parity shape used to replay the reference's
  validate/transform golden tests.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- change-event envelope (streaming input) --------------------------------

OPS = ("insert", "update", "delete")

CHANGE_EVENT = T.StructType(
    [
        T.StructField("op", T.StringType(), True),
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),  # nullable on delete
        T.StructField("content", T.StringType(), True),  # nullable on delete
        T.StructField("lsn", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("payload", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

LANGS = ("python", "java", "scala", "go", "rust", "sql", "markdown", "other")

# --- lake table --------------------------------------------------------------

# input_hint columns. Bookkeeping: lsn (cross-epoch LWW), ts (event time),
# _deleted (tombstone: a stale update arriving after a delete must not
# resurrect the key — tombstones carry the delete's lsn).
LAKE_KEY = ("repo", "path")

LAKE_BASE = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("_deleted", T.BooleanType(), False),
    ]
)

LAKE_BASE_COLS = [f.name for f in LAKE_BASE.fields]

# Column names a payload key must NEVER be promoted to: the change-event
# envelope (a payload key 'op' would clobber the CDC op before tombstone
# derivation), the lake bookkeeping columns, and anything starting with
# '_' (internal columns like _deleted/_bucket). schema evolution reports
# such keys instead of promoting them (streaming/evolve.py).
RESERVED_COLS = frozenset(f.name for f in CHANGE_EVENT.fields) | frozenset(LAKE_BASE_COLS)

# JSON wire format for change events (Kafka records, DLQ original_event
# envelopes): Spark's default timestampFormat carries MILLISECONDS only,
# so a to_json -> from_json round trip would silently truncate
# microsecond event times — breaking producer->consumer and DLQ-replay
# equality. Every serialize AND parse site must pass JSON_OPTS.
TS_JSON_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
JSON_OPTS = {"timestampFormat": TS_JSON_FMT}

# --- dead-letter table --------------------------------------------------------

DLQ = T.StructType(
    [
        T.StructField("original_event", T.StringType(), True),  # to_json(struct(*))
        T.StructField("error_type", T.StringType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("failed_at", T.TimestampType(), True),  # event-time derived
        T.StructField("processing_stage", T.StringType(), True),
        T.StructField("error_category", T.StringType(), True),
        T.StructField("can_retry", T.BooleanType(), True),
        T.StructField("remediation_suggestion", T.StringType(), True),
        T.StructField("epoch", T.LongType(), True),
    ]
)

# --- reference-parity user_event (for replaying reference golden tests) ------

USER_EVENT = T.StructType(
    [
        T.StructField("event_id", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("page_url", T.StringType(), True),
        T.StructField("element_id", T.StringType(), True),
        T.StructField("product_id", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("user_agent", T.StringType(), True),
        T.StructField("ip_address", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
    ]
)

USER_EVENT_TYPES = ("page_view", "click", "purchase", "signup", "login", "logout")
