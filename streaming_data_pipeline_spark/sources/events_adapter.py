"""Adapter: driver-provided `events` table → CDC change-event envelope.

The driver testdata's `events` table (event_id, ts, user_id,
event_type ∈ {signup, click, view, purchase, error}, value, props) is
the same shape family as the reference's user_event stream
(FIXTURES.md §4). This adapter derives a deterministic change-event
stream from it so the WHOLE CDC pipeline is exercisable — and oracle-
checkable in ANSI SQL — on driver data.

Every derivation uses **portable modular arithmetic on integer
columns** (never engine hash functions), so the identical mapping is
expressible in DuckDB SQL for the correctness gate:

  op:      signup → insert, purchase → delete, error → invalid_op
           (injected invalid enum), else update
  repo:    'org_' || user_id % 10 || '/repo_' || user_id
  path:    'src/mod_' || event_id % 37 || '.py'
  lsn:     event_id
  content: deterministic text from (user_id, event_id, value)
  commit:  first 12 hex chars of sha256(repo|path|lsn)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Must stay in sync with CHANGES_FROM_EVENTS_SQL below.


def changes_from_events(events: DataFrame) -> DataFrame:
    uid = F.col("user_id")
    eid = F.col("event_id")
    repo = F.concat(F.lit("org_"), F.pmod(uid, F.lit(10)).cast("string"), F.lit("/repo_"), uid.cast("string"))
    path = F.concat(F.lit("src/mod_"), F.pmod(eid, F.lit(37)).cast("string"), F.lit(".py"))
    op = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "purchase", "delete")
        .when(F.col("event_type") == "error", "invalid_op")
        .otherwise("update")
    )
    lsn = eid.cast("long")
    from ..functions.validate import commit_hash_col

    commit = commit_hash_col(repo, path, lsn)
    # integer-only content derivation: floor(v*100+0.5) is bit-identical
    # IEEE math in Spark and DuckDB (float *formatting* is not portable)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    content = F.when(
        op != "delete",
        F.concat(
            F.lit("cents="), cents.cast("string"),
            F.lit(";user="), uid.cast("string"),
            F.lit(";event="), eid.cast("string"),
        ),
    )
    lang = F.element_at(
        F.array(F.lit("python"), F.lit("java"), F.lit("go"), F.lit("rust")),
        (F.pmod(eid, F.lit(4)) + 1).cast("int"),
    )
    lang = F.when(op != "delete", lang)
    return events.select(
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        lsn.alias("lsn"),
        F.col("ts").alias("ts"),
        F.map_from_arrays(
            F.array(F.lit("k")), F.array(F.get_json_object(F.col("props"), "$.k"))
        ).alias("payload"),
        F.floor(eid / F.lit(1000)).cast("long").alias("epoch"),
    )


# DuckDB CTE producing the identical rows (minus map payload — exposed as
# plain column k). Interpolated into oracle SQL strings.
CHANGES_FROM_EVENTS_SQL = """
  SELECT
    CASE event_type WHEN 'signup' THEN 'insert'
                    WHEN 'purchase' THEN 'delete'
                    WHEN 'error' THEN 'invalid_op'
                    ELSE 'update' END AS op,
    -- ((x % n) + n) % n everywhere: DuckDB % keeps the dividend's sign
    -- while Spark pmod is always non-negative — a negative id would
    -- silently desynchronize the twins (and index a list out of range)
    'org_' || (((user_id % 10) + 10) % 10)::VARCHAR || '/repo_' || user_id::VARCHAR AS repo,
    'src/mod_' || (((event_id % 37) + 37) % 37)::VARCHAR || '.py' AS path,
    -- concat_ws, not ||: Spark's commit_hash_col skips NULL components
    -- (concat_ws semantics) while || would propagate NULL through sha256
    substring(sha256(concat_ws('|',
        'org_' || (((user_id % 10) + 10) % 10)::VARCHAR || '/repo_' || user_id::VARCHAR,
        'src/mod_' || (((event_id % 37) + 37) % 37)::VARCHAR || '.py',
        event_id::VARCHAR)), 1, 12) AS commit,
    CASE WHEN event_type = 'purchase' THEN NULL
         ELSE ['python','java','go','rust'][((event_id % 4) + 4) % 4 + 1] END AS lang,
    CASE WHEN event_type = 'purchase' THEN NULL
         ELSE 'cents=' || CAST(floor(value * 100 + 0.5) AS BIGINT)::VARCHAR
              || ';user=' || user_id::VARCHAR
              || ';event=' || event_id::VARCHAR END AS content,
    event_id AS lsn,
    ts,
    json_extract_string(props, '$.k') AS k,
    -- floor division, not DuckDB's truncate-toward-zero //: Spark
    -- floor(eid/1000) gives -2 for -1500 where // gives -1. Exact
    -- integer form (no float): (x - pmod(x, n)) / n
    ((event_id - (((event_id % 1000) + 1000) % 1000)) / 1000)::BIGINT AS epoch
  FROM events
"""
