"""Per-microbatch schema evolution: payload-key promotion + rename heuristic.

The reference's implicit "schema drift" is union-of-keys-per-batch type
inference at the sink (reference: src/sink_writer.py:143-155, 173-209),
which yields per-FILE schemas that can disagree across a directory. We
formalize it (SURVEY.md §7.4): the change-event ``payload``
map<string,string> is the sanctioned drift channel; each microbatch
diffs the payload keys against the table schema and promotes new keys
to real (string-typed) table columns in the SAME atomic commit as the
data. Old rows read the new column as null (by-name Parquet
reconciliation in plans/lake.py).

Rename heuristic (logged, conservative, off-switchable): if exactly one
previously-known payload column receives zero values in the batch while
exactly one unknown key appears, treat it as a rename — the new key's
values flow into the EXISTING column and the mapping is recorded; no
new column is created. Anything more ambiguous falls back to plain
addition (never destructive).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import LAKE_BASE_COLS

log = logging.getLogger(__name__)


def payload_key_counts(df: DataFrame) -> dict[str, int]:
    """Distinct payload keys with non-null value counts — one aggregate
    job; the result is bounded by the number of DISTINCT keys (schema-
    sized, not data-sized), so the collect is safe at any scale."""
    if "payload" not in df.columns:
        return {}
    rows = (
        df.select(F.explode_outer(F.col("payload")).alias("k", "v"))
        .filter(F.col("k").isNotNull() & F.col("v").isNotNull())
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return {r["k"]: r["n"] for r in rows}


def evolve_and_promote(
    df: DataFrame,
    table_schema: T.StructType,
    *,
    detect_renames: bool = True,
) -> tuple[DataFrame, T.StructType, dict]:
    """Promote payload keys to columns; return (df_with_promoted_columns,
    new_table_schema, evolution_report). ``df`` keeps CHANGE_EVENT shape
    minus ``payload`` plus one string column per known/new key."""
    known_extras = [f.name for f in table_schema.fields if f.name not in LAKE_BASE_COLS]
    counts = payload_key_counts(df)
    new_keys = sorted(k for k in counts if k not in known_extras and k not in LAKE_BASE_COLS)
    silent = sorted(k for k in known_extras if counts.get(k, 0) == 0)

    renames: dict[str, str] = {}
    if detect_renames and len(new_keys) == 1 and len(silent) == 1:
        renames = {new_keys[0]: silent[0]}
        log.warning("schema-evolution: treating payload key %r as rename of column %r", new_keys[0], silent[0])
        new_keys = []

    out = df
    if "payload" in df.columns:
        for col_name in known_extras:
            src_key = next((nk for nk, old in renames.items() if old == col_name), col_name)
            out = out.withColumn(col_name, F.col("payload")[src_key])
        for k in new_keys:
            out = out.withColumn(k, F.col("payload")[k])
        out = out.drop("payload")
    else:
        for col_name in known_extras + new_keys:
            if col_name not in out.columns:
                out = out.withColumn(col_name, F.lit(None).cast("string"))

    new_schema = table_schema
    if new_keys:
        fields = list(table_schema.fields) + [
            T.StructField(k, T.StringType(), True) for k in new_keys
        ]
        new_schema = T.StructType(fields)

    report = {
        "payload_keys": counts,
        "added_columns": new_keys,
        "renamed_columns": renames,
    }
    return out, new_schema, report
