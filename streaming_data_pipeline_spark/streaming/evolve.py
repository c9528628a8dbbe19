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

Promoted columns are deliberately STRING-typed, not inferred like the
reference's first-non-null typing: plain-Parquet by-name reconciliation
cannot widen a column's physical type later (a long column read under a
double/string schema fails in the vectorized reader), so an early wrong
guess would wedge the table. Typed promotion belongs to a catalog with
widening-aware readers (real Iceberg); consumers cast at read time.

Rename heuristic (OFF by default — opt-in): if exactly one
previously-known payload column receives zero values in the batch while
exactly one unknown key appears, treat it as a rename — the new key's
values flow into the EXISTING column and the mapping is recorded; no
new column is created. Anything more ambiguous falls back to plain
addition (never destructive). The signal is weak (a sparse batch plus a
genuinely new key fires it), so it defaults off and, when an accepted
rename IS taken, the caller persists it into the table metadata
(``column_renames``) so the mapping is stable across epochs — a later
batch carrying the new key keeps landing in the same column instead of
re-running the heuristic from scratch.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import LAKE_BASE_COLS, RESERVED_COLS

log = logging.getLogger(__name__)


def payload_key_counts(
    df: DataFrame, only: set[str] | None = None
) -> dict[str, int]:
    """Distinct payload keys with non-null value counts — one aggregate
    job; the result is bounded by the number of DISTINCT keys (schema-
    sized, not data-sized), so the collect is safe at any scale.
    ``only`` restricts the aggregate to candidate keys (the new-key
    confirmation pass)."""
    if "payload" not in df.columns:
        return {}
    exploded = (
        df.select(F.explode_outer(F.col("payload")).alias("k", "v"))
        .filter(F.col("k").isNotNull() & F.col("v").isNotNull())
    )
    if only is not None:
        exploded = exploded.filter(F.col("k").isin(*sorted(only)))
    rows = exploded.groupBy("k").agg(F.count("*").alias("n")).collect()
    return {r["k"]: r["n"] for r in rows}


def candidate_new_keys(
    counts: dict[str, int],
    table_schema: T.StructType,
    known_renames: dict[str, str] | None = None,
) -> set[str]:
    """The pre-confirmation NEW-key candidate set — one definition shared
    by `evolve_and_promote` and the apply path's DLQ-observe confirmation
    (apply.py builds per-candidate invalid-carrier aggregates from this
    exact set, so the two must never drift)."""
    known_renames = dict(known_renames or {})
    known_extras = {f.name for f in table_schema.fields if f.name not in LAKE_BASE_COLS}
    return {
        k
        for k in counts
        if k not in known_extras
        and k not in RESERVED_COLS
        and not k.startswith("_")
        and k not in known_renames
    }


def evolve_and_promote(
    df: DataFrame,
    table_schema: T.StructType,
    *,
    detect_renames: bool = False,
    known_renames: dict[str, str] | None = None,
    key_source: DataFrame | None = None,
    confirm_source: DataFrame | None = None,
    precomputed_counts: dict[str, int] | None = None,
    invalid_counts: dict[str, int] | None = None,
) -> tuple[DataFrame, T.StructType, dict]:
    """Promote payload keys to columns; return (df_with_promoted_columns,
    new_table_schema, evolution_report). ``df`` keeps CHANGE_EVENT shape
    minus ``payload`` plus one string column per known/new key.

    ``known_renames`` — persisted {payload_key: existing_column} mappings
    (from the table's ``column_renames`` metadata): those keys always land
    in their mapped column and never count as new. Newly DETECTED renames
    (only when ``detect_renames=True``) are returned in the report for the
    caller to persist.

    ``key_source`` — optional frame to DETECT keys from, defaulting to
    ``df``. The apply path passes the pre-validation batch: a validity
    filter references the (large) content column, forcing the key-count
    scan to read it, while the unfiltered frame prunes to the payload
    column alone — measured 5-6x cheaper per epoch. Semantics shift only
    conservatively: extra visible keys can only SUPPRESS the
    single-candidate rename heuristic, never mis-fire it.

    ``confirm_source`` — optional frame (the apply path passes the
    VALID split) gating which NEW keys may actually evolve the schema:
    a key detected in ``key_source`` but absent from every confirm row
    is deferred, not promoted (reported as ``deferred_keys``). Without
    this, keys carried only by invalid (DLQ-bound) rows would
    permanently promote all-null columns — malformed or adversarial
    events could grow the table schema even though their rows never
    land (ADVICE r4). The confirmation aggregate runs ONLY on epochs
    that detect candidate new keys, so the steady-state key scan keeps
    the cheap payload-pruned plan; deferred keys promote naturally at
    DLQ-replay time once their rows validate.

    ``invalid_counts`` — per-candidate carrier counts among INVALID
    rows, measured for free by the apply path as Observation aggregates
    riding the DLQ write's own scan (see apply.py). When provided,
    confirmation is pure arithmetic — a candidate whose total carriers
    (from the payload-pruned key scan) all sit in the invalid split is
    DLQ-only and defers — and the ``confirm_source`` scan never runs.
    This closes the residual cost of the r5 deferral fix: with the
    scan-based confirmation, a stream that KEEPS sending DLQ-only keys
    (adversarial invalid traffic) re-triggered a content-bearing scan
    of the valid split EVERY epoch; with subtraction the marginal cost
    of confirmation is zero regardless of traffic. ``confirm_source``
    remains the fallback when the observation is unavailable (e.g. an
    empty-plan corner the optimizer folds away).

    ``precomputed_counts`` — the key_source aggregate, when the caller
    already ran it (the apply path hoists it to derive the candidate
    set before submitting the DLQ job); skips the redundant scan."""
    known_renames = dict(known_renames or {})
    known_extras = [f.name for f in table_schema.fields if f.name not in LAKE_BASE_COLS]
    counts = (
        precomputed_counts
        if precomputed_counts is not None
        else payload_key_counts(df if key_source is None else key_source)
    )
    # effective payload source keys per existing column, as an ordered
    # COALESCE CHAIN, not a single winner: a column renamed more than once
    # across epochs has several persisted keys mapping to it, and a
    # transition batch can carry rows from EVERY producer generation at
    # once — each generation's values must land. known_renames preserves
    # acceptance order (commit() merges newer entries last), so the chain
    # prefers the newest key and falls back generation by generation to
    # the column name itself.
    srcs_for = {c: [c] for c in known_extras}
    for nk, old in known_renames.items():
        if old in srcs_for:
            srcs_for[old].insert(0, nk)
    # a persisted rename whose TARGET column is missing from the schema
    # (e.g. the table was rolled back to before the promotion): the key
    # must not vanish — revive the target column, still sourced from the
    # renamed key(s), instead of silently dropping the values
    revived_srcs: dict[str, list[str]] = {}
    for nk, old in known_renames.items():
        if old not in known_extras and counts.get(nk, 0) > 0:
            revived_srcs.setdefault(old, []).insert(0, nk)
    revived = sorted(revived_srcs)
    # a payload key colliding with an ENVELOPE column (e.g. 'op') must
    # never be promoted: withColumn('op', payload['op']) would clobber
    # the CDC op for the whole batch BEFORE tombstone derivation —
    # deletes stop tombstoning and rows without the key get a null op.
    # Underscore names would collide with internals (_deleted, _bucket).
    reserved_ignored = sorted(
        k for k in counts if k in RESERVED_COLS or k.startswith("_")
    )
    fresh = candidate_new_keys(counts, table_schema, known_renames)
    deferred: list[str] = []
    confirm_via = None
    if fresh and invalid_counts is not None:
        # zero-scan confirmation: a key whose every carrier is invalid
        # (total carriers == invalid carriers) must not evolve the
        # schema, and must not feed the rename heuristic either.
        # Plausibility guard (ADVICE r5): the two counts come from two
        # independent jobs over the same source — with a
        # non-deterministic source they can disagree. An invalid count
        # STRICTLY ABOVE the total is impossible under a stable source,
        # so such keys fall back to the confirm_source scan (when
        # available) instead of being silently deferred for the epoch.
        implausible = {
            k for k in fresh if invalid_counts.get(k, 0) > counts.get(k, 0)
        }
        deferred = sorted(
            k
            for k in fresh - implausible
            if counts.get(k, 0) <= invalid_counts.get(k, 0)
        )
        fresh -= set(deferred)
        confirm_via = "dlq_observe"
        if implausible and confirm_source is not None:
            confirmed = payload_key_counts(confirm_source, only=implausible)
            re_deferred = sorted(
                k for k in implausible if confirmed.get(k, 0) == 0
            )
            deferred = sorted(set(deferred) | set(re_deferred))
            fresh -= set(re_deferred)
            confirm_via = "dlq_observe+valid_scan"
    elif confirm_source is not None and fresh:
        # fallback path: one aggregate over the valid split restricted
        # to the candidates (content-bearing — the validity predicate
        # reads the wide column, which is why the apply path prefers
        # the observation arithmetic above)
        confirmed = payload_key_counts(confirm_source, only=fresh)
        deferred = sorted(k for k in fresh if confirmed.get(k, 0) == 0)
        fresh -= set(deferred)
        confirm_via = "valid_scan"
    new_keys = sorted(fresh | set(revived))
    silent = sorted(
        c for c in known_extras if all(counts.get(k, 0) == 0 for k in srcs_for[c])
    )

    renames: dict[str, str] = {}
    if detect_renames and len(new_keys) == 1 and len(silent) == 1 and new_keys[0] not in revived:
        renames = {new_keys[0]: silent[0]}
        srcs_for[silent[0]].insert(0, new_keys[0])
        log.warning("schema-evolution: treating payload key %r as rename of column %r", new_keys[0], silent[0])
        new_keys = []

    def _chain(keys: list[str]):
        if len(keys) == 1:
            return F.col("payload")[keys[0]]
        return F.coalesce(*[F.col("payload")[k] for k in keys])

    out = df
    if "payload" in df.columns:
        for col_name in known_extras:
            out = out.withColumn(col_name, _chain(srcs_for[col_name]))
        for k in new_keys:
            # revived rename target: same coalesce-chain rule — newest
            # renamed key first, down to the original column key, so a
            # transition batch mixing producer generations loses nothing
            out = out.withColumn(k, _chain(revived_srcs.get(k, []) + [k]))
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
        "applied_renames": {**known_renames, **renames},
        "reserved_keys_ignored": reserved_ignored,
        "deferred_keys": deferred,
        "confirm_via": confirm_via,
    }
    if deferred:
        log.warning(
            "schema-evolution: payload key(s) %s appear only in invalid "
            "(DLQ-bound) rows and were NOT promoted (deferred to replay)",
            deferred,
        )
    if reserved_ignored:
        log.warning(
            "schema-evolution: payload key(s) %s collide with reserved "
            "engine columns and were NOT promoted", reserved_ignored
        )
    return out, new_schema, report
