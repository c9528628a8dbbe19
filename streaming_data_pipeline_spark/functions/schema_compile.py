"""YAML rule document → vectorized validation predicates.

The reference derives its validation from a checked-in schema document
(reference: schema/schema_validator.py:44-65 loads
schema/event_schema.yaml and runs jsonschema.validate per event). This
module gives the engine the same config-driven surface — new field
rules ship as a YAML edit, no code change — but compiles the document
ONCE into whole-column Spark expressions, so validation stays JVM-side
and codegen'd (no per-row Python, BASELINE.json input_hint).

Dialect: an ordered list of rules per schema (see
schema_docs/event_rules.yaml). Order is semantic — the compiled error
column joins messages in document order, preserving the reference's
first/most-specific-failure-leads behavior (get_schema_errors,
schema_validator.py:147-169) that the DLQ categorizer keys off.

Null semantics match the hand-written predicates they replace: a rule
whose condition evaluates to NULL (e.g. `minimum` on a null value, or
`required_unless` when the guard field is itself null) contributes no
message — the guard field's own `required` rule reports instead.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "schema_docs",
    "event_rules.yaml",
)


def _read_doc_text(path: str) -> str:
    """Read the rule document, working both from a filesystem checkout
    AND from inside a `spark-submit --py-files` zip (where __file__
    points into the archive and plain open() raises NotADirectoryError).
    The zip path goes through importlib.resources, which resolves
    package data through the same zipimporter that loaded the code."""
    try:
        with open(path) as f:
            return f.read()
    except (NotADirectoryError, FileNotFoundError):
        if path != DEFAULT_DOC:
            raise
        from importlib import resources

        return (
            resources.files("streaming_data_pipeline_spark")
            .joinpath("schema_docs/event_rules.yaml")
            .read_text()
        )


@lru_cache(maxsize=16)
def load_schema_doc(name: str, path: str | None = None) -> tuple:
    """Load one schema's (rules, defaults) from the YAML document.
    Returned as tuples so the lru_cache stays hashable-safe."""
    import yaml

    doc = yaml.safe_load(_read_doc_text(path or DEFAULT_DOC))
    schema = doc["schemas"][name]
    rules = tuple(
        tuple(sorted(r.items(), key=lambda kv: kv[0])) for r in schema.get("rules", [])
    )
    defaults = tuple(sorted((schema.get("defaults") or {}).items()))
    return rules, defaults


def _rules_as_dicts(rules: tuple) -> list[dict]:
    return [dict(r) for r in rules]


def error_expressions(rules: list[dict]) -> list[Column]:
    """One `when(...)` per violated rule, in document order. Each yields
    NULL when the rule passes (or cannot be evaluated), so `concat_ws`
    drops it from the joined message."""
    parts: list[Column] = []
    for r in rules:
        f = r["field"]
        c = F.col(f)
        if r.get("required"):
            parts.append(F.when(c.isNull(), F.lit(f"missing required field '{f}'")))
        if "enum" in r:
            parts.append(
                F.when(
                    c.isNotNull() & ~c.isin(*r["enum"]),
                    F.concat(F.lit(f"invalid enum value for '{f}': "), c.cast("string")),
                )
            )
        if "minimum" in r:
            m = r["minimum"]
            parts.append(F.when(c < F.lit(m), F.lit(f"'{f}' must be >= {m}")))
        if "required_unless" in r:
            guard = r["required_unless"]
            parts.append(
                F.when(
                    (F.col(guard["field"]) != F.lit(guard["equals"])) & c.isNull(),
                    F.lit(f"missing required field '{f}'"),
                )
            )
    return parts


def compiled_errors(schema_name: str, path: str | None = None) -> Column:
    """Semicolon-joined per-row error string column (empty ⇒ valid) —
    the compiled equivalent of the reference's `get_schema_errors`."""
    rules, _ = load_schema_doc(schema_name, path)
    return F.concat_ws("; ", *error_expressions(_rules_as_dicts(rules)))


def violation_conditions(rules: list[dict]) -> list[Column]:
    """The bare boolean when-conditions of :func:`error_expressions`,
    without the message literals — the cheap form for validity routing
    (no per-row string building on the hot valid path)."""
    conds: list[Column] = []
    for r in rules:
        f = r["field"]
        c = F.col(f)
        if r.get("required"):
            conds.append(c.isNull())
        if "enum" in r:
            conds.append(c.isNotNull() & ~c.isin(*r["enum"]))
        if "minimum" in r:
            conds.append(c < F.lit(r["minimum"]))
        if "required_unless" in r:
            guard = r["required_unless"]
            conds.append(
                (F.col(guard["field"]) != F.lit(guard["equals"])) & c.isNull()
            )
    return conds


def compiled_valid(schema_name: str, path: str | None = None) -> Column:
    """Boolean validity predicate, exactly `compiled_errors == ''` but
    WITHOUT building the message string per row: the error column is
    empty iff no rule's when-condition is TRUE (a NULL condition
    contributes no message — the documented null semantics), so
    validity is the conjunction of NOT coalesce(cond, false). The apply
    path evaluates this on every row of every epoch; the string form is
    built only for the (small) invalid split (guide §1.2 per-task
    work)."""
    rules, _ = load_schema_doc(schema_name, path)
    valid = F.lit(True)
    for cond in violation_conditions(_rules_as_dicts(rules)):
        valid = valid & ~F.coalesce(cond, F.lit(False))
    return valid


def apply_doc_defaults(df: DataFrame, schema_name: str, path: str | None = None) -> DataFrame:
    """Fill schema-document defaults (reference `_apply_defaults`,
    schema_validator.py:113-130) — columns created if absent, nulls
    coalesced if present. Engine-derived defaults (commit hash, ts from
    lsn) stay in functions/validate.py: they are replay-determinism
    decisions, not schema facts."""
    _, defaults = load_schema_doc(schema_name, path)
    out = df
    for name, value in defaults:
        if name in out.columns:
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(value)))
        else:
            out = out.withColumn(name, F.lit(value))
    return out
