"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup: PII redaction, benchmark-contamination detection,
repetition scoring, and deterministic stratified sampling.

The reference has none of these (its pipeline stops at
validate→transform→sink); they are first-class here because the target
lake holds training text/code. All are pure column expressions or
broadcast-joined shingle machinery — no Python in the hot path, every
shuffle on a content-derived key — and each has a DuckDB-portable
formulation so the driver hash-verifies them end to end.

Scale notes:
- redact_pii: map-only (regexp over each row); trivially parallel.
- benchmark_contamination: the benchmark side is SMALL by definition
  (eval sets are thousands of docs) ⇒ its distinct shingles broadcast;
  the corpus side is one shingle explode + one aggregation.
- repetition_score: per-doc aggregation over its own shingles — one
  explode + one groupBy on doc_id (already co-partitioned).
- hash_stratified_sample: map-only Knuth-multiplicative bucket on the
  id — deterministic across engines AND executors (no RNG state), so
  samples are reproducible and composable with replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup_text import shingle_rows

# patterns kept in the RE2 ∩ Java-regex dialect so Spark and the DuckDB
# oracle match byte-for-byte
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{9,15}", "[PHONE]"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and redact PII spans. Output: doc_id, n_<kind> counts and
    the redacted text (placeholders substituted in pattern order).
    Counting happens BEFORE any replacement so overlapping patterns
    (an email containing digits, say) are attributed to the first
    pattern that matches the original text. Null text yields zero
    counts and null clean_text (size() on a null array would otherwise
    leak a -1/null sentinel into downstream sums)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.size(F.regexp_extract_all(txt, F.lit(pat), F.lit(0))).cast("long").alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]
    clean = txt
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    clean = F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(clean)
    return df.select("doc_id", *counts, clean.alias("clean_text"))


def benchmark_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram overlap against a benchmark/eval corpus — the
    standard decontamination check before training. Output: doc_id,
    n_shingles, n_overlap, contamination_ratio. The benchmark's distinct
    shingle set is broadcast (eval sets are small); zero-overlap docs
    are kept with ratio 0.0 so the caller filters at their threshold."""
    doc_sh = shingle_rows(df, text_col, n, distinct=True)
    sizes = doc_sh.select(
        "doc_id", F.col("n_sh").cast("long").alias("n_shingles")
    ).distinct()
    bench_sh = shingle_rows(benchmark, text_col, n, distinct=True).select("shingle").distinct()
    overlap = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        sizes.join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)) / F.col("n_shingles"), 4
            ).alias("contamination_ratio"),
        )
    )


def repetition_score(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Repetition quality filter: the fraction of a document occupied by
    its single most-repeated n-gram (shingles WITH multiplicity).
    Near-1.0 means degenerate loops — a standard pre-training drop rule.
    Output: doc_id, n_shingles, max_repeat, repetition_ratio."""
    sh = shingle_rows(df, text_col, n, distinct=False)
    per = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("c"))
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_shingles"),
            F.max("c").cast("long").alias("max_repeat"),
        )
        .withColumn("repetition_ratio", F.round(F.col("max_repeat") / F.col("n_shingles"), 4))
    )


KNUTH = 2654435761  # Fibonacci-hash multiplier; mixes sequential ids


def hash_stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    default_rate: int = 10,
    key_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row when its id's
    Knuth-multiplicative bucket (0-99) falls below the stratum's
    percentage. No RNG state ⇒ identical samples on every engine,
    executor and replay — the property that makes sampled training
    mixes reproducible. ``rates``: {stratum: pct_to_keep}.

    Overflow/sign care (ANSI mode): the key is folded into [0, 2^31)
    BEFORE the Knuth multiply so the product stays inside a long even
    for full-range hash-derived ids, and pmod keeps every stage
    non-negative. For small non-negative keys this equals the plain
    %-formulation the DuckDB oracle uses."""
    folded = F.pmod(F.col(key_col), F.lit(2**31))
    bucket = F.pmod(F.pmod(folded * F.lit(KNUTH), F.lit(2**32)), F.lit(100))
    rate = None
    for stratum, pct in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        rate = F.when(cond, pct) if rate is None else rate.when(cond, pct)
    rate = F.lit(default_rate) if rate is None else rate.otherwise(F.lit(default_rate))
    return df.withColumn("_bucket", bucket).filter(F.col("_bucket") < rate).drop("_bucket")
