"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in `pyspark.sql.functions` (JVM-side,
whole-stage-codegen'd); no Python UDFs. These generalize the
reference's scalar transforms (reference: src/transform.py:52-77 —
upper/category/metadata) to the document domain the lake serves.

Operators:
- tokenize / token stats (whitespace + BPE-ish size estimate)
- quality scoring (length, distinct-token ratio, stopword ratio)
- language-ID (marker-token n-gram heuristic)
- document fingerprinting (normalized-prefix hash + length bucket)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic marker lists per language for the heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "with"),
    "de": ("der", "und", "die", "mit"),
    "es": ("el", "los", "que", "con"),
    "fr": ("le", "les", "des", "avec"),
}

STOPWORDS = ("the", "and", "of", "a", "to", "in", "data", "table")


def tokens_col(text: Column) -> Column:
    """Whitespace tokens with EMPTY strings removed: split('') yields
    [''], so an empty or whitespace-only document would otherwise count
    one token — and then outscore real low-quality text in any filter
    keyed on these stats (empty doc: n_tokens=0, quality_score=0).
    array_remove, NOT F.filter: higher-order functions run interpreted
    outside whole-stage codegen (dedup_text.py measured the gap at 8×),
    and this module's contract is codegen'd hot paths."""
    return F.array_remove(F.split(F.trim(text), r"\s+"), "")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate (~4 chars/token,
    the published GPT-family rule of thumb) — both pure column exprs."""
    toks = tokens_col(F.col(text_col))
    # numerator = sum of TOKEN lengths, not raw string length: separators
    # and surrounding whitespace are not part of any token, and counting
    # them overstated avg_token_len by the separator share. length∘join
    # stays in codegen where an aggregate() lambda would not.
    tok_chars = F.length(F.array_join(toks, ""))
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.ceil(F.length(text_col) / F.lit(4.0)).cast("long").alias("n_bpe_est"),
        F.round(tok_chars / F.greatest(F.size(toks), F.lit(1)), 4).alias(
            "avg_token_len"
        ),
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score. Everything is
    expressed over one tokenization (Catalyst CSEs the repeated expr)."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # stopwords match case-INsensitively ('The' is as much boilerplate
    # as 'the'); distinctness stays case-sensitive (variable casing is
    # real signal in code). Multiset hit count without a HOF lambda:
    # per stopword, size(toks) - size(array_remove(toks, w)) is its
    # occurrence count — 8 codegen'd array ops beat one interpreted
    # filter() on the hot path.
    toks_lower = tokens_col(F.lower(F.col(text_col)))
    stop_hits = None
    for w in STOPWORDS:
        h = F.size(toks_lower) - F.size(F.array_remove(toks_lower, w))
        stop_hits = h if stop_hits is None else stop_hits + h
    uniq_ratio = F.round(n_distinct / F.greatest(n, F.lit(1)), 4)
    stop_ratio = F.round(stop_hits / F.greatest(n, F.lit(1)), 4)
    return df.select(
        "doc_id",
        n.alias("n_tokens"),
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stopword_ratio"),
        F.round(F.log1p(n) * uniq_ratio * (F.lit(1.0) - stop_ratio), 4).alias(
            "quality_score"
        ),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token heuristic language ID: count marker hits per language,
    pick the argmax (ties broken by language code order), 'und' if no
    hits. A real n-gram model slots in as a broadcast-joined lookup of
    n-gram → language weights; the plan shape is identical."""
    toks = tokens_col(F.lower(F.col(text_col)))

    def _hits(markers: tuple[str, ...]):
        # multiset marker count WITHOUT a higher-order function: per
        # marker, size(toks) - size(array_remove(toks, m)) is its
        # occurrence count, and markers are distinct so the sum equals
        # the old filter(isin) count. HOF lambdas run interpreted
        # outside whole-stage codegen — this keeps lang_id on the same
        # codegen'd idiom as the stopword counter above.
        total = None
        for m in markers:
            h = F.size(toks) - F.size(F.array_remove(toks, m))
            total = h if total is None else total + h
        return total

    hit_cols = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    # argmax via greatest + chained when (deterministic tie-break: first
    # lang in sorted order wins at equal counts)
    best = None
    langs = sorted(hit_cols)
    for lang in langs:
        cond = hit_cols[lang] > 0
        for other in langs:
            if other != lang:
                op = (
                    hit_cols[lang] >= hit_cols[other]
                    if other > lang
                    else hit_cols[lang] > hit_cols[other]
                )
                cond = cond & op
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    pred = best.otherwise(F.lit("und"))
    return df.select(
        "doc_id",
        *[hit_cols[lang].alias(f"hits_{lang}") for lang in langs],
        pred.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: sha256 of the normalized 64-char prefix plus
    a coarse length bucket — a cheap near-constant-work id for shard-
    level dedup triage (full near-dup detection lives in dedup_text.py)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.select(
        "doc_id",
        F.sha2(F.substring(norm, 1, 64), 256).alias("prefix_sha"),
        F.floor(F.length(text_col) / F.lit(100)).cast("long").alias("len_bucket"),
    )
