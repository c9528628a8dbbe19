"""Curation operators: PII redaction, benchmark contamination,
repetition scoring, deterministic stratified sampling."""

from __future__ import annotations

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.operators import curation


def test_redact_pii_counts_and_text(spark):
    df = spark.createDataFrame(
        [
            (0, "mail me at alice.smith+x@corp.example.org or call +491701234567"),
            (1, "server at 192.168.10.7 and 10.0.0.1 are fine"),
            (2, "nothing sensitive here"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.redact_pii(df).collect()}
    # null text: zero counts (never a -1/null sentinel), null clean_text
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0)
    assert out[3]["clean_text"] is None
    assert (out[0]["n_email"], out[0]["n_phone"]) == (1, 1)
    assert out[0]["clean_text"] == "mail me at [EMAIL] or call [PHONE]"
    assert out[1]["n_ipv4"] == 2 and out[1]["clean_text"] == "server at [IP] and [IP] are fine"
    assert out[2]["clean_text"] == "nothing sensitive here"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)


def test_benchmark_contamination_planted(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),   # verbatim leak
            (1, "completely unrelated text about spark engines here"),
            (2, "prefix words then the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.benchmark_contamination(corpus, bench).collect()}
    assert out[0]["contamination_ratio"] == 1.0
    assert out[1]["n_overlap"] == 0 and out[1]["contamination_ratio"] == 0.0
    assert 0.0 < out[2]["contamination_ratio"] < 1.0  # partial overlap


def test_repetition_score_degenerate_vs_diverse(spark):
    df = spark.createDataFrame(
        [
            (0, " ".join(["spam"] * 50)),                      # one shingle repeated
            (1, " ".join(f"w{i}" for i in range(50))),         # all distinct
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.repetition_score(df).collect()}
    assert out[0]["repetition_ratio"] == 1.0
    assert out[1]["max_repeat"] == 1
    assert out[1]["repetition_ratio"] < 0.05


def test_hash_stratified_sample_deterministic_and_stratified(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rates = {"en": 50, "de": 25}
    a = sorted(r["doc_id"] for r in curation.hash_stratified_sample(docs, rates).collect())
    b = sorted(r["doc_id"] for r in curation.hash_stratified_sample(docs, rates).collect())
    assert a == b and a  # no RNG: byte-identical across runs
    kept = curation.hash_stratified_sample(docs, rates).groupBy("lang").count()
    total = docs.groupBy("lang").count()
    k = {r["lang"]: r["count"] for r in kept.collect()}
    t = {r["lang"]: r["count"] for r in total.collect()}
    # rates hold within binomial-ish slack on a few hundred docs
    assert 0.3 < k["en"] / t["en"] < 0.7
    assert k.get("fr", 0) / t["fr"] < 0.25  # default 10%
    # sample is a strict subset
    assert set(a) <= {r["doc_id"] for r in docs.select("doc_id").collect()}
