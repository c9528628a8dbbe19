"""Sequence packing (operators/packing.py): concat-and-chunk semantics
pinned on hand-computed fixtures, plus the plan gate (one window
exchange, no Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_pack_sequences_hand_computed(spark):
    # py stream: 6 + 4 + 5 + 0 + 8 tokens, budget 8:
    #   d1 starts at 0  (seq 0, off 0)
    #   d2 starts at 6  (seq 0, off 6)  — straddles into seq 1
    #   d3 starts at 10 (seq 1, off 2)
    #   d4 (empty) at 15 (seq 1, off 7)
    #   d5 starts at 15 (seq 1, off 7)  — 8 tokens, straddles into seq 2
    rows = [
        (1, "py", "a b c d e f"),
        (2, "py", "g h i j"),
        (3, "py", "k l m n o"),
        (4, "py", "   "),
        (5, "py", "p q r s t u v w"),
        (10, "go", "x y z"),
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_start"], r["seq_id"], r["offset_in_seq"])
        for r in pack_sequences(_docs(spark, rows), 8).collect()
    }
    assert got[1] == (6, 0, 0, 0)
    assert got[2] == (4, 6, 0, 6)
    assert got[3] == (5, 10, 1, 2)
    assert got[4] == (0, 15, 1, 7)
    assert got[5] == (8, 15, 1, 7)
    assert got[10] == (3, 0, 0, 0)  # groups pack independently


def test_doc_larger_than_budget_starts_where_it_starts(spark):
    rows = [(1, "py", " ".join(f"t{i}" for i in range(20))), (2, "py", "a b")]
    got = {r["doc_id"]: r for r in pack_sequences(_docs(spark, rows), 8).collect()}
    assert (got[1]["seq_id"], got[1]["offset_in_seq"]) == (0, 0)
    # the 20-token doc fills seqs 0-1 and spills into 2; d2 starts at 20
    assert (got[2]["tok_start"], got[2]["seq_id"], got[2]["offset_in_seq"]) == (20, 2, 4)


def test_packing_stats_straddlers_and_sequences(spark):
    rows = [
        (1, "py", "a b c d e f"),
        (2, "py", "g h i j"),        # straddles 8-token boundary
        (3, "py", "k l m n o"),
        (4, "py", "   "),
        (5, "py", "p q r s t u v w"),  # 15+8=23 > 16: straddles
        (10, "go", "x y z"),
    ]
    packed = pack_sequences(_docs(spark, rows), 8)
    stats = {r["lang"]: r for r in packing_stats(packed, 8).collect()}
    py = stats["py"]
    assert (py["n_docs"], py["total_tokens"], py["n_sequences"]) == (5, 23, 3)
    assert py["n_straddlers"] == 2
    go = stats["go"]
    assert (go["n_docs"], go["total_tokens"], go["n_sequences"], go["n_straddlers"]) == (
        1, 3, 1, 0,
    )


def test_pack_deterministic_and_budget_validated(spark):
    rows = [(i, "py", f"w{i} " * (i % 5 + 1)) for i in range(50)]
    a = sorted(map(tuple, pack_sequences(_docs(spark, rows), 16).collect()))
    b = sorted(map(tuple, pack_sequences(_docs(spark, rows), 16).collect()))
    assert a == b
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(_docs(spark, rows), 0)


def test_pack_plan_single_exchange_no_python(spark):
    df = _docs(spark, [(1, "py", "a b"), (2, "py", "c")])
    plan = pack_sequences(df, 8)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the window partitioning, nothing else
    assert "Python" not in plan and "BatchEvalPython" not in plan
