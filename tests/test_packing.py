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


def test_packing_frame_plan_one_exchange_g_way(spark):
    """The export packing spec (VERDICT r4 next #4): the explicit
    G-way (lang, file_group) repartition must SATISFY the window's
    required clustering — exactly one exchange in the whole plan, at
    file_groups * headroom width, and no Python."""
    from streaming_data_pipeline_spark.plans.export import (
        _SHARD_WRITE_HEADROOM,
        packing_frame,
    )

    df = spark.createDataFrame(
        [(1, "r", "a.py", "py", "a b c"), (2, "r", "b.py", "py", "d e")],
        "doc_id long, repo string, path string, lang string, text string",
    )
    out = packing_frame(df, 8, 4, F.col("lang"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert f"{4 * _SHARD_WRITE_HEADROOM}" in plan  # explicit width, AQE-proof
    assert "Python" not in plan and "BatchEvalPython" not in plan


def _pack_rows(spark, out):
    import pyspark.sql.functions as SF

    return {
        tuple(r)
        for r in spark.read.parquet(f"{out}/_packing")
        .select(
            "doc_id", "repo", "path",
            SF.col("lang").cast("string"),
            SF.col("file_group").cast("long"),
            "n_tokens", "tok_start", "seq_id", "offset_in_seq",
        )
        .collect()
    }


def test_export_pack_budget_writes_group_aligned_sidecar(spark, tmp_path):
    """shard-and-pack as ONE artifact: _packing/lang=…/file_group=…
    mirrors the shard's G-way groups, coordinates restart per group,
    and re-export reproduces the identical sidecar."""
    import os

    from streaming_data_pipeline_spark.plans.export import export_training_mix
    from streaming_data_pipeline_spark.plans.lake import SnapshotTable
    from streaming_data_pipeline_spark.schemas import CHANGE_EVENT, LAKE_BASE
    from streaming_data_pipeline_spark.streaming.apply import apply_changes

    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=8)
    rows = [
        ("insert", "r", f"f{i}.py", f"c{i}", ["python", "go"][i % 2],
         " ".join(f"w{i}x{j}" for j in range(i % 7 + 4)), i + 1, None, None)
        for i in range(30)
    ]
    apply_changes(spark, table, spark.createDataFrame(rows, CHANGE_EVENT), 0)

    out = str(tmp_path / "mix")
    man = export_training_mix(
        spark, table, out, rates={}, default_rate=100,
        file_groups=4, pack_budget=16,
    )
    assert man["pack_budget"] == 16

    packs = _pack_rows(spark, out)
    assert len(packs) == man["counts"]["sampled"]
    # group-aligned layout on disk
    langs = os.listdir(f"{out}/_packing")
    assert any(d.startswith("lang=") for d in langs)
    # coordinates restart per (lang, file_group): every group's minimum
    # tok_start is 0 and the stream is contiguous (sum of n_tokens)
    import collections

    by_group = collections.defaultdict(list)
    for (_, repo, path, lang, fg, n_tok, tok_start, _seq, _off) in packs:
        by_group[(lang, fg)].append((repo, path, n_tok, tok_start))
    for g, docs in by_group.items():
        docs.sort(key=lambda d: (d[0], d[1]))
        cum = 0
        for (_, _, n_tok, tok_start) in docs:
            assert tok_start == cum, g
            cum += n_tok

    # byte-identical re-export (row-set + per-file layout)
    outB = str(tmp_path / "mixB")
    export_training_mix(
        spark, table, outB, rates={}, default_rate=100,
        file_groups=4, pack_budget=16,
    )
    assert _pack_rows(spark, outB) == packs


def test_refresh_maintains_packing(spark, tmp_path):
    """VERDICT r4 next #5: a delta shifts packing coordinates only
    within affected strata — refresh must land the sidecar exactly
    where a full re-export would, including removed docs and an
    emptied stratum."""
    from streaming_data_pipeline_spark.plans.export import export_training_mix
    from streaming_data_pipeline_spark.plans.lake import SnapshotTable
    from streaming_data_pipeline_spark.plans.refresh import refresh_training_mix
    from streaming_data_pipeline_spark.schemas import CHANGE_EVENT, LAKE_BASE
    from streaming_data_pipeline_spark.streaming.apply import apply_changes

    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=8)
    rows = [
        ("insert", "r", f"f{i}.py", f"c{i}", ["python", "go", "rust"][i % 3],
         " ".join(f"w{i}x{j}" for j in range(i % 7 + 4)), i + 1, None, None)
        for i in range(30)
    ]
    apply_changes(spark, table, spark.createDataFrame(rows, CHANGE_EVENT), 0)
    out = str(tmp_path / "mix")
    export_training_mix(
        spark, table, out, rates={}, default_rate=100,
        file_groups=4, pack_budget=16,
    )

    # delta: update one python doc (shifts its group's suffix), delete
    # another, add a go doc, and empty the rust stratum entirely
    delta = [
        ("update", "r", "f0.py", "c100", "python", "tok0 longer now " * 3, 100, None, None),
        ("delete", "r", "f3.py", "c101", "python", None, 101, None, None),
        ("insert", "r", "new.go", "c102", "go", "fresh go doc tokens", 102, None, None),
    ] + [
        ("delete", "r", f"f{i}.py", f"c{110 + i}", "rust", None, 110 + i, None, None)
        for i in range(2, 30, 3)
    ]
    apply_changes(spark, table, spark.createDataFrame(delta, CHANGE_EVENT), 1)

    manR = refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "mixB")
    manF = export_training_mix(
        spark, table, outB, rates={}, default_rate=100,
        file_groups=4, pack_budget=16,
    )
    assert manR["counts"] == manF["counts"]
    assert _pack_rows(spark, out) == _pack_rows(spark, outB)

    # the emptied rust stratum lost its packing dir, like the export
    import os

    assert not os.path.exists(f"{out}/_packing/lang=rust")
    assert not os.path.exists(f"{outB}/_packing/lang=rust")
