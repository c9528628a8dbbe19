"""Incremental shard refresh == full re-export (plans/refresh.py).

The refresh touches only change-feed keys, their sha groups, and the
affected lang partitions — yet must land byte-for-byte on the same
rows, index and counts a from-scratch export at the new snapshot
produces, across keeper promotion/demotion, content moves between
dedup groups, deletes, and sampling."""

from __future__ import annotations

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.plans.export import export_training_mix
from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.plans.refresh import refresh_training_mix
from streaming_data_pipeline_spark.schemas import CHANGE_EVENT, LAKE_BASE
from streaming_data_pipeline_spark.streaming.apply import apply_changes

RATES = {"python": 100, "go": 100, "java": 100}


def _ev(op, path, lsn, content, lang="python"):
    return (op, "r", path, f"c{lsn}", lang,
            None if op == "delete" else content, lsn, None, None)


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_EVENT)


def _shard_rows(spark, out):
    return {
        (r["repo"], r["path"], r["lang"], r["text"], r["_sha"])
        for r in spark.read.parquet(f"{out}/data").collect()
    }


def _index_rows(spark, out):
    return {tuple(r) for r in spark.read.parquet(f"{out}/_index").collect()}


def _seed(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=8)
    # duplicates across keys (dedup groups), several langs, loops for the
    # repetition filter, enough keys that sampling drops some
    rows = []
    for i in range(40):
        lang = ["python", "go", "java"][i % 3]
        content = f"def f_{i // 4}():\n    return {i // 4}\n"  # 4-way dup groups
        rows.append(_ev("insert", f"f{i}.py", i + 1, content, lang))
    rows.append(_ev("insert", "loop.py", 100, "spam " * 50))  # repetition drop
    apply_changes(spark, table, _batch(spark, rows), 0)
    return table


def _mutate(spark, table):
    """Epoch 1: the adversarial delta — keeper deletion (promotion),
    content moves between sha groups (demotion/steal), plain updates,
    new keys joining old groups, fresh groups, and a new lang."""
    rows = [
        _ev("delete", "f0.py", 200, None),                   # keeper of group 0 dies
        _ev("update", "f1.py", 201, "def f_9():\n    return 9\n"),  # moves g0 -> g9
        _ev("update", "f5.py", 202, "brand new content\n", "go"),   # g1 -> new group
        _ev("insert", "a_new.py", 203, "def f_2():\n    return 2\n"),  # joins g2, steals keeper (a < f)
        _ev("insert", "z_new.py", 204, "unique thing\n", "java"),
        _ev("delete", "loop.py", 205, None),
        _ev("insert", "only_rust.py", 206, "fn main() {}\n", "rust"),  # default-rate lang
    ]
    apply_changes(spark, table, _batch(spark, rows), 1)


def test_refresh_equals_full_export(spark, tmp_path):
    table = _seed(spark, tmp_path)
    outA = str(tmp_path / "shardA")
    man0 = export_training_mix(spark, table, outA, rates=RATES, default_rate=50)
    assert man0["counts"]["sampled"] > 0

    _mutate(spark, table)

    manR = refresh_training_mix(spark, table, outA)
    outB = str(tmp_path / "shardB")
    manF = export_training_mix(spark, table, outB, rates=RATES, default_rate=50)

    assert manR["snapshot_version"] == manF["snapshot_version"]
    assert manR["counts"] == manF["counts"]
    assert _shard_rows(spark, outA) == _shard_rows(spark, outB)
    assert _index_rows(spark, outA) == _index_rows(spark, outB)
    assert manR["changed_keys"] == 7

    # refresh with nothing new is a no-op
    again = refresh_training_mix(spark, table, outA)
    assert again["snapshot_version"] == manR["snapshot_version"]


def test_refresh_with_benchmark(spark, tmp_path):
    table = _seed(spark, tmp_path)
    bench = spark.createDataFrame(
        [(0, "def f_3():\n    return 3\n")], "doc_id long, text string"
    )
    outA = str(tmp_path / "bA")
    export_training_mix(
        spark, table, outA, rates=RATES, default_rate=50,
        benchmark=bench, max_contamination=0.4,
    )
    _mutate(spark, table)
    manR = refresh_training_mix(spark, table, outA, benchmark=bench)
    outB = str(tmp_path / "bB")
    manF = export_training_mix(
        spark, table, outB, rates=RATES, default_rate=50,
        benchmark=bench, max_contamination=0.4,
    )
    assert manR["counts"] == manF["counts"]
    assert _shard_rows(spark, outA) == _shard_rows(spark, outB)
    assert _index_rows(spark, outA) == _index_rows(spark, outB)

    # benchmark presence must match the original export
    import pytest

    with pytest.raises(ValueError, match="benchmark"):
        refresh_training_mix(spark, table, outA)


def test_refresh_refuses_feed_invisible_history(spark, tmp_path):
    """COW merges and rollbacks are invisible to the change feed (base
    files / republished manifests); refreshing across them would ship a
    silently stale shard — the refresh must refuse instead."""
    import pytest

    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=50)

    apply_changes(spark, table, _batch(spark, [_ev("insert", "x.py", 300, "xx\n")]), 1, mode="cow")
    with pytest.raises(ValueError, match="merge"):
        refresh_training_mix(spark, table, out)

    # a rollback in range refuses too
    table2 = _seed(spark, tmp_path / "t2")
    out2 = str(tmp_path / "s2")
    export_training_mix(spark, table2, out2, rates=RATES, default_rate=50)
    v_pre = table2.current_version()
    apply_changes(spark, table2, _batch(spark, [_ev("insert", "y.py", 301, "yy\n")]), 1)
    table2.rollback(v_pre)
    with pytest.raises(ValueError, match="rollback"):
        refresh_training_mix(spark, table2, out2)

    # and an OLDER target version refuses outright
    with pytest.raises(ValueError, match="OLDER"):
        refresh_training_mix(spark, table2, out2, version=0)


def test_refresh_recovers_from_torn_swap(spark, tmp_path):
    """A crash between the swap renames leaves an _old_lang dir; the next
    refresh restores it before computing, so no untouched rows are
    lost."""
    import os

    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=50)

    # simulate the torn window: live dir renamed aside, new never landed
    os.rename(f"{out}/data/lang=go", f"{out}/data/_old_lang=go")

    _mutate(spark, table)
    refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    export_training_mix(spark, table, outB, rates=RATES, default_rate=50)
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)


def test_refresh_empties_partition_like_full_export(spark, tmp_path):
    """Deleting every doc of a lang removes its partition dir (a full
    export writes none), and an all-deleted lake yields integer-zero
    counts, not JSON nulls."""
    import os

    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=100)
    assert os.path.isdir(f"{out}/data/lang=java")

    # delete every java doc (i % 3 == 2) and the loop doc
    rows = [_ev("delete", f"f{i}.py", 400 + i, None) for i in range(40) if i % 3 == 2]
    apply_changes(spark, table, _batch(spark, rows), 1)
    man = refresh_training_mix(spark, table, out)
    assert not os.path.isdir(f"{out}/data/lang=java")
    assert man["counts"]["sampled"] > 0  # other langs intact

    # now delete everything else
    rows = [_ev("delete", f"f{i}.py", 500 + i, None) for i in range(40) if i % 3 != 2]
    rows.append(_ev("delete", "loop.py", 600, None))
    apply_changes(spark, table, _batch(spark, rows), 2)
    man = refresh_training_mix(spark, table, out)
    assert man["counts"] == {
        "state_rows": 0, "after_exact_dedup": 0,
        "after_repetition_filter": 0, "sampled": 0,
    }
    assert not any(d.startswith("lang=") for d in os.listdir(f"{out}/data"))
