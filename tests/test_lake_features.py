"""Snapshot rollback and incremental change-feed reads (Iceberg
`rollback_to_snapshot` / incremental-append-scan analogs)."""

from __future__ import annotations

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.plans.maintenance import compact
from streaming_data_pipeline_spark.schemas import CHANGE_EVENT, LAKE_BASE
from streaming_data_pipeline_spark.streaming.apply import apply_changes

CH = CHANGE_EVENT


def _batch(spark, rows):
    return spark.createDataFrame(rows, CH)


def _ev(op, path, lsn, content="x", payload=None):
    return (op, "r", path, f"c{lsn}", "python",
            None if op == "delete" else content, lsn, None, payload)


def test_rollback_restores_state_and_keeps_history(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1), _ev("insert", "b.py", 2)]), 0)
    v_good = table.current_version()
    h_good = table.state_hash(spark)
    apply_changes(
        spark, table,
        _batch(spark, [_ev("update", "a.py", 3, "bad deploy"), _ev("delete", "b.py", 4)]),
        1,
    )
    assert table.state_hash(spark) != h_good

    nv = table.rollback(v_good)
    assert nv > v_good  # rollback is a NEW commit, not a rewind
    assert table.state_hash(spark) == h_good
    # history preserved: the bad snapshot is still time-travelable
    bad = table.read(spark, version=nv - 1, resolved=True)
    assert bad.filter(F.col("_deleted")).count() == 1


def test_rollback_pins_pre_evolution_schema(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t2"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1)]), 0)
    v0 = table.current_version()
    apply_changes(spark, table, _batch(spark, [_ev("insert", "b.py", 2, payload={"stars": "5"})]), 1)
    assert "stars" in [f.name for f in table.schema().fields]
    table.rollback(v0)
    assert "stars" not in [f.name for f in table.schema().fields]
    assert "stars" not in table.current_state(spark).columns


def test_changes_between_is_the_change_feed(spark, tmp_path):
    """MOR deltas between two snapshots are exactly the applied change
    rows (tombstones included); compaction rewrites don't re-emit."""
    table = SnapshotTable.create(str(tmp_path / "t3"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1), _ev("insert", "b.py", 2)]), 0)
    v1 = table.current_version()
    apply_changes(
        spark, table,
        _batch(spark, [_ev("update", "a.py", 3, "v2"), _ev("delete", "b.py", 4), _ev("insert", "c.py", 5)]),
        1,
    )
    v2 = table.current_version()

    feed = table.changes_between(spark, v1, v2)
    rows = {(r["path"], r["lsn"], r["_deleted"]) for r in feed.collect()}
    assert rows == {("a.py", 3, False), ("b.py", 4, True), ("c.py", 5, False)}

    # maintenance must not replay into the feed
    compact(spark, table, max_files_per_bucket=1)
    v3 = table.current_version()
    assert table.changes_between(spark, v2, v3).count() == 0
    # while the cumulative feed from v1 still shows epoch 1's changes
    assert {(r["path"], r["lsn"]) for r in table.changes_between(spark, v1, v3).collect()} == {
        ("a.py", 3), ("b.py", 4), ("c.py", 5)
    }


def test_rebucket_partition_evolution(spark, tmp_path):
    """Rebucketing preserves state bit-for-bit, switches the modulus for
    future applies and lookups, and keeps old snapshots readable."""
    from streaming_data_pipeline_spark.plans.maintenance import rebucket

    table = SnapshotTable.create(str(tmp_path / "rb"), LAKE_BASE, n_buckets=4)
    apply_changes(
        spark, table,
        _batch(spark, [_ev("insert", f"f{i}.py", i + 1) for i in range(40)] + [_ev("delete", "f0.py", 100)]),
        0,
    )
    h = table.state_hash(spark)
    v_old = table.current_version()

    rebucket(spark, table, 16)
    assert table.n_buckets == 16
    assert table.state_hash(spark) == h                      # state preserved
    assert {e["bucket"] for e in table.manifest()} <= set(range(16))
    assert len({e["bucket"] for e in table.manifest()}) > 4  # actually spread
    assert table.read(spark, version=v_old).count() > 0      # time travel intact

    # tombstone survived the rewrite (resurrection still blocked)
    apply_changes(spark, table, _batch(spark, [_ev("update", "f0.py", 50, "stale")]), 1)
    assert table.current_state(spark).filter(F.col("path") == "f0.py").count() == 0

    # point lookup prunes under the NEW modulus and still finds the key
    got = table.lookup(spark, "r", "f7.py").collect()
    assert len(got) == 1 and got[0]["lsn"] == 8


def test_bucket_change_requires_full_rewrite(spark, tmp_path):
    """Changing n_buckets while carrying old-modulus files is refused —
    stale bucket ids under a new modulus would corrupt pruning."""
    import pytest

    table = SnapshotTable.create(str(tmp_path / "rb2"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1)]), 0)
    with pytest.raises(ValueError, match="ALL buckets"):
        table.commit(new_files=[], replaced_buckets=set(), n_buckets=8)
