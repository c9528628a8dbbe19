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


def test_cow_merge_feeds_changes_via_changelog(spark, tmp_path):
    """COW merges contribute their deduped batch to the change feed via
    the kind='changelog' sidecar, while data reads NEVER see those files
    (the merged base rows already hold them — reading both would double
    the live view)."""
    table = SnapshotTable.create(str(tmp_path / "cl"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1), _ev("insert", "b.py", 2)]), 0)
    v1 = table.current_version()
    apply_changes(
        spark, table,
        _batch(spark, [_ev("update", "a.py", 3, "v2"), _ev("delete", "b.py", 4), _ev("insert", "c.py", 5)]),
        1, mode="cow",
    )
    v2 = table.current_version()

    feed = table.changes_between(spark, v1, v2)
    rows = {(r["path"], r["lsn"], r["_deleted"]) for r in feed.collect()}
    assert rows == {("a.py", 3, False), ("b.py", 4, True), ("c.py", 5, False)}

    # live view counts each key ONCE (changelog excluded from reads)
    state = {(r["path"], r["lsn"]) for r in table.current_state(spark).collect()}
    assert state == {("a.py", 3), ("c.py", 5)}
    # and the raw (unresolved) scan holds no duplicate of the merged rows
    raw = table.read(spark, resolved=False)
    assert raw.groupBy("repo", "path").count().filter("count > 1").count() == 0

    # compaction ignores changelog entries when counting fragmentation:
    # a freshly-merged table (1 base file + 1 changelog entry per
    # bucket) needs NO rewrite, and compact() is a version no-op
    from streaming_data_pipeline_spark.plans.maintenance import compact

    v_before = table.current_version()
    compact(spark, table, max_files_per_bucket=1)
    assert table.current_version() == v_before


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


def test_concurrent_appenders_optimistic_retry(spark, tmp_path):
    """Two MOR appenders racing on the same table: unique staging dirs +
    commit retry mean BOTH land (the Iceberg optimistic-commit model);
    no delta is lost and the resolved state sees both keys."""
    from concurrent.futures import ThreadPoolExecutor

    from streaming_data_pipeline_spark.operators.merge import append_delta

    table = SnapshotTable.create(str(tmp_path / "cc"), LAKE_BASE, n_buckets=4)

    def append(tag, lsn):
        df = _batch(spark, [_ev("insert", f"{tag}.py", lsn)])
        return append_delta(spark, table, df, epoch=lsn)

    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(append, "left", 1)
        f2 = pool.submit(append, "right", 2)
        r1, r2 = f1.result(), f2.result()
    assert {r1["version"], r2["version"]} == {1, 2}  # both committed
    paths = {r["path"] for r in table.current_state(spark).collect()}
    assert paths == {"left.py", "right.py"}


def test_stale_writer_cannot_roll_back_schema(spark, tmp_path):
    """Schema evolution is union-by-name at commit: a writer that never
    saw another writer's promoted column re-commits its older schema
    without erasing the newer column."""
    import pyspark.sql.types as T

    from streaming_data_pipeline_spark.operators.merge import append_delta

    table = SnapshotTable.create(str(tmp_path / "sw"), LAKE_BASE, n_buckets=4)
    evolved = T.StructType(list(LAKE_BASE.fields) + [T.StructField("stars", T.StringType(), True)])
    append_delta(spark, table, _batch(spark, [_ev("insert", "a.py", 1)]), epoch=0, new_schema=evolved)
    assert "stars" in [f.name for f in table.schema().fields]
    # stale writer commits with the ORIGINAL schema
    append_delta(spark, table, _batch(spark, [_ev("insert", "b.py", 2)]), epoch=1, new_schema=LAKE_BASE)
    assert "stars" in [f.name for f in table.schema().fields]


def test_remove_orphan_files(spark, tmp_path):
    """Files written by a crashed/losing writer (staged, never committed)
    are reclaimed; committed files survive."""
    import os

    from streaming_data_pipeline_spark.plans.maintenance import remove_orphan_files

    table = SnapshotTable.create(str(tmp_path / "of"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1)]), 0)
    h = table.state_hash(spark)

    # simulate a crashed writer: fully-written staging, no commit
    orphan_dir = table.new_staging_dir("delta-crashed")
    _batch(spark, [_ev("insert", "ghost.py", 9)]).write.mode("overwrite").parquet(orphan_dir)
    assert any(f.endswith(".parquet") for f in os.listdir(orphan_dir))

    deleted = remove_orphan_files(table)
    assert deleted and all("delta-crashed" in p or "stage" in p for p in deleted)
    assert not os.path.exists(orphan_dir)
    assert table.state_hash(spark) == h  # committed data untouched


def test_remove_orphans_reclaims_commit_losers(spark, tmp_path):
    """ADVICE r2: a writer that loses the v{N}.json race leaves its
    fallback manifest-{N}-{k}.json behind, referencing its staged data
    files. Those manifests are named by NO snapshot — treating them as
    live pinned the loser's files forever. Both the files and the
    orphan manifest must be reclaimed; committed manifests survive."""
    import json
    import os

    from streaming_data_pipeline_spark.plans.lake import _atomic_write_json
    from streaming_data_pipeline_spark.plans.maintenance import remove_orphan_files

    table = SnapshotTable.create(str(tmp_path / "ol"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1)]), 0)
    h = table.state_hash(spark)

    # simulate the loser: staged files + a fallback manifest naming them,
    # but no v{N}.json publish (it lost the exclusive-link race)
    loser_dir = table.new_staging_dir("delta-loser")
    _batch(spark, [_ev("insert", "lost.py", 9)]).write.mode("overwrite").parquet(loser_dir)
    rels = []
    for dirpath, _d, files in os.walk(loser_dir):
        rels += [
            os.path.relpath(os.path.join(dirpath, f), table.root)
            for f in files
            if f.endswith(".parquet")
        ]
    assert rels
    _atomic_write_json(
        {"files": [{"path": p, "bucket": 0, "rows": 1, "kind": "delta"} for p in rels]},
        os.path.join(table.meta_dir, "manifest-2-1.json"),
    )

    deleted = remove_orphan_files(table)
    assert any(p.endswith("manifest-2-1.json") for p in deleted)
    assert not os.path.exists(loser_dir)
    assert not os.path.exists(os.path.join(table.meta_dir, "manifest-2-1.json"))
    # every committed manifest is still present and the state unchanged
    meta = table.metadata()
    for s in meta["snapshots"].values():
        assert os.path.exists(os.path.join(table.meta_dir, s["manifest"]))
    assert table.state_hash(spark) == h


def test_rollback_of_rollback_schema(spark, tmp_path):
    """A rollback is itself a schema event in the log: rolling back TO a
    post-rollback version must restore the schema live AT that version,
    not the newest pre-rollback one (review r2 finding)."""
    table = SnapshotTable.create(str(tmp_path / "rr"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1)]), 0)
    v_plain = table.current_version()
    apply_changes(spark, table, _batch(spark, [_ev("insert", "b.py", 2, payload={"stars": "5"})]), 1)
    v_rb1 = table.rollback(v_plain)            # pins the stars-less schema
    assert "stars" not in [f.name for f in table.schema().fields]
    apply_changes(spark, table, _batch(spark, [_ev("insert", "c.py", 3)]), 2)
    table.rollback(v_rb1)                      # roll back TO the first rollback
    assert "stars" not in [f.name for f in table.schema().fields]


def test_change_feed_skips_rollback_readds(spark, tmp_path):
    """A rollback that re-publishes deltas compaction had retired must
    NOT re-emit their rows into the change feed (double-apply hazard)."""
    table = SnapshotTable.create(str(tmp_path / "cf"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1)]), 0)
    v1 = table.current_version()
    compact(spark, table, max_files_per_bucket=1)   # retires the delta
    v2 = table.current_version()
    table.rollback(v1)                              # re-adds the delta file
    v3 = table.current_version()
    assert table.changes_between(spark, v2, v3).count() == 0
    # and the cumulative feed still shows the original delivery exactly once
    assert table.changes_between(spark, 0, v3).count() == 1


def test_rollback_sidecar_makes_feed_visible(spark, tmp_path):
    """rollback(v, spark) records the key-level inverse as a changelog
    sidecar (VERDICT r3 missing #1): the feed across the rollback
    delivers the restored rows — target-state values for updated and
    deleted keys, a retraction tombstone for keys born after the
    target — while the republished old data files are still not
    re-delivered, and the live view is untouched by the sidecar."""
    table = SnapshotTable.create(str(tmp_path / "rbcf"), LAKE_BASE, n_buckets=4)
    apply_changes(
        spark, table,
        _batch(spark, [_ev("insert", "a.py", 1, "alpha"), _ev("insert", "b.py", 2, "beta")]),
        0,
    )
    v1 = table.current_version()
    h_good = table.state_hash(spark)
    apply_changes(
        spark, table,
        _batch(spark, [
            _ev("update", "a.py", 3, "bad deploy"),
            _ev("delete", "b.py", 4),
            _ev("insert", "c.py", 5, "newborn"),
        ]),
        1,
    )
    v2 = table.current_version()

    v3 = table.rollback(v1, spark)
    assert table.state_hash(spark) == h_good  # sidecar is feed-only, not data

    inv = {r["path"]: r for r in table.changes_between(spark, v2, v3).collect()}
    assert set(inv) == {"a.py", "b.py", "c.py"}
    assert inv["a.py"]["content"] == "alpha" and inv["a.py"]["lsn"] == 1
    assert not inv["a.py"]["_deleted"]
    assert inv["b.py"]["content"] == "beta" and not inv["b.py"]["_deleted"]
    # c.py never existed at the target: its birth is retracted
    assert inv["c.py"]["_deleted"] and inv["c.py"]["lsn"] == 5

    # cumulative feed = the bad epoch's rows once + the inverse once
    assert table.changes_between(spark, v1, v3).count() == 6
    # a legacy metadata-only rollback still contributes nothing
    v4 = table.rollback(v2)
    assert table.changes_between(spark, v3, v4).count() == 0


def test_rollback_sidecar_across_rebucket(spark, tmp_path):
    """rollback(v, spark) across a partition-spec evolution: the
    key-level inverse must be computed under the bucket modulus IN
    EFFECT AT THE TARGET (bucket_log walk) — the rebucket commit itself
    is feed-invisible (kind='base', like compaction), the restored
    modulus governs subsequent applies, and the feed across the
    rollback still names exactly the keys the rolled-back epoch
    delivered."""
    from streaming_data_pipeline_spark.plans.maintenance import rebucket

    table = SnapshotTable.create(str(tmp_path / "rbrb"), LAKE_BASE, n_buckets=4)
    apply_changes(
        spark, table,
        _batch(spark, [_ev("insert", "a.py", 1, "alpha"), _ev("insert", "b.py", 2, "beta")]),
        0,
    )
    v1 = table.current_version()
    h_good = table.state_hash(spark)

    rebucket(spark, table, 8)
    apply_changes(
        spark, table,
        _batch(spark, [_ev("update", "a.py", 3, "bad"), _ev("insert", "c.py", 4, "newborn")]),
        1,
    )
    v3 = table.current_version()

    v4 = table.rollback(v1, spark)
    assert table.state_hash(spark) == h_good
    assert table.n_buckets == 4  # modulus restored with the manifest

    inv = {r["path"]: r for r in table.changes_between(spark, v3, v4).collect()}
    assert set(inv) == {"a.py", "c.py"}
    assert inv["a.py"]["content"] == "alpha" and not inv["a.py"]["_deleted"]
    assert inv["c.py"]["_deleted"] and inv["c.py"]["lsn"] == 4

    # life goes on under the restored modulus: apply + point lookup
    apply_changes(spark, table, _batch(spark, [_ev("insert", "d.py", 5, "post")]), 2)
    assert table.lookup(spark, "r", "d.py").count() == 1
    assert table.current_state(spark).count() == 3


def test_commit_rejects_stale_bucket_modulus(spark, tmp_path):
    """A writer whose bucket ids were computed under an older modulus
    must fail at commit even when there is no version conflict — a
    rebucket landing cleanly before the commit leaves nothing to race."""
    import pytest

    from streaming_data_pipeline_spark.plans.maintenance import rebucket

    table = SnapshotTable.create(str(tmp_path / "sb"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1)]), 0)
    nb_seen_by_writer = table.n_buckets
    rebucket(spark, table, 8)  # concurrent layout change
    with pytest.raises(RuntimeError, match="bucket layout changed"):
        table.commit(
            new_files=[], replaced_buckets=set(), operation="append_delta",
            expected_n_buckets=nb_seen_by_writer,
        )


def test_rollback_past_rebucket_restores_modulus(spark, tmp_path):
    """Rolling back over a rebucket must restore the modulus the target
    manifest's bucket ids were computed under — otherwise lookups hash
    mod the NEW count against entries labeled under the old one and
    silently miss existing keys (review r2 finding: the bucket-layout
    analog of the schema pin)."""
    from streaming_data_pipeline_spark.plans.maintenance import rebucket

    table = SnapshotTable.create(str(tmp_path / "rbb"), LAKE_BASE, n_buckets=4)
    apply_changes(
        spark, table,
        _batch(spark, [_ev("insert", f"f{i}.py", i + 1) for i in range(40)]),
        0,
    )
    v_pre = table.current_version()
    h_pre = table.state_hash(spark)

    v_rb = rebucket(spark, table, 16)
    assert table.n_buckets == 16

    table.rollback(v_pre)
    assert table.n_buckets == 4  # modulus rolled back with the manifest
    assert table.state_hash(spark) == h_pre
    # point lookup prunes under the RESTORED modulus and finds the key
    got = table.lookup(spark, "r", "f7.py").collect()
    assert len(got) == 1 and got[0]["lsn"] == 8
    # appends after the rollback keep working under the old modulus
    apply_changes(spark, table, _batch(spark, [_ev("insert", "g.py", 900)]), 1)
    assert table.lookup(spark, "r", "g.py").count() == 1

    # rolling FORWARD to the rebucketed snapshot restores the new modulus
    table.rollback(v_rb)
    assert table.n_buckets == 16
    assert len(table.lookup(spark, "r", "f7.py").collect()) == 1


def test_bucket_replacing_commit_rejects_concurrent_append(spark, tmp_path):
    """A bucket-REPLACING commit (compaction/COW merge) built on a stale
    read must fail if a concurrent commit added files to the replaced
    buckets since — carrying only the rewriter's files would silently
    drop the concurrent rows (review r2 finding)."""
    import pytest

    from streaming_data_pipeline_spark.operators.merge import append_delta

    table = SnapshotTable.create(str(tmp_path / "cc"), LAKE_BASE, n_buckets=2)
    append_delta(spark, table, _batch(spark, [_ev("insert", f"f{i}.py", i + 1) for i in range(8)]))
    v_read = table.current_version()
    touched = {e["bucket"] for e in table.manifest(v_read)}

    # concurrent append lands between the rewriter's read and its commit
    append_delta(spark, table, _batch(spark, [_ev("insert", "late.py", 99)]))

    with pytest.raises(RuntimeError, match="conflicting commit"):
        table.commit(
            new_files=[],
            replaced_buckets=touched,
            operation="compact",
            expected_version=v_read,
        )

    # ...and the end-to-end rewrite path still succeeds on a fresh read
    from streaming_data_pipeline_spark.plans.maintenance import compact

    h = table.state_hash(spark)
    compact(spark, table, max_files_per_bucket=1)
    assert table.state_hash(spark) == h


def test_change_feed_truncation_surfaces_after_expiry(spark, tmp_path):
    """Retention bounds the feed: once expire_snapshots deletes a delta
    no retained snapshot references, changes_between over that range
    must FAIL LOUDLY (silent truncation would ship a stale refresh) —
    while the retained-range feed still works."""
    import pytest

    from streaming_data_pipeline_spark.plans.maintenance import (
        compact,
        expire_snapshots,
    )

    table = SnapshotTable.create(str(tmp_path / "tr"), LAKE_BASE, n_buckets=4)
    # two epochs on the SAME key fragment its bucket (2 delta files), so
    # the compaction genuinely retires them from the live manifest
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1)]), 0)
    apply_changes(spark, table, _batch(spark, [_ev("update", "a.py", 2, "v2")]), 1)
    compact(spark, table, max_files_per_bucket=1)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "c.py", 3)]), 2)
    v_recent = table.current_version()

    expire_snapshots(table, keep_last=2)  # drops the pre-compaction deltas
    with pytest.raises(FileNotFoundError, match="truncated"):
        table.changes_between(spark, 0).count()
    # the retained horizon still feeds
    assert table.changes_between(spark, v_recent - 1, v_recent).count() == 1


def test_rollback_race_cleans_staged_sidecar(spark, tmp_path, monkeypatch):
    """A rollback that loses the version race (concurrent commit wins
    v{nv}.json) must not leak its staged inverse-changelog parquet nor
    the speculative manifest: those data files are referenced by no
    manifest and nothing else would ever reclaim the manifest file
    (ADVICE r4, plans/lake.py rollback commit path)."""
    import glob
    import json
    import os

    import pytest

    import streaming_data_pipeline_spark.plans.lake as lake_mod

    table = SnapshotTable.create(str(tmp_path / "t"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, _batch(spark, [_ev("insert", "a.py", 1)]), 0)
    v_good = table.current_version()
    apply_changes(spark, table, _batch(spark, [_ev("update", "a.py", 2, "v2")]), 1)

    # a concurrent writer steals the version slot BETWEEN rollback's
    # metadata read and its exclusive publish: intercept the publish
    # and pre-create the destination just before the real write runs
    nv = table.metadata()["version"] + 1
    winner = os.path.join(table.meta_dir, f"v{nv}.json")
    real_write = lake_mod._atomic_write_json

    def racing(payload, dest, **kw):
        if kw.get("exclusive") and dest == winner and not os.path.exists(winner):
            with open(winner, "w") as f:
                json.dump({"stolen": True}, f)
        return real_write(payload, dest, **kw)

    monkeypatch.setattr(lake_mod, "_atomic_write_json", racing)
    manifests_before = set(glob.glob(os.path.join(table.meta_dir, "manifest-*")))
    with pytest.raises(FileExistsError, match="concurrent"):
        table.rollback(v_good, spark)
    monkeypatch.setattr(lake_mod, "_atomic_write_json", real_write)

    # staged sidecar dir removed, no speculative manifest left behind
    assert not glob.glob(os.path.join(table.data_dir, "rollback-*"))
    assert set(glob.glob(os.path.join(table.meta_dir, "manifest-*"))) == manifests_before

    # the table still works: clear the fake winner and roll back for real
    os.remove(winner)
    table.rollback(v_good, spark)
    assert table.current_state(spark).count() == 1
