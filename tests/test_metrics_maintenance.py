"""Metrics/health/lineage views + lake maintenance (compaction,
snapshot expiry, tombstone purge)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.plans import maintenance
from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.schemas import LAKE_BASE
from streaming_data_pipeline_spark.sources.changegen import generate_changes
from streaming_data_pipeline_spark.streaming import metrics
from streaming_data_pipeline_spark.streaming.apply import run_epoch
from streaming_data_pipeline_spark.streaming.exactly_once import EpochLog


def _build(spark, root, n=2000, epochs=4, invalid=0.2):
    table = SnapshotTable.create(root, LAKE_BASE, n_buckets=8)
    log = EpochLog(table.root)
    ch = generate_changes(
        spark, n, seed=5, events_per_epoch=n // epochs, invalid_ratio=invalid,
        delete_ratio=0.1, partitions=2,
    ).persist()
    for ep in sorted(r[0] for r in ch.select("epoch").distinct().collect()):
        run_epoch(spark, table, log, ch.filter(F.col("epoch") == ep), int(ep),
                  source_offsets=[f"wal/epoch-{ep}.parquet"])
    ch.unpersist()
    return table


def test_epoch_metrics_and_health(spark, tmp_path):
    table = _build(spark, str(tmp_path / "m1"))
    m = metrics.epoch_metrics(spark, table.root)
    rows = {r["epoch"]: r for r in m.collect()}
    assert len(rows) >= 4
    for r in rows.values():
        assert r["consumed"] == r["rows_valid"] + r["dlq_rows"]
        assert 0 <= r["error_rate"] <= 100
    # 20% invalid ⇒ warning under the reference's 10% rule
    assert metrics.overall_health(spark, table.root) == "warning"
    statuses = {r["status"] for r in metrics.health_report(spark, table.root).collect()}
    assert "warning" in statuses


def test_lineage_queries(spark, tmp_path):
    table = _build(spark, str(tmp_path / "m2"))
    lin = metrics.lineage_table(spark, table.root)
    assert lin.filter(F.col("input_file").isNull()).count() == 0
    files = metrics.files_for_offsets(spark, table.root, "wal/epoch-0.parquet")
    # staging dirs are writer-unique (data/delta-e<epoch>-<token> for MOR
    # appends, data/snap-N for COW/maintenance rewrites)
    assert files and all(f.startswith("data/") and f.endswith(".parquet") for f in files)


def test_compaction_reduces_files_preserves_state(spark, tmp_path):
    table = _build(spark, str(tmp_path / "m3"))
    before_files = len(table.manifest())
    h0 = table.state_hash(spark)
    v = maintenance.compact(spark, table, max_files_per_bucket=1)
    assert v == table.current_version()
    after = table.manifest()
    from collections import Counter

    counts = Counter(e["bucket"] for e in after)
    assert all(n == 1 for n in counts.values())
    assert len(after) <= before_files
    assert table.state_hash(spark) == h0  # live state unchanged


def test_expire_snapshots_deletes_unreferenced(spark, tmp_path):
    table = _build(spark, str(tmp_path / "m4"))
    # compaction supersedes the per-epoch delta files; expiry then
    # reclaims them once no retained snapshot references them
    maintenance.compact(spark, table, max_files_per_bucket=1)
    all_files_before = {
        os.path.join(table.root, e["path"]) for e in table.manifest()
    }
    deleted = maintenance.expire_snapshots(table, keep_last=1)
    assert deleted, "superseded snapshot files should be removed"
    # current snapshot still fully readable
    assert table.current_state(spark).count() > 0
    for f in all_files_before:  # current manifest's files untouched
        assert os.path.exists(f)


def test_purge_tombstones(spark, tmp_path):
    table = _build(spark, str(tmp_path / "m5"))
    n_tomb = table.read(spark).filter(F.col("_deleted")).count()
    assert n_tomb > 0
    h0 = table.state_hash(spark)
    maintenance.purge_tombstones(spark, table, lsn_horizon=10**9)
    assert table.read(spark).filter(F.col("_deleted")).count() == 0
    assert table.state_hash(spark) == h0  # live view unaffected


def test_expire_replays_pending_deletes_after_crash(spark, tmp_path, monkeypatch):
    """A crash between the expiry's metadata publish and its unlink loop
    must not strand files forever: the published expiry snapshot records
    its intended drop set, and the next expiry replays it (review r2
    finding — the pruned log no longer names the expired versions, and
    kept manifests still reference the files, so nothing else can ever
    reclaim them)."""
    table = _build(spark, str(tmp_path / "m6"))
    maintenance.compact(spark, table, max_files_per_bucket=1)

    real_unlink = os.unlink

    def boom(path, *a, **k):
        if str(path).endswith(".parquet"):
            raise OSError("injected crash mid-delete")
        return real_unlink(path, *a, **k)

    monkeypatch.setattr(maintenance.os, "unlink", boom)
    try:
        maintenance.expire_snapshots(table, keep_last=1)
        raise AssertionError("injected crash did not fire")
    except OSError:
        pass
    monkeypatch.setattr(maintenance.os, "unlink", real_unlink)

    # metadata was published (expiry snapshot exists, log pruned)...
    meta = table.metadata()
    exp = [s for s in meta["snapshots"].values() if s["operation"] == "expire_snapshots"]
    assert exp and exp[-1]["summary"]["pending_deletes"]
    # ...but the files survived the crash
    stranded = [
        rel for rel in exp[-1]["summary"]["pending_deletes"]
        if os.path.exists(os.path.join(table.root, rel))
    ]
    assert stranded, "crash should have left undeleted files"

    # the next expiry replays the pending list before its own work
    maintenance.expire_snapshots(table, keep_last=1)
    for rel in stranded:
        assert not os.path.exists(os.path.join(table.root, rel))
    assert table.current_state(spark).count() > 0
