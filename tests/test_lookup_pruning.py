"""Point-lookup pruning: bucket pruning + per-file repo min/max file
skipping, results identical to a full-state filter."""

from __future__ import annotations

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.plans.maintenance import compact
from streaming_data_pipeline_spark.schemas import LAKE_BASE
from streaming_data_pipeline_spark.sources.changegen import generate_changes
from streaming_data_pipeline_spark.streaming.apply import apply_changes


def test_lookup_matches_full_scan_and_prunes(spark, tmp_path):
    changes = generate_changes(
        spark, 3000, seed=17, events_per_epoch=1000, invalid_ratio=0.0,
        duplicate_ratio=0.0, out_of_order_ratio=0.0, delete_ratio=0.1,
        n_repos=40, partitions=4,
    )
    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=16)
    for ep in sorted(r[0] for r in changes.select("epoch").distinct().collect()):
        apply_changes(spark, table, changes.filter(F.col("epoch") == ep), int(ep))
    compact(spark, table, max_files_per_bucket=1)

    # manifest carries key-range stats after compaction
    assert all(e.get("repo_min") is not None for e in table.manifest())

    state = table.current_state(spark).persist()
    sample = state.orderBy("lsn").limit(3).collect()
    assert sample
    for row in sample:
        got = table.lookup(spark, row["repo"], row["path"]).collect()
        assert len(got) == 1
        assert got[0]["lsn"] == row["lsn"] and got[0]["content"] == row["content"]
        # pruning: repo-range skipping considers no more files than the
        # full manifest (strict reduction asserted in the test below)
        assert len(table.files(repo=row["repo"])) <= len(table.manifest())

    # repo-level lookup returns every live path of that repo
    repo = sample[0]["repo"]
    got_repo = {r["path"] for r in table.lookup(spark, repo).collect()}
    want_repo = {r["path"] for r in state.filter(F.col("repo") == repo).collect()}
    assert got_repo == want_repo
    state.unpersist()

    # absent key → empty, not error
    assert table.lookup(spark, "org_x/none", "nope.py").count() == 0


def test_lookup_prunes_file_count(spark, tmp_path):
    """With one sorted file per bucket, a full-key lookup opens exactly
    the files of ONE bucket whose repo-range matches."""
    changes = generate_changes(
        spark, 2000, seed=23, events_per_epoch=2000, invalid_ratio=0.0,
        duplicate_ratio=0.0, out_of_order_ratio=0.0, delete_ratio=0.0,
        n_repos=30, partitions=4,
    )
    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=16)
    apply_changes(spark, table, changes, 0)
    compact(spark, table, max_files_per_bucket=1)
    total_files = len(table.manifest())
    assert total_files >= 8
    row = table.current_state(spark).limit(1).collect()[0]
    b = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(row["repo"]), F.lit(row["path"])), F.lit(16)).alias("b")
    ).collect()[0]["b"]
    candidate_files = table.files(buckets={b}, repo=row["repo"])
    assert len(candidate_files) < total_files
