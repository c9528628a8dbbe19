"""The spark-submit CLI surface (`python -m streaming_data_pipeline_spark`),
driven in-process: main(argv) uses getOrCreate so the test session is
reused — every subcommand a cluster operator would run against a real
deployment (run → compact → metrics/lineage → expire-snapshots →
rebucket → replay-dlq → remove-orphans) exercises the same code path
spark-submit does, minus JVM startup."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.__main__ import main
from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.sources.changegen import generate_changes


def test_cli_full_operator_workflow(spark, tmp_path, capsys):
    wal = str(tmp_path / "wal")
    root = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    generate_changes(
        spark, 4000, seed=11, events_per_epoch=1000, invalid_ratio=0.1,
        delete_ratio=0.05, partitions=4,
    ).write.partitionBy("epoch").mode("overwrite").parquet(wal)

    # run: creates the table, drains the WAL (availableNow) one epoch
    # per WAL file so maintenance has multi-snapshot history to work on
    assert main(["run", "--wal", wal, "--table", root,
                 "--checkpoint", ckpt, "--n-buckets", "8",
                 "--max-files-per-trigger", "1"]) == 0
    table = SnapshotTable.load(root)
    n_live = table.current_state(spark).count()
    h = table.state_hash(spark)
    assert n_live > 0

    # re-run against the same checkpoint: nothing new, state unchanged
    assert main(["run", "--wal", wal, "--table", root,
                 "--checkpoint", ckpt]) == 0
    assert table.state_hash(spark) == h

    # compact prints the committed version as JSON
    assert main(["compact", "--table", root]) == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert "version" in json.loads(out[-1])
    assert table.state_hash(spark) == h

    # metrics + lineage render without error; lineage rows are JSON
    assert main(["metrics", "--table", root]) == 0
    assert main(["lineage", "--table", root]) == 0
    lineage = [json.loads(l) for l in capsys.readouterr().out.splitlines()
               if l.startswith("{")]
    assert lineage and all("epoch" in r for r in lineage)

    # expire-snapshots reclaims the pre-compaction delta files
    assert main(["expire-snapshots", "--table", root, "--keep-last", "1"]) == 0
    exp = json.loads([l for l in capsys.readouterr().out.splitlines()
                      if l.startswith("{")][-1])
    assert exp["deleted_files"] > 0
    assert table.state_hash(spark) == h

    # rebucket evolves the partition spec, state preserved
    assert main(["rebucket", "--table", root, "--n-buckets", "16"]) == 0
    assert SnapshotTable.load(root).n_buckets == 16
    assert table.state_hash(spark) == h

    # replay-dlq consumes retryable dead letters (none retryable in this
    # stream: all validation failures are permanent) — still exits 0
    assert main(["replay-dlq", "--table", root, "--epoch", "999"]) == 0

    # remove-orphans on a clean table deletes nothing
    assert main(["remove-orphans", "--table", root]) == 0
    ro = json.loads([l for l in capsys.readouterr().out.splitlines()
                     if l.startswith("{")][-1])
    assert ro["deleted_files"] == 0
    assert table.state_hash(spark) == h

    # export a curated shard, then a same-version refresh is a no-op
    out = str(tmp_path / "shard")
    assert main(["export-shard", "--table", root, "--out", out,
                 "--rates", '{"python": 100}', "--default-rate", "100"]) == 0
    man = json.loads([l for l in capsys.readouterr().out.splitlines()
                      if l.startswith("{")][-1])
    assert man["counts"]["sampled"] > 0
    assert main(["refresh-shard", "--table", root, "--out", out]) == 0
    man2 = json.loads([l for l in capsys.readouterr().out.splitlines()
                       if l.startswith("{")][-1])
    assert man2["snapshot_version"] == man["snapshot_version"]
