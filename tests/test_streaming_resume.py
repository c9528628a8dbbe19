"""Chaos / exactly-once tests (SURVEY.md §5.3, FIXTURES.md §5.2):
kill the streaming query mid-run, resume from checkpoint, and assert
the final state equals a clean batch apply and a clean replay."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.schemas import LAKE_BASE
from streaming_data_pipeline_spark.sources.changegen import generate_changes
from streaming_data_pipeline_spark.streaming.apply import apply_changes
from streaming_data_pipeline_spark.streaming.exactly_once import EpochLog
from streaming_data_pipeline_spark.streaming.stream import start_cdc_stream

N = 3000


@pytest.fixture(scope="module")
def wal_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("wal")
    changes = generate_changes(
        spark, N, seed=21, events_per_epoch=600, evolve_payload_at_epoch=2, partitions=2
    )
    for ep in sorted(r[0] for r in changes.select("epoch").distinct().collect()):
        changes.filter(F.col("epoch") == ep).drop("epoch").coalesce(1).write.mode(
            "append"
        ).parquet(str(base))
    return str(base)


def test_crash_resume_equals_clean_replay(spark, tmp_path, wal_dir):
    # crashed-and-resumed run
    t1 = SnapshotTable.create(str(tmp_path / "l1"), LAKE_BASE, n_buckets=8)
    q = start_cdc_stream(
        spark, t1, wal_dir, str(tmp_path / "cp1"), max_files_per_trigger=1, fail_after_epochs=2
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    epochs_at_crash = EpochLog(t1.root).epochs()
    assert len(epochs_at_crash) == 2
    q2 = start_cdc_stream(spark, t1, wal_dir, str(tmp_path / "cp1"))
    q2.awaitTermination()

    # clean single-shot run
    t2 = SnapshotTable.create(str(tmp_path / "l2"), LAKE_BASE, n_buckets=8)
    q3 = start_cdc_stream(spark, t2, wal_dir, str(tmp_path / "cp2"), max_files_per_trigger=3)
    q3.awaitTermination()

    assert t1.state_hash(spark) == t2.state_hash(spark)

    # markers are contiguous and lineage maps offsets → files
    lineage = EpochLog(t1.root).lineage()
    assert [r["epoch"] for r in lineage] == list(range(len(lineage)))
    assert all(r["source_offsets"]["input_files"] for r in lineage)


def test_marker_skip_prevents_double_apply(spark, tmp_path, wal_dir):
    """Crash window B: marker exists → epoch is skipped on replay (the
    run_epoch guard), even if the batch is re-delivered."""
    from streaming_data_pipeline_spark.streaming.apply import run_epoch

    t = SnapshotTable.create(str(tmp_path / "l3"), LAKE_BASE, n_buckets=8)
    log = EpochLog(t.root)
    batch = spark.read.parquet(wal_dir)
    stats = run_epoch(spark, t, log, batch, 0)
    assert stats is not None
    v = t.current_version()
    assert run_epoch(spark, t, log, batch, 0) is None  # marker short-circuit
    assert t.current_version() == v


def test_batch_vs_streaming_equivalence(spark, tmp_path, wal_dir):
    """demo_mvp-style batch API (apply_changes on the whole WAL at once)
    converges to the same live state as the epoch-ordered streaming run."""
    t_batch = SnapshotTable.create(str(tmp_path / "l4"), LAKE_BASE, n_buckets=8)
    apply_changes(spark, t_batch, spark.read.parquet(wal_dir), epoch=0)

    t_stream = SnapshotTable.create(str(tmp_path / "l5"), LAKE_BASE, n_buckets=8)
    q = start_cdc_stream(spark, t_stream, wal_dir, str(tmp_path / "cp5"), max_files_per_trigger=2)
    q.awaitTermination()

    a = t_batch.current_state(spark).select("repo", "path", "lsn", F.sha2("content", 256))
    b = t_stream.current_state(spark).select("repo", "path", "lsn", F.sha2("content", 256))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_processing_time_soak_trigger(spark, tmp_path, wal_dir):
    """The soak path (processingTime trigger) applies epochs continuously
    and picks up NEW WAL files appended while the query runs — the
    long-running-tailer mode, vs availableNow's drain-and-stop."""
    import time

    t = SnapshotTable.create(str(tmp_path / "l6"), LAKE_BASE, n_buckets=8)
    q = start_cdc_stream(
        spark, t, wal_dir, str(tmp_path / "cp6"),
        processing_time="500 milliseconds", compact_every=None,
    )
    try:
        log = EpochLog(t.root)
        deadline = time.time() + 60
        while time.time() < deadline and not log.epochs():
            time.sleep(0.5)
        assert log.epochs(), "no epoch applied within 60s of soak start"
        n0 = t.current_state(spark).count()

        # append new change files while the query is live
        spark.createDataFrame(
            [("insert", "soak/repo", "live.py", "c9", "python", "x = 9", 10**9, None, None)],
            "op string, repo string, path string, commit string, lang string, "
            "content string, lsn long, ts timestamp, payload map<string,string>",
        ).write.mode("append").parquet(wal_dir)

        deadline = time.time() + 60
        while time.time() < deadline:
            live = t.current_state(spark).filter(F.col("repo") == "soak/repo").count()
            if live:
                break
            time.sleep(0.5)
        assert live == 1, "appended WAL file not picked up by the soak trigger"
        assert t.current_state(spark).count() == n0 + 1
    finally:
        q.stop()


def test_checkpoint_offsets_reads_compacted_file_log(tmp_path):
    """FileStreamSourceLog rewrites every compactInterval-th batch as
    <K>.compact (all history, batchId-tagged) and deletes old plain
    files — lineage for those batches must come from the compact file
    (review r2 finding: every 10th epoch got empty lineage)."""
    import json

    from streaming_data_pipeline_spark.streaming.stream import checkpoint_offsets

    src = tmp_path / "ck" / "sources" / "0"
    src.mkdir(parents=True)
    # batch 9 was compacted: no plain file "9", only "9.compact" holding
    # batches 0..9 with per-entry batchId tags
    entries = [
        {"path": f"file:///wal/epoch-{b}.parquet", "timestamp": 1, "batchId": b}
        for b in range(10)
    ]
    (src / "9.compact").write_text(
        "v1\n" + "\n".join(json.dumps(e) for e in entries)
    )
    got = checkpoint_offsets(str(tmp_path / "ck"), 9)
    assert got == ["file:///wal/epoch-9.parquet"]
    # a batch INSIDE the compacted window (plain file already deleted)
    got = checkpoint_offsets(str(tmp_path / "ck"), 3)
    assert got == ["file:///wal/epoch-3.parquet"]


def test_checkpoint_offsets_kafka_blank_metadata_line(tmp_path):
    """OffsetSeq serializes absent metadata as an EMPTY line; the parser
    must not collapse blank lines before slicing or the first source's
    offsets shift into the metadata slot and vanish (review r2
    finding)."""
    from streaming_data_pipeline_spark.streaming.stream import checkpoint_offsets

    off = tmp_path / "ck2" / "offsets"
    off.mkdir(parents=True)
    (off / "4").write_text('v1\n\n{"events":{"0":120,"1":95}}\n')
    got = checkpoint_offsets(str(tmp_path / "ck2"), 4)
    assert got == ["events:0:120", "events:1:95"]
    # the usual layout (metadata present) still parses
    (off / "5").write_text(
        'v1\n{"batchWatermarkMs":0,"batchTimestampMs":1}\n{"t":{"0":7}}\n'
    )
    assert checkpoint_offsets(str(tmp_path / "ck2"), 5) == ["t:0:7"]
