"""DLQ replay chaos test (VERDICT r1 #7): inject transient-class
failures into the DLQ, replay the retryable rows as a batch epoch, and
assert the final table state equals a run where nothing failed.
Also pins idempotence (second replay is a no-op), loop prevention
(permanently-invalid rows re-DLQ as not-retryable), and consumption
markers (new files, DLQ untouched)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.functions.dlq import enrich_dead_letters
from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.schemas import CHANGE_EVENT, LAKE_BASE
from streaming_data_pipeline_spark.sources.changegen import generate_changes
from streaming_data_pipeline_spark.streaming.apply import apply_changes, dlq_path, read_dlq
from streaming_data_pipeline_spark.streaming.replay import (
    replay_dlq,
    replayed_source_epochs,
    retryable_dead_letters,
)


def _events(spark):
    return generate_changes(
        spark, 800, seed=11, n_repos=20, paths_per_repo=40,
        events_per_epoch=800, invalid_ratio=0.0, duplicate_ratio=0.0,
    ).drop("epoch")


def _simulate_transient_outage(spark, root, failed, epoch):
    """Model a transform-stage transient failure (network timeout to an
    enrichment service): the failed rows land in the DLQ with a
    retryable classification, bodies kept for self-contained replay."""
    dlq = enrich_dead_letters(
        failed.withColumn("_error_message", F.lit("connection timeout to transform service")),
        stage="transformation",
        error_type="ConnectionError",
        epoch=epoch,
        keep_content=True,
    )
    dlq.write.mode("overwrite").parquet(os.path.join(dlq_path(root), f"epoch={epoch}"))


def test_replay_restores_no_failure_state(spark, tmp_path):
    events = _events(spark).cache()
    failed = events.filter(F.col("lsn") % 7 == 0)
    survived = events.filter(F.col("lsn") % 7 != 0)

    # run A: nothing fails
    ta = SnapshotTable.create(str(tmp_path / "a"), LAKE_BASE, n_buckets=8)
    apply_changes(spark, ta, events, epoch=0)
    want = ta.state_hash(spark)

    # run B: outage drops a subset into the DLQ at epoch 0
    tb = SnapshotTable.create(str(tmp_path / "b"), LAKE_BASE, n_buckets=8)
    apply_changes(spark, tb, survived, epoch=0)
    _simulate_transient_outage(spark, tb.root, failed, epoch=0)
    assert tb.state_hash(spark) != want  # failure is visible pre-replay

    # retryable classification came from the normal D1/D2 chain
    cand = retryable_dead_letters(spark, tb.root)
    sample = cand.limit(1).collect()[0]
    assert sample["error_category"] == "network_error" and sample["can_retry"] is True

    stats = replay_dlq(spark, tb, epoch=1)
    assert stats["replayed_rows"] > 0 and stats["source_epochs"] == [0]
    assert tb.state_hash(spark) == want

    # idempotent: markers make a second replay a no-op
    again = replay_dlq(spark, tb, epoch=2)
    assert again == {"replayed_rows": 0, "source_epochs": [], "version": None}
    assert replayed_source_epochs(tb.root) == {0}
    assert tb.state_hash(spark) == want

    # the DLQ itself is untouched (immutable audit log)
    assert read_dlq(spark, tb.root).count() == failed.count()
    events.unpersist()


def test_replay_loop_prevention(spark, tmp_path):
    """A replayed row that is PERMANENTLY invalid re-enters the DLQ as
    stage=dlq_replay / ValidationError => can_retry=false, so the next
    replay has nothing to consume — no loop (reference O3 decision)."""
    table = SnapshotTable.create(str(tmp_path / "t"), LAKE_BASE, n_buckets=4)
    bad = spark.createDataFrame(
        [("insert", "r", "a.py", "c1", "python", None, 5, None, None)],
        CHANGE_EVENT,
    )  # insert with null content: fails validation every time
    _simulate_transient_outage(spark, table.root, bad, epoch=0)

    stats = replay_dlq(spark, table, epoch=1)
    assert stats["source_epochs"] == [0] and stats["replayed_rows"] == 0
    redlq = read_dlq(spark, table.root).filter(F.col("epoch") == 1).collect()
    assert len(redlq) == 1
    assert redlq[0]["processing_stage"] == "dlq_replay"
    assert redlq[0]["can_retry"] is False
    assert replay_dlq(spark, table, epoch=2)["source_epochs"] == []
