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
    # re-DLQ rows land under the EFFECTIVE replay epoch — the disjoint
    # range that a resumed streaming tailer's batch ids can never reach
    from streaming_data_pipeline_spark.streaming.replay import REPLAY_EPOCH_BASE

    assert stats["replay_epoch"] == REPLAY_EPOCH_BASE + 1
    redlq = read_dlq(spark, table.root).filter(
        F.col("epoch") == stats["replay_epoch"]
    ).collect()
    assert len(redlq) == 1
    assert redlq[0]["processing_stage"] == "dlq_replay"
    assert redlq[0]["can_retry"] is False
    assert replay_dlq(spark, table, epoch=2)["source_epochs"] == []


def test_concurrent_replays_cannot_double_consume(spark, tmp_path):
    """ADVICE r2: two replays with DIFFERENT ids racing past the
    read-then-act window must not both consume the same source epochs.
    The per-epoch claim markers are written before applying, so a
    second replay arriving after the first's claims (but before or
    after its replay marker) wins nothing."""
    from streaming_data_pipeline_spark.streaming.replay import (
        _claim_source_epochs,
        REPLAY_EPOCH_BASE,
    )

    events = _events(spark)
    failed = events.filter(F.col("lsn") % 7 == 0)
    table = SnapshotTable.create(str(tmp_path / "t"), LAKE_BASE, n_buckets=8)
    _simulate_transient_outage(spark, table.root, failed, epoch=0)

    # replay #2 arrives mid-window: epoch 0 is already CLAIMED by
    # replay #1 (which hasn't written its replay marker yet — the exact
    # race the replay-level marker cannot see)
    claimed = _claim_source_epochs(table.root, REPLAY_EPOCH_BASE + 1, [0])
    assert claimed == [0]
    out2 = replay_dlq(spark, table, epoch=2)
    assert out2 == {"replayed_rows": 0, "source_epochs": [], "version": None}

    # replay #1 (same id as the claim) resumes its crashed attempt:
    # the claim is its own, its marker is absent, so it proceeds
    out1 = replay_dlq(spark, table, epoch=1)
    assert out1["source_epochs"] == [0] and out1["replayed_rows"] > 0

    # after #1's marker lands its id is CONSUMED: re-using it would let
    # the claim resume-check mis-read future claims as crashed attempts
    # and then crash on the exclusive marker write — refused up front
    import pytest

    with pytest.raises(ValueError, match="already completed"):
        replay_dlq(spark, table, epoch=1)
    # a fresh id over the consumed epoch is a clean no-op
    assert replay_dlq(spark, table, epoch=3)["source_epochs"] == []


def test_replay_preserves_microsecond_timestamps(spark, tmp_path):
    """The DLQ original_event envelope must round-trip microsecond event
    times: Spark's default JSON timestampFormat is millis-only, so a
    dead-lettered event with ts=.123456 would be replayed as .123000 and
    the replayed table state would differ from a no-failure run (review
    r2 finding)."""
    from datetime import datetime

    ev = spark.createDataFrame(
        [("insert", "r", "t.py", "c9", "python", "x", 9,
          datetime(2026, 8, 16, 12, 0, 0, 123456), None)],
        CHANGE_EVENT,
    )
    table = SnapshotTable.create(str(tmp_path / "us"), LAKE_BASE, n_buckets=4)
    _simulate_transient_outage(spark, table.root, ev, epoch=0)
    stats = replay_dlq(spark, table, epoch=1, dlq_keep_content=True)
    assert stats["replayed_rows"] == 1
    row = table.current_state(spark).collect()[0]
    assert row["ts"] == datetime(2026, 8, 16, 12, 0, 0, 123456)


def test_transient_stage_rows_are_retryable(spark, tmp_path):
    """apply_changes(error_type=...) reaches the retryability classifier:
    a transient-stage failure (TimeoutError in transformation) must
    produce can_retry=true rows the replay job can find — previously the
    hardcoded ValidationError made every engine DLQ row terminal."""
    from streaming_data_pipeline_spark.streaming.apply import apply_changes, read_dlq
    from streaming_data_pipeline_spark.streaming.replay import retryable_dead_letters

    bad = spark.createDataFrame(
        [("insert", "r", "a.py", "c1", "python", None, 5, None, None)],
        CHANGE_EVENT,
    )  # null content fails validation -> lands in DLQ under our labels
    table = SnapshotTable.create(str(tmp_path / "rt"), LAKE_BASE, n_buckets=4)
    apply_changes(
        spark, table, bad, 0, stage="transformation", error_type="TimeoutError"
    )
    dlq = read_dlq(spark, table.root).collect()
    assert len(dlq) == 1 and dlq[0]["can_retry"] is True
    assert retryable_dead_letters(spark, table.root).count() == 1
