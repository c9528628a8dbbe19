"""COW-mode oracle equivalence + event-time windowed aggregations
(streaming with watermark via memory sink, and the batch twins)."""

from __future__ import annotations

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.schemas import CHANGE_EVENT, LAKE_BASE
from streaming_data_pipeline_spark.sources.changegen import generate_changes
from streaming_data_pipeline_spark.streaming.apply import apply_changes
from streaming_data_pipeline_spark.streaming.windows import (
    repo_activity_sessions_batch,
    windowed_change_rates,
    windowed_change_rates_batch,
)

from .oracle import apply_oracle, state_rows


def test_cow_mode_matches_oracle_and_mor(spark, tmp_path):
    changes = generate_changes(
        spark, 2500, seed=13, events_per_epoch=800, invalid_ratio=0.05,
        duplicate_ratio=0.05, out_of_order_ratio=0.1, delete_ratio=0.1,
        partitions=4,
    ).persist()
    collected = [r.asDict(recursive=True) for r in changes.collect()]
    epochs = sorted({r["epoch"] for r in collected})

    t_cow = SnapshotTable.create(str(tmp_path / "cow"), LAKE_BASE, n_buckets=8)
    t_mor = SnapshotTable.create(str(tmp_path / "mor"), LAKE_BASE, n_buckets=8)
    for ep in epochs:
        batch = changes.filter(F.col("epoch") == ep)
        apply_changes(spark, t_cow, batch, int(ep), mode="cow")
        apply_changes(spark, t_mor, batch, int(ep), mode="mor")
    changes.unpersist()

    def rows(t):
        return {
            tuple(r)
            for r in t.current_state(spark)
            .select(
                "repo", "path", "commit", "lang",
                F.sha2(F.col("content"), 256), "lsn",
                F.col("review_state"), F.lit(None).cast("string"),
            )
            .collect()
        }

    expected = state_rows(apply_oracle(collected))
    assert rows(t_cow) == expected
    assert rows(t_mor) == expected

    # COW keeps exactly one row per key physically (no resolve debt)
    raw = t_cow.read(spark)
    assert raw.count() == raw.select("repo", "path").distinct().count()


def test_windowed_change_rates_streaming_vs_batch(spark, tmp_path):
    changes = generate_changes(
        spark, 2000, seed=8, events_per_epoch=2000, invalid_ratio=0.0,
        duplicate_ratio=0.0, out_of_order_ratio=0.0, delete_ratio=0.1,
        partitions=2,
    ).drop("epoch")
    wal = str(tmp_path / "wal")
    changes.coalesce(1).write.parquet(wal)

    stream = spark.readStream.schema(CHANGE_EVENT).parquet(wal)
    agg = windowed_change_rates(stream, window="1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_rates")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["win"]["start"], r["op"]): (r["n_changes"], r["approx_repos"])
        for r in spark.sql("select * from win_rates").collect()
    }
    want = {
        (r["win_start"], r["op"]): (r["n_changes"], r["approx_repos"])
        for r in windowed_change_rates_batch(spark.read.parquet(wal), "1 minute").collect()
    }
    assert got == want and len(got) > 1


def test_sessionization_batch(spark):
    rows = [
        ("r1", i, f"2024-01-01 00:{m:02d}:00")
        for i, m in enumerate([0, 1, 2, 30, 31, 59])
    ] + [("r2", 100, "2024-01-01 00:05:00")]
    df = spark.createDataFrame(rows, "repo string, lsn long, ts_s string").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = repo_activity_sessions_batch(df, gap_seconds=600)
    r1 = sorted(
        (r["n_changes"], r["max_lsn"]) for r in out.filter(F.col("repo") == "r1").collect()
    )
    # gaps: 0-2min contiguous; 30-31; 59 → three sessions
    assert r1 == [(1, 5), (2, 4), (3, 2)]
    assert out.filter(F.col("repo") == "r2").count() == 1


def test_cow_and_mor_agree_on_lsn_tie(spark, tmp_path):
    """ADVICE r1: on an lsn tie the two apply modes must pick the same
    winner — lexicographic (lsn, commit). Two events for the same key,
    same lsn, different commit, delivered across epochs in both orders:
    final state must be identical in both modes, keeping max commit."""
    import pyspark.sql.functions as F

    from streaming_data_pipeline_spark.plans.lake import SnapshotTable
    from streaming_data_pipeline_spark.schemas import CHANGE_EVENT, LAKE_BASE
    from streaming_data_pipeline_spark.streaming.apply import apply_changes

    def ev(commit, content):
        return ("insert", "r", "tie.py", commit, "python", content, 7, None, None)

    for mode in ("mor", "cow"):
        for order, first, second in (("fwd", "c_aa", "c_zz"), ("rev", "c_zz", "c_aa")):
            t = SnapshotTable.create(
                str(tmp_path / f"{mode}_{order}"), LAKE_BASE, n_buckets=2
            )
            apply_changes(spark, t, spark.createDataFrame([ev(first, first)], CHANGE_EVENT), 0, mode=mode)
            apply_changes(spark, t, spark.createDataFrame([ev(second, second)], CHANGE_EVENT), 1, mode=mode)
            row = t.current_state(spark).filter(F.col("path") == "tie.py").collect()[0]
            assert (row["commit"], row["content"]) == ("c_zz", "c_zz"), (mode, order, row)


def test_cow_replay_accounting_consumed_vs_applied(spark, tmp_path):
    """Apply-mode-agnostic accounting (review r2 finding): source_rows
    means rows CONSUMED from the batch in both modes; rows_applied is
    the LWW-winning subset. On a pure replay of an already-applied
    batch, COW must report N consumed / 0 applied — not 0 consumed."""
    rows = [
        ("insert", "r", f"f{i}.py", f"c{i}", "py", "x", i + 1, None, None)
        for i in range(5)
    ]
    batch = spark.createDataFrame(rows, CHANGE_EVENT)
    table = SnapshotTable.create(str(tmp_path / "acct"), LAKE_BASE, n_buckets=4)

    first = apply_changes(spark, table, batch, 0, mode="cow")
    assert first["source_rows"] == 5
    assert first["rows_applied"] == 5

    # strict-greater LSN makes the replay a no-op — but it still consumed
    replay = apply_changes(spark, table, batch, 1, mode="cow")
    assert replay["source_rows"] == 5
    assert replay["rows_applied"] == 0
    assert table.current_state(spark).count() == 5


def test_batch_sessionization_subsecond_gap_parity(spark):
    """The batch sessionization twin must honor SUB-SECOND gaps the way
    the streaming session_window does: whole-second truncation turned a
    600.2s gap into exactly 600 (= not > 600), merging sessions the
    streaming operator splits (review r2 finding, verified live)."""
    from datetime import datetime

    from streaming_data_pipeline_spark.streaming.windows import (
        repo_activity_sessions_batch,
    )

    rows = [
        ("r", datetime(2026, 1, 1, 0, 0, 0, 700000), 1),
        ("r", datetime(2026, 1, 1, 0, 10, 0, 900000), 2),  # gap 600.2s
        ("r", datetime(2026, 1, 1, 0, 20, 0, 900000), 3),  # gap exactly 600.0s
    ]
    df = spark.createDataFrame(rows, "repo string, ts timestamp, lsn long")
    out = repo_activity_sessions_batch(df, gap_seconds=600).collect()
    # 600.2 > 600 -> new session; exactly 600.0 is NOT > 600 -> merged
    assert len(out) == 2
    sizes = sorted(r["n_changes"] for r in out)
    assert sizes == [1, 2]


def test_cow_broadcast_gate_is_size_aware(monkeypatch):
    """VERDICT r4 "what's wrong" #1: the gate must see bytes, not just
    rows — a narrow batch of MANY rows still broadcasts while a wide
    batch over the byte cap falls back to sort-merge."""
    from streaming_data_pipeline_spark.operators.merge import (
        cow_broadcast_decision,
    )

    monkeypatch.delenv("SDP_COW_BROADCAST_MAX_ROWS", raising=False)
    monkeypatch.delenv("SDP_COW_BROADCAST_MAX_BYTES", raising=False)
    assert cow_broadcast_decision(100, 10**6)
    assert not cow_broadcast_decision(100, 2 * 1024**3)   # wide: bytes cap
    assert cow_broadcast_decision(3_000_000, 10**6)       # narrow, many rows
    assert not cow_broadcast_decision(5_000_000, 10**6)   # rows cap
    monkeypatch.setenv("SDP_COW_BROADCAST_MAX_BYTES", "1000")
    assert not cow_broadcast_decision(10, 2000)           # env override


def test_cow_wide_batch_fallback_matches_broadcast_state(spark, tmp_path, monkeypatch):
    """A/B at identical state: the byte-capped sort-merge fallback and
    the default broadcast decomposition land the same table."""
    changes = generate_changes(
        spark, 800, seed=21, events_per_epoch=800, invalid_ratio=0.05,
        duplicate_ratio=0.05, delete_ratio=0.1, partitions=4,
    ).persist()

    monkeypatch.delenv("SDP_COW_BROADCAST_MAX_BYTES", raising=False)
    t_b = SnapshotTable.create(str(tmp_path / "bc"), LAKE_BASE, n_buckets=8)
    s_b = apply_changes(spark, t_b, changes, 0, mode="cow")
    assert s_b["broadcast"] is True
    assert s_b["batch_bytes_est"] > 0

    # content-sized batches blow a 4 KiB cap immediately
    monkeypatch.setenv("SDP_COW_BROADCAST_MAX_BYTES", "4096")
    t_s = SnapshotTable.create(str(tmp_path / "sm"), LAKE_BASE, n_buckets=8)
    s_s = apply_changes(spark, t_s, changes, 0, mode="cow")
    assert s_s["broadcast"] is False
    changes.unpersist()

    def rows(t):
        return {
            tuple(r)
            for r in t.current_state(spark)
            .select("repo", "path", "lsn", F.sha2(F.col("content"), 256))
            .collect()
        }

    assert rows(t_b) == rows(t_s)
