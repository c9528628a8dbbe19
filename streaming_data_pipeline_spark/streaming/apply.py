"""The microbatch body: validate → split → DLQ → evolve → LWW → MERGE.

This one function is the Spark-first collapse of the reference's whole
process graph — producer validation (src/producer.py:165-214), consumer
re-validation (src/consumer.py:90-104), transformer
(src/transform.py:27-101), sink (src/sink_writer.py:43-127) and DLQ
handler (src/dead_letter_handler.py:33-95), which the reference runs as
4 GIL-bound daemon threads over Kafka hops (src/pipeline.py:222-314) —
into a single distributed DAG executed once per epoch (SURVEY.md §3).

Also exposed as the BATCH-mode API (the reference's `demo_mvp.py`
stepwise path): call `apply_changes` directly with any DataFrame of
change events.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.dlq import enrich_dead_letters
from ..functions.transform import transform_changes
from ..functions.validate import apply_defaults, validate_and_split
from ..operators.merge import merge_into
from ..plans.lake import SnapshotTable
from .evolve import evolve_and_promote
from .exactly_once import EpochLog


def dlq_path(table_root: str) -> str:
    return os.path.join(table_root, "dlq")


def read_dlq(spark: SparkSession, table_root: str) -> DataFrame:
    p = dlq_path(table_root)
    try:
        return spark.read.parquet(os.path.join(p, "epoch=*"))
    except Exception:
        from ..schemas import DLQ

        return spark.createDataFrame([], DLQ)


def apply_changes(
    spark: SparkSession,
    table: SnapshotTable,
    raw: DataFrame,
    epoch: int,
    *,
    detect_renames: bool = True,
    salt_buckets: int = 8,
    stage: str = "consumer_validation",
) -> dict:
    """Apply one microbatch of change events. Idempotent per epoch when
    driven through `run_epoch` (marker check); the MERGE itself is also
    state-idempotent (strict-greater LSN), covering the crash window
    between snapshot commit and marker write."""
    df = raw.drop("epoch") if "epoch" in raw.columns else raw
    df = apply_defaults(transform_changes(df))
    # one source scan: the flagged frame feeds both the valid and the
    # invalid split (SURVEY.md R1 — "split, not two scans").
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        valid, invalid = validate_and_split(df)

        # DLQ is a TABLE, partition-per-epoch ⇒ overwriting the same
        # epoch partition on replay keeps the DLQ exactly-once too
        # (vs the reference's file-per-event JSON sink, K6). The row
        # count rides the write job via Observation — no separate count.
        from pyspark.sql import Observation

        dlq = enrich_dead_letters(invalid, stage=stage, epoch=epoch)
        obs = Observation(f"dlq-{epoch}")
        dlq.observe(obs, F.count(F.lit(1)).alias("n")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(dlq_path(table.root), f"epoch={epoch}"))
        n_dlq = int(obs.get["n"] or 0)

        promoted, new_schema, evolution = evolve_and_promote(
            valid, table.schema(), detect_renames=detect_renames
        )
        stats = merge_into(
            spark,
            table,
            promoted,
            epoch=epoch,
            new_schema=new_schema,
            salt_buckets=salt_buckets,
        )
        stats["dlq_rows"] = int(n_dlq)
        stats["schema_evolution"] = evolution
        return stats
    finally:
        df.unpersist()


def run_epoch(
    spark: SparkSession,
    table: SnapshotTable,
    epoch_log: EpochLog,
    raw: DataFrame,
    epoch: int,
    source_offsets: list[str] | None = None,
    **kw,
) -> dict | None:
    """Exactly-once wrapper: skip epochs whose marker exists; write the
    marker (with lineage) only after the snapshot commit lands.
    ``source_offsets``: authoritative offset range for the epoch (the
    streaming runner reads it from the checkpoint WAL); falls back to
    the microbatch plan's inputFiles()."""
    if epoch_log.has(epoch):
        return None
    input_files = list(source_offsets or [])
    if not input_files:
        try:
            input_files = raw.inputFiles()
        except Exception:
            pass
    stats = apply_changes(spark, table, raw, epoch, **kw)
    epoch_log.write(
        epoch,
        {
            "source_offsets": {"input_files": sorted(input_files)},
            "snapshot_version": stats.get("version"),
            "files_written": stats.get("files", []),
            "summary": {k: v for k, v in stats.items() if k not in ("files",)},
        },
    )
    return stats
