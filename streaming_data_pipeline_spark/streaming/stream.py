"""Structured Streaming tailer: file-source WAL → foreachBatch → lake.

The change log is a directory of Parquet files tailed with
`readStream` — the sandbox stand-in for the binlog/WAL; on a real
cluster swapping `format("parquet")` for `format("kafka")` +
`from_json(value)` is a config change (the reference's Kafka
consumer, src/consumer.py:50-88, maps to exactly that — SURVEY.md §1.4).

Delivery: Spark's checkpoint WAL gives a stable, replayable batch_id
per offset range; run_epoch's marker protocol (exactly_once.py) turns
the at-least-once `foreachBatch` contract into exactly-once table
commits. `availableNow` drains the backlog and stops (replay-to-drain
for tests/bench); `processingTime` soaks.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..plans.lake import SnapshotTable
from ..schemas import CHANGE_EVENT
from .apply import run_epoch
from .exactly_once import EpochLog


def checkpoint_offsets(checkpoint_dir: str, batch_id: int) -> list[str]:
    """Authoritative per-epoch offset range from the checkpoint. This is
    the lineage anchor — `inputFiles()` on the microbatch plan is
    best-effort only. Two layouts are read, matching what each source
    actually writes per batch:
      - file source: <ckpt>/sources/0/<batchId> (FileStreamSourceLog),
        one JSON record per file, each with a "path"; every
        compactInterval batches the log is a <batchId>.compact file
        holding all history (entries batchId-tagged), read instead when
        the plain per-batch file is absent;
      - Kafka (and other offset-based sources): the engine's OffsetSeqLog
        at <ckpt>/offsets/<batchId> — a version line, one metadata JSON
        line, then one offset JSON per source; a Kafka source's entry is
        a topic→partition→endOffset map, serialized here as
        "topic:partition:offset" strings (the range START is the
        previous batch's entry). Kafka does NOT write per-batch files
        under sources/ — only the batch-0 initial offsets — so parsing
        sources/0/<batchId> alone would leave every Kafka epoch with
        empty lineage."""
    import json as _json
    import os as _os

    def _file_entries(path: str, only_batch: int | None) -> list[str]:
        out: list[str] = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("v"):
                    continue
                rec = _json.loads(line)
                if isinstance(rec, dict) and "path" in rec:
                    # compact files hold ALL entries seen so far, each
                    # tagged with the batch it arrived in
                    if only_batch is None or rec.get("batchId") == only_batch:
                        out.append(rec["path"])
        return out

    files: list[str] = []
    src_dir = _os.path.join(checkpoint_dir, "sources", "0")
    try:
        files = _file_entries(_os.path.join(src_dir, str(batch_id)), None)
    except OSError:
        # FileStreamSourceLog compacts every compactInterval batches
        # (default 10): batch K's log is written as K.compact holding ALL
        # history with per-entry batchId tags, and older plain files are
        # eventually deleted — so every compact-boundary batch (and any
        # batch older than the retained window) only exists inside the
        # first compact file at or after it.
        try:
            compacts = sorted(
                int(fn[: -len(".compact")])
                for fn in _os.listdir(src_dir)
                if fn.endswith(".compact") and fn[: -len(".compact")].isdigit()
            )
        except OSError:
            compacts = []
        # every compact >= batch_id contains the batch's entries; a later
        # one may have replaced (deleted) the first between listdir and
        # open, so keep trying rather than silently settling for empty
        # lineage on one OSError
        for k in compacts:
            if k >= batch_id:
                try:
                    files = _file_entries(_os.path.join(src_dir, f"{k}.compact"), batch_id)
                    break
                except OSError:
                    continue
    if files:
        return files
    # offset-based sources: OffsetSeqLog
    p = _os.path.join(checkpoint_dir, "offsets", str(batch_id))
    try:
        with open(p) as f:
            lines = [ln.rstrip("\n") for ln in f]
    except OSError:
        return files
    # line 0 is the version ("v1"); line 1 the batch metadata JSON — an
    # EMPTY line when OffsetSeq carries no metadata (serialized as
    # getOrElse("")), so blank lines must survive until AFTER the slice
    # or the first source's offsets shift into the metadata slot; each
    # later line is one source's offsets ("-" for an absent offset)
    for line in lines[2:]:
        if not line.strip() or line == "-":
            continue
        try:
            rec = _json.loads(line)
        except ValueError:
            continue
        if isinstance(rec, dict):
            for topic, parts in rec.items():
                if isinstance(parts, dict):
                    files.extend(
                        f"{topic}:{part}:{off}" for part, off in sorted(parts.items())
                    )
    return files


def start_cdc_stream(
    spark: SparkSession,
    table: SnapshotTable,
    source_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    processing_time: str | None = None,
    fail_after_epochs: int | None = None,
    detect_renames: bool = False,
    salt_buckets: int = 8,
    mode: str = "mor",
    compact_every: int | None = 8,
    compact_max_files_per_bucket: int = 4,
    source=None,
) -> StreamingQuery:
    """Start the CDC tailer. ``fail_after_epochs`` injects a crash after
    N applied epochs (chaos tests). Returns the StreamingQuery.

    ``source``: optional pre-built streaming DataFrame in CHANGE_EVENT
    shape (e.g. sources.kafka.kafka_change_stream) replacing the file
    tailer — the epoch protocol, lineage extraction (offsets_for parses
    both file-WAL and Kafka offset formats) and compaction cadence are
    source-agnostic."""
    if source is not None:
        src = source
    else:
        reader = spark.readStream.schema(CHANGE_EVENT)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        src = reader.parquet(source_dir)

    epoch_log = EpochLog(table.root)
    applied = {"n": 0}

    def process(batch_df, batch_id: int):
        stats = run_epoch(
            spark, table, epoch_log, batch_df, batch_id,
            source_offsets=checkpoint_offsets(checkpoint_dir, batch_id), mode=mode,
            detect_renames=detect_renames, salt_buckets=salt_buckets,
        )
        if stats is not None:
            applied["n"] += 1
            # merge-on-read debt control: fold delta files back into one
            # sorted base file per bucket every `compact_every` applied
            # epochs (deterministic given the snapshot ⇒ replay-safe; a
            # crash before/after compaction does not change the live view)
            if mode == "mor" and compact_every and applied["n"] % compact_every == 0:
                from ..plans.maintenance import compact

                compact(spark, table, max_files_per_bucket=compact_max_files_per_bucket)
        if fail_after_epochs is not None and applied["n"] >= fail_after_epochs:
            raise RuntimeError(f"injected failure after {applied['n']} epochs")

    writer = src.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain(query: StreamingQuery) -> None:
    """Run an availableNow query to completion, re-raising its failure."""
    query.awaitTermination()


def replay_to_drain(
    spark: SparkSession,
    table: SnapshotTable,
    source_dir: str,
    checkpoint_dir: str,
    **kw,
) -> None:
    """Convenience: start + drain (used by tests and bench)."""
    q = start_cdc_stream(spark, table, source_dir, checkpoint_dir, **kw)
    q.awaitTermination()
