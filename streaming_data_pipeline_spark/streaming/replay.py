"""DLQ batch replay: reprocess retryable dead letters through the engine.

The reference computes retryability (`_can_retry_event`,
src/dead_letter_handler.py:145-181) but nothing ever consumes it — its
DLQ is terminal by design (DESIGN_DOCUMENT.md:174-177). This module is
the step a real operator takes next: a BATCH job (not a stream — no
loop back into the pipeline) that

  1. reads the DLQ table and keeps rows with ``can_retry = true`` from
     source epochs not yet replayed,
  2. reconstructs change events from the ``original_event`` JSON
     envelope (self-contained when the pipeline ran with
     ``dlq_keep_content=True``; otherwise a ``fixer`` must restore the
     body),
  3. optionally applies a caller-supplied ``fixer(df) -> df`` that
     corrects the defect (fill a missing field, re-fetch content, remap
     an enum),
  4. re-applies the events through the NORMAL ``apply_changes`` path
     under a fresh epoch — so they re-validate, and anything still
     invalid lands back in the DLQ under ``stage='dlq_replay'`` with
     ``error_type=ValidationError`` ⇒ ``can_retry=false`` ⇒ NO infinite
     replay loop (the reference's loop-prevention decision, preserved),
  5. marks the consumed source epochs with an atomic first-writer-wins
     marker under ``<root>/dlq_replays/`` (a NEW file, never an
     in-place DLQ rewrite — the DLQ stays an immutable audit log).

Idempotent: markers make a re-run of the same replay a no-op, and the
apply itself is LWW-idempotent like any epoch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.lake import SnapshotTable, _atomic_write_json
from ..schemas import CHANGE_EVENT, JSON_OPTS
from .apply import apply_changes, read_dlq


# Replay epochs live in their own id range, disjoint from streaming
# foreachBatch batch ids: the resumed tailer numbers its next batch from
# the CHECKPOINT (unknown to a replay caller), and a collision would let
# that batch's DLQ overwrite destroy the replay's re-DLQ'd audit rows —
# or a replay overwrite the very DLQ partition it is reading. Streaming
# batch ids are small integers; 2^40 epochs of history is out of reach.
REPLAY_EPOCH_BASE = 1 << 40


def _replay_dir(table_root: str) -> str:
    return os.path.join(table_root, "dlq_replays")


def _claim_source_epochs(
    table_root: str, replay_epoch: int, src_epochs: list[int]
) -> list[int]:
    """Per-source-epoch claim markers, written BEFORE applying: the
    replay-level marker alone only guards same-id replays — two
    concurrent replay_dlq runs with DIFFERENT ids could both pass the
    replayed_source_epochs() read and double-consume the same DLQ
    epochs (read-then-act race). Claims are exclusive os.link creates,
    so exactly one replay wins each epoch. A claim carrying OUR id
    whose replay marker never landed is a crashed earlier attempt of
    this same replay — re-claimed, so the retry path stays idempotent
    rather than stranding the epoch."""
    claims = os.path.join(_replay_dir(table_root), "claims")
    ours: list[int] = []
    done_marker = os.path.join(_replay_dir(table_root), f"replay-{replay_epoch}.json")
    for e in src_epochs:
        dest = os.path.join(claims, f"epoch-{e}.json")
        try:
            _atomic_write_json({"replay_epoch": replay_epoch}, dest, exclusive=True)
            ours.append(e)
        except FileExistsError:
            with open(dest) as f:
                owner = json.load(f).get("replay_epoch")
            if owner == replay_epoch and not os.path.exists(done_marker):
                ours.append(e)  # our own crashed attempt; resume it
    return ours


def replayed_source_epochs(table_root: str) -> set[int]:
    """Source epochs already consumed by a previous replay run."""
    d = _replay_dir(table_root)
    done: set[int] = set()
    if not os.path.isdir(d):
        return done
    for fn in os.listdir(d):
        if fn.startswith("replay-") and fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                done.update(json.load(f).get("source_epochs", []))
    return done


def retryable_dead_letters(spark: SparkSession, table_root: str) -> DataFrame:
    """The replay candidate set: can_retry rows from unconsumed epochs."""
    dlq = read_dlq(spark, table_root)
    done = replayed_source_epochs(table_root)
    out = dlq.filter(F.col("can_retry"))
    if done:
        out = out.filter(~F.col("epoch").isin(*sorted(done)))
    return out


def replay_dlq(
    spark: SparkSession,
    table: SnapshotTable,
    *,
    epoch: int,
    fixer=None,
    mode: str = "mor",
    salt_buckets: int = 8,
    dlq_keep_content: bool = False,
) -> dict:
    """Reprocess retryable dead letters as one batch epoch. Returns the
    apply stats plus replay bookkeeping; a no-op (None version) when
    nothing is eligible. ``epoch`` is the caller's replay id — it is
    offset into ``REPLAY_EPOCH_BASE``'s disjoint range (the effective id
    is returned as ``replay_epoch``), so it can never collide with a
    streaming batch id. The marker write is first-writer-wins, so two
    concurrent replays of the same id cannot double-consume."""
    if epoch < REPLAY_EPOCH_BASE:
        epoch = REPLAY_EPOCH_BASE + epoch
    # a COMPLETED replay id is consumed, full stop: re-using it against
    # newly-retryable epochs would claim them (the claim resume-check
    # reads "our id, marker absent" as a crashed attempt), apply, then
    # crash on the exclusive marker write — stranding those epochs
    # behind claims no id can ever consume. Refuse up front instead.
    if os.path.exists(os.path.join(_replay_dir(table.root), f"replay-{epoch}.json")):
        raise ValueError(
            f"replay epoch id {epoch} has already completed; each replay "
            "run needs a fresh id (re-use is only valid to RESUME a "
            "crashed attempt, which has claims but no replay marker)"
        )
    todo = retryable_dead_letters(spark, table.root)
    # bounded collect: one row per DLQ epoch (epoch count, not data size)
    src_epochs = sorted(r[0] for r in todo.select("epoch").distinct().collect())
    # claim BEFORE applying (see _claim_source_epochs): a concurrent
    # replay under another id keeps only the epochs it won
    src_epochs = _claim_source_epochs(table.root, epoch, src_epochs)
    if not src_epochs:
        return {"replayed_rows": 0, "source_epochs": [], "version": None}
    todo = todo.filter(F.col("epoch").isin(*src_epochs))

    events = todo.select(
        F.from_json(F.col("original_event"), CHANGE_EVENT, JSON_OPTS).alias("e")
    ).select("e.*")
    if fixer is not None:
        events = fixer(events)

    stats = apply_changes(
        spark,
        table,
        events,
        epoch=epoch,
        mode=mode,
        salt_buckets=salt_buckets,
        stage="dlq_replay",
        dlq_keep_content=dlq_keep_content,
    )
    marker = {
        "replay_epoch": epoch,
        "source_epochs": src_epochs,
        "rows_applied": stats.get("rows_applied", stats.get("source_rows", 0)),
        "redlq_rows": stats.get("dlq_rows", 0),
        "snapshot_version": stats.get("version"),
    }
    _atomic_write_json(
        marker, os.path.join(_replay_dir(table.root), f"replay-{epoch}.json"), exclusive=True
    )
    return {
        **stats,
        "replay_epoch": epoch,
        "replayed_rows": marker["rows_applied"],
        "source_epochs": src_epochs,
    }
