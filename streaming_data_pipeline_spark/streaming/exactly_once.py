"""Idempotent epoch commit markers + per-partition lineage.

The reference is at-least-once at best — Kafka offsets auto-commit
BEFORE processing (reference: src/config.py:27-33,
DESIGN_DOCUMENT.md:179-183), so a crash between auto-commit and the
sink's in-memory batch flush LOSES events (src/sink_writer.py:34). The
north star inverts that into exactly-once:

  epoch (= foreachBatch batch_id, recovered from Spark's checkpoint
  WAL) → apply MERGE → commit snapshot → write marker
  `_commits/epoch=<id>.json` atomically.

On restart, an epoch whose marker exists is skipped outright. A crash
AFTER the snapshot commit but BEFORE the marker re-applies the epoch —
and the MERGE is idempotent by construction (LWW on strictly-greater
lsn: re-applying already-applied changes is a no-op on state), so the
replayed epoch converges to the identical live state. Both crash
windows are covered by tests/test_streaming_resume.py.

The marker doubles as the LINEAGE record: source offset range (input
files for the file source; topic/partition/offset ranges for Kafka) →
snapshot id → files written per bucket with row counts.
"""

from __future__ import annotations

import json
import logging
import os

from ..plans.lake import _atomic_write_json

log = logging.getLogger(__name__)


class EpochLog:
    def __init__(self, table_root: str):
        self.dir = os.path.join(table_root, "_commits")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, epoch: int) -> str:
        return os.path.join(self.dir, f"epoch={epoch}.json")

    def has(self, epoch: int) -> bool:
        return os.path.exists(self._path(epoch))

    def write(self, epoch: int, record: dict) -> None:
        """First-writer-wins, like every commit artifact (lake.py): a
        zombie driver racing its replacement on the same epoch must not
        OVERWRITE the winner's marker — live state converges either way
        (applies are idempotent), but a last-writer-wins rename would
        leave lineage pointing at only one of the two file sets. The
        loser's marker is dropped; the surviving record stays internally
        consistent."""
        try:
            _atomic_write_json({"epoch": epoch, **record}, self._path(epoch), exclusive=True)
        except FileExistsError:
            log.warning("epoch %s marker already committed by a concurrent writer", epoch)

    def read(self, epoch: int) -> dict:
        with open(self._path(epoch)) as f:
            return json.load(f)

    def epochs(self) -> list[int]:
        out = []
        for fn in os.listdir(self.dir):
            if fn.startswith("epoch=") and fn.endswith(".json"):
                out.append(int(fn[len("epoch=") : -len(".json")]))
        return sorted(out)

    def lineage(self) -> list[dict]:
        """Queryable lineage: one record per epoch — source offset range →
        snapshot → files written (per-bucket row counts)."""
        return [self.read(e) for e in self.epochs()]
