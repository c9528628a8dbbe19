"""Independent single-threaded Python oracle for the CDC engine.

Mirrors SURVEY.md §5.2: sort all VALID change events by (lsn, commit),
apply last-writer-wins into a dict keyed (repo, path); deletes remove
the key from the live view. Validation rules are re-implemented here
from the spec (FIXTURES.md §2) — NOT imported from the engine — so the
comparison is engine-vs-spec, not engine-vs-itself.
"""

from __future__ import annotations

import hashlib

OPS = {"insert", "update", "delete"}


def is_valid(ev: dict) -> bool:
    if ev.get("repo") is None or ev.get("path") is None:
        return False
    op = ev.get("op")
    if op is None or op not in OPS:
        return False
    if ev.get("lsn") is None or ev["lsn"] < 0:
        return False
    if op != "delete" and ev.get("content") is None:
        return False
    return True


def validation_failure_category(ev: dict) -> str:
    """Expected DLQ error_category per invalid mode (matches the engine's
    error message wording fed through the reference's categorizer rules,
    reference: src/dead_letter_handler.py:109-115 — required/missing
    first, then enum)."""
    if ev.get("repo") is None or ev.get("path") is None:
        return "missing_required_field"
    if ev.get("op") not in OPS:
        return "invalid_enum_value"
    if ev.get("lsn") is not None and ev["lsn"] < 0:
        # message "'lsn' must be >= 0" → no keyword hit until the
        # ValidationError/schema rule
        return "schema_validation_error"
    return "unknown_error"


def apply_oracle(events: list[dict]) -> dict[tuple[str, str], dict]:
    """Final live state: key -> winning event (op != delete)."""
    state: dict[tuple[str, str], dict] = {}
    for ev in sorted(
        (e for e in events if is_valid(e)),
        key=lambda e: (e["lsn"], e.get("commit") or ""),
    ):
        state[(ev["repo"], ev["path"])] = ev
    return {k: v for k, v in state.items() if v["op"] != "delete"}


def state_rows(state: dict[tuple[str, str], dict]) -> set[tuple]:
    """Comparable row multiset: (repo, path, commit, lang, sha256(content),
    review_state, stars)."""
    rows = set()
    for (repo, path), ev in state.items():
        payload = ev.get("payload") or {}
        content = ev.get("content")
        sha = hashlib.sha256(content.encode()).hexdigest() if content is not None else None
        rows.add(
            (
                repo,
                path,
                ev.get("commit"),
                ev.get("lang"),
                sha,
                ev.get("lsn"),
                payload.get("review_state"),
                payload.get("stars"),
            )
        )
    return rows
