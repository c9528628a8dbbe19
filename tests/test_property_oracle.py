"""Property-based replay equivalence (hypothesis): arbitrary small
change streams — random ops, duplicate lsns, out-of-order epochs,
deletes of absent keys, null-field corruption — applied through the
full engine must equal the independent oracle, in BOTH apply modes."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.schemas import LAKE_BASE
from streaming_data_pipeline_spark.streaming.apply import apply_changes

from .oracle import apply_oracle, is_valid

CH = (
    "op string, repo string, path string, commit string, lang string, "
    "content string, lsn long, ts timestamp, payload map<string,string>, epoch long"
)

REPOS = ["r0", "r1"]
PATHS = ["a", "b", "c"]

event_st = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["insert", "update", "delete", "bogus", None]),
        "repo": st.sampled_from(REPOS + [None]),
        "path": st.sampled_from(PATHS + [None]),
        "lsn": st.integers(min_value=-2, max_value=40),
        "content": st.sampled_from(["x", "yy", "zzz", None]),
        "epoch": st.integers(min_value=0, max_value=2),
    }
)


def _to_row(e: dict, i: int) -> tuple:
    # commit derived from lsn so duplicate (key, lsn) pairs are IDENTICAL
    # rows (at-least-once redelivery), matching the generator's contract
    commit = hashlib.sha256(f"{e['repo']}|{e['path']}|{e['lsn']}".encode()).hexdigest()[:8]
    content = None if e["op"] == "delete" else e["content"]
    return (
        e["op"], e["repo"], e["path"], commit, "python",
        content, e["lsn"], None, None, e["epoch"],
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=st.lists(event_st, min_size=1, max_size=25))
def test_random_streams_match_oracle(spark, tmp_path_factory, mode, events):
    # canonicalize: the WHOLE event must be deterministic per (key, lsn)
    # so duplicate deliveries are byte-identical rows (at-least-once
    # redelivery contract). Op included: a delete and an update sharing
    # one (key, lsn, commit) is a broken WAL — the oracle would break
    # that tie by list arrival order, which no distributed engine can
    # observe, and (lsn, commit) is the engine's documented total order
    # per key.
    canon: dict = {}
    fixed = []
    for e in events:
        k = (e["repo"], e["path"], e["lsn"])
        op, content = canon.setdefault(k, (e["op"], e["content"]))
        e = dict(e, op=op, content=content)
        fixed.append(e)

    rows = [_to_row(e, i) for i, e in enumerate(fixed)]
    df = spark.createDataFrame(rows, CH)
    root = tmp_path_factory.mktemp("prop")
    table = SnapshotTable.create(str(root / "lake"), LAKE_BASE, n_buckets=4)
    for ep in sorted({e["epoch"] for e in fixed}):
        apply_changes(
            spark, table, df.filter(F.col("epoch") == ep), int(ep), mode=mode
        )

    oracle_events = []
    for e, row in zip(fixed, rows):
        oracle_events.append(
            {
                "op": e["op"], "repo": e["repo"], "path": e["path"],
                "commit": row[3], "lang": "python",
                "content": row[5], "lsn": e["lsn"], "payload": None,
            }
        )
    expected = {
        (k[0], k[1], v["lsn"], v["content"])
        for k, v in apply_oracle(oracle_events).items()
    }
    got = {
        (r["repo"], r["path"], r["lsn"], r["content"])
        for r in table.current_state(spark).collect()
    }
    assert got == expected

    # DLQ row count equals invalid event count
    from streaming_data_pipeline_spark.streaming.apply import read_dlq

    n_invalid = sum(1 for e in oracle_events if not is_valid(e))
    assert read_dlq(spark, table.root).count() == n_invalid
