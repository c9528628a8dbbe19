"""Maintenance-interleaving fuzz: random sequences of append / compact /
expire / rebucket / purge / rollback against a pure-Python shadow
oracle. Every maintenance operation must preserve the live view exactly
(compact/expire/rebucket/purge are physical-layout changes only), and
rollback must restore the live view the shadow recorded at the target
version — across ANY interleaving, which is where snapshot-log,
manifest-carry and modulus-pinning bugs hide."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from streaming_data_pipeline_spark.plans import maintenance
from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.schemas import CHANGE_EVENT, LAKE_BASE
from streaming_data_pipeline_spark.streaming.apply import apply_changes

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a"), ("r1", "c"), ("r2", "d")]

# an op is ("append", [(key_idx, op_kind), ...]) or a maintenance verb
append_st = st.tuples(
    st.just("append"),
    st.lists(
        st.tuples(st.integers(0, len(KEYS) - 1), st.sampled_from(["insert", "update", "delete"])),
        min_size=1,
        max_size=6,
    ),
)
maint_st = st.sampled_from(
    [("compact", None), ("expire", None), ("rebucket", None), ("purge", None), ("rollback", None)]
)
ops_st = st.lists(st.one_of(append_st, maint_st), min_size=3, max_size=8)


def _live(table, spark) -> set[tuple]:
    return {
        (r["repo"], r["path"], r["lsn"], r["content"])
        for r in table.current_state(spark).collect()
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=ops_st, data=st.data())
def test_maintenance_interleavings_preserve_live_view(spark, tmp_path_factory, ops, data):
    root = tmp_path_factory.mktemp("fuzz")
    table = SnapshotTable.create(str(root / "lake"), LAKE_BASE, n_buckets=4)

    shadow: dict[tuple, tuple] = {}  # key -> (lsn, content, deleted)
    saved: dict[int, dict] = {table.current_version(): dict(shadow)}
    lsn = 0
    epoch = 0

    for verb, arg in ops:
        if verb == "append":
            rows = []
            for key_idx, kind in arg:
                lsn += 1
                repo, path = KEYS[key_idx]
                content = None if kind == "delete" else f"v{lsn}"
                rows.append(
                    (kind, repo, path, f"c{lsn}", "python", content, lsn, None, None)
                )
                shadow[(repo, path)] = (lsn, content, kind == "delete")
            epoch += 1
            apply_changes(
                spark, table, spark.createDataFrame(rows, CHANGE_EVENT), epoch
            )
        elif verb == "compact":
            maintenance.compact(spark, table, max_files_per_bucket=1)
        elif verb == "expire":
            maintenance.expire_snapshots(table, keep_last=2)
        elif verb == "purge":
            # contract: only safe when no event below the horizon can
            # still arrive — lsn is globally increasing here
            maintenance.purge_tombstones(spark, table, lsn_horizon=lsn + 1)
        elif verb == "rebucket":
            nb = data.draw(st.sampled_from([4, 8, 16]), label="n_buckets")
            maintenance.rebucket(spark, table, nb)
        elif verb == "rollback":
            meta = table.metadata()
            candidates = sorted(
                v for v in (int(x) for x in meta["snapshots"]) if v in saved
            )
            v = data.draw(st.sampled_from(candidates), label="rollback_to")
            table.rollback(v)
            shadow = dict(saved[v])

        saved[table.current_version()] = dict(shadow)
        expected = {
            (repo, path, l, c)
            for (repo, path), (l, c, deleted) in shadow.items()
            if not deleted
        }
        assert _live(table, spark) == expected, f"after {verb}"

    # the table remains fully usable: one more append lands correctly
    lsn += 1
    apply_changes(
        spark,
        table,
        spark.createDataFrame(
            [("insert", "r9", "z", f"c{lsn}", "go", "final", lsn, None, None)],
            CHANGE_EVENT,
        ),
        epoch + 1,
    )
    assert ("r9", "z", lsn, "final") in _live(table, spark)
