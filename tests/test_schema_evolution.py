"""Schema evolution: payload-key promotion, old-row nulls, rename
heuristic (SURVEY.md §7.4; FIXTURES.md §5.5)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import types as T

from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.schemas import LAKE_BASE
from streaming_data_pipeline_spark.streaming.apply import apply_changes
from streaming_data_pipeline_spark.streaming.evolve import evolve_and_promote

CH = (
    "op string, repo string, path string, commit string, lang string, "
    "content string, lsn long, ts timestamp, payload map<string,string>"
)


def _ev(op, repo, path, lsn, payload=None, content="x"):
    return (
        op, repo, path, f"c{lsn}", "python",
        None if op == "delete" else content, lsn, None, payload,
    )


def test_new_column_promoted_old_rows_null(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), LAKE_BASE, n_buckets=4)
    apply_changes(
        spark,
        table,
        spark.createDataFrame([_ev("insert", "r", "a.py", 1, {"stars": "5"})], CH),
        0,
    )
    assert "stars" in [f.name for f in table.schema().fields]
    # next epoch introduces a NEW key; previous rows read it as null
    apply_changes(
        spark,
        table,
        spark.createDataFrame(
            [_ev("insert", "r", "b.py", 2, {"stars": "7", "forks": "2"})], CH
        ),
        1,
    )
    rows = {r["path"]: r for r in table.current_state(spark).collect()}
    assert rows["b.py"]["forks"] == "2"
    assert rows["a.py"]["forks"] is None  # pre-evolution row
    assert rows["a.py"]["stars"] == "5"


def test_rename_heuristic(spark):
    """Exactly one known key silent + one unknown key present ⇒ treated
    as a rename: values flow into the EXISTING column, no new column."""
    schema = T.StructType(
        list(LAKE_BASE.fields) + [T.StructField("stars", T.StringType(), True)]
    )
    batch = spark.createDataFrame(
        [_ev("insert", "r", "c.py", 3, {"stargazers": "9"})], CH
    )
    out, new_schema, report = evolve_and_promote(batch, schema, detect_renames=True)
    assert report["renamed_columns"] == {"stargazers": "stars"}
    assert report["added_columns"] == []
    assert [f.name for f in new_schema.fields] == [f.name for f in schema.fields]
    row = out.collect()[0]
    assert row["stars"] == "9"
    assert "stargazers" not in out.columns


def test_rename_heuristic_off(spark):
    schema = T.StructType(
        list(LAKE_BASE.fields) + [T.StructField("stars", T.StringType(), True)]
    )
    batch = spark.createDataFrame(
        [_ev("insert", "r", "c.py", 3, {"stargazers": "9"})], CH
    )
    out, new_schema, report = evolve_and_promote(batch, schema, detect_renames=False)
    assert report["renamed_columns"] == {}
    assert report["added_columns"] == ["stargazers"]
    assert "stargazers" in [f.name for f in new_schema.fields]


def test_ambiguous_rename_falls_back_to_add(spark):
    """Two unknown keys + one silent column is ambiguous ⇒ plain adds."""
    schema = T.StructType(
        list(LAKE_BASE.fields) + [T.StructField("stars", T.StringType(), True)]
    )
    batch = spark.createDataFrame(
        [_ev("insert", "r", "d.py", 4, {"stargazers": "9", "watchers": "3"})], CH
    )
    _, new_schema, report = evolve_and_promote(batch, schema, detect_renames=True)
    assert report["renamed_columns"] == {}
    assert sorted(report["added_columns"]) == ["stargazers", "watchers"]


def test_accepted_rename_persists_across_epochs(spark, tmp_path):
    """An accepted rename is recorded in table metadata (column_renames)
    and applied on later epochs WITHOUT the heuristic: a subsequent
    sparse batch carrying only the new key keeps landing in the same
    column (ADVICE: persist renames so the mapping is stable)."""
    table = SnapshotTable.create(str(tmp_path / "t"), LAKE_BASE, n_buckets=4)
    apply_changes(
        spark,
        table,
        spark.createDataFrame([_ev("insert", "r", "a.py", 1, {"stars": "5"})], CH),
        0,
    )
    # epoch 1: stars silent, stargazers appears → rename accepted (opt-in)
    apply_changes(
        spark,
        table,
        spark.createDataFrame([_ev("insert", "r", "b.py", 2, {"stargazers": "7"})], CH),
        1,
        detect_renames=True,
    )
    assert table.column_renames == {"stargazers": "stars"}
    # epoch 2: heuristic OFF (default); persisted mapping still applies
    apply_changes(
        spark,
        table,
        spark.createDataFrame([_ev("insert", "r", "c.py", 3, {"stargazers": "9"})], CH),
        2,
    )
    rows = {r["path"]: r for r in table.current_state(spark).collect()}
    assert rows["a.py"]["stars"] == "5"
    assert rows["b.py"]["stars"] == "7"
    assert rows["c.py"]["stars"] == "9"
    assert "stargazers" not in [f.name for f in table.schema().fields]


def test_rename_default_off_in_apply(spark, tmp_path):
    """detect_renames defaults OFF in apply_changes: the ambiguous signal
    (silent column + unknown key) adds a column instead of renaming."""
    table = SnapshotTable.create(str(tmp_path / "t2"), LAKE_BASE, n_buckets=4)
    apply_changes(
        spark,
        table,
        spark.createDataFrame([_ev("insert", "r", "a.py", 1, {"stars": "5"})], CH),
        0,
    )
    apply_changes(
        spark,
        table,
        spark.createDataFrame([_ev("insert", "r", "b.py", 2, {"stargazers": "7"})], CH),
        1,
    )
    names = [f.name for f in table.schema().fields]
    assert "stars" in names and "stargazers" in names
    assert table.column_renames == {}


def test_persisted_rename_with_absent_target_revives_column(spark):
    """A persisted rename whose target column vanished from the schema
    (e.g. after a rollback past the promotion) must not silently drop
    the payload key's values — the target column is revived, sourced
    from the renamed key (review r2 finding)."""
    batch = spark.createDataFrame(
        [_ev("insert", "r", "z.py", 9, {"stargazers": "7"})], CH
    )
    out, new_schema, report = evolve_and_promote(
        batch, LAKE_BASE, known_renames={"stargazers": "stars"}
    )
    assert "stars" in [f.name for f in new_schema.fields]
    assert report["added_columns"] == ["stars"]
    row = out.collect()[0]
    assert row["stars"] == "7"
    assert "stargazers" not in out.columns


def test_revived_rename_transition_batch_keeps_both_producers(spark):
    """A revived rename column must coalesce across BOTH payload keys: a
    transition batch mixing old-producer rows ({'stars': ...}) and
    new-producer rows ({'stargazers': ...}) loses neither side (review
    r2 finding — the revived path previously sourced only the renamed
    key, nulling old-producer values)."""
    batch = spark.createDataFrame(
        [
            _ev("insert", "r", "new.py", 9, {"stargazers": "7"}),
            _ev("insert", "r", "old.py", 8, {"stars": "5"}),
        ],
        CH,
    )
    out, new_schema, report = evolve_and_promote(
        batch, LAKE_BASE, known_renames={"stargazers": "stars"}
    )
    assert report["added_columns"] == ["stars"]
    vals = {r["path"]: r["stars"] for r in out.collect()}
    assert vals == {"new.py": "7", "old.py": "5"}


def test_chained_renames_coalesce_all_generations(spark):
    """A column renamed TWICE across epochs has two persisted keys
    mapping to it; a transition batch carrying rows from every producer
    generation (oldest column key, middle key, newest key) must land
    all three — a single-winner source would null the middle
    generation (review r2 finding). Newest key wins when a row carries
    several."""
    batch = spark.createDataFrame(
        [
            _ev("insert", "r", "gen0.py", 1, {"stars": "1"}),
            _ev("insert", "r", "gen1.py", 2, {"stargazers": "2"}),
            _ev("insert", "r", "gen2.py", 3, {"star_count": "3"}),
            _ev("insert", "r", "both.py", 4, {"stargazers": "9", "star_count": "4"}),
        ],
        CH,
    )
    schema = T.StructType(
        list(LAKE_BASE.fields) + [T.StructField("stars", T.StringType(), True)]
    )
    # acceptance order: stargazers accepted first, star_count later (newest)
    out, _, report = evolve_and_promote(
        batch, schema,
        known_renames={"stargazers": "stars", "star_count": "stars"},
    )
    assert report["added_columns"] == []
    vals = {r["path"]: r["stars"] for r in out.collect()}
    assert vals == {"gen0.py": "1", "gen1.py": "2", "gen2.py": "3", "both.py": "4"}


def test_chained_renames_on_revived_column(spark):
    """The revived-column path honors the same all-generations chain."""
    batch = spark.createDataFrame(
        [
            _ev("insert", "r", "g1.py", 1, {"stargazers": "2"}),
            _ev("insert", "r", "g2.py", 2, {"star_count": "3"}),
            _ev("insert", "r", "g0.py", 3, {"stars": "1"}),
        ],
        CH,
    )
    out, new_schema, report = evolve_and_promote(
        batch, LAKE_BASE,
        known_renames={"stargazers": "stars", "star_count": "stars"},
    )
    assert report["added_columns"] == ["stars"]
    vals = {r["path"]: r["stars"] for r in out.collect()}
    assert vals == {"g0.py": "1", "g1.py": "2", "g2.py": "3"}


def test_reserved_payload_keys_never_promoted(spark, tmp_path):
    """A payload key named like an ENVELOPE column (e.g. 'op') must not
    be promoted — withColumn('op', ...) would clobber the CDC op for the
    whole batch before tombstone derivation, so deletes stop deleting
    (review r2 finding). The key is reported, not silently dropped."""
    batch = spark.createDataFrame(
        [
            _ev("insert", "r", "a.py", 1, {"op": "merged", "_sneaky": "x", "stars": "3"}),
            _ev("delete", "r", "b.py", 2, {"op": "merged"}),
        ],
        CH,
    )
    out, new_schema, report = evolve_and_promote(batch, LAKE_BASE)
    assert report["added_columns"] == ["stars"]
    assert report["reserved_keys_ignored"] == ["_sneaky", "op"]
    # the CDC op survived: the delete is still a delete
    ops = {r["path"]: r["op"] for r in out.collect()}
    assert ops == {"a.py": "insert", "b.py": "delete"}

    # end-to-end: the delete still produces a tombstone through apply
    from streaming_data_pipeline_spark.streaming.apply import apply_changes

    table = SnapshotTable.create(str(tmp_path / "rsv"), LAKE_BASE, n_buckets=4)
    apply_changes(spark, table, batch, 0)
    live = {r["path"] for r in table.current_state(spark).collect()}
    assert live == {"a.py"}


def test_dlq_only_payload_keys_do_not_evolve_schema(spark, tmp_path):
    """A payload key carried ONLY by invalid (DLQ-bound) rows must not
    promote an all-null column (ADVICE r4: malformed/adversarial events
    could otherwise grow the table schema forever). It is deferred —
    and promotes naturally once a VALID row carries it (the replay
    path)."""
    table = SnapshotTable.create(str(tmp_path / "t"), LAKE_BASE, n_buckets=4)
    batch = spark.createDataFrame(
        [
            _ev("insert", "r", "a.py", 1, {"stars": "5"}),
            # invalid: negative lsn fails the YAML rule doc
            _ev("insert", "r", "bad.py", -7, {"evil_key": "x"}),
        ],
        CH,
    )
    stats = apply_changes(spark, table, batch, 0)
    names = [f.name for f in table.schema().fields]
    assert "stars" in names
    assert "evil_key" not in names
    assert stats["schema_evolution"]["deferred_keys"] == ["evil_key"]
    assert stats["dlq_rows"] == 1

    # the same key arriving on a VALID row later (e.g. DLQ replay after
    # the producer fixes the envelope) promotes normally
    apply_changes(
        spark,
        table,
        spark.createDataFrame(
            [_ev("insert", "r", "ok.py", 8, {"evil_key": "now-legit"})], CH
        ),
        1,
    )
    assert "evil_key" in [f.name for f in table.schema().fields]
    rows = {r["path"]: r for r in table.current_state(spark).collect()}
    assert rows["ok.py"]["evil_key"] == "now-legit"


def test_confirm_source_defers_unseen_keys_unit(spark):
    """evolve_and_promote(confirm_source=...): keys absent from every
    confirm row are deferred and excluded from the rename heuristic."""
    schema = T.StructType(
        list(LAKE_BASE.fields) + [T.StructField("stars", T.StringType(), True)]
    )
    batch = spark.createDataFrame(
        [_ev("insert", "r", "c.py", 3, {"stargazers": "9"})], CH
    )
    empty_confirm = spark.createDataFrame([], CH)
    out, new_schema, report = evolve_and_promote(
        batch, schema, detect_renames=True,
        key_source=batch, confirm_source=empty_confirm,
    )
    # without confirmation this exact shape fires the rename heuristic
    # (test_rename_heuristic); a DLQ-only key must not
    assert report["renamed_columns"] == {}
    assert report["added_columns"] == []
    assert report["deferred_keys"] == ["stargazers"]
    assert [f.name for f in new_schema.fields] == [f.name for f in schema.fields]


def test_invalid_counts_subtraction_unit(spark):
    """evolve_and_promote(invalid_counts=...): zero-scan confirmation —
    a candidate whose total carriers all sit in the invalid split
    defers; a mixed-carrier candidate promotes. No confirm_source frame
    is touched (None) and the report names the mechanism."""
    batch = spark.createDataFrame(
        [
            _ev("insert", "r", "a.py", 1, {"good_key": "1", "bad_key": "x"}),
            _ev("insert", "r", "b.py", 2, {"bad_key": "y"}),
        ],
        CH,
    )
    counts = {"good_key": 1, "bad_key": 2}
    out, new_schema, report = evolve_and_promote(
        batch,
        LAKE_BASE,
        key_source=batch,
        precomputed_counts=counts,
        invalid_counts={"bad_key": 2},  # every bad_key carrier is invalid
        confirm_source=None,
    )
    assert report["confirm_via"] == "dlq_observe"
    assert report["deferred_keys"] == ["bad_key"]
    assert report["added_columns"] == ["good_key"]
    names = [f.name for f in new_schema.fields]
    assert "good_key" in names and "bad_key" not in names


def test_apply_confirms_dlq_only_keys_on_candidate_epochs(spark, tmp_path):
    """The apply path confirms candidate new keys POSITIVELY against the
    valid split (confirm_via == valid_scan), and only on epochs that
    actually detect candidates — the confirmation aggregate overlaps the
    DLQ write on the pool thread instead of blocking on it (r6: the r5
    DLQ-observation ride serialized the key scan ahead of the DLQ launch
    every epoch). Deferral semantics are unchanged: a DLQ-only key never
    grows the schema."""
    table = SnapshotTable.create(str(tmp_path / "t"), LAKE_BASE, n_buckets=4)
    for epoch in range(3):
        batch = spark.createDataFrame(
            [
                _ev("insert", "r", f"ok{epoch}.py", 10 + epoch, {"stars": "5"}),
                # invalid every epoch, always carrying the hostile key
                _ev("insert", "r", f"bad{epoch}.py", -1, {"evil_key": "x"}),
            ],
            CH,
        )
        stats = apply_changes(spark, table, batch, epoch)
        report = stats["schema_evolution"]
        assert report["confirm_via"] == "valid_scan", (epoch, report)
        assert report["deferred_keys"] == ["evil_key"]
        assert stats["dlq_rows"] == 1
    names = [f.name for f in table.schema().fields]
    assert "stars" in names and "evil_key" not in names
    # the hostile key arriving on a VALID row still promotes normally
    apply_changes(
        spark,
        table,
        spark.createDataFrame(
            [_ev("insert", "r", "legit.py", 99, {"evil_key": "ok"})], CH
        ),
        3,
    )
    assert "evil_key" in [f.name for f in table.schema().fields]
