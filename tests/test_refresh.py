"""Incremental shard refresh == full re-export (plans/refresh.py).

The refresh touches only change-feed keys, their sha groups, and the
affected lang partitions — yet must land byte-for-byte on the same
rows, index and counts a from-scratch export at the new snapshot
produces, across keeper promotion/demotion, content moves between
dedup groups, deletes, and sampling."""

from __future__ import annotations

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.plans.export import export_training_mix
from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.plans.refresh import refresh_training_mix
from streaming_data_pipeline_spark.schemas import CHANGE_EVENT, LAKE_BASE
from streaming_data_pipeline_spark.streaming.apply import apply_changes

RATES = {"python": 100, "go": 100, "java": 100}


def _ev(op, path, lsn, content, lang="python"):
    return (op, "r", path, f"c{lsn}", lang,
            None if op == "delete" else content, lsn, None, None)


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_EVENT)


def _shard_rows(spark, out):
    return {
        (r["repo"], r["path"], r["lang"], r["text"], r["_sha"])
        for r in spark.read.parquet(f"{out}/data").collect()
    }


def _index_rows(spark, out):
    return {tuple(r) for r in spark.read.parquet(f"{out}/_index").collect()}


def _seed(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=8)
    # duplicates across keys (dedup groups), several langs, loops for the
    # repetition filter, enough keys that sampling drops some
    rows = []
    for i in range(40):
        lang = ["python", "go", "java"][i % 3]
        content = f"def f_{i // 4}():\n    return {i // 4}\n"  # 4-way dup groups
        rows.append(_ev("insert", f"f{i}.py", i + 1, content, lang))
    rows.append(_ev("insert", "loop.py", 100, "spam " * 50))  # repetition drop
    apply_changes(spark, table, _batch(spark, rows), 0)
    return table


def _mutate(spark, table):
    """Epoch 1: the adversarial delta — keeper deletion (promotion),
    content moves between sha groups (demotion/steal), plain updates,
    new keys joining old groups, fresh groups, and a new lang."""
    rows = [
        _ev("delete", "f0.py", 200, None),                   # keeper of group 0 dies
        _ev("update", "f1.py", 201, "def f_9():\n    return 9\n"),  # moves g0 -> g9
        _ev("update", "f5.py", 202, "brand new content\n", "go"),   # g1 -> new group
        _ev("insert", "a_new.py", 203, "def f_2():\n    return 2\n"),  # joins g2, steals keeper (a < f)
        _ev("insert", "z_new.py", 204, "unique thing\n", "java"),
        _ev("delete", "loop.py", 205, None),
        _ev("insert", "only_rust.py", 206, "fn main() {}\n", "rust"),  # default-rate lang
    ]
    apply_changes(spark, table, _batch(spark, rows), 1)


def test_refresh_equals_full_export(spark, tmp_path):
    table = _seed(spark, tmp_path)
    outA = str(tmp_path / "shardA")
    man0 = export_training_mix(spark, table, outA, rates=RATES, default_rate=50)
    assert man0["counts"]["sampled"] > 0

    _mutate(spark, table)

    manR = refresh_training_mix(spark, table, outA)
    outB = str(tmp_path / "shardB")
    manF = export_training_mix(spark, table, outB, rates=RATES, default_rate=50)

    assert manR["snapshot_version"] == manF["snapshot_version"]
    assert manR["counts"] == manF["counts"]
    assert _shard_rows(spark, outA) == _shard_rows(spark, outB)
    assert _index_rows(spark, outA) == _index_rows(spark, outB)
    assert manR["changed_keys"] == 7

    # refresh with nothing new is a no-op
    again = refresh_training_mix(spark, table, outA)
    assert again["snapshot_version"] == manR["snapshot_version"]


def test_refresh_with_benchmark(spark, tmp_path):
    table = _seed(spark, tmp_path)
    bench = spark.createDataFrame(
        [(0, "def f_3():\n    return 3\n")], "doc_id long, text string"
    )
    outA = str(tmp_path / "bA")
    export_training_mix(
        spark, table, outA, rates=RATES, default_rate=50,
        benchmark=bench, max_contamination=0.4,
    )
    _mutate(spark, table)
    manR = refresh_training_mix(spark, table, outA, benchmark=bench)
    outB = str(tmp_path / "bB")
    manF = export_training_mix(
        spark, table, outB, rates=RATES, default_rate=50,
        benchmark=bench, max_contamination=0.4,
    )
    assert manR["counts"] == manF["counts"]
    assert _shard_rows(spark, outA) == _shard_rows(spark, outB)
    assert _index_rows(spark, outA) == _index_rows(spark, outB)

    # benchmark presence must match the original export
    import pytest

    with pytest.raises(ValueError, match="benchmark"):
        refresh_training_mix(spark, table, outA)


def test_refresh_spans_cow_merge_history(spark, tmp_path):
    """A cow-mode lake is refreshable (r2 missing #1): merge_into's
    changelog sidecar makes the merge feed-visible, so the refresh over
    a mixed mor/cow history equals a full re-export."""
    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=50)

    # the adversarial delta applied via COW, plus a second cow epoch
    rows = [
        _ev("delete", "f0.py", 200, None),
        _ev("update", "f1.py", 201, "def f_9():\n    return 9\n"),
        _ev("insert", "a_new.py", 203, "def f_2():\n    return 2\n"),
    ]
    apply_changes(spark, table, _batch(spark, rows), 1, mode="cow")
    apply_changes(
        spark, table,
        _batch(spark, [_ev("insert", "z_new.py", 204, "unique thing\n", "java")]),
        2, mode="cow",
    )

    manR = refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    manF = export_training_mix(spark, table, outB, rates=RATES, default_rate=50)
    assert manR["counts"] == manF["counts"]
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)
    assert _index_rows(spark, out) == _index_rows(spark, outB)
    assert manR["changed_keys"] == 4


def test_refresh_refuses_feed_invisible_history(spark, tmp_path):
    """Legacy merges (no changelog sidecar) and rollbacks are invisible
    to the change feed (base files / republished manifests); refreshing
    across them would ship a silently stale shard — the refresh must
    refuse instead."""
    import pytest

    from streaming_data_pipeline_spark.operators.merge import merge_into

    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=50)

    merge_into(
        spark, table, _batch(spark, [_ev("insert", "x.py", 300, "xx\n")]),
        epoch=1, write_changelog=False,
    )
    with pytest.raises(ValueError, match="merge commit without a changelog"):
        refresh_training_mix(spark, table, out)

    # a LEGACY (metadata-only, sidecar-less) rollback in range refuses too
    table2 = _seed(spark, tmp_path / "t2")
    out2 = str(tmp_path / "s2")
    export_training_mix(spark, table2, out2, rates=RATES, default_rate=50)
    v_pre = table2.current_version()
    apply_changes(spark, table2, _batch(spark, [_ev("insert", "y.py", 301, "yy\n")]), 1)
    table2.rollback(v_pre)
    with pytest.raises(ValueError, match="rollback"):
        refresh_training_mix(spark, table2, out2)

    # and an OLDER target version refuses outright
    with pytest.raises(ValueError, match="OLDER"):
        refresh_training_mix(spark, table2, out2, version=0)


def test_partition_escape_matches_spark(spark, tmp_path):
    """_escape_partition_value must produce EXACTLY the dir segment
    partitionBy writes — pinned against a real Spark write, not against
    a re-implementation's opinion."""
    import os

    from streaming_data_pipeline_spark.plans.refresh import (
        _escape_partition_value,
    )

    vals = ["plain", "f#", "a/b", "pct%20", "sp ace", "eq=x", "q?", "co:lon",
            "back\\slash", "st*ar", "bra[ck]et", "ca^ret", "cu{rly", None, ""]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, lang string"
    )
    out = str(tmp_path / "esc")
    df.write.partitionBy("lang").parquet(out)
    spark_dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    ours = {f"lang={_escape_partition_value(v)}" for v in vals}
    assert ours == spark_dirs


def test_refresh_with_adversarial_lang_values(spark, tmp_path):
    """Producer-supplied langs containing '/', '#', '%', '=', space and
    null must land refresh and full export on identical partitions —
    the ADVICE r2 path-escaping hazard."""
    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=8)
    weird = ["f#", "a/b", "pct%23", "sp ace", "eq=x", None]
    rows = []
    for i in range(24):
        lang = weird[i % len(weird)]
        rows.append(_ev("insert", f"w{i}.py", i + 1, f"content {i}\n", lang))
    apply_changes(spark, table, _batch(spark, rows), 0)

    out = str(tmp_path / "shard")
    rates = {w: 100 for w in weird if w is not None}
    export_training_mix(spark, table, out, rates=rates, default_rate=100)

    # delta touches every weird lang: update one doc of each
    rows = [
        _ev("update", f"w{i}.py", 100 + i, f"new content {i}\n", weird[i % len(weird)])
        for i in range(len(weird))
    ]
    rows.append(_ev("delete", "w6.py", 200, None))
    apply_changes(spark, table, _batch(spark, rows), 1)

    refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    export_training_mix(spark, table, outB, rates=rates, default_rate=100)
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)
    assert _index_rows(spark, out) == _index_rows(spark, outB)
    # and the LIVE partition dirs are identical — no raw/escaped twins
    import os

    da = {d for d in os.listdir(f"{out}/data") if d.startswith("lang=")}
    db = {d for d in os.listdir(f"{outB}/data") if d.startswith("lang=")}
    assert da == db


def test_literal_default_partition_lang_collapses(spark, tmp_path):
    """A producer-supplied lang equal to the LITERAL string
    '__HIVE_DEFAULT_PARTITION__' shares a partition dir with null langs
    (Spark's own collapse); refresh must treat them as one stratum or
    its two staging writes clobber each other."""
    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=8)
    rows = [
        # '' survives apply_defaults (only NULL lang gets the 'other'
        # default) and partitionBy lands it in the default partition
        _ev("insert", "a.py", 1, "def alpha():\n    return one two three\n", ""),
        _ev("insert", "b.py", 2, "def beta():\n    return four five six\n", "__HIVE_DEFAULT_PARTITION__"),
        _ev("insert", "c.py", 3, "def gamma():\n    return seven eight nine\n", "python"),
    ]
    apply_changes(spark, table, _batch(spark, rows), 0)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=100)

    rows = [
        _ev("update", "a.py", 10, "def alpha():\n    return ten eleven twelve\n", ""),
        _ev("update", "b.py", 11, "def beta():\n    return thirteen fourteen fifteen\n", "__HIVE_DEFAULT_PARTITION__"),
    ]
    apply_changes(spark, table, _batch(spark, rows), 1)
    refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    export_training_mix(spark, table, outB, rates=RATES, default_rate=100)
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)


def test_refresh_with_null_content_doc(spark, tmp_path):
    """A live null-content row (reachable via a DLQ-replay fixer path —
    append_delta does not re-validate) must flow through export AND
    refresh identically: sha_col's sentinel keeps the _sha equi-joins
    from dropping it (SQL NULL never equi-matches)."""
    from streaming_data_pipeline_spark.operators.merge import append_delta

    table = _seed(spark, tmp_path)
    append_delta(
        spark, table,
        _batch(spark, [("insert", "r", "nullc.py", "cx", "python", None, 999, None, None)]),
        epoch=90,
    )
    out = str(tmp_path / "shard")
    export_training_mix(spark, table, out, rates=RATES, default_rate=100)
    # the null-content doc is a keeper of its (singleton) sha group
    idx = {r["path"]: r for r in spark.read.parquet(f"{out}/_index").collect()}
    assert idx["nullc.py"]["is_keeper"] and idx["nullc.py"]["_sha"] == ""

    _mutate(spark, table)
    # a SECOND null-content doc joins the sentinel sha group ('a_null' <
    # 'nullc' steals the keeper role — exercises group logic on the
    # sentinel, not just carriage)
    append_delta(
        spark, table,
        _batch(spark, [("insert", "r", "a_null.py", "cy", "python", None, 1000, None, None)]),
        epoch=91,
    )
    refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    export_training_mix(spark, table, outB, rates=RATES, default_rate=100)
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)
    assert _index_rows(spark, out) == _index_rows(spark, outB)


def test_empty_shard_refreshes_forward(spark, tmp_path):
    """A shard emptied by deletes (no parquet under data/) must remain
    refreshable: new inserts at a later snapshot repopulate it, equal to
    a full re-export (ADVICE r2: empty-dir schema inference)."""
    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=100)
    rows = [_ev("delete", f"f{i}.py", 400 + i, None) for i in range(40)]
    rows.append(_ev("delete", "loop.py", 600, None))
    apply_changes(spark, table, _batch(spark, rows), 1)
    man = refresh_training_mix(spark, table, out)
    assert man["counts"]["sampled"] == 0

    # forward again from the empty shard
    rows = [
        _ev("insert", f"g{i}.py", 700 + i, f"def g_{i}():\n    return {i}\n")
        for i in range(6)
    ]
    apply_changes(spark, table, _batch(spark, rows), 2)
    refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    export_training_mix(spark, table, outB, rates=RATES, default_rate=100)
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)
    assert _index_rows(spark, out) == _index_rows(spark, outB)


def test_shard_write_fans_out_per_stratum(spark, tmp_path):
    """The VERDICT r2 scale item: a dominant lang must not funnel
    through one writer task. With file_groups=G, a populated stratum
    carries >1 part file (G-way deterministic groups), and a refresh
    rewrite of that stratum keeps the fan-out."""
    import os

    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=100, file_groups=4)

    def nfiles(d):
        return len([f for f in os.listdir(d) if f.endswith(".parquet")])

    # 14 python docs over 4 hash groups: >1 file whp (pinned: deterministic)
    assert nfiles(f"{out}/data/lang=python") > 1

    _mutate(spark, table)
    refresh_training_mix(spark, table, out)
    assert nfiles(f"{out}/data/lang=python") > 1
    outB = str(tmp_path / "full")
    export_training_mix(spark, table, outB, rates=RATES, default_rate=100, file_groups=4)
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)

    # FILE-LAYOUT parity, not just row sets: the refreshed stratum must
    # reproduce the full export's file splits (shared shuffle spec —
    # same partition count, same (lang, group) hash columns)
    import pyarrow.parquet as pq

    def file_layout(d):
        out_files = []
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".parquet"):
                t = pq.read_table(os.path.join(d, fn))
                out_files.append(tuple(sorted(zip(
                    t.column("repo").to_pylist(), t.column("path").to_pylist()
                ))))
        return sorted(out_files)

    for lang in ("python", "go", "java"):
        assert file_layout(f"{out}/data/lang={lang}") == file_layout(
            f"{outB}/data/lang={lang}"
        ), lang


def test_refresh_spans_sidecar_rollback(spark, tmp_path):
    """A rollback committed WITH its key-level-inverse sidecar
    (rollback(v, spark)) stays feed-visible: a lake operator who rolls
    back one bad epoch no longer loses incremental refresh — refresh
    across (bad epoch, rollback, good epoch) equals a full re-export."""
    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=50)
    v_pre = table.current_version()

    _mutate(spark, table)  # the bad epoch (keeper churn, new lang, deletes)
    table.rollback(v_pre, spark)  # retract it, feed-visibly
    apply_changes(
        spark, table,
        _batch(spark, [_ev("insert", "good.py", 300, "def good():\n    return 3\n")]),
        2,
    )

    manR = refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    manF = export_training_mix(spark, table, outB, rates=RATES, default_rate=50)
    assert manR["counts"] == manF["counts"]
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)
    assert _index_rows(spark, out) == _index_rows(spark, outB)


def test_refresh_spans_deep_rollback_behind_shard_version(spark, tmp_path):
    """Rollback to a version BEHIND the shard's own snapshot: the shard
    was refreshed at v_a, then the lake rolls back to v_pre < v_a (the
    inverse retracts changes the shard has already incorporated) and a
    new epoch lands on top. Refresh must converge to a full re-export —
    exercised in near-dup mode so the band/pair sidecars also unwind."""
    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(
        spark, table, out, rates=RATES, default_rate=100, near_dup_threshold=0.6
    )
    v_pre = table.current_version()

    _mutate(spark, table)
    refresh_training_mix(spark, table, out)  # shard now AT the bad epoch

    table.rollback(v_pre, spark)  # retract what the shard already has
    apply_changes(
        spark, table,
        _batch(spark, [_ev("insert", "after.py", 400, "def after():\n    return 4\n")]),
        2,
    )

    manR = refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    manF = export_training_mix(
        spark, table, outB, rates=RATES, default_rate=100, near_dup_threshold=0.6
    )
    assert manR["counts"] == manF["counts"]
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)
    assert _index_rows(spark, out) == _index_rows(spark, outB)
    assert _rows(spark, f"{out}/_near/pairs") == _rows(spark, f"{outB}/_near/pairs")
    assert _rows(spark, f"{out}/_near/bands") == _rows(spark, f"{outB}/_near/bands")


def test_index_and_sidecar_writes_fan_out(spark, tmp_path):
    """VERDICT r3 #2: the O(corpus) id-level index and the near-dup
    sidecars must not funnel through fixed-width writer tasks. With
    file_groups=G they fan out over G-way deterministic hash groups
    (>1 part file), and a refresh reproduces the full export's file
    layout exactly (shared index_repartition spec)."""
    import os

    import pyarrow.parquet as pq

    table = _near_seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(
        spark, table, out, rates=RATES, default_rate=100,
        near_dup_threshold=0.5, file_groups=4,
    )

    def nfiles(d):
        return len([f for f in os.listdir(d) if f.endswith(".parquet")])

    assert nfiles(f"{out}/_index") > 1
    assert nfiles(f"{out}/_near/bands") > 1

    rows = [
        _ev("delete", "p1.py", 100, None),
        _ev("update", "q2.py", 101, f"{BASE1} omicron\n", "go"),
        _ev("insert", "p4.py", 102, f"{BASE1} pi\n"),
    ]
    apply_changes(spark, table, _batch(spark, rows), 1)
    refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    export_training_mix(
        spark, table, outB, rates=RATES, default_rate=100,
        near_dup_threshold=0.5, file_groups=4,
    )

    def file_layout(d, cols):
        layouts = []
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".parquet"):
                t = pq.read_table(os.path.join(d, fn))
                layouts.append(tuple(sorted(zip(*(t.column(c).to_pylist() for c in cols)))))
        return sorted(layouts)

    for sub, cols in (
        ("_index", ("doc_id", "_sha")),
        ("_near/bands", ("doc_id", "band")),
        ("_near/pairs", ("doc_a", "doc_b")),
    ):
        assert file_layout(f"{out}/{sub}", cols) == file_layout(f"{outB}/{sub}", cols), sub


def test_refresh_recovers_from_torn_swap(spark, tmp_path):
    """A crash between the swap renames leaves an _old_lang dir; the next
    refresh restores it before computing, so no untouched rows are
    lost."""
    import os

    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=50)

    # simulate the torn window: live dir renamed aside, new never landed
    os.rename(f"{out}/data/lang=go", f"{out}/data/_old_lang=go")

    _mutate(spark, table)
    refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    export_training_mix(spark, table, outB, rates=RATES, default_rate=50)
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)


def test_refresh_empties_partition_like_full_export(spark, tmp_path):
    """Deleting every doc of a lang removes its partition dir (a full
    export writes none), and an all-deleted lake yields integer-zero
    counts, not JSON nulls."""
    import os

    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=100)
    assert os.path.isdir(f"{out}/data/lang=java")

    # delete every java doc (i % 3 == 2) and the loop doc
    rows = [_ev("delete", f"f{i}.py", 400 + i, None) for i in range(40) if i % 3 == 2]
    apply_changes(spark, table, _batch(spark, rows), 1)
    man = refresh_training_mix(spark, table, out)
    assert not os.path.isdir(f"{out}/data/lang=java")
    assert man["counts"]["sampled"] > 0  # other langs intact

    # now delete everything else
    rows = [_ev("delete", f"f{i}.py", 500 + i, None) for i in range(40) if i % 3 != 2]
    rows.append(_ev("delete", "loop.py", 600, None))
    apply_changes(spark, table, _batch(spark, rows), 2)
    man = refresh_training_mix(spark, table, out)
    assert man["counts"] == {
        "state_rows": 0, "after_exact_dedup": 0,
        "after_repetition_filter": 0, "sampled": 0,
    }
    assert not any(d.startswith("lang=") for d in os.listdir(f"{out}/data"))


def test_refresh_spans_maintenance_history(spark, tmp_path):
    """Compaction, rebucket and tombstone purges in the v0->v1 range are
    feed-invisible by design (base-file rewrites, no key changes) and
    must NOT block or skew a refresh: the result still equals a full
    re-export at v1."""
    from streaming_data_pipeline_spark.plans.maintenance import (
        compact,
        purge_tombstones,
        rebucket,
    )

    table = _seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(spark, table, out, rates=RATES, default_rate=50)

    _mutate(spark, table)
    compact(spark, table, max_files_per_bucket=1)
    rebucket(spark, table, 16)
    purge_tombstones(spark, table, lsn_horizon=1000)
    apply_changes(
        spark, table,
        _batch(spark, [_ev("insert", "post_maint.py", 2000, "def pm():\n    return 1\n")]),
        2,
    )

    manR = refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    manF = export_training_mix(spark, table, outB, rates=RATES, default_rate=50)
    assert manR["counts"] == manF["counts"]
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)
    assert _index_rows(spark, out) == _index_rows(spark, outB)


# --------------------------- near-dup mode ---------------------------

BASE1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda omega sigma tau phi chi psi rho pip"
BASE2 = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
BASE3 = "red orange yellow green blue indigo violet cyan magenta umber ochre"


def _near_seed(spark, tmp_path):
    """Corpus with real near-dup structure: group1 = three tail-variants
    of BASE1 (pairwise jaccard ~0.8), group2 = two variants of BASE2,
    plus unrelated singletons on BASE3-like texts."""
    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=8)
    rows = [
        _ev("insert", "p1.py", 1, f"{BASE1} mu\n"),
        _ev("insert", "p2.py", 2, f"{BASE1} nu\n"),
        _ev("insert", "p3.py", 3, f"{BASE1} xi\n"),
        _ev("insert", "q1.py", 4, f"{BASE2} twenty\n", "go"),
        _ev("insert", "q2.py", 5, f"{BASE2} thirty\n", "go"),
        _ev("insert", "s1.py", 6, f"{BASE3} one\n", "java"),
        _ev("insert", "s2.py", 7, "completely different words entirely unique tokens here now then\n", "java"),
        _ev("insert", "s3.py", 8, "def standalone():\n    return something_else entirely_nine\n"),
    ]
    apply_changes(spark, table, _batch(spark, rows), 0)
    return table


def test_near_dup_export_clusters_and_sidecars(spark, tmp_path):
    import os

    table = _near_seed(spark, tmp_path)
    out = str(tmp_path / "s")
    man = export_training_mix(
        spark, table, out, rates=RATES, default_rate=100, near_dup_threshold=0.5
    )
    # 8 docs, no exact dups; near-dedup collapses group1 (3) and group2
    # (2) to one rep each: 8 -> 5 survivors
    assert man["counts"]["after_exact_dedup"] == 8
    assert man["counts"]["after_near_dedup"] == 5
    assert man["near_dup_threshold"] == 0.5
    idx = {r["path"]: r for r in spark.read.parquet(f"{out}/_index").collect()}
    p_cluster = {idx[p]["cluster_id"] for p in ("p1.py", "p2.py", "p3.py")}
    assert len(p_cluster) == 1  # one transitive cluster
    assert idx["s1.py"]["cluster_id"] == idx["s1.py"]["doc_id"]  # singleton
    # the shard holds only cluster representatives
    shard_paths = {r["path"] for r in spark.read.parquet(f"{out}/data").collect()}
    assert len(shard_paths) == 5
    assert os.path.isdir(f"{out}/_near/bands") and os.path.isdir(f"{out}/_near/pairs")


def test_near_refresh_equals_full_export(spark, tmp_path):
    """The capstone equivalence, near-dup mode: cluster SPLITS (a rep
    deleted, a member updated out of its cluster), cluster MERGES (a
    doc updated into another group's neighborhood), joins of brand-new
    docs, and singleton deletions — refresh == full re-export, twice."""
    table = _near_seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(
        spark, table, out, rates=RATES, default_rate=100, near_dup_threshold=0.5
    )

    rows = [
        _ev("delete", "p1.py", 100, None),                    # group1 shrinks (maybe rep death)
        _ev("update", "p2.py", 101, "now utterly unrelated text with brand new tokens only\n"),  # leaves group1
        _ev("update", "q2.py", 102, f"{BASE1} omicron\n", "go"),  # q2 MERGES into group1's cluster
        _ev("insert", "p4.py", 103, f"{BASE1} pi\n"),         # brand-new join
        _ev("delete", "s3.py", 104, None),                    # singleton death
    ]
    apply_changes(spark, table, _batch(spark, rows), 1)

    manR = refresh_training_mix(spark, table, out)
    outB = str(tmp_path / "full")
    manF = export_training_mix(
        spark, table, outB, rates=RATES, default_rate=100, near_dup_threshold=0.5
    )
    assert manR["counts"] == manF["counts"]
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)
    assert _index_rows(spark, out) == _index_rows(spark, outB)
    # sidecars stay in lockstep too (the NEXT refresh depends on them)
    assert _rows(spark, f"{out}/_near/pairs") == _rows(spark, f"{outB}/_near/pairs")
    assert _rows(spark, f"{out}/_near/bands") == _rows(spark, f"{outB}/_near/bands")

    # second delta on the refreshed state: the rep of the merged cluster
    # changes again and a split happens via bridge-node death
    rows = [
        _ev("delete", "p3.py", 200, None),
        _ev("update", "s1.py", 201, f"{BASE2} forty\n", "java"),  # joins q1's base family
        _ev("insert", "r1.py", 202, "yet another standalone document body here entirely\n", "rust"),
    ]
    apply_changes(spark, table, _batch(spark, rows), 2)
    manR2 = refresh_training_mix(spark, table, out)
    outC = str(tmp_path / "full2")
    manF2 = export_training_mix(
        spark, table, outC, rates=RATES, default_rate=100, near_dup_threshold=0.5
    )
    assert manR2["counts"] == manF2["counts"]
    assert _shard_rows(spark, out) == _shard_rows(spark, outC)
    assert _index_rows(spark, out) == _index_rows(spark, outC)
    assert _rows(spark, f"{out}/_near/pairs") == _rows(spark, f"{outC}/_near/pairs")

    # and a no-op refresh stays a no-op
    again = refresh_training_mix(spark, table, out)
    assert again["snapshot_version"] == manR2["snapshot_version"]


def _rows(spark, path):
    return {tuple(r) for r in spark.read.parquet(path).collect()}


def test_near_refresh_with_sampling_and_benchmark(spark, tmp_path):
    """Near mode composed with the decontamination and sampling stages:
    flags live on near-keepers; promotion into near-keeperhood must
    recompute flags, carriage must not."""
    table = _near_seed(spark, tmp_path)
    bench = spark.createDataFrame(
        [(0, f"{BASE2} twenty\n")], "doc_id long, text string"
    )
    out = str(tmp_path / "s")
    export_training_mix(
        spark, table, out, rates={"python": 100, "go": 100, "java": 50},
        default_rate=50, near_dup_threshold=0.5,
        benchmark=bench, max_contamination=0.4,
    )
    rows = [
        _ev("delete", "q1.py", 100, None),   # possibly the contaminated rep dies
        _ev("insert", "p4.py", 101, f"{BASE1} rho\n"),
    ]
    apply_changes(spark, table, _batch(spark, rows), 1)
    manR = refresh_training_mix(spark, table, out, benchmark=bench)
    outB = str(tmp_path / "full")
    manF = export_training_mix(
        spark, table, outB, rates={"python": 100, "go": 100, "java": 50},
        default_rate=50, near_dup_threshold=0.5,
        benchmark=bench, max_contamination=0.4,
    )
    assert manR["counts"] == manF["counts"]
    assert _shard_rows(spark, out) == _shard_rows(spark, outB)
    assert _index_rows(spark, out) == _index_rows(spark, outB)


def test_near_refresh_fuzz_20_deltas(spark, tmp_path):
    """Seeded 20-delta fuzz of the near-mode incremental refresh
    (VERDICT r3 #7): random insert/update/delete with heavy cluster
    churn — docs hopping between near-dup families (merges/splits/
    moves), family births and deaths, unique singletons — asserting
    refresh == full re-export after EVERY delta. Every sixth delta is
    first applied and then RETRACTED with a feed-visible sidecar
    rollback before refreshing, so the rollback path is fuzzed inside
    the same chain. Deterministic (random.Random(42)): LSH recall does
    not affect the equivalence — a band-missed pair is missed by both
    paths identically, which is exactly the invariant under test."""
    import random

    rng = random.Random(42)
    WORDS = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
        "nu xi omicron pi rho sigma tau upsilon"
    ).split()

    def family_text(fam: int, tail: int) -> str:
        base = " ".join(f"{w}f{fam}" for w in WORDS)  # per-family salt
        return f"{base} tail{tail}\n"

    def unique_text(i: int) -> str:
        return " ".join(f"uniq{i}w{j}" for j in range(12)) + "\n"

    langs = ["python", "go", "java"]
    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=8)
    lsn = 0
    tail = 0
    uniq = 0
    present: list[str] = []

    def mk(op, path, content, lang):
        nonlocal lsn
        lsn += 1
        return _ev(op, path, lsn, content, lang)

    rows = []
    for fam in range(3):
        for _ in range(3):
            tail += 1
            rows.append(mk("insert", f"d{tail}_{fam}.py", family_text(fam, tail), rng.choice(langs)))
            present.append(rows[-1][2])
    for _ in range(4):
        uniq += 1
        tail += 1
        rows.append(mk("insert", f"u{tail}.py", unique_text(uniq), rng.choice(langs)))
        present.append(rows[-1][2])
    apply_changes(spark, table, _batch(spark, rows), 0)

    out = str(tmp_path / "s")
    export_training_mix(
        spark, table, out, rates=RATES, default_rate=100,
        near_dup_threshold=0.6, pack_budget=32,
    )

    def random_delta():
        nonlocal tail, uniq
        ops = []
        for _ in range(rng.randint(1, 3)):
            r = rng.random()
            if r < 0.35 and present:  # cluster move/merge/split via update
                p = rng.choice(present)
                fam = rng.randint(0, 3)  # fam 3 starts empty: family births
                tail += 1
                ops.append(mk("update", p, family_text(fam, tail), rng.choice(langs)))
            elif r < 0.55:  # new family member joins
                fam = rng.randint(0, 3)
                tail += 1
                p = f"d{tail}_{fam}.py"
                ops.append(mk("insert", p, family_text(fam, tail), rng.choice(langs)))
                present.append(p)
            elif r < 0.75 or not present:  # unique singleton
                uniq += 1
                tail += 1
                p = f"u{tail}.py"
                ops.append(mk("insert", p, unique_text(uniq), rng.choice(langs)))
                present.append(p)
            else:  # death (maybe a representative / bridge node)
                p = rng.choice(present)
                present.remove(p)
                ops.append(mk("delete", p, None, None))
        return ops

    for step in range(1, 21):
        if step % 6 == 3:
            # apply a delta, then RETRACT it feed-visibly: the refresh
            # below must span (bad epoch, rollback, next epoch)
            v_pre = table.current_version()
            snap_present = list(present)
            apply_changes(spark, table, _batch(spark, random_delta()), step * 10)
            table.rollback(v_pre, spark)
            present[:] = snap_present
        apply_changes(spark, table, _batch(spark, random_delta()), step * 10 + 1)

        manR = refresh_training_mix(spark, table, out)
        outB = str(tmp_path / f"full{step}")
        manF = export_training_mix(
            spark, table, outB, rates=RATES, default_rate=100,
            near_dup_threshold=0.6, pack_budget=32,
        )
        assert manR["counts"] == manF["counts"], f"step {step}"
        assert _shard_rows(spark, out) == _shard_rows(spark, outB), f"step {step}"
        assert _index_rows(spark, out) == _index_rows(spark, outB), f"step {step}"
        assert _rows(spark, f"{out}/_near/pairs") == _rows(spark, f"{outB}/_near/pairs"), f"step {step}"
        assert _rows(spark, f"{out}/_near/bands") == _rows(spark, f"{outB}/_near/bands"), f"step {step}"
        assert _rows(spark, f"{out}/_packing") == _rows(spark, f"{outB}/_packing"), f"step {step}"


def test_near_refresh_recovers_from_torn_sidecar_swap(spark, tmp_path):
    """Crash windows between the sidecar swaps and the index swap must
    re-run idempotently: v1 sidecars + v0 index (and the half-swapped
    bands-only window) both converge to the same state as an untorn
    refresh — incl. the demoted-keeper case where the reverse swap
    order lost eviction information forever."""
    import shutil

    table = _near_seed(spark, tmp_path)
    out = str(tmp_path / "s")
    export_training_mix(
        spark, table, out, rates=RATES, default_rate=100, near_dup_threshold=0.5
    )
    v0_backup = str(tmp_path / "backup")
    shutil.copytree(out, v0_backup)

    # the delta includes an exact-keeper DEMOTION: a smaller-key
    # duplicate of p1's content steals its keeperhood
    rows = [
        _ev("insert", "a0.py", 100, f"{BASE1} mu\n"),  # exact dup of p1, smaller key
        _ev("update", "q2.py", 101, f"{BASE2} fifty\n", "go"),
        _ev("delete", "s3.py", 102, None),
    ]
    apply_changes(spark, table, _batch(spark, rows), 1)
    refresh_training_mix(spark, table, out)

    def rows_of(p):
        return {tuple(r) for r in spark.read.parquet(p).collect()}

    want_pairs = rows_of(f"{out}/_near/pairs")
    want_bands = rows_of(f"{out}/_near/bands")
    want_idx = _index_rows(spark, out)
    want_shard = _shard_rows(spark, out)

    def torn(keep_v1):
        """Rebuild the crash state: v1 artifacts for `keep_v1`, v0 for
        everything else (index, manifest, remaining sidecars)."""
        d = str(tmp_path / f"torn_{'_'.join(s.replace('/', '-') for s in keep_v1)}")
        shutil.copytree(v0_backup, d)
        for base in keep_v1:
            shutil.rmtree(f"{d}/{base}")
            shutil.copytree(f"{out}/{base}", f"{d}/{base}")
        # data partitions swap before metadata — model them as already v1
        shutil.rmtree(f"{d}/data")
        shutil.copytree(f"{out}/data", f"{d}/data")
        return d

    # window 1: both sidecars swapped, index not yet
    # window 2: only the bands sidecar swapped
    for keep in (["_near/bands", "_near/pairs"], ["_near/bands"]):
        d = torn(keep)
        refresh_training_mix(spark, table, d)
        assert rows_of(f"{d}/_near/pairs") == want_pairs, keep
        assert rows_of(f"{d}/_near/bands") == want_bands, keep
        assert _index_rows(spark, d) == want_idx, keep
        assert _shard_rows(spark, d) == want_shard, keep


def test_refresh_fuzz_maintenance_interleaved(spark, tmp_path):
    """VERDICT r4 next #7: interleave the whole maintenance op pool —
    compact, rebucket, expire_snapshots, purge_tombstones (all
    feed-invisible base rewrites) — plus feed-visible rollbacks into a
    seeded delta chain over a NEAR-mode PACKED shard, asserting
    refresh == full re-export after every step. Maintenance must be
    invisible to the refresh (no spurious shard/index/packing changes)
    and must not break its O(delta) feed reads."""
    import random

    from streaming_data_pipeline_spark.plans import maintenance

    rng = random.Random(7)
    WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()

    def family_text(fam: int, tail: int) -> str:
        return " ".join(f"{w}f{fam}" for w in WORDS) + f" tail{tail}\n"

    def unique_text(i: int) -> str:
        return " ".join(f"uq{i}w{j}" for j in range(10)) + "\n"

    langs = ["python", "go", "java"]
    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=8)
    lsn = 0
    tail = 0
    uniq = 0
    present: list[str] = []

    def mk(op, path, content, lang):
        nonlocal lsn
        lsn += 1
        return _ev(op, path, lsn, content, lang)

    rows = []
    for fam in range(3):
        for _ in range(3):
            tail += 1
            rows.append(mk("insert", f"d{tail}_{fam}.py", family_text(fam, tail), rng.choice(langs)))
            present.append(rows[-1][2])
    for _ in range(3):
        uniq += 1
        tail += 1
        rows.append(mk("insert", f"u{tail}.py", unique_text(uniq), rng.choice(langs)))
        present.append(rows[-1][2])
    apply_changes(spark, table, _batch(spark, rows), 0)

    out = str(tmp_path / "s")
    export_training_mix(
        spark, table, out, rates=RATES, default_rate=100,
        near_dup_threshold=0.6, pack_budget=32, file_groups=2,
    )

    def random_delta():
        nonlocal tail, uniq
        ops = []
        for _ in range(rng.randint(1, 3)):
            r = rng.random()
            if r < 0.35 and present:
                p = rng.choice(present)
                fam = rng.randint(0, 3)
                tail += 1
                ops.append(mk("update", p, family_text(fam, tail), rng.choice(langs)))
            elif r < 0.6:
                fam = rng.randint(0, 3)
                tail += 1
                p = f"d{tail}_{fam}.py"
                ops.append(mk("insert", p, family_text(fam, tail), rng.choice(langs)))
                present.append(p)
            elif r < 0.8 or not present:
                uniq += 1
                tail += 1
                p = f"u{tail}.py"
                ops.append(mk("insert", p, unique_text(uniq), rng.choice(langs)))
                present.append(p)
            else:
                p = rng.choice(present)
                present.remove(p)
                ops.append(mk("delete", p, None, None))
        return ops

    # the maintenance schedule cycles the WHOLE pool, including a
    # round-trip rebucket (8 -> 12 -> 8); expire keeps a horizon deep
    # enough that the next refresh's change feed is never truncated
    maint_ops = [
        lambda: maintenance.compact(spark, table, max_files_per_bucket=1),
        lambda: maintenance.rebucket(spark, table, 12),
        lambda: maintenance.expire_snapshots(table, keep_last=10),
        lambda: maintenance.purge_tombstones(spark, table, lsn_horizon=max(1, lsn - 30)),
        lambda: maintenance.rebucket(spark, table, 8),
    ]

    for step in range(1, 11):
        if step % 4 == 2:
            # feed-visible rollback inside the same chain
            v_pre = table.current_version()
            snap_present = list(present)
            apply_changes(spark, table, _batch(spark, random_delta()), step * 10)
            table.rollback(v_pre, spark)
            present[:] = snap_present
        apply_changes(spark, table, _batch(spark, random_delta()), step * 10 + 1)
        if step % 2 == 0:
            maint_ops[(step // 2 - 1) % len(maint_ops)]()

        manR = refresh_training_mix(spark, table, out)
        outB = str(tmp_path / f"full{step}")
        manF = export_training_mix(
            spark, table, outB, rates=RATES, default_rate=100,
            near_dup_threshold=0.6, pack_budget=32, file_groups=2,
        )
        assert manR["counts"] == manF["counts"], f"step {step}"
        assert _shard_rows(spark, out) == _shard_rows(spark, outB), f"step {step}"
        assert _index_rows(spark, out) == _index_rows(spark, outB), f"step {step}"
        assert _rows(spark, f"{out}/_near/pairs") == _rows(spark, f"{outB}/_near/pairs"), f"step {step}"
        assert _rows(spark, f"{out}/_packing") == _rows(spark, f"{outB}/_packing"), f"step {step}"


def test_packing_refresh_rewrites_only_changed_groups(spark, tmp_path):
    """VERDICT r5 next #3: the packing sidecar refresh's unit of work is
    the (lang, file_group) GROUP, not the lang stratum — after a delta
    touching one doc, every untouched group's _packing file must be
    byte-identical AND not rewritten (same mtime), the changed doc's
    group must be re-derived, and the refreshed sidecar must still equal
    a full re-export's."""
    import hashlib
    import os

    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=8)
    rows = [
        _ev("insert", f"doc{i:03d}.py", i + 1,
            " ".join(f"d{i}w{j}" for j in range(10)) + "\n")
        for i in range(24)
    ]
    apply_changes(spark, table, _batch(spark, rows), 0)
    out = str(tmp_path / "s")
    export_training_mix(
        spark, table, out, rates=RATES, default_rate=100,
        near_dup_threshold=0.6, pack_budget=32, file_groups=4,
    )

    def packing_files(root):
        snap = {}
        for dp, _dirs, fns in os.walk(os.path.join(root, "_packing")):
            for fn in fns:
                if fn.endswith(".parquet"):
                    p = os.path.join(dp, fn)
                    with open(p, "rb") as f:
                        digest = hashlib.sha256(f.read()).hexdigest()
                    snap[os.path.relpath(p, root)] = (os.stat(p).st_mtime_ns, digest)
        return snap

    before = packing_files(out)
    assert len({rel.split("/")[2] for rel in before}) >= 3  # several groups live

    target = "doc003.py"
    g = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("r"), F.lit(target)), F.lit(4)).alias("g")
    ).collect()[0]["g"]
    apply_changes(
        spark, table,
        _batch(spark, [_ev("update", target, 300, "changed words here entirely\n")]),
        1,
    )
    refresh_training_mix(spark, table, out)
    after = packing_files(out)

    changed_dir = f"file_group={g}"
    touched = [rel for rel in after if changed_dir in rel]
    assert touched, "changed group lost its packing file"
    for rel, meta in after.items():
        if changed_dir in rel:
            assert before.get(rel) != meta, "changed group file not re-derived"
        else:
            assert before.get(rel) == meta, f"untouched group file rewritten: {rel}"

    outB = str(tmp_path / "full")
    export_training_mix(
        spark, table, outB, rates=RATES, default_rate=100,
        near_dup_threshold=0.6, pack_budget=32, file_groups=4,
    )
    assert _rows(spark, f"{out}/_packing") == _rows(spark, f"{outB}/_packing")
