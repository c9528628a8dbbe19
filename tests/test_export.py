"""Training-mix export: the capstone composition (lake → dedup →
decontaminate → repetition-filter → deterministic sample → shard)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.plans.export import export_training_mix
from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.schemas import CHANGE_EVENT, LAKE_BASE
from streaming_data_pipeline_spark.streaming.apply import apply_changes


def _lake(spark, root):
    table = SnapshotTable.create(root, LAKE_BASE, n_buckets=4)
    rows = []
    lsn = 0
    for i in range(40):
        lsn += 1
        lang = "en" if i % 2 == 0 else "de"
        rows.append(("insert", "r", f"{lang}/f{i}.py", f"c{lsn}", lang,
                     f"unique tokens {i} alpha beta gamma delta epsilon zeta", lsn, None, None))
    # exact duplicate content under a different key (dedup target)
    lsn += 1
    rows.append(("insert", "r", "en/dup_of_f0.py", f"c{lsn}", "en",
                 "unique tokens 0 alpha beta gamma delta epsilon zeta", lsn, None, None))
    # degenerate repetition doc
    lsn += 1
    rows.append(("insert", "r", "en/spam.py", f"c{lsn}", "en", "spam " * 40, lsn, None, None))
    # benchmark leak
    lsn += 1
    rows.append(("insert", "r", "en/leak.py", f"c{lsn}", "en",
                 "the quick brown fox jumps over the lazy dog", lsn, None, None))
    apply_changes(spark, table, spark.createDataFrame(rows, CHANGE_EVENT), 0)
    return table


def test_export_training_mix(spark, tmp_path):
    table = _lake(spark, str(tmp_path / "lake"))
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
    )
    out = str(tmp_path / "shard")
    m = export_training_mix(
        spark, table, out,
        rates={"en": 100, "de": 100},  # keep all that survive curation
        benchmark=bench, max_contamination=0.5, max_repetition=0.9,
    )
    c = m["counts"]
    assert c["state_rows"] == 43
    assert c["after_exact_dedup"] == 42          # dup_of_f0 collapsed
    assert c["after_decontamination"] == 41      # leak dropped
    assert c["after_repetition_filter"] == 40    # spam dropped
    assert c["sampled"] == 40                    # 100% rates keep the rest

    shard = spark.read.parquet(f"{out}/data")
    paths = {r["path"] for r in shard.collect()}
    assert "en/leak.py" not in paths and "en/spam.py" not in paths
    # canonical keeper for the duplicated content is the least (repo,path)
    assert ("en/dup_of_f0.py" in paths) ^ ("en/f0.py" in paths)
    assert json.load(open(f"{out}/_manifest.json"))["snapshot_version"] == m["snapshot_version"]


def test_export_is_deterministic_and_stratified(spark, tmp_path):
    table = _lake(spark, str(tmp_path / "lake2"))
    a = export_training_mix(spark, table, str(tmp_path / "s1"), rates={"en": 50, "de": 10})
    b = export_training_mix(spark, table, str(tmp_path / "s2"), rates={"en": 50, "de": 10})
    assert a["counts"] == b["counts"]
    ra = sorted(map(tuple, spark.read.parquet(str(tmp_path / "s1/data")).select("repo", "path", "_sha").collect()))
    rb = sorted(map(tuple, spark.read.parquet(str(tmp_path / "s2/data")).select("repo", "path", "_sha").collect()))
    assert ra == rb  # identical shard, no RNG anywhere
    shard = spark.read.parquet(str(tmp_path / "s1/data"))
    n_en = shard.filter(F.col("lang") == "en").count()
    n_de = shard.filter(F.col("lang") == "de").count()
    assert n_en > n_de  # 50% vs 10% strata actually bite
