"""Property-style stress: extreme hot-key skew + heavy duplication +
out-of-order arrivals, engine vs independent oracle (FIXTURES.md §5.5:
'seeded random event streams (duplicates, out-of-order LSNs, hot keys
at Zipf skew, deletes of absent keys) vs oracle')."""

from __future__ import annotations

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.plans.maintenance import compact
from streaming_data_pipeline_spark.schemas import LAKE_BASE
from streaming_data_pipeline_spark.sources.changegen import generate_changes
from streaming_data_pipeline_spark.streaming.apply import apply_changes

from .oracle import apply_oracle, state_rows


def test_hot_key_skew_matches_oracle(spark, tmp_path):
    """One synthetic hot key absorbs ~30% of all events on top of a
    Zipf-skewed stream; LWW + tombstones must still resolve exactly."""
    base = generate_changes(
        spark, 3000, seed=99, n_repos=10, paths_per_repo=20,
        events_per_epoch=1000, invalid_ratio=0.05, duplicate_ratio=0.10,
        out_of_order_ratio=0.15, delete_ratio=0.15, hot_key_zipf_s=3.0,
        partitions=4,
    )
    # redirect ~30% of rows onto a single (repo, path) — the worst case
    # for per-key reducers
    hot = F.pmod(F.xxhash64("lsn", F.lit(1)), F.lit(10)) < 3
    skewed = base.withColumns(
        {
            "repo": F.when(hot, F.lit("org_hot/repo_hot")).otherwise(F.col("repo")),
            "path": F.when(hot & F.col("path").isNotNull(), F.lit("src/hot.py")).otherwise(F.col("path")),
        }
    ).persist()

    collected = [r.asDict(recursive=True) for r in skewed.collect()]
    table = SnapshotTable.create(str(tmp_path / "lake"), LAKE_BASE, n_buckets=8)
    for ep in sorted({r["epoch"] for r in collected}):
        apply_changes(spark, table, skewed.filter(F.col("epoch") == ep), int(ep))
    compact(spark, table, max_files_per_bucket=1)
    skewed.unpersist()

    engine = {
        tuple(r)
        for r in table.current_state(spark)
        .select(
            "repo", "path", "commit", "lang",
            F.sha2(F.col("content"), 256), "lsn",
            F.col("review_state"), F.lit(None).cast("string"),
        )
        .collect()
    }
    assert engine == state_rows(apply_oracle(collected))

    # the hot key resolved to exactly its max-lsn event (or absent if
    # that was a delete)
    oracle_state = apply_oracle(collected)
    hot_key = ("org_hot/repo_hot", "src/hot.py")
    hot_rows = [r for r in engine if r[0] == hot_key[0] and r[1] == hot_key[1]]
    if hot_key in oracle_state:
        assert len(hot_rows) == 1
        assert hot_rows[0][5] == oracle_state[hot_key]["lsn"]
    else:
        assert not hot_rows
