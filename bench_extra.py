"""Round-6 evidence benchmarks (NOT the graded bench — bench.py is
frozen; guide §1.4 noop-sink isolation lives in bench_profile.py).

Modes (each runs in its own process/session so memory/UI configs bind):

  spill   — the MOR apply under deliberately tight execution memory
            (spark.memory.fraction lowered, small heap): evidence that
            the per-epoch pipeline degrades smoothly via spill instead
            of OOMing or changing plan shape (VERDICT r5 next #6).
            Reports events/s and stage-aggregated memory/disk spill
            from the UI REST API.

  skew    — MERGE under adversarial Zipf (s≈1.75) with a 30% synthetic
            hot key at ~10x the skew-test doc count: per-stage
            max-task/median-task time ratio from the REST API
            (VERDICT r5 next #7: salting/partial-agg must keep the
            straggler ratio bounded).

Results are cited in BENCH.md / OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _rest(spark, path):
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def run_spill() -> None:
    from streaming_data_pipeline_spark.session import get_spark

    spark = get_spark(
        "sdp-spill",
        shuffle_partitions=CPUS * 2,
        extra_conf={
            "spark.ui.enabled": "true",
            # tight execution memory: most of the (small) heap is user/
            # storage-reserved, so sorts and aggregates must spill
            "spark.driver.memory": os.environ.get("SDP_SPILL_HEAP", "6g"),
            "spark.memory.fraction": os.environ.get("SDP_SPILL_FRACTION", "0.15"),
        },
    )
    import bench as benchmod

    wal_tmp = tempfile.mkdtemp(prefix="sdp_spill_")
    try:
        wal = benchmod.materialize_wal(spark, wal_tmp)
        t, n = benchmod.run_cdc_apply(spark, wal, mode="mor")
        stages = _rest(spark, "/stages?status=complete")
        mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in stages)
        disk_spill = sum(s.get("diskBytesSpilled", 0) for s in stages)
        print(json.dumps({
            "mode": "spill",
            "heap": spark.conf.get("spark.driver.memory"),
            "memory_fraction": spark.conf.get("spark.memory.fraction"),
            "apply_sec": round(t, 3),
            "events": n,
            "events_per_sec": round(n / t, 1),
            "memoryBytesSpilled": mem_spill,
            "diskBytesSpilled": disk_spill,
            "n_stages": len(stages),
        }))
    finally:
        shutil.rmtree(wal_tmp, ignore_errors=True)


def run_skew() -> None:
    import pyspark.sql.functions as F

    from streaming_data_pipeline_spark.plans.lake import SnapshotTable
    from streaming_data_pipeline_spark.schemas import LAKE_BASE
    from streaming_data_pipeline_spark.session import get_spark
    from streaming_data_pipeline_spark.sources.changegen import generate_changes
    from streaming_data_pipeline_spark.streaming.apply import apply_changes

    spark = get_spark(
        "sdp-skew",
        shuffle_partitions=CPUS * 2,
        extra_conf={"spark.ui.enabled": "true"},
    )
    n_events = int(os.environ.get("SDP_SKEW_EVENTS", "30000"))
    base = generate_changes(
        spark, n_events, seed=99, n_repos=10, paths_per_repo=20,
        events_per_epoch=n_events, invalid_ratio=0.05, duplicate_ratio=0.10,
        out_of_order_ratio=0.15, delete_ratio=0.15, hot_key_zipf_s=1.75,
        partitions=CPUS,
    )
    # ~30% of all events redirected onto ONE (repo, path): the worst
    # case for any per-key reducer (same construction as
    # tests/test_skew_stress.py, 10x the volume)
    hot = F.pmod(F.xxhash64("lsn", F.lit(1)), F.lit(10)) < 3
    skewed = base.withColumns({
        "repo": F.when(hot, F.lit("org_hot/repo_hot")).otherwise(F.col("repo")),
        "path": F.when(hot & F.col("path").isNotNull(), F.lit("src/hot.py")).otherwise(F.col("path")),
    })
    tmp = tempfile.mkdtemp(prefix="sdp_skew_")
    try:
        skewed.drop("epoch").write.mode("overwrite").parquet(f"{tmp}/wal")
        batch = spark.read.parquet(f"{tmp}/wal")
        table = SnapshotTable.create(f"{tmp}/lake", LAKE_BASE, n_buckets=max(CPUS, 16))
        t0 = time.time()
        # COW merge: the LWW dedup aggregate + broadcast MERGE under the
        # hot key — the path the straggler question is about
        stats = apply_changes(spark, table, batch, epoch=0, mode="cow")
        wall = time.time() - t0
        ratios = []
        for s in _rest(spark, "/stages?status=complete"):
            sid, att = s["stageId"], s["attemptId"]
            try:
                tl = _rest(
                    spark,
                    f"/stages/{sid}/{att}/taskSummary?quantiles=0.0,0.5,1.0",
                )
            except Exception:
                continue
            q = tl.get("executorRunTime")
            if not q or q[1] <= 0 or q[2] < 50:
                continue  # sub-50ms stages are scheduling noise
            ratios.append(
                {
                    "stage": sid,
                    "name": s.get("name", "")[:60],
                    "median_ms": q[1],
                    "max_ms": q[2],
                    "ratio": round(q[2] / max(q[1], 1.0), 2),
                }
            )
        worst = max((r["ratio"] for r in ratios), default=None)
        print(json.dumps({
            "mode": "skew",
            "events": n_events,
            "zipf_s": 1.75,
            "hot_share": 0.3,
            "wall_sec": round(wall, 3),
            "rows_out": stats.get("rows_out"),
            "worst_max_over_median": worst,
            "stages": sorted(ratios, key=lambda r: -r["ratio"])[:6],
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "spill"
    {"spill": run_spill, "skew": run_skew}[mode]()
