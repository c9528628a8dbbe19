"""SparkSession factory for the CDC/incremental-ingest engine.

Replaces the reference's hand-rolled process/thread orchestration
(reference: src/pipeline.py:222-314 — 4 daemon threads in one GIL-bound
process) with a single SparkSession whose scheduler distributes work
across executor cores. All scale knobs live here so tests, benchmarks
and the streaming loop share one configuration surface.

Design notes for 100 TB / 1000-executor scale:
- AQE on (runtime coalesce + skew-join splitting) — the backstop behind
  our explicit hot-key salting (operators/merge.py).
- Arrow on — every Python crossing is vectorized (pandas UDF /
  mapInPandas); no row-at-a-time Python anywhere in the engine.
- shuffle.partitions defaults to the local core count; on a real
  cluster pass ~2-3x total cores (or rely on AQE coalesce from a
  higher initial number).
- Session timezone pinned to UTC so event-time math is reproducible
  and comparable with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Floor of 128: a cores-proportional count funnels whole-table
# aggregations (e.g. compaction's LWW resolve) into a few multi-GB
# reducers at low parallelism — measured minutes-long single-task
# sorts. 128 keeps reducers data-sized; AQE coalesces the small case.
DEFAULT_SHUFFLE_PARTITIONS = max(128, 2 * int(os.environ.get("SPARK_GRAFT_CPUS", "32")))


def get_spark(
    app_name: str = "streaming_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox;
    on a real cluster the caller submits via ``spark-submit --py-files``
    and leaves ``master`` unset.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    # Ship this package to Python workers: local-mode workers inherit the
    # driver process env, so PYTHONPATH is the `spark-submit --py-files`
    # analog (pandas-UDF closures reference this module by name).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let the planner pick shuffled-hash over sort-merge when its
        # size conditions hold (guide §3.1): no sort on either side for
        # moderate equi-joins (e.g. the n-gram inverted-index self-join
        # — measured a consistent few-% win); broadcast decisions are
        # unaffected, and AQE still rewrites at runtime.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # the engine's epoch loops build one broadcast + several staged
        # frames per epoch; ContextCleaner frees their blocks only when
        # the driver GCs. On a large heap (48g bench) that can be never
        # — until a multi-second full GC lands mid-epoch. A periodic GC
        # bounds the accumulation (cost: a sub-second minor GC/2 min).
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # deterministic file layout: one sorted file per write-partition
        # unless the partition exceeds this bound (then Spark splits).
        .config("spark.sql.files.maxRecordsPerFile", "5000000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.shuffle.spill.compress", "true")
        # AQE builds a full plan-explain string per re-optimization even
        # when nobody reads it; a deeply-stacked plan (multi-stage frames
        # over cached/unioned lineage) OOMed the driver inside
        # explainString. Cap it — 1 MB of plan text is already unreadable.
        .config("spark.sql.maxPlanStringLength", "1048576")
        # ObjectHashAggregateExec (TypedImperative aggs: collect_list,
        # percentile, ...) falls back to sort-based at 128 (!) distinct
        # keys per task by default — every reducer then external-sorts
        # concurrently. Raise it and instead size shuffle partitions so
        # distinct keys per reducer stay ≲ 2M. (max_by itself plans as
        # SortAggregate — struct buffers aren't hash-aggregable — so the
        # LWW path is unaffected; this protects the metrics/stats aggs.)
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
