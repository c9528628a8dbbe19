"""Training-mix export: lake snapshot → curated, sampled, reproducible
training shard.

The capstone composition this engine exists for: the CDC lake holds the
current state of every (repo, path); a training run wants a CURATED,
DETERMINISTIC slice of it. One batch job chains the curation operators:

    live state → exact content dedup (keep canonical key)
               → benchmark decontamination (drop eval-set overlap)
               → repetition filter (drop degenerate docs)
               → deterministic stratified sample (per-lang mix)
               → sorted parquet shard + JSON manifest

Every stage is deterministic (hash-derived doc ids, no RNG, sorted
writes), so the same snapshot + same config reproduce the identical
shard — and the manifest records the snapshot version, so the shard's
LINEAGE reaches back through the lake's epoch markers to source
offsets. Counts per stage are collected with one aggregate per stage
boundary (driver-side scalars, not data).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import (
    benchmark_contamination,
    hash_stratified_sample,
    repetition_score,
)
from .lake import SnapshotTable, _atomic_write_json


def export_training_mix(
    spark: SparkSession,
    table: SnapshotTable,
    out_dir: str,
    *,
    rates: dict[str, int],
    default_rate: int = 10,
    benchmark: DataFrame | None = None,
    max_contamination: float = 0.5,
    max_repetition: float = 0.9,
    n: int = 3,
    version: int | None = None,
) -> dict:
    """Export a curated training shard from snapshot ``version`` (default
    current). Returns the manifest dict (also written to
    ``out_dir/_manifest.json``)."""
    v = table.current_version() if version is None else version
    state = table.current_state(spark, version=v)
    docs = state.select(
        F.xxhash64("repo", "path").alias("doc_id"),
        "repo",
        "path",
        "lang",
        F.col("content").alias("text"),
    )
    # Each stage boundary persists its survivors and retires the previous
    # cache: the per-stage counts AND the downstream stage read the
    # materialized frame, so the expensive upstream work (LWW resolve,
    # dedup join, shingle kernels) runs once, not once per action. That
    # includes stage 0: the snapshot resolve is the single most expensive
    # upstream, so `docs` itself is persisted before its count.
    from pyspark.storagelevel import StorageLevel

    # every currently-persisted frame, unpersisted in the finally below:
    # a failure mid-export (bad benchmark frame, out-of-space shard
    # write) must not leak MEMORY_AND_DISK blocks of the full lake state
    # into a long-lived session
    cached: list = []

    def _persist(frame):
        frame = frame.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(frame)
        return frame

    def _stage(frame, prev):
        frame = _persist(frame)
        nrows = frame.count()
        if prev is not None:
            prev.unpersist()
            cached.remove(prev)
        return frame, nrows

    try:
        docs = _persist(docs)
        counts = {"state_rows": docs.count()}

        # 1. exact content dedup: canonical keeper = lexicographically least
        # (repo, path) per content hash — deterministic, one shuffle
        keyed = docs.withColumn("_sha", F.sha2(F.col("text"), 256))
        keepers = keyed.groupBy("_sha").agg(
            F.min(F.struct("repo", "path")).alias("_keep")
        )
        deduped = (
            keyed.join(keepers, "_sha")
            .filter((F.col("repo") == F.col("_keep.repo")) & (F.col("path") == F.col("_keep.path")))
            .drop("_keep")
        )
        deduped, counts["after_exact_dedup"] = _stage(deduped, docs)

        # 2. decontamination against the benchmark/eval corpus
        if benchmark is not None:
            contam = benchmark_contamination(
                deduped.select("doc_id", "text"), benchmark, n=n
            ).filter(F.col("contamination_ratio") > max_contamination).select("doc_id")
            deduped, counts["after_decontamination"] = _stage(
                deduped.join(contam, "doc_id", "left_anti"), deduped
            )

        # 3. repetition filter (degenerate loops out)
        reps = repetition_score(deduped.select("doc_id", "text"), n=n).filter(
            F.col("repetition_ratio") > max_repetition
        ).select("doc_id")
        deduped, counts["after_repetition_filter"] = _stage(
            deduped.join(reps, "doc_id", "left_anti"), deduped
        )

        # 4. deterministic per-lang mix — a pure filter over the cached
        # survivors, so count + write cost two cheap passes
        sampled = hash_stratified_sample(
            deduped, rates=rates, default_rate=default_rate, key_col="doc_id", strata_col="lang"
        )
        counts["sampled"] = sampled.count()

        (
            sampled.select("repo", "path", "lang", "text", "_sha")
            .repartition(F.col("lang"))
            .sortWithinPartitions("lang", "repo", "path")
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(os.path.join(out_dir, "data"))
        )
        manifest = {
            "snapshot_version": v,
            "rates": rates,
            "default_rate": default_rate,
            "max_contamination": max_contamination if benchmark is not None else None,
            "max_repetition": max_repetition,
            "counts": counts,
        }
        _atomic_write_json(manifest, os.path.join(out_dir, "_manifest.json"))
    finally:
        # success path leaves nothing cached either — the shard is
        # on disk and the session owes no memory to this export
        for f in cached:
            f.unpersist()
    return manifest
