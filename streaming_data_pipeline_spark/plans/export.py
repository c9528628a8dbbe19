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

from pyspark.sql import types as T

from ..operators.curation import (
    benchmark_contamination,
    hash_stratified_sample,
    repetition_score,
)
from .lake import SnapshotTable, _atomic_write_json

# the shard's on-disk schema (lang is the partition column). Refresh
# reads the prior shard with this schema EXPLICITLY so a legitimately
# empty shard (zero sampled rows, or a refresh that removed every lang
# partition) doesn't fail schema inference and strand the shard.
SHARD_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("_sha", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def sha_col(text):
    """Content sha with a NULL→'' sentinel: sha2(null) is null, and SQL
    equi-joins never match NULL=NULL — a live null-content doc (possible
    via a DLQ-replay fixer) would silently fall out of the export's
    keeper join and desynchronize refresh from export. The sentinel
    keeps every _sha join/group a plain equi operation; '' collides with
    no real sha (sha2 output is 64 hex chars)."""
    return F.coalesce(F.sha2(text, 256), F.lit(""))


def shard_file_group(file_groups: int):
    """Deterministic file-group id within a lang stratum. Export and
    refresh both repartition shard writes on (lang, group) so a dominant
    lang (80% of a 100 TB corpus) fans out over ``file_groups`` writer
    tasks instead of funneling through one — while keeping the layout
    deterministic: group membership is a pure hash of the key, and rows
    are sorted within each file."""
    return F.pmod(F.xxhash64("repo", "path"), F.lit(file_groups))


# shuffle-partition head-room multiplier for shard writes. The shuffle
# partition COUNT must be (a) explicit — a column-only repartition uses
# the session's shuffle.partitions and AQE may re-coalesce it, both of
# which break cross-session layout determinism — and (b) much larger
# than file_groups: repartition(G, ...) would cap TOTAL writer
# parallelism at G across ALL strata (the funnel the fan-out exists to
# remove) and birthday-collide a stratum's G groups into ~0.63*G
# partitions. With N = G * 32 the expected per-stratum file count stays
# ≈ G and total parallelism scales with n_langs * G up to N.
_SHARD_WRITE_HEADROOM = 32


def shard_repartition(df: DataFrame, file_groups: int, lang_col) -> DataFrame:
    """The ONE shuffle spec for shard writes, shared by export and
    refresh so a refreshed partition reproduces the full export's file
    grouping exactly: same partition count, same hash columns
    (lang, key-group) ⇒ each (lang, g) lands in the same shuffle
    partition id in both paths, hence the same file splits. Refresh
    passes the stratum's lang as a LITERAL column (its frames are
    already single-stratum)."""
    n = file_groups * _SHARD_WRITE_HEADROOM
    return df.repartition(n, lang_col, shard_file_group(file_groups))


def index_repartition(df: DataFrame, file_groups: int, id_col: str = "doc_id") -> DataFrame:
    """The ONE shuffle spec for the O(corpus) sidecar writes (`_index`,
    `_near/bands`, `_near/pairs`), shared by export and refresh: the
    same deterministic G-way hash-group fan-out as
    :func:`shard_repartition`. These datasets scale with the corpus
    (one row per live doc / per keeper×band) but previously funneled
    through ≤4 fixed writer tasks — the same single-digit-writer class
    that capped shard writes before r3. Group membership is a pure hash
    of the id and rows are sorted within files, so the layout stays
    byte-reproducible across export↔refresh; the explicit large
    partition count stops AQE re-coalescing (see _SHARD_WRITE_HEADROOM)."""
    n = file_groups * _SHARD_WRITE_HEADROOM
    return df.repartition(n, F.pmod(F.xxhash64(F.col(id_col)), F.lit(file_groups)))


def packing_frame(
    df: DataFrame, budget: int, file_groups: int, lang_col
) -> DataFrame:
    """The ONE packing spec shared by export and refresh: documents →
    (lang, file_group) training-sequence coordinates over the SAME
    G-way hash groups the shard writer uses (`shard_file_group`), in
    the shard's (repo, path) file order — so a training loader reading
    shard file (lang, g) finds its windows in `_packing/lang=…/
    file_group=g` with no re-tokenization.

    One exchange total: the explicit repartition clusters each
    (lang, g) stream into one shuffle partition, and the window's
    required ClusteredDistribution(lang, file_group) is satisfied by
    it, so Catalyst inserts NO second exchange (plan-gated in
    test_packing). Each group packs sequentially by definition
    (a running prefix sum); parallelism is n_langs × G, exactly the
    shard-writer fan-out. ``df`` needs (doc_id, repo, path, lang,
    text)."""
    from ..operators.packing import pack_sequences

    src = df.withColumn("file_group", shard_file_group(file_groups))
    n = file_groups * _SHARD_WRITE_HEADROOM
    src = src.repartition(n, lang_col, F.col("file_group"))
    return pack_sequences(
        src,
        budget,
        group_cols=("lang", "file_group"),
        order_cols=("repo", "path"),
        id_col="doc_id",
        keep_cols=("repo", "path"),
    )


def write_packing(packed: DataFrame, dest: str, *, per_lang: bool = False) -> None:
    """Write packing coordinates partitioned by (lang, file_group) —
    or by file_group alone for a refresh's single-lang staging dir.
    Rows sorted by the window's own (repo, path) order within each
    group file, so refresh↔export file parity holds at group
    granularity (each (lang, g) stream lives in one shuffle partition
    ⇒ one file per group dir)."""
    parts = ["file_group"] if per_lang else ["lang", "file_group"]
    sort_cols = (
        ["file_group", "repo", "path"]
        if per_lang
        else ["lang", "file_group", "repo", "path"]
    )
    if per_lang:
        # lang is the STAGING DIR in refresh mode; keeping it in-file
        # would desynchronize the file schema from the export's
        # partitionBy layout (which moves lang into the dir name)
        packed = packed.drop("lang")
    (
        packed.sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy(*parts)
        .parquet(dest)
    )


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
    file_groups: int = 8,
    near_dup_threshold: float | None = None,
    pack_budget: int | None = None,
) -> dict:
    """Export a curated training shard from snapshot ``version`` (default
    current). Returns the manifest dict (also written to
    ``out_dir/_manifest.json``).

    ``near_dup_threshold``: when set, a NEAR-duplicate dedup stage runs
    after exact dedup — MinHash-LSH pairs at this Jaccard threshold,
    closed into transitive clusters (operators/graph.py), keeping the
    min-doc_id representative per cluster. Two sidecars land next to
    the index (``_near/bands``: every exact keeper's LSH band buckets;
    ``_near/pairs``: the verified pair graph) so the incremental
    refresh can regenerate exactly the pairs with a changed endpoint by
    probing the stored buckets — O(delta), never re-shingling the
    corpus — and re-cluster only the affected components.

    ``pack_budget``: when set, a SEQUENCE-PACKING stage runs over the
    sampled survivors (operators/packing.py): per (lang, file_group)
    — the shard writer's own G-way spec — documents in (repo, path)
    order form one token stream chunked into ``pack_budget``-token
    training windows. Coordinates land in ``_packing/lang=…/
    file_group=…`` (one file per shard group), making shard-and-pack
    a single reproducible artifact; refresh recomputes only affected
    strata."""
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
        keyed = docs.withColumn("_sha", sha_col(F.col("text")))
        keepers = keyed.groupBy("_sha").agg(
            F.min(F.struct("repo", "path")).alias("_keep")
        )
        deduped = (
            keyed.join(keepers, "_sha")
            .filter((F.col("repo") == F.col("_keep.repo")) & (F.col("path") == F.col("_keep.path")))
            .drop("_keep")
        )
        # docs stays cached through the whole export (not retired at the
        # first stage boundary): the id-level INDEX written at the end
        # covers EVERY live doc, keeper or not, and must not re-trigger
        # the snapshot resolve
        deduped, counts["after_exact_dedup"] = _stage(deduped, None)
        keeper_ids = _persist(deduped.select("doc_id"))
        keeper_ids.count()

        # 1b. optional near-dup dedup over the exact keepers: LSH pairs →
        # transitive clusters → min-doc_id representative survives
        clusters = None
        near_bands = None
        near_pairs = None
        if near_dup_threshold is not None:
            from ..operators.dedup_text import minhash_band_buckets, verify_jaccard_pairs
            from ..operators.graph import connected_components

            near_bands = _persist(
                minhash_band_buckets(deduped.select("doc_id", "text"), n=n)
            )
            near_bands.count()
            # candidates from the ALREADY-computed buckets (running
            # minhash_lsh_pairs here would re-shingle and re-MinHash the
            # whole corpus a second time), verified against only the
            # candidate docs' shingle sets — identical output, half the
            # corpus passes, candidate-sized verify
            x, y = near_bands.alias("x"), near_bands.alias("y")
            cand = (
                x.join(y, ["band", "bucket"])
                .filter(F.col("x.doc_id") < F.col("y.doc_id"))
                .select(
                    F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
                )
                .distinct()
            )
            cand_ids = (
                cand.select(F.col("doc_a").alias("doc_id"))
                .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
                .distinct()
            )
            verify_docs = deduped.select("doc_id", "text").join(
                cand_ids, "doc_id", "left_semi"
            )
            near_pairs = _persist(
                verify_jaccard_pairs(
                    cand, verify_docs, n=n, threshold=near_dup_threshold
                ).select("doc_a", "doc_b")
            )
            near_pairs.count()
            cc = connected_components(near_pairs)
            clusters = _persist(
                deduped.select("doc_id")
                .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
                )
            )
            clusters.count()
            deduped, counts["after_near_dedup"] = _stage(
                deduped.join(
                    clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id"),
                    "doc_id",
                ),
                None,  # the exact-keeper frame stays cached for sidecars/index
            )

        # 2. decontamination against the benchmark/eval corpus. The
        # fail-sets are persisted id-frames: the index join below reuses
        # them without re-running the shingle kernels.
        contam = None
        if benchmark is not None:
            contam = _persist(
                benchmark_contamination(deduped.select("doc_id", "text"), benchmark, n=n)
                .filter(F.col("contamination_ratio") > max_contamination)
                .select("doc_id")
            )
            contam.count()
            deduped, counts["after_decontamination"] = _stage(
                deduped.join(contam, "doc_id", "left_anti"), deduped
            )

        # 3. repetition filter (degenerate loops out)
        reps = _persist(
            repetition_score(deduped.select("doc_id", "text"), n=n)
            .filter(F.col("repetition_ratio") > max_repetition)
            .select("doc_id")
        )
        reps.count()
        deduped, counts["after_repetition_filter"] = _stage(
            deduped.join(reps, "doc_id", "left_anti"), deduped
        )

        # 4. deterministic per-lang mix — a pure filter over the cached
        # survivors, so count + write cost two cheap passes
        sampled = hash_stratified_sample(
            deduped, rates=rates, default_rate=default_rate, key_col="doc_id", strata_col="lang"
        )
        counts["sampled"] = sampled.count()

        # G-way deterministic file groups per stratum: repartition on
        # (lang, hash-group) instead of lang alone — hash-by-lang put
        # each stratum in ONE shuffle partition, so a dominant lang
        # funneled through a single writer task at scale. Group
        # membership is a pure key hash and files are key-sorted, so the
        # layout stays deterministic; file_groups is recorded in the
        # manifest so refresh stages rewrites with the same fan-out.
        (
            shard_repartition(
                sampled.select("repo", "path", "lang", "text", "_sha"),
                file_groups,
                F.col("lang"),
            )
            .sortWithinPartitions("lang", "repo", "path")
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(os.path.join(out_dir, "data"))
        )
        if pack_budget is not None:
            # packing coordinates over the surviving shard rows in the
            # shard's own (lang, file_group, repo, path) order — the
            # loader-facing "shard-and-pack" sidecar. Partition-aligned
            # with the shard files (one coordinates file per (lang, g)
            # group dir), so the refresh can re-derive affected strata
            # only (plans/refresh.py) while untouched group dirs keep
            # their bytes.
            write_packing(
                packing_frame(
                    sampled.select("doc_id", "repo", "path", "lang", "text"),
                    pack_budget,
                    file_groups,
                    F.col("lang"),
                ),
                os.path.join(out_dir, "_packing"),
            )
        # id-level index (no text — tiny next to the corpus): one row per
        # live doc with its content sha and every curation decision. The
        # substrate for plans/refresh.py, which recomputes decisions ONLY
        # for docs the change feed touched instead of re-scanning 100 TB.
        write_index(
            keyed.select("doc_id", "repo", "path", "lang", "_sha"),
            keeper_ids,
            contam,
            reps,
            sampled.select("doc_id"),
            benchmark_used=benchmark is not None,
            dest=os.path.join(out_dir, "_index"),
            clusters=clusters,
            file_groups=file_groups,
        )
        if near_dup_threshold is not None:
            # the refresh substrate: stored buckets (probe target for
            # changed docs) + the verified pair graph (edges to carry /
            # invalidate). Sorted, G-way deterministic layout like the
            # index — bands are O(keepers × bands), pairs O(edges).
            (
                index_repartition(near_bands, file_groups, "doc_id")
                .sortWithinPartitions("doc_id", "band")
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "_near", "bands"))
            )
            (
                index_repartition(near_pairs, file_groups, "doc_a")
                .sortWithinPartitions("doc_a", "doc_b")
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "_near", "pairs"))
            )
        manifest = {
            "snapshot_version": v,
            "rates": rates,
            "default_rate": default_rate,
            "max_contamination": max_contamination if benchmark is not None else None,
            "max_repetition": max_repetition,
            "n": n,
            "benchmark_used": benchmark is not None,
            "file_groups": file_groups,
            "near_dup_threshold": near_dup_threshold,
            "pack_budget": pack_budget,
            "counts": counts,
        }
        _atomic_write_json(manifest, os.path.join(out_dir, "_manifest.json"))
    finally:
        # success path leaves nothing cached either — the shard is
        # on disk and the session owes no memory to this export
        for f in cached:
            f.unpersist()
    return manifest


def write_index(
    ids: DataFrame,
    keeper_ids: DataFrame,
    contam_fail: DataFrame | None,
    rep_fail: DataFrame,
    sampled_ids: DataFrame,
    *,
    benchmark_used: bool,
    dest: str,
    clusters: DataFrame | None = None,
    file_groups: int = 4,
) -> None:
    """Write the curation index: (doc_id, repo, path, lang, _sha,
    is_keeper, cluster_id, passed_decontam, passed_repetition, sampled).

    Flag semantics mirror the export stages exactly — refresh carries
    them forward for untouched docs, so they must be REPLAYABLE:
      - is_keeper: doc is the canonical (min repo,path) of its sha group;
      - cluster_id: the near-dup cluster of a keeper (null for
        non-keepers; null everywhere when the near-dup stage is off —
        ``clusters`` None). A keeper survives near-dedup iff
        cluster_id == doc_id;
      - passed_decontam: null unless the doc SURVIVED dedup (exact
        keeper, and near-dup representative when the stage is on); True
        for every survivor when no benchmark was supplied;
      - passed_repetition: null unless passed_decontam (the repetition
        stage only ever saw decontam survivors);
      - sampled: null unless passed_repetition; else the deterministic
        per-stratum hash decision."""
    idx = ids.join(keeper_ids.withColumn("_k", F.lit(True)), "doc_id", "left")
    if clusters is not None:
        idx = idx.join(clusters.withColumnRenamed("cluster_id", "_cl"), "doc_id", "left")
    else:
        idx = idx.withColumn("_cl", F.lit(None).cast("long"))
    if contam_fail is not None:
        idx = idx.join(contam_fail.withColumn("_cf", F.lit(True)), "doc_id", "left")
    else:
        idx = idx.withColumn("_cf", F.lit(None).cast("boolean"))
    idx = idx.join(rep_fail.withColumn("_rf", F.lit(True)), "doc_id", "left")
    idx = idx.join(sampled_ids.withColumn("_sm", F.lit(True)), "doc_id", "left")

    is_k = F.coalesce(F.col("_k"), F.lit(False))
    # the flag universe is the dedup SURVIVORS: exact keepers, further
    # narrowed to cluster representatives when the near stage ran
    survived = is_k if clusters is None else (is_k & (F.col("_cl") == F.col("doc_id")))
    passed_c = F.when(
        survived,
        F.lit(True) if not benchmark_used else ~F.coalesce(F.col("_cf"), F.lit(False)),
    )
    passed_r = F.when(passed_c, ~F.coalesce(F.col("_rf"), F.lit(False)))
    samp = F.when(passed_r, F.coalesce(F.col("_sm"), F.lit(False)))
    (
        idx.select(
            "doc_id",
            "repo",
            "path",
            "lang",
            "_sha",
            is_k.alias("is_keeper"),
            F.when(is_k, F.col("_cl")).alias("cluster_id"),
            passed_c.alias("passed_decontam"),
            passed_r.alias("passed_repetition"),
            samp.alias("sampled"),
        )
        .transform(lambda d: index_repartition(d, file_groups, "doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(dest)
    )
