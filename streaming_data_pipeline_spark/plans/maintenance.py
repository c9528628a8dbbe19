"""Lake maintenance: compaction, snapshot expiry (vacuum), tombstone purge.

Copy-on-write MERGE leaves two kinds of debt the reference never had
to think about (its sink was write-once files, reference:
src/sink_writer.py:96-111): superseded data files from old snapshots,
and tombstone rows that only exist to block stale-update resurrection.

- compact(): rewrite the current snapshot's buckets whose file count
  exceeds a threshold into one sorted file per bucket (a new snapshot;
  time travel to pre-compaction versions still works).
- expire_snapshots(): drop snapshots older than `keep_last` and delete
  data files referenced by NO retained snapshot — the Iceberg
  `expireSnapshots` analog.
- purge_tombstones(): rewrite buckets dropping tombstones older than a
  safe LSN horizon (any event with lsn below the horizon has already
  been applied or deduped, so resurrection is impossible). Analogous to
  Cassandra/Iceberg tombstone GC grace.
"""

from __future__ import annotations

import os
from collections import Counter

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .lake import SnapshotTable


def _rewrite_buckets(
    spark: SparkSession,
    table: SnapshotTable,
    buckets: set[int],
    df_filter=None,
    operation: str = "compact",
) -> int:
    """Fold the given buckets into fresh BASE files: LWW-resolved (so
    merge-on-read deltas collapse), tombstones retained unless the
    caller filters them, sorted by key."""
    if not buckets:
        return table.current_version()
    # pin the read snapshot; commit(expected_version=...) fails the
    # publish if ANY concurrent commit changed these buckets' file set
    # since — a rewrite built on a stale read would drop those rows
    read_version = table.current_version()
    # writer-unique staging (see SnapshotTable.new_staging_dir): a
    # concurrent rewriter must lose at the COMMIT, never by silently
    # overwriting another writer's staged files
    staging = table.new_staging_dir(operation)
    nb_at_write = table.metadata(read_version)["n_buckets"]
    bucket = F.pmod(F.xxhash64(F.col("repo"), F.col("path")), F.lit(nb_at_write))
    # SINGLE-shuffle rewrite (guide §2.4 "two operations keyed the same
    # way share one exchange"): cluster by _bucket FIRST, then run the
    # LWW fold grouped by (_bucket, repo, path). _bucket is a pure
    # function of (repo, path), so the group keys are equivalent to the
    # plain key fold — and hashpartitioning(_bucket) satisfies the
    # aggregation's ClusteredDistribution, so the fold AND the bucketed
    # sorted write both reuse the one exchange. The previous shape
    # (read resolved=True, then repartition(_bucket)) shuffled the whole
    # rewritten byte set twice: once for the resolve groupBy, once for
    # the write clustering.
    from ..operators.dedup import lww_dedup

    df = (
        table.read(spark, version=read_version, buckets=buckets, resolved=False)
        .withColumn("_bucket", bucket)
        .repartition(F.col("_bucket"))
    )
    df = lww_dedup(
        df, key=("_bucket", "repo", "path"), order=("lsn", "commit"), salt_buckets=1
    )
    if df_filter is not None:
        df = df.filter(df_filter)
    (
        df.sortWithinPartitions("_bucket", "repo", "path")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(staging)
    )
    new_files = table.collect_written_files(staging, kind="base")
    return table.commit(
        new_files=new_files,
        replaced_buckets=buckets,
        operation=operation,
        summary={"buckets": sorted(buckets)},
        expected_n_buckets=nb_at_write,
        expected_version=read_version,
    )


def compact(spark: SparkSession, table: SnapshotTable, max_files_per_bucket: int = 1) -> int:
    """Rewrite buckets fragmented beyond ``max_files_per_bucket`` into
    sorted single files. Returns the new (or current) version."""
    # changelog sidecars are feed records, not live data — they neither
    # fragment reads nor get folded by a rewrite, so they don't count
    counts = Counter(
        e["bucket"] for e in table.manifest() if e.get("kind") != "changelog"
    )
    frag = {b for b, n in counts.items() if n > max_files_per_bucket}
    return _rewrite_buckets(spark, table, frag, operation="compact")


def purge_tombstones(spark: SparkSession, table: SnapshotTable, lsn_horizon: int) -> int:
    """Drop tombstones with lsn < horizon. Safe when the source
    guarantees no event below the horizon can still arrive (checkpoint
    position defines it)."""
    # only rewrite buckets that actually hold old tombstones
    hit = table.read(spark).filter(
        F.col("_deleted") & (F.col("lsn") < lsn_horizon)
    )
    buckets = {
        r[0]
        for r in hit.select(
            F.pmod(F.xxhash64("repo", "path"), F.lit(table.n_buckets))
        ).distinct().collect()
    }
    keep = ~(F.col("_deleted") & (F.col("lsn") < lsn_horizon))
    return _rewrite_buckets(spark, table, buckets, df_filter=keep, operation="purge_tombstones")


def remove_orphan_files(table: SnapshotTable) -> list[str]:
    """Delete data files referenced by NO committed manifest (Iceberg
    `remove_orphan_files` analog): crashed or commit-losing writers
    leave fully-written staging dirs behind — their files were never
    published, so they are garbage the moment the writer is gone. Run
    only when no writer is mid-commit (on a real deployment, gate by
    file age the way Iceberg defaults to >3 days).

    "Committed" means the manifest is NAMED by some v{N}.json snapshot
    entry. A writer that loses the v{N}.json race still wrote its
    fallback manifest-{N}-{k}.json — treating any manifest-*.json as
    live would pin the loser's staged files forever, defeating the
    whole point. Orphan manifests are deleted along with their files."""
    import json as _json

    committed: set[str] = set()
    for fn in os.listdir(table.meta_dir):
        if fn.startswith("v") and fn.endswith(".json") and fn[1:-5].isdigit():
            with open(os.path.join(table.meta_dir, fn)) as f:
                meta = _json.load(f)
            committed |= {s["manifest"] for s in meta.get("snapshots", {}).values()}
    referenced: set[str] = set()
    orphan_manifests: list[str] = []
    for fn in os.listdir(table.meta_dir):
        if fn.startswith("manifest-") and fn.endswith(".json"):
            if fn in committed:
                with open(os.path.join(table.meta_dir, fn)) as f:
                    referenced |= {e["path"] for e in _json.load(f)["files"]}
            else:
                orphan_manifests.append(fn)
    deleted: list[str] = []
    for dirpath, _dirs, files in os.walk(table.data_dir, topdown=False):
        for fn in files:
            if fn.endswith(".parquet"):
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, table.root)
                if rel not in referenced:
                    os.unlink(full)
                    deleted.append(rel)
        # sidecars (_SUCCESS, Hadoop .crc) go once no data file remains
        if not any(p.endswith(".parquet") for p in os.listdir(dirpath)):
            for fn in os.listdir(dirpath):
                p = os.path.join(dirpath, fn)
                if os.path.isfile(p):
                    os.unlink(p)
        if not os.listdir(dirpath):
            os.rmdir(dirpath)
    # the loser's fallback manifest itself is garbage too — with its
    # staged files gone it would otherwise sit as a dangling reference
    for fn in orphan_manifests:
        os.unlink(os.path.join(table.meta_dir, fn))
        deleted.append(os.path.relpath(os.path.join(table.meta_dir, fn), table.root))
    return sorted(deleted)


def rebucket(spark: SparkSession, table: SnapshotTable, new_n_buckets: int) -> int:
    """Partition-spec evolution: rewrite the whole table into a new
    bucket modulus in ONE snapshot (state-preserving — rows are
    LWW-resolved with tombstones retained, exactly like compaction).
    The operational lever for a table that outgrew its create-time
    bucket count: at 100 TB you raise n_buckets so a microbatch keeps
    touching a small fraction of buckets and files stay executor-sized.
    Readers of OLD snapshots still prune correctly (each manifest entry
    carries the bucket id it was written under, and metadata is
    versioned — `table.metadata(v)["n_buckets"]` gives the modulus in
    effect at v for anyone computing bucket ids against a time-travel
    read); readers of the new snapshot and all future applies use the
    new modulus from current metadata."""
    read_version = table.current_version()
    old_buckets = {e["bucket"] for e in table.manifest(read_version)}
    df = table.read(spark, version=read_version, resolved=True)
    staging = table.new_staging_dir("rebucket")
    bucket = F.pmod(F.xxhash64(F.col("repo"), F.col("path")), F.lit(new_n_buckets))
    (
        df.withColumn("_bucket", bucket)
        .repartition(F.col("_bucket"))
        .sortWithinPartitions("_bucket", "repo", "path")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(staging)
    )
    new_files = table.collect_written_files(staging, kind="base")
    return table.commit(
        new_files=new_files,
        replaced_buckets=old_buckets,
        operation="rebucket",
        summary={"n_buckets": new_n_buckets, "from": len(old_buckets)},
        n_buckets=new_n_buckets,
        expected_version=read_version,
    )


def expire_snapshots(table: SnapshotTable, keep_last: int = 2) -> list[str]:
    """Delete data files referenced only by expired snapshots; prune the
    snapshot log. Returns the deleted file paths. Metadata files are
    kept (cheap, and they document history)."""
    meta = table.metadata()
    # replay unfinished deletions first: a crash between a previous
    # expiry's metadata publish and its unlink loop strands the files
    # forever otherwise — the pruned snapshot log no longer names the
    # expired versions (so they are never re-candidates), while the kept
    # manifest history still references the files (so orphan cleanup
    # won't touch them). Each expiry snapshot records its intended drop
    # set; unlinking is idempotent, so replay costs nothing when clean.
    for snap in meta["snapshots"].values():
        if snap.get("operation") == "expire_snapshots":
            for rel in snap["summary"].get("pending_deletes", []):
                full = os.path.join(table.root, rel)
                if os.path.exists(full):
                    os.unlink(full)
    versions = sorted(int(v) for v in meta["snapshots"])
    retained = set(versions[-keep_last:])
    retained.add(meta["current_snapshot_id"])

    def files_of(version: int) -> set[str]:
        import json

        snap = meta["snapshots"][str(version)]
        with open(os.path.join(table.meta_dir, snap["manifest"])) as f:
            return {e["path"] for e in json.load(f)["files"]}

    keep_files: set[str] = set()
    for v in retained:
        keep_files |= files_of(v)
    drop_files: set[str] = set()
    for v in versions:
        if v not in retained:
            drop_files |= files_of(v)
    drop_files -= keep_files

    # PUBLISH the pruned snapshot log FIRST, delete files SECOND (the
    # Iceberg order): if the exclusive metadata write loses to a
    # concurrent commit (or this process dies here), nothing has been
    # deleted and the log never references missing files. The reverse
    # order leaves a window where still-listed snapshots point at
    # already-unlinked parquet.
    for v in versions:
        if v not in retained:
            meta["snapshots"].pop(str(v), None)
    from .lake import _atomic_write_json

    nv = meta["version"] + 1
    meta["version"] = nv
    # current snapshot unchanged; this metadata bump records the expiry
    man = meta["snapshots"][str(meta["current_snapshot_id"])]["manifest"]
    meta["snapshots"][str(nv)] = {
        "manifest": man,
        "epoch": None,
        "operation": "expire_snapshots",
        "summary": {
            "deleted_files": len(drop_files),
            "retained": sorted(retained),
            # intended deletes, published BEFORE any unlink: if this
            # process dies mid-loop, the next expiry replays the list
            "pending_deletes": sorted(drop_files),
        },
    }
    meta["current_snapshot_id"] = nv
    # same first-writer-wins rule as SnapshotTable.commit: the expiry bump
    # must not silently clobber a concurrent writer's v{N}.json
    _atomic_write_json(meta, os.path.join(table.meta_dir, f"v{nv}.json"), exclusive=True)
    _atomic_write_json({"v": nv}, os.path.join(table.meta_dir, "version-hint.json"))

    deleted = []
    for rel in sorted(drop_files):
        full = os.path.join(table.root, rel)
        if os.path.exists(full):
            os.unlink(full)
            deleted.append(rel)
    return deleted
