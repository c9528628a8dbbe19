"""Deterministic seeded change-event generator (pure column expressions).

Spark-first replacement for the reference's Faker-based producer
(reference: src/producer.py:42-109 — per-row Python dict generation,
53 LoC, plus `generate_invalid_event` at 96-109). Here the whole
stream is a single `spark.range(n)` plan with seeded `xxhash64`
columns — no Python in the data path, no wall-clock, no uuid4, so the
same (n, seed, knobs) always yields the identical event multiset.
That determinism is what makes replay-equality testable (SURVEY.md §7.5).

Knobs mirror the reference producer's (src/producer.py:216-245,
src/pipeline.py:321-328):
  invalid_ratio      — like the producer's 10%/5% invalid injection
  duplicate_ratio    — at-least-once re-delivery (exact dup, same lsn)
  out_of_order_ratio — late arrivals: event lands one epoch later
  hot_key_zipf_s     — Zipf-ish repo skew (hot keys for salting tests)
  delete_ratio       — tombstone ops
  events_per_epoch   — microbatch sizing (analog of BATCH_SIZE=100,
                       src/config.py:45)

Invalid modes (FIXTURES.md §2; categories per functions/dlq.py rules —
modes 1 and 2 SHARE missing_required_field, and mode 3's message
matches no keyword rule so it takes the stage-based fallback):
  0: op = 'invalid_op'   (enum violation — analog of src/producer.py:103)
                         → invalid_enum_value
  1: repo = NULL         (missing required field) → missing_required_field
  2: path = NULL         (missing required field) → missing_required_field
  3: lsn  = negative     (numeric lower-bound violation, like amount>=0)
                         → schema_validation_error (stage fallback)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import LANGS

_U_SCALE = 1_000_000_000


def _u(col: Column, seed: int, salt: int) -> Column:
    """Deterministic uniform [0,1) per row from a seeded hash."""
    return F.pmod(F.xxhash64(col, F.lit(seed), F.lit(salt)), F.lit(_U_SCALE)) / F.lit(
        float(_U_SCALE)
    )


def generate_changes(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_repos: int = 100,
    paths_per_repo: int = 200,
    events_per_epoch: int = 10_000,
    invalid_ratio: float = 0.05,
    duplicate_ratio: float = 0.02,
    out_of_order_ratio: float = 0.05,
    hot_key_zipf_s: float = 2.0,
    delete_ratio: float = 0.05,
    content_repeat: int = 4,
    evolve_payload_at_epoch: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Return a change-event DataFrame (CHANGE_EVENT columns + ``epoch``).

    ``lsn`` is the unique monotone log sequence number (= range id).
    ``epoch`` simulates arrival order: the streaming harness feeds
    epochs in ascending order; out-of-order events are assigned a later
    epoch than their lsn implies, and duplicates are re-emitted in the
    next epoch with the same lsn (exactly the at-least-once hazard the
    reference has, DESIGN_DOCUMENT.md:143-146).
    """
    df = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    idc = F.col("id")

    # Zipf-ish hot-repo skew: u^s concentrates mass near repo 0.
    u_repo = _u(idc, seed, 1)
    repo_idx = F.floor(F.pow(u_repo, F.lit(hot_key_zipf_s)) * F.lit(n_repos)).cast("long")
    repo = F.concat(
        F.lit("org_"), F.pmod(repo_idx, F.lit(10)).cast("string"), F.lit("/repo_"), repo_idx.cast("string")
    )
    path_idx = F.pmod(F.xxhash64(idc, F.lit(seed), F.lit(2)), F.lit(paths_per_repo))
    path = F.concat(
        F.lit("src/pkg_"),
        F.pmod(path_idx, F.lit(8)).cast("string"),
        F.lit("/mod_"),
        path_idx.cast("string"),
        F.lit(".py"),
    )

    u_op = _u(idc, seed, 3)
    op = (
        F.when(u_op < F.lit(delete_ratio), F.lit("delete"))
        .when(u_op < F.lit(delete_ratio + 0.30), F.lit("insert"))
        .otherwise(F.lit("update"))
    )

    lsn = idc.cast("long")
    commit = F.substring(F.sha2(F.concat_ws("|", repo, path, lsn.cast("string"), F.lit(seed)), 256), 1, 12)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(F.xxhash64(idc, F.lit(seed), F.lit(4)), F.lit(len(LANGS))) + 1).cast("int"),
    )
    # Deterministic pseudo-source text; sha256(content) is the per-row
    # invariant carrier (BASELINE.json input_hint).
    body_hash = F.sha2(F.concat_ws("|", F.lit("body"), repo, path, lsn.cast("string")), 256)
    content = F.concat(
        F.lit("# "), repo, F.lit("/"), path, F.lit("\n"),
        F.lit("def handler_"), F.pmod(path_idx, F.lit(97)).cast("string"), F.lit("(event):\n"),
        F.lit('    """'), F.repeat(body_hash, content_repeat), F.lit('"""\n'),
        F.lit("    return "), F.substring(body_hash, 1, 16), F.lit("\n"),
    )
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + lsn)

    base_epoch = F.floor(idc / F.lit(events_per_epoch)).cast("long")
    late = _u(idc, seed, 5) < F.lit(out_of_order_ratio)
    epoch = F.when(late, base_epoch + 1).otherwise(base_epoch)

    payload = F.map_from_arrays(
        F.array(F.lit("review_state")),
        F.array(
            F.element_at(
                F.array(F.lit("open"), F.lit("approved"), F.lit("merged")),
                (F.pmod(F.xxhash64(idc, F.lit(seed), F.lit(6)), F.lit(3)) + 1).cast("int"),
            )
        ),
    )
    if evolve_payload_at_epoch is not None:
        stars = F.pmod(F.xxhash64(idc, F.lit(seed), F.lit(7)), F.lit(5000)).cast("string")
        payload = F.when(
            base_epoch >= F.lit(evolve_payload_at_epoch),
            F.map_concat(payload, F.map_from_arrays(F.array(F.lit("stars")), F.array(stars))),
        ).otherwise(payload)

    # invalid injection — AFTER all valid fields so corruption is last-write.
    u_bad = _u(idc, seed, 8)
    bad_mode = F.pmod(F.xxhash64(idc, F.lit(seed), F.lit(9)), F.lit(4))
    is_bad = u_bad < F.lit(invalid_ratio)
    op = F.when(is_bad & (bad_mode == 0), F.lit("invalid_op")).otherwise(op)
    repo = F.when(is_bad & (bad_mode == 1), F.lit(None).cast("string")).otherwise(repo)
    path = F.when(is_bad & (bad_mode == 2), F.lit(None).cast("string")).otherwise(path)
    lsn = F.when(is_bad & (bad_mode == 3), -lsn - 1).otherwise(lsn)

    # deletes carry no content/lang (FIXTURES.md §2: nullable on delete)
    content = F.when(op == "delete", F.lit(None).cast("string")).otherwise(content)
    lang = F.when(op == "delete", F.lit(None).cast("string")).otherwise(lang)

    out = df.select(
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        lsn.alias("lsn"),
        ts.alias("ts"),
        payload.alias("payload"),
        epoch.alias("epoch"),
        idc.alias("_gid"),  # generator id, used only to derive the dup flag
    )

    if duplicate_ratio > 0:
        # Exact re-delivery in the next epoch (same lsn/content) — a second
        # scan of the same range plan, no join, no shuffle.
        dup_flag = _u(F.col("_gid"), seed, 10) < F.lit(duplicate_ratio)
        dups = out.filter(dup_flag).withColumn("epoch", F.col("epoch") + 1)
        out = out.unionByName(dups)
    return out.drop("_gid")


def generate_changes_simple(
    spark: SparkSession, n_events: int, *, seed: int = 42, **kw
) -> DataFrame:
    """Generator variant with duplicate join avoided (single-scan): used
    by benchmarks where the duplicated fraction is re-derived cheaply."""
    kw.setdefault("duplicate_ratio", 0.0)
    return generate_changes(spark, n_events, seed=seed, **kw)
