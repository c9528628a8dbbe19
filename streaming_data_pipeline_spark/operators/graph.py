"""Connected components over near-duplicate pair graphs.

Pair-emitting dedup operators (MinHash-LSH, SimHash, n-gram Jaccard,
embedding near-dup — operators/dedup_text.py, operators/similarity.py)
stop at EDGES; a real dedup pipeline needs the transitive CLUSTERS:
if A~B and B~C, one representative must survive out of {A,B,C} even
when A~C was never emitted. This module closes that gap with a
DataFrame-native connected-components operator.

Algorithm: iterative min-label propagation with pointer jumping.
Each round does two bounded steps —
  1. propagate: label(n) ← min(label(n), min over neighbors' labels)
     (one equi-join on node id + one partial-aggregated groupBy);
  2. shortcut:  label(n) ← label(label(n))
     (one self-join — the pointer-jumping step that collapses chains
     in O(log diameter) rounds instead of O(diameter); a 2^k-node path
     converges in ~k rounds).
Labels start as the node's own id and only ever DECREASE, so the sum
of labels is a monotone convergence metric: one cheap scalar aggregate
per round, no row-level diff join. Every round's result is
localCheckpoint'ed — iterative plans otherwise stack lineage until the
driver OOMs building the plan string (measured in r2).

Scale: each round is two shuffles on node id (AQE-sized), state is one
(node, label) row per node — O(V) not O(V+E) carried state — and the
round count is logarithmic in the largest cluster's diameter. Near-dup
clusters are overwhelmingly star/clique-shaped (diameter ≤ 4), so the
typical run is 2-3 rounds.

No reference counterpart (the reference has no dedup at all); the
DuckDB oracle is a recursive transitive closure, making this the
engine's fully-oracled ITERATIVE algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 30,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``edges``, where
    cluster_id = the minimum node id of the node's connected component.
    Deterministic; raises if not converged within ``max_iters`` rounds
    (with pointer jumping that bounds cluster diameter at ~2^max_iters,
    far beyond any real near-dup graph)."""
    from pyspark.sql import Observation

    # checkpoint the EDGE projection before the symmetrization union:
    # both union legs read `e`, so an expensive upstream pair plan
    # (e.g. the n-gram inverted-index join) would otherwise execute
    # twice inside the sym materialization (r6).
    e = edges.select(
        F.col(src).cast("long").alias("n"), F.col(dst).cast("long").alias("m")
    ).localCheckpoint(eager=True)
    sym = e.unionByName(
        e.select(F.col("m").alias("n"), F.col("n").alias("m"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select("n").distinct().withColumn("label", F.col("n"))
    labels = labels.localCheckpoint(eager=True)

    prev_sum = None
    for i in range(max_iters):
        # 1. propagate the minimum label across one hop of edges
        neigh_min = (
            sym.join(labels.select(F.col("n").alias("m"), "label"), "m")
            .groupBy("n")
            .agg(F.min("label").alias("_nl"))
        )
        labels = labels.join(neigh_min, "n", "left").select(
            "n",
            F.least(F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))).alias(
                "label"
            ),
        )
        # 2. pointer jumping: follow the label one hop (label of label).
        # Label values are always node ids (mins of initial ids), so the
        # lookup side is the labels frame itself.
        jump = labels.select(F.col("n").alias("label"), F.col("label").alias("_jl"))
        # labels only decrease ⇒ equal sums mean a fixpoint (one scalar
        # metric per round — no row-diff join). decimal(38,0): labels are
        # full-range xxhash64 ids, and a LONG sum overflows under ANSI
        # mode on the first real corpus. The sum RIDES the round's
        # checkpoint materialization as an Observation, so each round is
        # exactly ONE job — the former separate agg job per round halved
        # iteration throughput on scheduling overhead alone (r6).
        obs = Observation(f"cc-round-{i}")
        labels = (
            labels.join(jump, "label", "left")
            .select(
                "n",
                F.least(F.col("label"), F.coalesce(F.col("_jl"), F.col("label"))).alias(
                    "label"
                ),
            )
            .observe(obs, F.sum(F.col("label").cast("decimal(38,0)")).alias("s"))
            .localCheckpoint(eager=True)
        )
        s = obs.get["s"]
        if s == prev_sum:
            return labels.select(F.col("n").alias("node"), F.col("label").alias("cluster_id"))
        prev_sum = s
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "a cluster with astronomical diameter; raise max_iters"
    )


def assign_clusters(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 30,
) -> DataFrame:
    """Every document with its near-dup cluster id — singletons (docs in
    no pair) are their own cluster. The keeper-selection substrate:
    ``keep = assign_clusters(...).filter(doc_id == cluster_id)`` keeps
    exactly one representative (the min doc id) per transitive cluster."""
    cc = connected_components(edges, src=src, dst=dst, max_iters=max_iters)
    return docs.select(F.col(id_col).cast("long").alias(id_col)).join(
        cc.select(F.col("node").alias(id_col), "cluster_id"), id_col, "left"
    ).select(
        id_col, F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id")
    )
