"""Connected components over near-dup pair graphs (operators/graph.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from streaming_data_pipeline_spark.operators import dedup_text
from streaming_data_pipeline_spark.operators.graph import (
    assign_clusters,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_components_basic_shapes(spark):
    # two components: a chain {1,2,3} and a pair {10, 11}; edge order
    # and direction must not matter
    cc = {
        r["node"]: r["cluster_id"]
        for r in connected_components(
            _edges(spark, [(2, 1), (2, 3), (11, 10)])
        ).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_long_chain_pointer_jumping(spark):
    """A 64-node path is the adversarial diameter case: plain min
    propagation needs 63 rounds; pointer jumping must converge well
    inside the default budget."""
    chain = [(i, i + 1) for i in range(64)]
    cc = connected_components(_edges(spark, chain), max_iters=12).collect()
    assert {r["cluster_id"] for r in cc} == {0}
    assert len(cc) == 65


def test_components_empty_edges(spark):
    out = connected_components(_edges(spark, []))
    assert out.count() == 0


def test_assign_clusters_keeper_semantics(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in assign_clusters(docs, _edges(spark, [(0, 4), (4, 2)])).collect()
    }
    # transitive cluster {0,2,4} labels to 0; singletons are their own
    assert out == {0: 0, 1: 1, 2: 0, 3: 3, 4: 0, 5: 5}
    keep = {d for d, c in out.items() if d == c}
    assert keep == {0, 1, 3, 5}  # exactly one survivor per cluster


def test_clusters_close_transitive_near_dups(spark):
    """End-to-end over the driver corpus: pairs from the (oracled)
    n-gram Jaccard operator, clusters = transitive closure — every
    pair's two docs share a cluster id, and cluster count equals
    components of the pair graph."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup_text.ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_shingle_df=1000
    ).select("doc_a", "doc_b")
    out = assign_clusters(docs, pairs)
    joined = (
        pairs.join(
            out.select(F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca")),
            "doc_a",
        )
        .join(
            out.select(F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb")),
            "doc_b",
        )
    )
    assert joined.filter("ca != cb").count() == 0
    assert out.count() == docs.count()
