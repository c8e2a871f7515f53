"""PageRank (operators/graph.py) — q_pagerank's value parity is
oracle-checked registry-wide (unrolled integer rounds); here the
algorithm's semantics are pinned on crafted graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_mirror_spark.operators.graph import PR_SCALE, pagerank


def _und(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    return df.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        df.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def test_hub_outranks_spokes(spark):
    """Star graph: the hub near-duplicating every spoke (the template-
    carrier shape) must outrank each spoke, and the isolated pair ranks
    lowest-degree-flat."""
    star = [(0, i) for i in range(1, 8)]
    ranks = {
        r["id"]: r["rank"]
        for r in pagerank(_und(spark, star + [(100, 101)]), n_iter=5).collect()
    }
    assert all(ranks[0] > ranks[i] for i in range(1, 8))
    assert ranks[100] == ranks[101]
    spoke_vals = {ranks[i] for i in range(1, 8)}
    assert len(spoke_vals) == 1, "symmetric spokes must tie exactly"


def test_mass_is_conserved_to_quantization(spark):
    """Integer floors lose < deg ulps of 1e-12 per node per round —
    total rank stays within that bound of PR_SCALE."""
    edges = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (2, 7)]
    out = pagerank(_und(spark, edges), n_iter=4)
    total = out.agg(F.sum("rank")).first()[0]
    n_nodes = out.count()
    assert n_nodes == 10
    slack = 4 * 3 * n_nodes * 10  # rounds * avg-deg * nodes, generous
    assert PR_SCALE - slack <= total <= PR_SCALE


def test_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0


def test_ranks_are_deterministic_across_runs(spark):
    edges = _und(spark, [(i, j) for i in range(6) for j in range(i + 1, 6) if (i + j) % 3])
    a = sorted((r["id"], r["rank"]) for r in pagerank(edges, n_iter=3).collect())
    b = sorted((r["id"], r["rank"]) for r in pagerank(edges, n_iter=3).collect())
    assert a == b
