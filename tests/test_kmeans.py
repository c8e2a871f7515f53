"""Distributed k-means (operators/similarity.py::train_kmeans /
kmeans_assign).

q_kmeans' end-to-end value parity (3 unrolled Lloyd rounds) is
oracle-checked registry-wide; here the trainer itself is characterized:
bit-exact agreement with an independent numpy Lloyd under the same
quantized arithmetic, monotone-ish convergence, the empty-cluster
keep-old rule, and tol early stop.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from npm_mirror_spark.operators.similarity import (
    _SRP_SCALE,
    kmeans_assign,
    train_kmeans,
)
from npm_mirror_spark.tables import load_table


def _numpy_lloyd(vecs: np.ndarray, k: int, n_iter: int):
    """Independent reference replaying the exact arithmetic contract:
    2^-24 integer quantization, exact int argmin (ties -> lowest cid),
    requantized mean floor(sum/2^24/cnt * 2^24)."""
    q = np.floor(vecs.astype(np.float64) * _SRP_SCALE).astype(np.int64)
    cents = q[:k].copy()
    for _ in range(n_iter):
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the first (lowest) index
        new = cents.copy()
        for c in range(k):
            members = q[assign == c]
            if len(members):
                s = members.sum(axis=0)
                new[c] = np.array(
                    [
                        math.floor(t / float(_SRP_SCALE) / len(members) * _SRP_SCALE)
                        for t in s
                    ],
                    dtype=np.int64,
                )
        cents = new
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return cents, d.argmin(axis=1)


def test_matches_numpy_lloyd_bit_exactly(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").orderBy("vec_id")
    rows = e.select("vec_id", "embedding").collect()
    vecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ref_cents, ref_assign = _numpy_lloyd(vecs, k=8, n_iter=3)

    model = train_kmeans(e, k=8, n_iter=3)
    assert model["n_iter"] == 3
    assert [list(c) for c in ref_cents] == model["centroids_q"]
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(e, model["centroids_q"]).collect()
    }
    want = {r["vec_id"]: int(a) for r, a in zip(rows, ref_assign)}
    assert got == want


def test_shifts_shrink(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    model = train_kmeans(e, k=8, n_iter=3)
    assert model["shifts"][-1] < model["shifts"][0]


def test_tol_early_stop(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    model = train_kmeans(e, k=8, n_iter=50, tol=0.05)
    assert model["n_iter"] < 50
    assert model["shifts"][-1] < 0.05


def test_empty_cluster_keeps_previous_centroid(spark):
    """Two far groups, three seeds; the two identical seed vectors split
    zero/all members — the starved centroid must survive unchanged."""
    rows = (
        [(0, [0.0, 0.0]), (1, [0.0, 0.0])]  # seeds 0 and 1 identical
        + [(2, [10.0, 10.0])]  # seed 2
        + [(i, [10.0 + (i % 3) * 0.1, 10.0]) for i in range(3, 20)]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = train_kmeans(df, k=3, n_iter=2)
    # cluster 1's seed (dup of 0) gets no members (ties go to cluster 0)
    assert model["centroids_q"][1] == [0, 0]
    assign = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, model["centroids_q"]).collect()}
    assert assign[0] == 0 and assign[1] == 0
    assert all(assign[i] == 2 for i in range(2, 20))


def test_assignment_is_map_side(spark, sf_dir):
    """The per-round argmin must not shuffle: kmeans_assign's plan is a
    scan + project only."""
    e = load_table(spark, sf_dir, "embeddings")
    model = train_kmeans(e, k=4, n_iter=1)
    plan = (
        kmeans_assign(e, model["centroids_q"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
