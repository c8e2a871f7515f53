"""Product quantization (PQ) — determinism, code shape, and measured
recall against the exact cosine oracle face.

Two recall regimes, both characterized rather than assumed:
- ADC alone on CLUSTERED data (the geometry PQ is built for): planted
  clusters with separated centers -> near-perfect recall.
- ADC + exact rerank on the WORST-CASE synthetic corpus (pairwise
  cosines all ~0.5, neighbor gaps below quantization error): shortlist
  reranking recovers the exact top-k set.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from npm_mirror_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _probes(e):
    return e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )


def test_pq_train_deterministic_shapes(spark):
    e = _emb(spark)
    cb1 = sim.train_pq(e, m=8, ks=16, iters=5)
    cb2 = sim.train_pq(e, m=8, ks=16, iters=5)
    assert cb1["codebooks"].shape == (8, 16, 8)
    np.testing.assert_array_equal(cb1["codebooks"], cb2["codebooks"])
    # dim not divisible by m is a hard error, not silent truncation
    import pytest

    with pytest.raises(ValueError):
        sim.train_pq(e, m=7, ks=16)


def test_pq_encode_codes_partition_invariant(spark):
    e = _emb(spark)
    cb = sim.train_pq(e, m=8, ks=16)
    one = {
        r["vec_id"]: tuple(r["codes"])
        for r in sim.pq_encode(e.repartition(1), cb).collect()
    }
    many = {
        r["vec_id"]: tuple(r["codes"])
        for r in sim.pq_encode(e.repartition(7), cb).collect()
    }
    assert one == many
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in one.values())


def _clustered_df(spark, n_clusters=10, per_cluster=40, dim=64):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for ci in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[ci] + 0.05 * rng.normal(size=dim)
            rows.append((vid, [float(x) for x in v], ci))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_pq_adc_recall_on_clustered_geometry(spark):
    # What PQ preserves is the COARSE geometry: with separated planted
    # clusters, every ADC top-k neighbor must come from the probe's own
    # cluster (within-cluster ORDER is quantization-dominated by design —
    # members differ by less than the code error; that regime is the
    # rerank test below).
    df = _clustered_df(spark)
    probes = df.filter(F.col("vec_id") % 40 == 1).limit(5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    cb = sim.train_pq(df, m=8, ks=16)
    codes = sim.pq_encode(df, cb)
    adc = sim.pq_topk(codes, probes, cb, k=5)
    labels = df.select(F.col("vec_id").alias("neighbor_id"), "label")
    probe_labels = df.select(
        F.col("vec_id").alias("probe_id"), F.col("label").alias("probe_label")
    )
    joined = adc.join(labels, "neighbor_id").join(probe_labels, "probe_id")
    n = joined.count()
    same = joined.filter(F.col("label") == F.col("probe_label")).count()
    assert n == 25
    assert same / n >= 0.9, f"only {same}/{n} ADC neighbors in-cluster"


def test_pq_rerank_recovers_exact_topk_worst_case(spark):
    e = _emb(spark)
    probes = _probes(e)
    cb = sim.train_pq(e, m=8, ks=32)
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in sim.cosine_topk(e, probes, 5).collect()
    }
    rr = sim.pq_topk_rerank(e, probes, cb, k=5, shortlist=128)
    got = {(r["probe_id"], r["neighbor_id"]) for r in rr.collect()}
    # worst-case corpus (neighbor cosine gaps ~1e-2 at cos~0.5): the
    # 128-wide shortlist + exact rerank recovers the exact answer set
    assert got == exact
    # and the reranked cos_sim is the EXACT cosine (same HOF expression)
    exact_sims = {
        (r["probe_id"], r["neighbor_id"]): r["cos_sim"]
        for r in sim.cosine_topk(e, probes, 5).collect()
    }
    for r in rr.collect():
        assert abs(r["cos_sim"] - exact_sims[(r["probe_id"], r["neighbor_id"])]) < 1e-12


def test_pq_adc_scores_bounded_quantization_error(spark):
    e = _emb(spark)
    probes = _probes(e)
    cb = sim.train_pq(e, m=8, ks=32)
    codes = sim.pq_encode(e, cb)
    adc = sim.pq_topk(codes, probes, cb, k=5).collect()
    # approx_cos is a cosine estimate on normalized vectors: bounded
    assert all(-1.5 <= r["approx_cos"] <= 1.5 for r in adc)
    # exactly k rows per probe, ranks 1..k
    by_probe = {}
    for r in adc:
        by_probe.setdefault(r["probe_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_probe.values())


def test_pq_recall_meter_cross_checked_inline(spark):
    """pq_recall is the meter that justifies (m, ks) before anyone
    trusts the compressed index — so its NUMBERS must be right, not
    just its shape.  Cross-check every (probe_id, n_found, recall)
    against an inline exact-vs-ADC set intersection computed from the
    same primitives.  (No recall FLOOR is asserted: within-cluster
    top-k order is quantization-dominated by design — see the ADC
    geometry test above — so the meter legitimately reads low here;
    what must hold is that it reads TRUE.)"""
    df = _clustered_df(spark)
    probes = df.filter(F.col("vec_id") % 40 == 1).limit(5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    cb = sim.train_pq(df, m=8, ks=16)
    k = 5
    got = {
        r["probe_id"]: (r["n_found"], r["recall"])
        for r in sim.pq_recall(df, probes, k, cb).collect()
    }
    # inline replica from the same building blocks
    exact = {}
    for r in sim.cosine_topk(df, probes, k).collect():
        exact.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    codes = sim.pq_encode(df, cb)
    approx = {}
    for r in sim.pq_topk(codes, probes, cb, k).collect():
        approx.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(exact)
    for pid, want_set in exact.items():
        n_found = len(want_set & approx.get(pid, set()))
        assert got[pid][0] == n_found, (pid, got[pid], n_found)
        assert abs(got[pid][1] - n_found / k) < 1e-12
