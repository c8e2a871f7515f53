"""Signed-random-projection LSH (operators/similarity.py::srp_signs/
srp_signature/srp_pairs).

q_srp_pairs' end-to-end value parity (planes, signature, blocking,
verify) is oracle-checked registry-wide; here the blocking scheme itself
is characterized: sign-matrix determinism, exact-verify precision
(guaranteed 1.0 by construction), measured recall vs the brute-force
all-pairs baseline, and the collision-probability monotonicity that
makes the signature a meaningful blocking key.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from npm_mirror_spark.operators.similarity import (
    cosine_dup_pairs,
    srp_pairs,
    srp_signature,
    srp_signs,
)
from npm_mirror_spark.tables import load_table

THRESHOLD = 0.4


def test_signs_are_deterministic_and_balanced():
    a = srp_signs(16, 64)
    b = srp_signs(16, 64)
    assert a == b
    assert all(s in (-1, 1) for row in a for s in row)
    # md5 low bits are unbiased: no plane may be (near-)constant, which
    # would waste a signature bit
    for row in a:
        assert 16 <= sum(1 for s in row if s == 1) <= 48
    # replay the derivation the DuckDB oracle uses (first-byte parity)
    assert a[3][7] == (
        1 if hashlib.md5(b"srp:3:7").digest()[0] % 2 else -1
    )


def test_precision_is_exact_on_corpus_regime(spark, sf_dir):
    """Every emitted pair is exact-cosine-verified, so false positives
    are impossible by construction: the blocked set is a SUBSET of the
    brute all-pairs answer at the same threshold. (Recall at this weak
    0.4 threshold is intentionally NOT asserted — per-bit collision
    probability 1 - 66deg/180 ~ 0.63 makes half-signature blocking
    porous there, the same weak-regime under-recall q_cosine_dup_pairs'
    docstring documents for IVF; the regime SRP is FOR is
    test_near_dup_recall below.)"""
    e = load_table(spark, sf_dir, "embeddings")
    brute = {
        (r["id_a"], r["id_b"])
        for r in cosine_dup_pairs(e, threshold=THRESHOLD).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"])
        for r in srp_pairs(e, srp_signs(16, 64), threshold=THRESHOLD).collect()
    }
    assert blocked <= brute, "exact verify must forbid false positives"


def test_near_dup_recall(spark, sf_dir):
    """The design regime: true near-duplicates (cos >= ~0.9). Inject a
    perturbed copy of every corpus vector (one coordinate nudged — cos
    stays ~0.99) and require SRP blocking to recover nearly all injected
    (id, id+OFFSET) pairs: per-bit collision ~0.97, so P(a half of 8
    bits agrees) ~ 0.78 and the two-half union catches ~95%."""
    OFFSET = 1_000_000
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = e.select(
        (F.col("vec_id") + OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x * F.lit(1.1)).otherwise(x),
        ).alias("embedding"),
    )
    both = e.unionByName(dup)
    found = {
        (r["id_a"], r["id_b"])
        for r in srp_pairs(
            both, srp_signs(16, 64), max_hamming=3, threshold=0.9
        ).collect()
        if r["id_b"] - r["id_a"] == OFFSET
    }
    n = e.count()
    recall = len(found) / n
    assert recall >= 0.85, f"near-dup SRP recall collapsed: {recall:.2f}"


def test_signature_agreement_tracks_cosine(spark, sf_dir):
    """The hyperplane-LSH property (Goemans-Williamson / Charikar):
    E[Hamming] grows with angle. Check the aggregate form — the mean
    Hamming distance over high-cosine pairs is strictly below the mean
    over a sample of arbitrary pairs."""
    e = load_table(spark, sf_dir, "embeddings")
    signs = srp_signs(16, 64)
    sigs = e.select("vec_id", srp_signature("embedding", signs).alias("sig"))
    # arbitrary-pair mean: consecutive ids (synthetic embeddings are
    # unrelated across ids except the injected near-dup tail)
    a = sigs.select(F.col("vec_id").alias("ia"), F.col("sig").alias("sa"))
    b = sigs.select((F.col("vec_id") - 1).alias("ia"), F.col("sig").alias("sb"))
    rand_mean = (
        a.join(b, "ia")
        .select(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("h"))
        .agg(F.avg("h"))
        .first()[0]
    )
    near = srp_pairs(e, signs, max_hamming=16, threshold=THRESHOLD)
    near_mean = near.agg(F.avg("hamming")).first()[0]
    if near_mean is not None:
        assert near_mean < rand_mean


def test_no_cartesian_in_plan(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    plan = (
        srp_pairs(e, srp_signs(16, 64))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
