"""Bloom-pre-filtered existence probes (operators/bloom.py).

q_bloom_new_customers is oracle-checked registry-wide; here the operator
itself is proven EXACT against the plain anti join (false positives only
cost a second look), the no-false-negative invariant is pinned, and the
false-positive rate is sanity-bounded near its design point.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from npm_mirror_spark.operators.bloom import (
    bloom_anti_join,
    bloom_build,
    bloom_might_contain,
)
from npm_mirror_spark.operators.joins import anti_join
from npm_mirror_spark.tables import load_table


def test_bloom_anti_join_equals_plain_anti_join(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    seen = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("c_custkey"))
    )
    got = sorted(
        (r["c_custkey"], r["c_name"])
        for r in bloom_anti_join(c, seen, "c_custkey").collect()
    )
    want = sorted(
        (r["c_custkey"], r["c_name"])
        for r in anti_join(c, seen, "c_custkey", broadcast_inventory=True).collect()
    )
    assert got == want and len(got) > 0


def test_exact_even_when_bitmap_saturates(spark):
    """A deliberately tiny bitmap (128 bits for 500 keys) is ~all-ones —
    every probe becomes a 'maybe' and the exact anti join does all the
    work. Correctness must not depend on the sizing."""
    probe = spark.range(0, 700).withColumnRenamed("id", "k")
    seen = spark.range(0, 500).withColumnRenamed("id", "k")
    got = sorted(
        r["k"]
        for r in bloom_anti_join(probe, seen, "k", num_bits=128).collect()
    )
    assert got == list(range(500, 700))


def test_no_false_negatives(spark):
    seen = spark.range(0, 2000).withColumnRenamed("id", "k")
    words = bloom_build(seen, "k", num_bits=1 << 14)
    hits = (
        seen.filter(bloom_might_contain(words, F.col("k")))
        .count()
    )
    assert hits == 2000  # every inserted key must probe True


def test_false_positive_rate_near_design_point(spark):
    """2^14 bits / 1000 keys / k=5 -> theoretical FPR ~0.5%; assert an
    order-of-magnitude bound, not the exact constant."""
    seen = spark.range(0, 1000).withColumnRenamed("id", "k")
    words = bloom_build(seen, "k", num_bits=1 << 14)
    absent = spark.range(1_000_000, 1_010_000).withColumnRenamed("id", "k")
    fp = absent.filter(bloom_might_contain(words, F.col("k"))).count()
    assert fp / 10_000 < 0.05


def test_bitmap_is_bounded_and_word_aligned(spark):
    seen = spark.range(0, 100).withColumnRenamed("id", "k")
    words = bloom_build(seen, "k", num_bits=1 << 10)
    assert len(words) == (1 << 10) // 64
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(seen, "k", num_bits=100)


def test_definite_new_branch_is_shuffle_free(spark):
    """The map-side pre-filter itself must not introduce an exchange:
    filter(NOT might_contain) over a scan stays a scan+filter."""
    probe = spark.range(0, 1000).withColumnRenamed("id", "k")
    words = bloom_build(spark.range(0, 10).withColumnRenamed("id", "k"), "k")
    plan = (
        probe.filter(~bloom_might_contain(words, F.col("k")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
