"""Partition-count invariance: the queries that claim order-independent
arithmetic (exact DECIMAL moments, integer rank selections) must return
byte-identical results under radically different parallelism. This is the
local proxy for "same answer on 8 cores and on 1000 executors" — a float
aggregate computed in shuffle order would fail it."""

from __future__ import annotations

import pytest

from npm_mirror_spark.queries import QUERIES

# the order-independence claims under test
CLAIMED = [
    "q_corr_moments",
    "q_zscore_outliers",
    "q_mad",
    "q_filter_size",
    "q_revenue_share",
    "q_market_share",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("qname", CLAIMED)
def test_results_invariant_to_partition_count(spark, sf_dir, qname):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        few = _canon(QUERIES[qname](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        many = _canon(QUERIES[qname](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert few == many, f"{qname}: result depends on partitioning"
