"""Persistent bucketing: joins between co-bucketed tables must run with
zero shuffle exchanges — the pay-the-shuffle-once-at-ingest layout that
makes repeated 100 TB fact-to-fact joins affordable."""

from __future__ import annotations

from npm_mirror_spark import plans
from npm_mirror_spark.sinks import write_bucketed_table
from npm_mirror_spark.tables import load_table


def test_cobucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    bo = write_bucketed_table(
        spark, orders, "b_orders", str(tmp_path / "bo"), "o_custkey", 8
    )
    bc = write_bucketed_table(
        spark, customer, "b_customer", str(tmp_path / "bc"), "c_custkey", 8
    )
    try:
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            assert plans.shuffle_count(joined) == 0, plans.explain_str(
                joined, "simple"
            )
            # and the result is the same rows a shuffled join produces
            plain = orders.join(customer, orders.o_custkey == customer.c_custkey)
            assert joined.count() == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_aggregate_has_no_exchange(spark, sf_dir, tmp_path):
    """A groupBy on the bucket key consumes the on-disk layout too."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    bo = write_bucketed_table(
        spark, orders, "b_orders_agg", str(tmp_path / "boa"), "o_custkey", 8
    )
    try:
        agg = bo.groupBy("o_custkey").count()
        assert plans.shuffle_count(agg) == 0, plans.explain_str(agg, "simple")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_agg")
