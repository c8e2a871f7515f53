"""The SQL face of the engine: every table registers as a view and plain
``spark.sql`` text produces row-identical results to the DataFrame
operators — Catalyst compiles both to the same plans, so a SQL-first user
can drive this engine without touching the Python API."""

from __future__ import annotations

from npm_mirror_spark.queries import QUERIES
from npm_mirror_spark.tables import load_table

TABLES = ("orders", "customer", "lineitem", "events", "documents")


def _register(spark, sf_dir):
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_sql_text_matches_dataframe_flagship(spark, sf_dir):
    _register(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT o_custkey, count(*) AS n_orders,
               max(o_orderdate) AS latest_order
        FROM orders GROUP BY o_custkey
        """
    )
    from pyspark.sql import functions as F

    df = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("o_orderdate").alias("latest_order"),
        )
    )
    assert _rows(sql) == _rows(df)


def test_sql_window_matches_registered_query(spark, sf_dir):
    _register(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT o_custkey, latest_order_key, latest_order_date FROM (
          SELECT o_custkey, o_orderkey AS latest_order_key,
                 o_orderdate AS latest_order_date,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1
        """
    )
    assert _rows(sql) == _rows(QUERIES["q_argmax_latest"](spark, sf_dir))
