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


def test_driver_window_composition_pinned():
    """The driver checks the FIRST 50 registry entries; an accidental
    reorder silently changes what gets driver-verified.  Since r9 the
    window has ONE source of truth — queries.DRIVER_WINDOW — and the
    registry dict is mechanically reordered from it, so this test pins
    (a) the never-rotating §2 core as an independent literal, (b) that
    the dict head really equals DRIVER_WINDOW, and (c) oracle coverage
    for every window slot (see docs/DRIVER_WINDOW.md)."""
    from npm_mirror_spark.queries import (
        DRIVER_WINDOW,
        ORACLES,
        PINNED_27,
        QUERIES,
        WINDOW_TAIL,
    )

    names = list(QUERIES)
    pinned_27 = [
        "q_scan_project", "q_json_decode", "q_regex_clean", "q_split_last",
        "q_prefix_bucket", "q_ts_parse", "q_normalize", "q_flag_route",
        "q_filter_notnull", "q_filter_size", "q_argmax_latest",
        "q_mirror_record", "q_retention_topn", "q_retention_gc",
        "q_retention_tombstone", "q_count_events", "q_max_seq", "q_lag",
        "q_union_logs", "q_anti_join", "q_enrich_join", "q_dedup_exact",
        "q_dedup_norm", "q_minhash_pairs", "q_cosine_topk", "q_text_stats",
        "q_approx_stats",
    ]
    assert list(PINNED_27) == pinned_27, "the §2 core must never rotate"
    assert names[:50] == list(DRIVER_WINDOW)
    assert len(WINDOW_TAIL) == 23
    # every window entry except the documented rows-only ones has an oracle
    rows_only = {
        "q_approx_stats", "q_lm_nll", "q_quality_classifier",
        "q_bpe_encode", "q_lm_bigram", "q_cosine_topk_arrow",
    }
    missing = [n for n in names[:50] if n not in ORACLES and n not in rows_only]
    assert missing == [], f"window entries without oracles: {missing}"
