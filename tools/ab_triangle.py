"""A/B the r10 basket_pairs repartition guard on q_triangle_est's path
(r10 verdict item 2): same session, alternating variants, sf0.1.

Variant A = current code (repartition(basket_col) before the self-join).
Variant B = identical pipeline with the repartition removed.
"""
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build(spark, sf_dir, with_repartition):
    from npm_mirror_spark.operators.graph import (
        drop_oversized_baskets,
        triangle_count_sampled,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    guarded = drop_oversized_baskets(li, "l_orderkey", 64)
    if with_repartition:
        guarded = guarded.repartition("l_orderkey")
    x, y = guarded.alias("x"), guarded.alias("y")
    edges = x.join(
        y,
        (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("x.l_partkey") < F.col("y.l_partkey")),
    ).select(
        F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
    )
    return triangle_count_sampled(edges, rate_den=5, seed=8)


def main():
    sf_dir = "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up both shapes once
    for w in (True, False):
        build(spark, sf_dir, w).count()
    res = {"A_repart": [], "B_norepart": []}
    for _ in range(4):
        for key, w in (("A_repart", True), ("B_norepart", False)):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            row = build(spark, sf_dir, w).collect()[0]
            res[key].append(round(time.monotonic() - t0, 3))
    print(res, "est:", row.est_triangles)
    spark.stop()


if __name__ == "__main__":
    main()
