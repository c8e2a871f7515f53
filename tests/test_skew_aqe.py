"""AQE skew handling, demonstrated: a join with one hot key gets its
oversized shuffle partition SPLIT at runtime (OptimizeSkewedJoin), so a
single straggler task can't serialize the stage — the runtime complement
to the static salting in operators/skew.py (q_salted_counts proves the
salted rewrite's values; this proves the zero-rewrite path)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # shrink the thresholds so test-sized data exhibits "skew"
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # force a sort-merge join so there IS a shuffle to skew
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # left: 200k rows, 95% on key 0, payload to make the hot
        # partition's bytes dominate; right: all 50 keys evenly
        left = (
            spark.range(200_000)
            .select(
                F.when(F.col("id") % 20 != 0, F.lit(0))
                .otherwise(F.col("id") % 50)
                .alias("k"),
                F.concat(F.lit("x" * 64), F.col("id")).alias("payload"),
            )
        )
        right = spark.range(50).select(
            F.col("id").alias("k"), F.lit("dim").alias("side")
        )
        joined = left.join(right, "k")
        # collect() drives THIS DataFrame's QueryExecution to its final
        # adaptive plan (count() would build and execute a separate one,
        # leaving joined's plan un-finalized)
        assert len(joined.collect()) == 200_000

        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
