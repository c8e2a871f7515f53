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


def test_skew_report_values_and_salt_suggestion(spark):
    """skew_report on a crafted distribution: hot key 80 rows, two cold
    keys 10 each -> mean 33.33, skew_ratio 2.4, suggested salt 3; top-k
    ordering is (cnt desc, key asc) deterministic."""
    from pyspark.sql import functions as F

    from npm_mirror_spark.operators.skew import skew_report

    df = spark.range(100).select(
        F.when(F.col("id") < 80, "hot")
        .when(F.col("id") < 90, "a")
        .otherwise("b")
        .alias("k")
    )
    rows = skew_report(df, "k", top_k=2).collect()
    assert [r["key"] for r in rows] == ["hot", "a"]
    top = rows[0]
    assert (top["cnt"], top["n_rows"], top["n_keys"], top["max_count"]) == (
        80, 100, 3, 80,
    )
    assert abs(top["skew_ratio"] - 2.4) < 1e-12
    assert top["suggested_salt"] == 3
    # uniform distribution: ratio 1.0, salt 1 (i.e. "don't bother")
    uni = spark.range(90).select((F.col("id") % 3).cast("string").alias("k"))
    r = skew_report(uni, "k", top_k=1).collect()[0]
    assert r["skew_ratio"] == 1.0 and r["suggested_salt"] == 1
