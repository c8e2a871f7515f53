"""Dynamic partition pruning: a fact table laid out by a partition column
must be pruned at runtime by a selective broadcast dimension filter — the
mechanism that turns a 100 TB scan into a few-partition scan when the
dimension side is filtered. Pinned here on the same partitionBy layout
the sinks use (sinks.py bucket/partition writers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_mirror_spark.tables import load_table


def test_partitioned_join_prunes_at_runtime(spark, sf_dir, tmp_path):
    fact_path = str(tmp_path / "events_by_type")
    load_table(spark, sf_dir, "events").write.partitionBy("event_type").parquet(
        fact_path
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("purchase", 1.0), ("signup", 2.0), ("view", 0.5), ("click", 0.1), ("error", 0.0)],
        "event_type string, weight double",
    ).filter(F.col("weight") > 1.5)

    joined = fact.join(F.broadcast(dim), "event_type").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    text = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in text.lower(), "no runtime partition pruning in plan"

    rows = {r.event_type: r.n for r in joined.collect()}
    assert set(rows) == {"signup"}
    total = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    ).count()
    assert rows["signup"] == total
