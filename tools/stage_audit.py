"""Repeat-measure a registered face at a given SF dir on the bench's
Spark config, printing per-run wall times and a final JSON line — the
steady-state evidence the flagged-regression audits record in
docs/BENCH_NOTES.md (stage-level attribution, when needed, comes from
.explain and the Spark UI's stage metrics, not this tool).

Usage: python tools/stage_audit.py q_triangle_est [sf_dir] [repeats]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


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

    q = QUERIES.get(name)
    if q is None:
        # fall back to unregistered staged batches
        import importlib

        for mod_name in (f"staging_r{i}" for i in range(14, 30)):
            try:
                mod = importlib.import_module(f"npm_mirror_spark.{mod_name}")
            except ImportError:
                continue
            if name in mod.STAGED_QUERIES:
                q = mod.STAGED_QUERIES[name]
                break
    if q is None:
        raise SystemExit(f"unknown query: {name}")
    walls = []
    for i in range(repeats):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = q(spark, sf_dir)
        n = df.count()
        wall = time.monotonic() - t0
        walls.append(round(wall, 3))
        print(f"run {i}: wall={wall:.3f}s rows={n}", flush=True)

    print(json.dumps({"query": name, "sf_dir": sf_dir, "walls": walls}))
    spark.stop()


if __name__ == "__main__":
    main()
