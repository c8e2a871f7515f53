#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced with a count() (no driver-side collect of payloads);
a warmup pass on sf0.001 triggers JVM/codegen warm paths so the measured
numbers reflect steady-state execution, not JIT noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

from npm_mirror_spark.queries import QUERIES
from npm_mirror_spark.session import get_spark

# Headline set: the flagship + one representative per operator family.
HEADLINE = [
    "q_mirror_record",
    "q_scan_project",
    "q_filter_size",
    "q_argmax_latest",
    "q_retention_topn",
    "q_count_events",
    "q_anti_join",
    "q_enrich_join",
    "q_dedup_exact",
    "q_dedup_norm",
    "q_minhash_pairs",
    "q_cosine_topk",
    "q_text_stats",
    "q_union_logs",
    "q_json_decode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="npm-mirror-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup at the smallest SF: JVM classloading + codegen, not data
    for name in HEADLINE:
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
