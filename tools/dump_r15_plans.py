"""Dump .explain('formatted') for a list of faces into plans/r15/.

Usage: python tools/dump_r15_plans.py before|after q_a q_b ...

Writes plans/r15/<face>_<tag>.txt.  Faces whose construction runs
driver-side training loops (q_kmeans, q_quality_classifier, ...) dump
the plan of the RETURNED DataFrame; the training rounds themselves are
driver-loop jobs described in OPTIMIZATION_r15.md.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = Path(__file__).resolve().parents[1] / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName(f"dump-plans-{tag}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from npm_mirror_spark.plans.inspect import explain_str
    from npm_mirror_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.1"
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = explain_str(df, "formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
