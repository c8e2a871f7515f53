"""One-face oracle check at one or more SFs — the fast inner loop while
optimizing an operator: prove the restructured plan still matches the
DuckDB oracle before a full sweep.

Usage: python tools/check_face.py q_spearman [sf_dir ...]
       (default: all three of /root/testdata/sf{0.001,0.01,0.1})
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("/")]
    dirs = [a for a in sys.argv[1:] if a.startswith("/")] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("check-face")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from npm_mirror_spark.queries import ORACLES, QUERIES
    from tests.oracle_harness import compare, duckdb_con

    rc = 0
    for sf_dir in dirs:
        con = duckdb_con(sf_dir)
        for name in names:
            q = QUERIES.get(name)
            sql = ORACLES.get(name)
            if q is None:
                import importlib

                for mod_name in (f"staging_r{i}" for i in range(14, 30)):
                    try:
                        mod = importlib.import_module(
                            f"npm_mirror_spark.{mod_name}"
                        )
                    except ImportError:
                        continue
                    if name in mod.STAGED_QUERIES:
                        q = mod.STAGED_QUERIES[name]
                        if hasattr(mod, "build_oracles"):
                            mod.build_oracles(ORACLES)
                        sql = mod.STAGED_ORACLES.get(name) or ORACLES.get(name)
                        break
            if q is None:
                raise SystemExit(f"unknown query: {name}")
            t0 = time.monotonic()
            df = q(spark, sf_dir)
            if sql is None:
                print(f"{sf_dir} {name}: rows-only ({df.count()} rows, "
                      f"{time.monotonic()-t0:.1f}s)")
                continue
            problems = compare(df, con, sql)
            dt = time.monotonic() - t0
            if problems:
                rc = 1
                print(f"{sf_dir} {name}: FAIL {problems} ({dt:.1f}s)")
            else:
                print(f"{sf_dir} {name}: ok ({dt:.1f}s)")
    spark.stop()
    raise SystemExit(rc)


if __name__ == "__main__":
    main()
