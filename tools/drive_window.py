"""Vanilla-session replica of the driver's correctness gate: run the
first 50 registry entries (`DRIVER_WINDOW`) through `__spark_entry__`'s
queries()/oracle_sql() surface at sf0.01 and compare with the same
rows + schema + order-insensitive value canonicalization the driver
uses (tests/oracle_harness.py).  Prints one line per face and a final
tally; exit 1 on any mismatch.

Usage: python tools/drive_window.py [sf_dir] [n_slots]
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_slots = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("drive-window")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from tests.oracle_harness import compare, duckdb_con

    queries = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb_con(sf_dir)

    window = list(queries)[:n_slots]
    n_pass = n_rows_only = n_fail = 0
    fails: list[str] = []
    for i, name in enumerate(window, 1):
        t0 = time.monotonic()
        df = queries[name](spark, sf_dir)
        if name not in oracles:
            n = df.count()
            n_rows_only += 1
            print(
                f"[{i:2d}/{len(window)}] {name}: rows-only ({n} rows, "
                f"{time.monotonic()-t0:.1f}s)",
                flush=True,
            )
            continue
        problems = compare(df, con, oracles[name])
        dt_s = time.monotonic() - t0
        if problems:
            n_fail += 1
            fails.append(name)
            print(f"[{i:2d}/{len(window)}] {name}: FAIL {problems} ({dt_s:.1f}s)", flush=True)
        else:
            n_pass += 1
            print(f"[{i:2d}/{len(window)}] {name}: ok ({dt_s:.1f}s)", flush=True)

    print(
        f"\nwindow drive @ {sf_dir}: {n_pass} oracle-green, "
        f"{n_rows_only} rows-only, {n_fail} FAIL {fails or ''}"
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
