"""Full-registry oracle sweep: every registered face (plus any staged
batch) vs its DuckDB oracle at a given SF — the end-of-round gate
(r10 ran 242/242 at sf0.1 before closing).

Usage: python tools/full_sweep.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("full-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from npm_mirror_spark.queries import ORACLES, QUERIES
    from tests.oracle_harness import compare, duckdb_con

    con = duckdb_con(sf_dir)
    t_start = time.monotonic()
    n_pass = n_rows_only = 0
    fails: list[str] = []
    # all prior staged batches (faces_r12.py, staging_r13.py) are now
    # registered, so QUERIES covers them; unregistered staged batches
    # sweep alongside
    import importlib

    work = [(n, q, ORACLES.get(n)) for n, q in QUERIES.items()]
    for mod_name in (f"staging_r{i}" for i in range(14, 30)):
        try:
            mod = importlib.import_module(f"npm_mirror_spark.{mod_name}")
        except ImportError:
            continue
        if hasattr(mod, "build_oracles"):
            # compose-deferred staged oracles (q_mrr/q_ndcg pattern)
            mod.build_oracles(ORACLES)
        staged = {
            n: q
            for n, q in mod.STAGED_QUERIES.items()
            if n not in QUERIES
        }
        work += [
            (f"{n} (staged)", q, mod.STAGED_ORACLES.get(n))
            for n, q in staged.items()
        ]
    for i, (name, q, sql) in enumerate(work, 1):
        t0 = time.monotonic()
        try:
            df = q(spark, sf_dir)
            if sql is None:
                nrows = df.count()
                n_rows_only += 1
                status = f"rows-only ({nrows})"
            else:
                problems = compare(df, con, sql)
                if problems:
                    fails.append(name)
                    status = f"FAIL {problems}"
                else:
                    n_pass += 1
                    status = "ok"
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            fails.append(name)
            status = f"ERROR {exc}"
        print(
            f"[{i}/{len(work)}] {name}: {status} ({time.monotonic()-t0:.1f}s)",
            flush=True,
        )
    print(
        f"\nfull sweep @ {sf_dir}: {n_pass} oracle-green, {n_rows_only} "
        f"rows-only, {len(fails)} FAIL {fails or ''} "
        f"({time.monotonic()-t_start:.0f}s total)"
    )
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
