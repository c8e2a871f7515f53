"""Per-stage profile of one registered face: run it warm on the bench's
Spark config with the UI enabled, then read per-stage wall/shuffle/task
metrics back over the UI REST API — the stage-level attribution
tools/stage_audit.py deliberately leaves to the UI (guide §1.1/§7.1).

Usage: python tools/profile_face.py q_triangle_est [sf_dir] [repeats]

Prints each warm run's wall, then the last run's stages sorted by
executor-summed task time, with shuffle read/write bytes and task counts
— the "which stage owns the wall" evidence OPTIMIZATION notes record.
"""
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName(f"profile-{name}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from npm_mirror_spark.queries import QUERIES

    q = QUERIES.get(name)
    if q is None:
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

    def stages() -> list[dict]:
        base = "http://localhost:4099/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base))
        app_id = apps[0]["id"]
        return json.load(
            urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete")
        )

    for i in range(repeats):
        spark.catalog.clearCache()
        before = {s["stageId"] for s in stages()} if i == repeats - 1 else set()
        t0 = time.monotonic()
        df = q(spark, sf_dir)
        n = df.count()
        wall = time.monotonic() - t0
        print(f"run {i}: wall={wall:.3f}s rows={n}", flush=True)

    new = [s for s in stages() if s["stageId"] not in before]
    new.sort(key=lambda s: -s.get("executorRunTime", 0))
    total_rt = sum(s.get("executorRunTime", 0) for s in new)
    print(
        f"\nlast run: {len(new)} stages, executor task-time total "
        f"{total_rt/1000.0:.2f}s (cores x wall)"
    )
    print(
        f"{'stage':>6} {'taskTime_s':>10} {'tasks':>5} {'shufR_MB':>9} "
        f"{'shufW_MB':>9} {'input_MB':>9}  name"
    )
    for s in new[:25]:
        nm = s.get("name", "")[:70]
        print(
            f"{s['stageId']:>6} {s.get('executorRunTime', 0)/1000.0:>10.2f} "
            f"{s.get('numCompleteTasks', 0):>5} "
            f"{s.get('shuffleReadBytes', 0)/1e6:>9.2f} "
            f"{s.get('shuffleWriteBytes', 0)/1e6:>9.2f} "
            f"{s.get('inputBytes', 0)/1e6:>9.2f}  {nm}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
