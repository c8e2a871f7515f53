"""compact_partitions: many small appended files collapse to one per
partition dir; values and partition layout are byte-for-byte preserved."""

from __future__ import annotations

import pytest as _pytest

# slow tier (r15, r14 verdict item 1): algorithm re-derivation /
# brute-force sweep suite — guards development-time regressions,
# not per-round results.  Runs with --runslow / SPARK_GRAFT_SLOW_TESTS=1.
pytestmark = _pytest.mark.slow


import glob

from npm_mirror_spark.sinks import compact_partitions


def _files_per_partition(path):
    out = {}
    for d in glob.glob(f"{path}/stage=*"):
        out[d.rsplit("=", 1)[1]] = len(glob.glob(f"{d}/*.parquet"))
    return out


def test_compaction_collapses_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "store")
    # 8 appends x 3 partitions -> 24+ small files
    for i in range(8):
        df = spark.createDataFrame(
            [(i * 10 + j, ["a", "b", "c"][j % 3]) for j in range(6)],
            "id long, stage string",
        ).coalesce(1)
        df.write.mode("append").partitionBy("stage").parquet(path)

    before_files = _files_per_partition(path)
    assert all(n >= 8 for n in before_files.values()), before_files
    before_rows = sorted(
        (r["id"], r["stage"]) for r in spark.read.parquet(path).collect()
    )

    compact_partitions(spark, path, "stage")

    after_files = _files_per_partition(path)
    assert set(after_files) == set(before_files)
    assert all(n == 1 for n in after_files.values()), after_files
    after_rows = sorted(
        (r["id"], r["stage"]) for r in spark.read.parquet(path).collect()
    )
    assert after_rows == before_rows
