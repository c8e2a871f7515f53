"""Physical-layout sinks: prefix-bucket partitioning + partition pruning."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from npm_mirror_spark import plans
from npm_mirror_spark.sinks import write_bucketed_by_prefix


def test_bucketed_layout_and_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "parts_bucketed")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    write_bucketed_by_prefix(part, path, "p_name")

    back = spark.read.parquet(path)
    assert back.count() == part.count()

    # filtering on the bucket column must partition-prune, not scan-filter
    one_bucket = back.filter(F.col("bucket") == "BLU")
    text = plans.explain_str(one_bucket, "formatted")
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", text)
    assert pf and "bucket" in pf[0], f"expected partition pruning, got {pf}"

    assert one_bucket.count() == part.filter(
        F.upper(F.substring("p_name", 1, 3)) == "BLU"
    ).count()
