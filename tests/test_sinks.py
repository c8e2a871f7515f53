"""Physical-layout sinks: prefix-bucket partitioning + partition pruning,
and the bucket-scoped upsert (dynamic partition overwrite)."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from npm_mirror_spark import plans
from npm_mirror_spark.sinks import upsert_latest, write_bucketed_by_prefix


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


def test_upsert_latest_wins_and_touches_only_affected_buckets(spark, tmp_path):
    """db.save parity: re-upserting a key replaces its row (latest rev
    wins, no duplicate); buckets the batch does not touch keep their files
    byte-identical (dynamic partition overwrite = O(touched buckets))."""
    path = str(tmp_path / "upsert")

    def df(rows):
        return spark.createDataFrame(rows, "pkg string, rev long, payload string")

    upsert_latest(
        spark,
        df([("alpha-one", 1, "a1"), ("beta-two", 1, "b1"), ("gamma-x", 1, "g1")]),
        path,
        key="pkg",
        order_cols=["rev"],
    )
    # second batch: update alpha (rev 2), insert delta; beta/gamma untouched
    before = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path)
        if d.startswith("bucket=")
    }
    mtimes = {
        d: os.path.getmtime(os.path.join(path, d, fs[0]))
        for d, fs in before.items()
        if fs
    }
    upsert_latest(
        spark,
        df([("alpha-one", 2, "a2"), ("delta-q", 1, "d1")]),
        path,
        key="pkg",
        order_cols=["rev"],
    )
    back = {r["pkg"]: (r["rev"], r["payload"]) for r in spark.read.parquet(path).collect()}
    assert back == {
        "alpha-one": (2, "a2"),
        "beta-two": (1, "b1"),
        "gamma-x": (1, "g1"),
        "delta-q": (1, "d1"),
    }
    # stale update loses: rev 1 arriving after rev 2 must NOT regress alpha
    upsert_latest(
        spark, df([("alpha-one", 1, "stale")]), path, key="pkg", order_cols=["rev"]
    )
    back2 = {r["pkg"]: r["rev"] for r in spark.read.parquet(path).collect()}
    assert back2["alpha-one"] == 2
    # untouched buckets kept their original files (same mtime)
    beta_bucket = "bucket=" + "beta-two"[:3].upper()
    assert os.path.getmtime(
        os.path.join(path, beta_bucket, before[beta_bucket][0])
    ) == mtimes[beta_bucket]
