"""Batch backfill from an artifact directory tree (S4 — the
organize-NAS.py job, legacy_code/app/organize-NAS.py:31-78).

The reference walks package directories one by one, picks the latest
timestamped doc JSON per package (argmax by filename timestamp,
organize-NAS.py:20-28), loads it, projects ['_id','_rev','name'] and saves
to CouchDB. Here the whole tree is ONE distributed read:

  binaryFile scan -> path parsing (package + timestamp from the file path)
  -> argmax-latest window per package -> from_json projection

No driver-side directory loop: a million package dirs are a million rows,
partitioned by Spark's file index. Filename-timestamp parsing is P9
(ISO-microsecond strptime, organize-NAS.py:24).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# filenames look like <iso-ts>Z.json inside <root>/<package>/ dirs
# (mirror.ts:80-97 writes them; organize-NAS.py:24 parses them). One
# deviation from the reference: Hadoop paths cannot contain ':', so the
# time separator is '_' on disk (2023-08-25T05_00_00.967096Z.json).
_TS_PATTERN = r"([\d\-T_\.]+Z)\.json$"
_PKG_PATTERN = r".*/([^/]+)/[^/]+\.json$"


def scan_artifact_tree(spark: SparkSession, root: str) -> DataFrame:
    """One distributed scan of every doc JSON under the tree. The binary
    content rides along untouched until after the argmax — only winners
    get parsed."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.json")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    return files.select(
        F.regexp_extract(F.col("path"), _PKG_PATTERN, 1).alias("package"),
        F.to_timestamp(
            F.regexp_extract(F.col("path"), _TS_PATTERN, 1),
            "yyyy-MM-dd'T'HH_mm_ss.SSSSSS'Z'",
        ).alias("doc_ts"),
        F.col("path"),
        F.col("content"),
    )


def latest_doc_per_package(scanned: DataFrame) -> DataFrame:
    """organize-NAS.py:20-28,40: argmax by filename timestamp per package.
    Deterministic tiebreak on path."""
    w = Window.partitionBy("package").orderBy(F.desc("doc_ts"), F.desc("path"))
    return (
        scanned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def backfill_records(spark: SparkSession, root: str) -> DataFrame:
    """The full job: latest doc per package, projected to the reference's
    3-field record (organize-NAS.py:56). JSON parsing happens AFTER the
    argmax — losers' bytes are never deserialized."""
    latest = latest_doc_per_package(scan_artifact_tree(spark, root))
    doc = F.from_json(
        F.col("content").cast("string"), "_id string, _rev string, name string"
    )
    return latest.select(
        "package",
        "doc_ts",
        doc["_id"].alias("_id"),
        doc["_rev"].alias("_rev"),
        doc["name"].alias("name"),
        F.col("path").alias("tgz_file_path"),
    )


def write_fake_artifact_tree(
    root: str, n_packages: int = 20, files_per_pkg: int = 4, seed: int = 42
) -> dict[str, str]:
    """Test fixture: a NAS-like tree of timestamped doc JSONs. Returns
    {package: expected-latest-filename}."""
    import random

    rng = random.Random(seed)
    t0 = datetime(2023, 6, 1)
    expected: dict[str, str] = {}
    for p in range(n_packages):
        pkg = f"pkg{p}"
        d = os.path.join(root, pkg)
        os.makedirs(d, exist_ok=True)
        stamps = sorted(
            t0 + timedelta(hours=rng.randint(0, 10_000), microseconds=rng.randint(0, 999_999))
            for _ in range(files_per_pkg)
        )
        for i, ts in enumerate(stamps):
            name = ts.strftime("%Y-%m-%dT%H_%M_%S.%f") + "Z.json"
            body = {"_id": pkg, "_rev": f"{i + 1}-abc", "name": pkg}
            with open(os.path.join(d, name), "w") as f:
                json.dump(body, f)
        expected[pkg] = stamps[-1].strftime("%Y-%m-%dT%H_%M_%S.%f") + "Z.json"
    return expected
