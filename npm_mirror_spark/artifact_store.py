"""Artifact store: the reference's zip-per-version NAS (K5) as a bucketed
binary-column table, with retention GC (A2) and a deletion log (K4).

The reference stores one zip per package version in 3-char-prefix dirs and
GCs the oldest zips beyond 5 per package, logging deletions to a
``deleted-zips`` db (changes_consumer.py:209-280). File-per-artifact
does not survive 100 TB (small-file death); the Spark-native store is a
parquet table with a ``binary`` content column:

- partitioned by the same prefix bucket -> partition-pruned point lookups;
- content column pruned away for metadata queries (tested in
  test_multimodal.py);
- GC is a declarative top-N-per-group + a compacting rewrite, with the
  evicted rows appended to the deletion log FIRST (log-then-delete, the
  same ordering the reference uses at changes_consumer.py:209-216).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from npm_mirror_spark.operators.aggregates import retention_gc, retention_topn
from npm_mirror_spark.operators.projections import prefix_bucket

VERSION_RETENTION_LIMIT = 5  # changes_consumer.py:25


class ArtifactStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.store_path = os.path.join(root, "artifacts")
        self.deletion_log_path = os.path.join(root, "deleted")

    def append(self, artifacts: DataFrame) -> None:
        """artifacts: (package, version_seq, save_path, content, created_ts).
        Bucketed by package prefix like the reference's dir scheme."""
        out = artifacts.withColumn("bucket", prefix_bucket("package"))
        out.write.mode("append").partitionBy("bucket").parquet(self.store_path)

    def exists(self) -> bool:
        """Genuine-absence probe (first-batch case); real read errors
        propagate so a transient failure can't silently disable dedup."""
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(self.store_path)
        fs = p.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return bool(fs.exists(p))

    def committed_seqs_from(self, min_seq: int) -> DataFrame:
        """Committed version_seqs >= ``min_seq`` — the bounded anti-join
        side that makes :meth:`append` callers replay-idempotent (same
        seq-bounded pattern as pipeline.py's mirror dedup: the predicate
        pushes to the scan, so row-group stats skip old files)."""
        return (
            self.read()
            .select("version_seq")
            .filter(F.col("version_seq") >= F.lit(min_seq))
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.store_path)

    def deletion_log(self) -> DataFrame:
        return self.spark.read.parquet(self.deletion_log_path)

    def gc(self, limit: int = VERSION_RETENTION_LIMIT) -> tuple[int, int]:
        """Retention pass: keep the newest ``limit`` versions per package,
        append evicted save_paths to the deletion log, rewrite the store
        compacted. Returns (kept, evicted) counts.

        Crash-safe swap: the rewrite lands in a temp dir, the live store is
        renamed ASIDE (never deleted first), the temp renamed into place,
        and only then is the old copy dropped — every crash point leaves a
        full recoverable copy on disk (``__old`` if between the renames;
        :meth:`gc` restores it on the next run). A real deployment swaps
        this for a table format's atomic commit. No-op on an absent store.
        """
        old = self.store_path + "__old"
        if not os.path.exists(self.store_path):
            if os.path.exists(old):
                # crashed between the two renames last time: the aside copy
                # IS the store — restore it and continue the pass
                os.rename(old, self.store_path)
            else:
                return 0, 0  # nothing stored yet
        current = self.read().cache()
        try:
            order = [F.desc("created_ts"), F.desc("version_seq")]
            kept = retention_topn(current, ["package"], order, n=limit)
            evicted = retention_gc(current, ["package"], order, n=limit)

            n_evicted = evicted.count()
            if n_evicted:
                (
                    evicted.select(
                        F.col("save_path").alias("deleted_zip_path"),
                        F.current_timestamp().alias("deleted_at"),
                    )
                    .write.mode("append")
                    .parquet(self.deletion_log_path)
                )
            tmp = self.store_path + "__compact"
            kept.drop("bucket").withColumn(
                "bucket", prefix_bucket("package")
            ).write.mode("overwrite").partitionBy("bucket").parquet(tmp)
            n_kept = kept.count()
        finally:
            current.unpersist()

        import shutil

        if os.path.exists(old):
            shutil.rmtree(old)  # leftover aside copy from a prior crash
        os.rename(self.store_path, old)
        os.rename(tmp, self.store_path)
        shutil.rmtree(old)
        return n_kept, n_evicted
