"""The mirror pipeline: parse -> route -> project -> multi-sink fan-out.

Re-expresses the reference consumer's per-message imperative loop
(changes_consumer.py:332-408) as ONE declarative plan applied per
micro-batch:

  reference                              here
  ---------                              ----
  poll + json.loads (L376,391)           file/Kafka source + from_json
  catch-all -> skipped_changes (L393)    PERMISSIVE corrupt routing (stage col)
  doc-missing / size / status filters    route_changes() predicates (F1,F2,F5)
  13-field projection + db.save (L283)   mirror_record() -> parquet append
  5 log topics (L53-59,332-370)          per-stage dirs under out_dir/stages/
  commit after process (L408)            checkpointLocation (at-least-once)
  duplicate rows on redelivery (L325)    seq-keyed dedup (intentional upgrade)
  Prometheus counters (L38-42)           df.observe() + StreamingQueryListener

Delivery semantics: the file/parquet sinks below are exactly-once per
Spark's checkpoint contract; the explicit in-batch + cross-batch dedup on
``seq`` upgrades the reference's at-least-once duplicate-happy CouchDB sink
(SURVEY.md §2.7). At scale the same code runs against Kafka in/out — the
seams are the source reader and foreachBatch writer only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from npm_mirror_spark.operators.projections import mirror_record
from npm_mirror_spark.sources.changes import MAX_SIZE, read_changes_stream

STAGES = (
    "downloaded_in_local",
    "moved_to_remote",
    "added_to_db",
    "skipped_changes",
    "run_logs",
)


def route_changes(parsed: DataFrame, max_size: int = MAX_SIZE) -> DataFrame:
    """Tag each change with its terminal stage (K2 fan-out).

    skip reasons mirror the reference: malformed JSON (F9), missing doc
    (F1), failed fetch (F5), oversize artifact (F2/F4 — doc+tarball drop
    as one row). Everything else lands in the mirror table (added_to_db).
    """
    return parsed.withColumn(
        "skip_reason",
        F.when(F.col("seq").isNull(), F.lit("malformed"))
        .when(F.col("doc").isNull(), F.lit("missing_doc"))
        .when(F.col("fetch_status") != 200, F.lit("fetch_failed"))
        .when(F.col("artifact_size") > max_size, F.lit("oversize"))
        .otherwise(F.lit(None)),
    ).withColumn(
        "stage",
        F.when(F.col("skip_reason").isNotNull(), F.lit("skipped_changes")).otherwise(
            F.lit("added_to_db")
        ),
    )


def processed_mirror_records(routed: DataFrame) -> DataFrame:
    """The rows that survive routing, projected to the 13-field mirror
    record — THE pipeline output (K3)."""
    ok = routed.filter(F.col("stage") == "added_to_db")
    return mirror_record(ok)


class MirrorPipeline:
    """Streaming shell with injectable output root, drivable by tests via
    availableNow and by production via continuous triggers."""

    def __init__(self, spark: SparkSession, out_dir: str, with_artifacts: bool = False):
        self.spark = spark
        self.out_dir = out_dir
        self.mirror_path = os.path.join(out_dir, "mirror")
        self.stages_path = os.path.join(out_dir, "stages")
        self.checkpoint = os.path.join(out_dir, "_checkpoint")
        self.artifact_store = None
        if with_artifacts:
            from npm_mirror_spark.artifact_store import ArtifactStore

            self.artifact_store = ArtifactStore(spark, os.path.join(out_dir, "store"))

    # -- batch-visible state --------------------------------------------

    def mirror_table(self) -> DataFrame:
        return self.spark.read.parquet(self.mirror_path)

    def stage_log(self, stage: str) -> DataFrame:
        # partition-pruned read of one stage "topic"
        return (
            self.spark.read.parquet(self.stages_path)
            .filter(F.col("stage") == stage)
            .drop("stage")
        )

    def _mirror_exists(self) -> bool:
        """Explicit existence probe for the first-batch case. A catch-all
        except around the read would silently DISABLE dedup on any
        transient read failure (committing duplicates instead of failing
        the batch) — so only genuine absence returns False; real read
        errors propagate and fail the micro-batch, which Spark retries
        from the checkpoint."""
        jvm = self.spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(self.mirror_path)
        fs = path.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return bool(fs.exists(path))

    def _committed_seqs_from(self, min_seq: int) -> DataFrame:
        """Committed seqs that could possibly collide with a batch whose
        smallest seq is ``min_seq``.

        A redelivered change carries its original seq, so a committed seq
        below the current batch's minimum can never match the anti-join —
        filtering it out is exact, not heuristic. The predicate pushes to
        the parquet scan (row-group stats skip old files), so the dedup
        input is bounded by the source's redelivery window instead of
        growing with the sink's whole history."""
        return (
            self.mirror_table()
            .select("change_seq_id")
            .filter(F.col("change_seq_id") >= F.lit(min_seq))
        )

    # -- the foreachBatch writer -----------------------------------------

    def _write_batch(self, routed: DataFrame, batch_id: int) -> None:
        """One micro-batch: dedup + fan-out. Runs as ordinary batch code —
        every operator above is stream/batch pure, so this is the ONLY
        stream-specific code in the pipeline."""
        routed = routed.persist()
        fresh = None
        try:
            # stage logs (the 5 Kafka topics, K2): ONE partitioned write —
            # each stage becomes a partition dir, no per-stage job, no
            # driver-side stage enumeration (was: collect + N filtered
            # writes = N extra passes over the batch)
            (
                routed.select(
                    "seq", "id", "skip_reason", F.lit(batch_id).alias("batch_id"), "stage"
                )
                .write.mode("append")
                .partitionBy("stage")
                .parquet(self.stages_path)
            )

            # mirror records: in-batch dedup on seq (redelivery inside a
            # batch) + anti-join against already-committed seqs (redelivery
            # across restarts) -> effectively-once rows. The committed side
            # is seq-bounded (see _committed_seqs_from) and carries NO
            # broadcast hint: small windows broadcast via AQE on their own,
            # and a wide redelivery window legitimately falls back to a
            # shuffled anti-join instead of blowing driver memory.
            records = processed_mirror_records(routed).dropDuplicates(
                ["change_seq_id"]
            )
            mirror_exists = self._mirror_exists()
            if mirror_exists or self.artifact_store is not None:
                # cache only when a second consumer exists (min-agg below
                # and/or the artifact projection) — an unconditional persist
                # taxes the common fresh-sink fast path for nothing
                fresh = records = records.persist()
            if mirror_exists:
                batch_min_seq = records.agg(F.min("change_seq_id")).first()[0]
                if batch_min_seq is not None:
                    records = records.join(
                        self._committed_seqs_from(batch_min_seq),
                        "change_seq_id",
                        "left_anti",
                    )
            records.write.mode("append").parquet(self.mirror_path)

            # K5: artifact rows ride into the bucketed store (content here
            # is the change's own digest surrogate — the enrichment seam
            # supplies real bytes in production).
            #
            # Independently idempotent: artifacts derive from ``fresh`` (the
            # in-batch-deduped rows BEFORE the mirror anti-join) and anti-join
            # the artifact store's OWN committed seqs. Deriving from the
            # mirror-anti-joined ``records`` instead would lose rows on
            # replay: a crash after the mirror write but before this append
            # leaves the rows committed to the mirror, so the retried batch
            # anti-joins them away and their artifacts are never written.
            if self.artifact_store is not None:
                artifacts = fresh.select(
                    F.col("package_name").alias("package"),
                    F.col("change_seq_id").alias("version_seq"),
                    F.col("change_save_path").alias("save_path"),
                    F.sha2(F.col("change_save_path"), 256).cast("binary").alias("content"),
                    F.coalesce(
                        F.col("package_latest_change_time"), F.current_timestamp()
                    ).alias("created_ts"),
                )
                if self.artifact_store.exists():
                    amin = artifacts.agg(F.min("version_seq")).first()[0]
                    if amin is not None:
                        artifacts = artifacts.join(
                            self.artifact_store.committed_seqs_from(amin),
                            "version_seq",
                            "left_anti",
                        )
                self.artifact_store.append(artifacts)
        finally:
            if fresh is not None:
                fresh.unpersist()
            routed.unpersist()

    # -- drive ------------------------------------------------------------

    def run_available_now(self, source_path: str) -> None:
        """Drain-and-stop (the reference stream is unbounded; availableNow
        is the test/backfill trigger, SURVEY.md §2.7)."""
        parsed = read_changes_stream(self.spark, source_path)
        routed = route_changes(parsed)
        observed = routed.observe(
            "mirror_metrics",
            F.count(F.lit(1)).alias("n_changes"),  # npmUpdateCounter analog
            F.max("seq").alias("max_seq"),  # lastSeq gauge analog
            F.sum(
                F.when(F.col("stage") == "skipped_changes", 1).otherwise(0)
            ).alias("n_skipped"),
        )
        q = (
            observed.writeStream.foreachBatch(self._write_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # retention maintenance after the drain (the reference GCs inline
        # per change; batched GC after the micro-batch run is the
        # amortized equivalent — same invariant, one compaction)
        if self.artifact_store is not None:
            self.artifact_store.gc()

    def run_batch(self, source_path: str) -> None:
        """The same plan under spark.read — stream/batch parity by
        construction (one codebase, two triggers; SURVEY.md §3.3)."""
        from npm_mirror_spark.sources.changes import read_changes_batch

        routed = route_changes(read_changes_batch(self.spark, source_path))
        self._write_batch(routed, batch_id=-1)


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_col: str = "seq",
):
    """K1 parity: keyed, compressed Kafka producer
    (producer.ts:172-199 — key=seq, gzip). Not exercisable in this
    container — no broker listens, and the spark-sql-kafka connector jar
    is not in pyspark's jars/ (re-checked r5), so even a fake broker
    could not load the sink. The serialization plan is the production
    path; the key/value projection it wraps is exercised by the file
    sinks. Returns the started StreamingQuery."""
    out = df.selectExpr(
        f"CAST({key_col} AS STRING) AS key", "to_json(struct(*)) AS value"
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("kafka.compression.type", "gzip")
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


class MetricsListener:
    """StreamingQueryListener surfacing the reference's four Prometheus
    metrics (changes_consumer.py:38-42, producer.ts:111-115): processed
    counter, skipped counter, last seq, plus per-batch duration — the
    monitoring-is-the-test-suite stance of the reference (SURVEY.md §5),
    exportable to any metrics backend from the driver."""

    def __init__(self) -> None:
        self.n_changes = 0
        self.n_skipped = 0
        self.last_seq: int | None = None
        self.batch_durations_ms: list[int] = []

    def attach(self, spark: SparkSession) -> "MetricsListener":
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                row = (p.observedMetrics or {}).get("mirror_metrics")
                if row is not None:
                    outer.n_changes += row["n_changes"] or 0
                    outer.n_skipped += row["n_skipped"] or 0
                    if row["max_seq"] is not None:
                        outer.last_seq = max(outer.last_seq or 0, row["max_seq"])
                if p.durationMs and "triggerExecution" in p.durationMs:
                    outer.batch_durations_ms.append(p.durationMs["triggerExecution"])

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self._listener = _L()
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self._listener)

    def lag(self, newest_seq: int) -> int | None:
        """producer.ts:206-243 lag rule: newest remote seq - last seen."""
        return None if self.last_seq is None else newest_seq - self.last_seq
