"""Contract-gated streaming ingest: validate every micro-batch BEFORE it
reaches the table, quarantine what fails, keep the audit durable.

The batch-side pieces already exist — declarative contracts
(operators/checks.py::constraint_report, one aggregation job) and the
idempotent snapshot sink (snapshot_store.py, token-deduplicated commits).
This module is their streaming composition, the pattern a 100 TB
continuous ingest actually runs: a bad upstream deploy must not poison
the training table for every consumer downstream, and "we dropped batch
1234" is useless without WHY — so failing batches land in a quarantine
table (full rows, replayable once fixed) and every batch's constraint
report lands in an audit table keyed by batch id.

Per micro-batch cost: ONE aggregation job over the batch (all
constraints in one pass, map-side partials) + one parquet write — the
gate adds an aggregation, never a second scan per rule.  All three
sinks commit with token=batch_id, so Spark's at-least-once foreachBatch
replay stays exactly-once end to end (the same transactional contract
tests/test_sink_idempotence.py pins for the artifact sinks).

The reference consumes its change feed with inline per-record shape
checks (data_pipeline/npm-mirror/app/changes_consumer.py); table-level
batch contracts with quarantine are extension surface for the analytics
store (SURVEY §2.9).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from npm_mirror_spark.operators.checks import constraint_report
from npm_mirror_spark.snapshot_store import SnapshotStore


class ValidatedAppend:
    """Streaming sink: contract-gated append with quarantine + audit.

    ``constraints`` is the constraint_report spec list; a batch commits
    to ``main`` only if EVERY constraint passes, otherwise the whole
    batch goes to ``quarantine`` (all-or-nothing: a batch that is
    partially garbage is evidence of an upstream fault, not something
    to silently filter — row-level cleaning belongs in the curation
    gate, not the contract gate).  Every batch appends its full report
    to ``audit`` either way.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        constraints: list,
    ) -> None:
        self.spark = spark
        self.constraints = constraints
        self.main = SnapshotStore(spark, os.path.join(root, "main"))
        self.quarantine = SnapshotStore(spark, os.path.join(root, "quarantine"))
        self.audit = SnapshotStore(spark, os.path.join(root, "audit"))

    # -- batch path (also usable directly for backfills) -------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Gate one batch; returns True if it reached ``main``."""
        if batch_df.isEmpty():
            return False
        report = constraint_report(batch_df, self.constraints)
        rows = report.collect()  # bounded: one row per constraint
        passed = all(r["ok"] for r in rows)
        audit_df = self.spark.createDataFrame(rows, report.schema).select(
            F.lit(int(batch_id)).alias("batch_id"),
            "*",
            F.lit(passed).alias("batch_ok"),
        )
        self.audit.commit(audit_df, token=batch_id)
        if passed:
            self.main.commit(batch_df, token=batch_id)
        else:
            self.quarantine.commit(batch_df, token=batch_id)
        return passed

    # -- streaming attachment ---------------------------------------------

    def attach(self, stream_df: DataFrame, checkpoint: str, available_now: bool = True):
        """writeStream.foreachBatch wiring; returns the StreamingQuery."""
        writer = stream_df.writeStream.foreachBatch(
            lambda df, bid: self.process_batch(df, bid)
        ).option("checkpointLocation", checkpoint)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
