"""Streaming sketch maintenance — the continuous-ingest face of
operators/sketches.py (Count-Min and HyperLogLog).

Mergeable sketches ARE streaming state: a micro-batch's sketch folds
into the running sketch cell-wise (+ for CMS counts, max for HLL
ranks), and because both operators use exact integer arithmetic with
seeded md5 hashes, the streamed state after any drain is BIT-EQUAL to
the batch sketch of everything ingested so far — split-invariance the
tests pin exactly (the same discipline as StreamingKMeans, which this
module mirrors structurally).

Per micro-batch: one bounded-output aggregation job (depth x width /
2^p rows to the driver-held dict), nothing corpus-sized retained.
State is checkpointable as plain (r, b, c) / (idx, mreg) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from npm_mirror_spark.operators.sketches import (
    count_min_estimate,
    count_min_sketch,
    hll_estimate,
    hll_registers,
)


class StreamingCountMin:
    """Running Count-Min over a stream of keys.

    After any number of ``update_batch`` calls, ``cells`` equals the
    batch ``count_min_sketch`` of the concatenated input exactly."""

    def __init__(self, key_col: str, depth: int = 4, width: int = 64):
        self.key_col = key_col
        self.depth = depth
        self.width = width
        self.cells: dict[tuple[int, int], int] = {}
        self.n_batches = 0
        self._last_batch: int | None = None

    def update_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        # review finding: CMS '+' merge is NOT idempotent (unlike HLL
        # max), so a checkpoint-replayed foreachBatch micro-batch must
        # be skipped by its batch_id — the same transactional-sink
        # contract SnapshotStore.commit(token=...) applies
        if batch_id is not None and batch_id == self._last_batch:
            return
        rows = count_min_sketch(
            batch_df, self.key_col, self.depth, self.width
        ).collect()
        for r in rows:
            key = (r["r"], r["b"])
            self.cells[key] = self.cells.get(key, 0) + r["c"]
        self.n_batches += 1
        self._last_batch = batch_id

    def sketch_df(self, spark) -> DataFrame:
        rows = [(r, b, c) for (r, b), c in sorted(self.cells.items())]
        return spark.createDataFrame(rows or [], "r int, b int, c long")

    def restore(self, sketch_df: DataFrame, last_batch_id: int | None = None) -> None:
        """Rehydrate the sketch from a persisted ``sketch_df`` (the
        (r, b, c) rows this object wrote) plus the batch_id it was
        persisted AFTER — the missing half of checkpoint recovery (r6
        advice finding): a restarted driver resumes the stream from the
        checkpoint, so without restoring the cells the committed
        batches are silently lost and every estimate undercounts.
        Persist (sketch_df, last applied batch_id) transactionally with
        each batch (e.g. SnapshotStore.commit(token=batch_id)) and
        restore both before re-attaching."""
        self.cells = {
            (r["r"], r["b"]): r["c"] for r in sketch_df.collect()
        }
        self._last_batch = last_batch_id

    def estimate(self, probes: DataFrame) -> DataFrame:
        return count_min_estimate(
            self.sketch_df(probes.sparkSession),
            probes,
            self.key_col,
            self.depth,
            self.width,
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        """Wire onto a stream.  State lives on THIS object, not in the
        checkpoint: recovering a restarted driver from ``checkpoint``
        requires :meth:`restore` with the last persisted sketch first
        (or a fresh checkpoint dir to replay the source from scratch) —
        attaching empty to an advanced checkpoint undercounts."""
        return (
            stream.writeStream.foreachBatch(self.update_batch)
            .option("checkpointLocation", checkpoint)
        )


class StreamingCardinality:
    """Running HyperLogLog distinct-count over a stream of keys.

    Register merge is cell-wise max, so the state is insensitive to
    duplication ACROSS batches too — re-delivered keys (at-least-once
    sources) cannot inflate the estimate, which is exactly why HLL, not
    a counter, is the streaming distinct gauge."""

    def __init__(self, key_col: str, p: int = 8):
        self.key_col = key_col
        self.p = p
        self.regs: dict[int, int] = {}
        self.n_batches = 0

    def update_batch(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        rows = hll_registers(batch_df, self.key_col, self.p).collect()
        for r in rows:
            if r["mreg"] > self.regs.get(r["idx"], 0):
                self.regs[r["idx"]] = r["mreg"]
        self.n_batches += 1

    def registers_df(self, spark) -> DataFrame:
        rows = sorted(self.regs.items())
        return spark.createDataFrame(rows or [], "idx int, mreg int")

    def restore(self, registers_df: DataFrame) -> None:
        """Rehydrate from persisted (idx, mreg) rows before re-attaching
        a recovered stream.  No batch_id needed: register max-merge is
        idempotent, so even a replayed batch folds harmlessly."""
        self.regs = {r["idx"]: r["mreg"] for r in registers_df.collect()}

    def estimate(self, spark) -> DataFrame:
        return hll_estimate(self.registers_df(spark), self.p)

    def attach(self, stream: DataFrame, checkpoint: str):
        """State lives on THIS object: recovering a restarted driver
        from ``checkpoint`` requires :meth:`restore` with the last
        persisted registers first (or a fresh checkpoint dir); an empty
        gauge against an advanced checkpoint undercounts distincts."""
        return (
            stream.writeStream.foreachBatch(self.update_batch)
            .option("checkpointLocation", checkpoint)
        )
