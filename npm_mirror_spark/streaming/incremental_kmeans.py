"""Streaming (mini-batch) k-means — the continuous-ingest face of
operators/similarity.py::train_kmeans.

A live embedding feed (the IVF tier's input) can't re-run batch Lloyd
per arrival; the standard answer (mini-batch k-means, Sculley 2010 /
Spark MLlib's StreamingKMeans) folds each micro-batch into running
per-cluster statistics.  This implementation keeps the repo's exact-
arithmetic discipline: the state is the EXACT integer component sums
and counts per cluster (2^-24 quantized, the train_kmeans contract),
and the centroid is the same requantized mean — so one update over a
batch equals one batch-Lloyd round bit-for-bit (pinned in
tests/test_incremental_kmeans.py), and the result is independent of
how rows are split WITHIN a batch.

Topology per micro-batch (same shape as one train_kmeans round):
map-side exact-int argmin assignment against the current centroids
(closure literals), one (cluster, pos) integer-sum shuffle, k x dim
numbers to the driver-held state.  State is k x (dim + 1) integers —
MBs at most — checkpointable by writing (cluster, pos, s, cnt) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from npm_mirror_spark.operators.similarity import (
    _nearest_centroid,
    _quantize,
    _requantize,
)


class StreamingKMeans:
    """Mini-batch k-means over a stream of vectors.

    ``init_centroids_q``: 2^-24-quantized integer seed centroids (e.g.
    train_kmeans(...)["centroids_q"] from a bootstrap corpus, or the k
    first vectors).  After each ``update_batch`` the current partition
    model is ``centroids_q`` / ``assign_df``.
    """

    def __init__(self, init_centroids_q: list[list[int]], vec_col: str = "embedding"):
        self.vec_col = vec_col
        self.init = [list(c) for c in init_centroids_q]
        self.k = len(init_centroids_q)
        self.dim = len(init_centroids_q[0])
        self.sums = [[0] * self.dim for _ in range(self.k)]
        self.counts = [0] * self.k
        self.n_batches = 0
        self._last_batch: int | None = None

    @property
    def centroids_q(self) -> list[list[int]]:
        """Requantized running means; clusters that have seen no data
        keep their seed (the train_kmeans empty-cluster rule)."""
        out = []
        for c in range(self.k):
            if self.counts[c] == 0:
                out.append(list(self.init[c]))
            else:
                out.append(
                    [_requantize(s, self.counts[c]) for s in self.sums[c]]
                )
        return out

    def update_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """Fold one (micro-)batch into the running statistics — assign
        against the CURRENT centroids, then merge exact integer sums.
        Signature matches foreachBatch.  Integer-sum merging is not
        idempotent, so a checkpoint-replayed batch (same batch_id as the
        last applied one) is skipped — the transactional-sink replay
        guard."""
        if batch_id is not None and batch_id == self._last_batch:
            return
        cents = self.centroids_q
        rows = (
            batch_df.select(
                _nearest_centroid(_quantize(self.vec_col), cents).alias("cluster"),
                _quantize(self.vec_col).alias("__q"),
            )
            .select("cluster", F.posexplode("__q").alias("pos", "qc"))
            .groupBy("cluster", "pos")
            .agg(F.sum("qc").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        for r in rows:
            self.sums[r["cluster"]][r["pos"]] += r["s"]
        # cnt is identical across pos within a cluster: count once
        for r in rows:
            if r["pos"] == 0:
                self.counts[r["cluster"]] += r["cnt"]
        self.n_batches += 1
        self._last_batch = batch_id

    def attach(self, stream: DataFrame, checkpoint: str):
        """Wire onto a streaming DataFrame of vectors; availableNow or
        continuous triggers both work — state lives on this object, so
        recovering a restarted driver from the checkpoint requires
        :meth:`restore` with the last persisted state first."""
        return (
            stream.writeStream.foreachBatch(self.update_batch)
            .option("checkpointLocation", checkpoint)
        )

    def state_rows(self) -> list[tuple[int, int, int, int]]:
        """(cluster, pos, s, cnt) rows — write these to persist the
        exact state; a new StreamingKMeans restores by replaying them
        into sums/counts."""
        out = []
        for c in range(self.k):
            for p in range(self.dim):
                out.append((c, p, self.sums[c][p], self.counts[c]))
        return out

    def restore(
        self,
        state_rows: list[tuple[int, int, int, int]],
        last_batch_id: int | None = None,
    ) -> None:
        """Rehydrate from persisted :meth:`state_rows` output plus the
        batch_id the state was persisted after — checkpoint recovery's
        required other half (r6 advice finding): a restarted driver
        resuming the stream with zeroed sums silently forgets every
        committed batch.  Integer state restores bit-exactly."""
        for c, p, s, cnt in state_rows:
            self.sums[c][p] = s
            self.counts[c] = cnt
        self._last_batch = last_batch_id
