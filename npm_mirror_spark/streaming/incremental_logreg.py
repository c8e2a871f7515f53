"""Streaming (online mini-batch SGD) quality classifier — the
continuous-training face of operators/classifier.py::train_logreg.

tests/test_streaming_curation.py already pins streaming SCORING with
frozen weights; this is the other half: when the weak label arrives with
the stream (a rule gate computed in-flight, user feedback, a judged
sample), the model keeps learning — one gradient step per micro-batch
over that batch's rows, the textbook mini-batch SGD regime (each batch
is a sample of the stream).

Per micro-batch: hashed features for the batch (one explode + one
(id, bucket) aggregation), then operators/classifier.py::gd_step — the
IDENTICAL arithmetic train_logreg runs per round, so one batch
containing all data reproduces one full-batch iteration bit-for-bit
(pinned in tests/test_incremental_logreg.py).  Driver state is dim+1
floats; everything else aggregates in the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from npm_mirror_spark.operators.classifier import (
    _with_bias,
    gd_step,
    hashed_features,
    score_logreg,
)


class StreamingLogReg:
    """Mini-batch SGD over a stream of (id, text, label) rows."""

    def __init__(
        self,
        dim: int = 256,
        lr: float = 0.5,
        l2: float = 1e-4,
        text_col: str = "text",
        id_col: str = "doc_id",
        label_col: str = "label",
    ):
        self.dim, self.lr, self.l2 = dim, lr, l2
        self.text_col, self.id_col, self.label_col = text_col, id_col, label_col
        self.weights = [0.0] * dim
        self.bias = 0.0
        self.losses: list[float] = []
        self._last_batch: int | None = None

    @property
    def model(self) -> dict:
        return {"weights": list(self.weights), "bias": self.bias}

    def update_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """One SGD step on this micro-batch (foreachBatch signature).
        A checkpoint-replayed batch (same batch_id as the last applied)
        is skipped: a repeated gradient step is not idempotent."""
        if batch_id is not None and batch_id == self._last_batch:
            return
        n = batch_df.count()
        if n == 0:
            return
        labels = batch_df.select(self.id_col, self.label_col)
        feats = hashed_features(
            batch_df, self.text_col, self.id_col, self.dim
        )
        fb = _with_bias(feats, labels, self.id_col)
        self.weights, self.bias, ml = gd_step(
            fb, labels, self.weights, self.bias, n, self.lr, self.l2,
            self.dim, self.id_col, self.label_col,
        )
        self.losses.append(ml)
        self._last_batch = batch_id

    def restore(
        self,
        model: dict,
        last_batch_id: int | None = None,
        losses: list[float] | None = None,
    ) -> None:
        """Rehydrate from a persisted ``model`` dict (weights + bias —
        what :attr:`model` returns) and the batch_id it was persisted
        after.  Required for checkpoint recovery (r6 advice finding):
        the stream checkpoint advances past committed batches, so a
        restarted driver that re-attaches with fresh zero weights
        silently discards all training to date."""
        self.weights = [float(w) for w in model["weights"]]
        self.bias = float(model["bias"])
        self.losses = list(losses) if losses is not None else []
        self._last_batch = last_batch_id

    def attach(self, stream: DataFrame, checkpoint: str):
        """State lives on THIS object: recovering a restarted driver
        from ``checkpoint`` requires :meth:`restore` with the last
        persisted model first (or a fresh checkpoint dir to retrain
        from scratch)."""
        return (
            stream.writeStream.foreachBatch(self.update_batch)
            .option("checkpointLocation", checkpoint)
        )

    def score(self, df: DataFrame) -> DataFrame:
        return score_logreg(
            hashed_features(df, self.text_col, self.id_col, self.dim),
            self.model,
            self.id_col,
        )
