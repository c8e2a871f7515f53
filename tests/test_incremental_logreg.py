"""Streaming mini-batch SGD classifier (streaming/incremental_logreg.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from npm_mirror_spark.operators.classifier import hashed_features, train_logreg
from npm_mirror_spark.streaming.incremental_logreg import StreamingLogReg
from npm_mirror_spark.tables import load_table

DIM = 64


def _labeled(spark, sf_dir, limit=200):
    docs = load_table(spark, sf_dir, "documents").limit(limit)
    return docs.select(
        "doc_id", "text",
        F.col("text").contains("spark").cast("int").alias("label"),
    )


def test_one_batch_equals_one_fullbatch_iter(spark, sf_dir):
    """All data in one micro-batch from zero weights == one train_logreg
    iteration — the shared-gd_step contract."""
    data = _labeled(spark, sf_dir)
    sk = StreamingLogReg(dim=DIM, lr=0.5)
    sk.update_batch(data)
    ref = train_logreg(
        hashed_features(data, dim=DIM),
        data.select("doc_id", "label"),
        dim=DIM, iters=1, lr=0.5,
    )
    assert sk.bias == ref["bias"]
    assert sk.weights == ref["weights"]
    assert sk.losses == ref["losses"]


def test_minibatch_stream_learns(spark, sf_dir, tmp_path):
    """Drive labeled chunks through a real availableNow stream; the
    model must beat the 0.5-score coin flip on the planted keyword
    (scores ordered with labels) and log a loss per batch."""
    data = _labeled(spark, sf_dir).collect()
    feed = tmp_path / "feed"
    feed.mkdir()
    for i in range(8):
        chunk = [r for j, r in enumerate(data) if j % 8 == i]
        (feed / f"b{i}.jsonl").write_text(
            "\n".join(
                json.dumps(
                    {"doc_id": r["doc_id"], "text": r["text"], "label": r["label"]}
                )
                for r in chunk
            )
        )
    # dim=256: at 64 buckets hash collisions cap the planted-signal
    # AUC at ~0.78 regardless of trainer (measured) — not a streaming issue
    sk = StreamingLogReg(dim=256, lr=1.0)
    stream = (
        spark.readStream.schema("doc_id long, text string, label int")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = sk.attach(stream, str(tmp_path / "cp")).trigger(availableNow=True).start()
    q.awaitTermination(180)
    assert len(sk.losses) >= 2

    df = _labeled(spark, sf_dir)
    scored = sk.score(df).join(df.select("doc_id", "label"), "doc_id").collect()
    pos = [r["score"] for r in scored if r["label"] == 1]
    neg = [r["score"] for r in scored if r["label"] == 0]
    import bisect

    neg_sorted = sorted(neg)
    auc = sum(bisect.bisect_left(neg_sorted, p) for p in pos) / (
        len(pos) * len(neg)
    )
    assert auc > 0.8, f"streaming SGD failed to learn: AUC={auc:.3f}"
