"""Streaming curation gate: the batch curation operators (quality gate +
PII redaction) ARE the streaming plan — same pure projections, no
stream-specific rewrites — routed to keep/reject partitions on write.
This is the continuous-ingest face of the corpus-curation stack."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from npm_mirror_spark.operators.curation import redact_pii
from npm_mirror_spark.operators.text import gopher_rules

CLEAN = (
    "the research team finished a careful study of river ecosystems and "
    "published the results in a journal after months of patient fieldwork"
)
SPAM = "buy now " * 40
WITH_PII = CLEAN + " contact maria.lopez@example.org for the dataset"


def test_stream_gate_routes_and_redacts(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "b1.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 1, "text": CLEAN},
                {"doc_id": 2, "text": SPAM},
                {"doc_id": 3, "text": WITH_PII},
            ]
        )
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )

    gated = gopher_rules(stream, "text")
    out = redact_pii(gated, "text").select(
        "doc_id", "keep", "low_repetition", "n_email", "redacted"
    )
    q = (
        out.writeStream.partitionBy("keep")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .option("path", str(tmp_path / "out"))
        .trigger(availableNow=True)
        .format("parquet")
        .start()
    )
    q.awaitTermination()

    rows = {
        r["doc_id"]: r for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # the partition column round-trips as its string path value
    assert rows[1]["keep"] == "true"
    assert rows[2]["keep"] == "false" and rows[2]["low_repetition"] is False
    assert rows[3]["n_email"] == 1 and "[EMAIL]" in rows[3]["redacted"]
    assert "maria.lopez" not in rows[3]["redacted"]
    # physical routing: rejects live under keep=false
    reject_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out"))
        .where(F.col("keep") == "false")
        .collect()
    }
    assert reject_ids == {2}


def test_stream_scores_with_batch_trained_classifier(spark, tmp_path):
    """The trained-model deployment story: train the quality classifier
    in BATCH (operators/classifier.py), freeze the weights, and score a
    STREAM inside foreachBatch — the same sink seam every other sink in
    streaming/pipeline.py uses (score_logreg aggregates per doc, which
    append-mode streaming would reject without a watermark; per-batch
    scoring is the standard model-deployment shape). Streamed scores
    must equal batch scores for the same rows."""
    import json as _json
    import os

    from npm_mirror_spark.operators.classifier import (
        hashed_features,
        score_logreg,
        train_logreg,
    )
    from npm_mirror_spark.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf_dir, "documents").limit(60)
    labels = docs.select(
        "doc_id", F.col("text").contains("spark").cast("int").alias("label")
    )
    model = train_logreg(hashed_features(docs, dim=64), labels, dim=64, iters=4)

    rows = docs.select("doc_id", "text").collect()
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "b1.jsonl").write_text(
        "\n".join(
            _json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) for r in rows
        )
    )
    out_dir = str(tmp_path / "scored")

    def score_batch(batch_df, _batch_id):
        score_logreg(hashed_features(batch_df, dim=64), model).write.mode(
            "append"
        ).parquet(out_dir)

    stream = spark.readStream.schema("doc_id long, text string").json(str(feed))
    q = (
        stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: (round(r["score"], 9), r["pred"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r["doc_id"]: (round(r["score"], 9), r["pred"])
        for r in score_logreg(hashed_features(docs, dim=64), model).collect()
    }
    assert got == want
