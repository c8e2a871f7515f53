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
