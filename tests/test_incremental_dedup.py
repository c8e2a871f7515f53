"""IncrementalDeduper: a document stream dedups against (a) itself within
the micro-batch, (b) the growing LSH index of previously accepted docs,
(c) re-delivered ids after a checkpoint replay — and the corpus itself is
never rescanned, only its band index."""

from __future__ import annotations

import json

from npm_mirror_spark.streaming.incremental_dedup import IncrementalDeduper

A = "the quick brown fox jumps over the lazy dog near the river bank today"
B = "completely unrelated legal contract concerning maritime insurance obligations and arbitration clauses"
C = "chocolate cake recipe requires flour butter sugar eggs vanilla and patient slow baking"


def _write(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _drain(spark, feed, out, schema="doc_id long, text string"):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    d = IncrementalDeduper(spark, str(out))
    q = d.start(stream)
    q.awaitTermination()
    return d


def test_intra_batch_cross_batch_and_replay_dedup(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    out = tmp_path / "out"
    # batch 1: 2 is an exact dup of 1 (same id wins by lowest id); 3 is new
    _write(feed / "b1.jsonl", [
        {"doc_id": 1, "text": A},
        {"doc_id": 2, "text": A},
        {"doc_id": 3, "text": B},
    ])
    # batch 2: 4 duplicates ACCEPTED doc 1 across batches; 5 is new
    _write(feed / "b2.jsonl", [
        {"doc_id": 4, "text": A},
        {"doc_id": 5, "text": C},
    ])
    d = _drain(spark, feed, out)

    accepted = {r["doc_id"] for r in d.accepted().collect()}
    assert accepted == {1, 3, 5}
    # index holds exactly the accepted docs' band rows
    idx = d.index()
    assert {r["doc_id"] for r in idx.select("doc_id").distinct().collect()} == {1, 3, 5}

    # restart the SAME checkpoint with one more file: drained batches do
    # not reprocess; a re-sent accepted id and a fuzzy dup of C both drop
    _write(feed / "b3.jsonl", [
        {"doc_id": 3, "text": B},
        {"doc_id": 7, "text": C},
        {"doc_id": 8, "text": "genuinely novel sentence about volcanic geology and basalt columns forming hexagons"},
    ])
    d2 = _drain(spark, feed, out)
    accepted2 = {r["doc_id"] for r in d2.accepted().collect()}
    assert accepted2 == {1, 3, 5, 8}


def test_bootstrap_then_stream(spark, tmp_path):
    """Bulk-index an existing corpus, then stream increments against it:
    history dups reject, novel docs accept."""
    corpus = spark.createDataFrame(
        [(100, A), (101, B)], "doc_id long, text string"
    )
    out = tmp_path / "out"
    d = IncrementalDeduper(spark, str(out))
    d.bootstrap(corpus)
    assert {r["doc_id"] for r in d.accepted().collect()} == {100, 101}

    feed = tmp_path / "feed"
    feed.mkdir()
    _write(feed / "b1.jsonl", [
        {"doc_id": 200, "text": A},   # dup of bootstrapped history
        {"doc_id": 201, "text": C},   # novel
    ])
    d2 = _drain(spark, feed, out)
    assert {r["doc_id"] for r in d2.accepted().collect()} == {100, 101, 201}
