"""Per-sink replay idempotence: each append sink must converge on batch
replay INDEPENDENTLY of the others. A foreachBatch body with two appends
has a crash point between them; Spark replays the whole batch, so the
first sink sees rows it already committed (must not duplicate) and the
second sees rows the first already 'claimed' (must not lose them)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from npm_mirror_spark.sources import changes as ch
from npm_mirror_spark.streaming.incremental_dedup import IncrementalDeduper
from npm_mirror_spark.streaming.pipeline import MirrorPipeline


def _feed(tmp_path, n=40, seed=11):
    feed = tmp_path / "feed"
    feed.mkdir()
    evs = ch.generate_changes(n=n, seed=seed)
    with open(feed / "all.jsonl", "w") as f:
        for c in evs:
            f.write(json.dumps(c) + "\n")
    return str(feed)


def test_artifact_append_survives_crash_after_mirror_write(spark, tmp_path):
    """Crash BETWEEN the mirror write and the artifact append, then replay:
    the artifact store must still receive every mirrored row exactly once.
    (Deriving artifacts from the mirror-anti-joined rows would lose them —
    the replayed batch anti-joins the already-mirrored rows away.)"""
    feed = _feed(tmp_path)
    p = MirrorPipeline(spark, str(tmp_path / "out"), with_artifacts=True)
    original_append = p.artifact_store.append
    crashed = {"yes": False}

    def flaky_append(df):
        if not crashed["yes"]:
            crashed["yes"] = True
            raise RuntimeError("injected artifact-sink crash")
        original_append(df)

    p.artifact_store.append = flaky_append
    with pytest.raises(Exception, match="injected artifact-sink crash"):
        p.run_available_now(feed)
    assert crashed["yes"]
    # the mirror write committed before the crash — replay must not
    # re-append there either
    mirrored_before = p.mirror_table().count()
    assert mirrored_before > 0

    p2 = MirrorPipeline(spark, str(tmp_path / "out"), with_artifacts=True)
    p2.run_available_now(feed)

    clean = MirrorPipeline(spark, str(tmp_path / "clean"), with_artifacts=True)
    clean.run_available_now(feed)

    got_m = sorted(r["change_seq_id"] for r in p2.mirror_table().collect())
    want_m = sorted(r["change_seq_id"] for r in clean.mirror_table().collect())
    assert got_m == want_m, "mirror rows lost or duplicated on replay"

    got_a = sorted(r["version_seq"] for r in p2.artifact_store.read().collect())
    want_a = sorted(r["version_seq"] for r in clean.artifact_store.read().collect())
    assert got_a == want_a, "artifact rows lost or duplicated on replay"
    assert len(got_a) == len(set(got_a))


A = "the quick brown fox jumps over the lazy dog near the river bank today"
B = "completely unrelated legal contract concerning maritime insurance obligations and arbitration clauses"


def test_lsh_index_append_self_heals_on_replay(spark, tmp_path):
    """Crash BETWEEN the accepted append and the index append, then replay:
    the index must regain the accepted-but-unindexed doc's band rows (a
    survivors-derived retry writes nothing — the replay guard empties the
    survivors — leaving the doc invisible to future near-dup probes)."""
    d = IncrementalDeduper(spark, str(tmp_path / "out"))
    batch = spark.createDataFrame([(1, A), (3, B)], "doc_id long, text string")
    d.process_batch(batch, 0)
    assert {r["doc_id"] for r in d.accepted().collect()} == {1, 3}

    # simulate the crash aftermath: doc 3 accepted, its index rows lost
    # (localCheckpoint truncates lineage so the overwrite of the dir being
    # read is safe, and the on-disk schema is preserved exactly)
    pruned = d.index().filter(F.col("doc_id") == 1).localCheckpoint(eager=True)
    assert pruned.count() > 0, "sanity: doc 1 has index rows"
    pruned.write.mode("overwrite").parquet(d.index_path)
    assert {r["doc_id"] for r in d.index().collect()} == {1}

    # replay of the same batch: no new accepted rows, index self-heals
    d.process_batch(batch, 0)
    acc = d.accepted()
    assert acc.count() == 2 and {r["doc_id"] for r in acc.collect()} == {1, 3}
    idx_ids = {r["doc_id"] for r in d.index().collect()}
    assert idx_ids == {1, 3}, "index did not regain the accepted doc"
    # no duplicate index rows either
    n = d.index().count()
    assert n == d.index().dropDuplicates(["doc_id", "band", "band_hash"]).count()

    # and the healed index actually rejects a near-dup of doc 3 now
    batch2 = spark.createDataFrame([(9, B)], "doc_id long, text string")
    d.process_batch(batch2, 1)
    assert 9 not in {r["doc_id"] for r in d.accepted().collect()}


def test_lsh_index_partial_band_append_self_heals(spark, tmp_path):
    """Crash DURING the index append (parquet append has no job-level
    rollback): some of a doc's band rows commit, the rest are lost. The
    heal diff runs on (doc_id, band) — an id-only diff would see the
    surviving row and skip the doc forever, leaving it only partially
    probe-visible."""
    d = IncrementalDeduper(spark, str(tmp_path / "out"))
    batch = spark.createDataFrame([(1, A), (3, B)], "doc_id long, text string")
    d.process_batch(batch, 0)
    full = d.index().filter(F.col("doc_id") == 3)
    n_bands = full.count()
    assert n_bands > 1, "fixture needs multiple bands per doc"

    # keep exactly one of doc 3's band rows; lose the rest
    pruned = (
        d.index()
        .filter((F.col("doc_id") != 3) | (F.col("band") == 0))
        .localCheckpoint(eager=True)
    )
    pruned.write.mode("overwrite").parquet(d.index_path)
    assert d.index().filter(F.col("doc_id") == 3).count() == 1

    d.process_batch(batch, 0)  # replay
    healed = d.index().filter(F.col("doc_id") == 3)
    assert healed.count() == n_bands, "missing band rows not restored"
    assert (
        d.index().count()
        == d.index().dropDuplicates(["doc_id", "band", "band_hash"]).count()
    ), "heal duplicated surviving band rows"
