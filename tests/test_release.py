"""build_release: the five-stage curation pipeline end-to-end on the
fixture corpus — monotone attrition, every stage visibly firing, packed
output committed as an atomic snapshot version."""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_mirror_spark.release import build_release
from npm_mirror_spark.snapshot_store import SnapshotStore
from npm_mirror_spark.tables import load_table


def test_release_pipeline_end_to_end(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    # inject a near-dup so the dedup stage demonstrably fires
    docs = docs.unionByName(
        docs.where(F.col("doc_id") % 25 == 0).withColumn(
            "doc_id", F.col("doc_id") + 900000
        )
    )
    bench = docs.where(F.col("doc_id") % 20 == 0)
    corpus = docs.where(F.col("doc_id") % 20 != 0)

    audit = build_release(
        spark, corpus, bench, str(tmp_path / "release"), token="r1"
    )

    assert audit["version"] == 1
    assert (
        audit["n_input"]
        >= audit["n_after_quality"]
        >= audit["n_after_decontamination"]
        >= audit["n_after_dedup"]
        == audit["n_after_cap"]  # no cap requested -> pass-through
        == audit["n_released"]
    )
    # every stage dropped something on this corpus
    assert audit["n_after_quality"] < audit["n_input"]
    assert audit["n_after_dedup"] < audit["n_after_decontamination"]

    store = SnapshotStore(spark, str(tmp_path / "release"))
    released = store.read(version=1)
    assert released.count() == audit["n_released"]
    # packing columns present and internally consistent
    row = released.orderBy("doc_id").first()
    assert row["first_block"] == row["offset"] // 512

    # token replay (checkpoint recovery) must not double-commit
    audit2 = build_release(
        spark, corpus, bench, str(tmp_path / "release"), token="r1"
    )
    assert audit2["version"] == 1
    assert store.latest_version() == 1


def test_release_cap_bounds_dominant_shard(spark, sf_dir, tmp_path):
    """max_per_shard caps every source's post-dedup contribution exactly;
    smaller sources pass through whole and the audit records the cut."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    corpus = docs.where(F.col("doc_id") % 20 != 0)

    audit = build_release(
        spark, corpus, bench, str(tmp_path / "capped"),
        max_per_shard=10, token="r1",
    )
    assert audit["n_after_cap"] <= audit["n_after_dedup"]
    assert audit["n_released"] == audit["n_after_cap"]
    released = SnapshotStore(spark, str(tmp_path / "capped")).read(version=1)
    worst = (
        released.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    )
    assert worst <= 10


def test_release_diff_between_versions(spark, sf_dir, tmp_path):
    """Two releases with different caps: the diff reports per-source
    removals for the tightened cap and no additions."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    root = str(tmp_path / "store")

    a1 = build_release(spark, corpus, bench, root, max_per_shard=10, token="r1")
    a2 = build_release(spark, corpus, bench, root, max_per_shard=5, token="r2")
    assert (a1["version"], a2["version"]) == (1, 2)

    from npm_mirror_spark.release import release_diff

    store = SnapshotStore(spark, root)
    diff = {r["source"]: (r["n_added"], r["n_removed"])
            for r in release_diff(store, 1, 2).collect()}
    assert diff, "diff must be non-empty when the cap tightened"
    for src, (added, removed) in diff.items():
        assert added == 0, f"{src}: tightening the cap cannot add docs"
        assert removed > 0
    # v2 is a full-replacement snapshot (build_release commits with
    # replace=True): its manifest holds ONLY the newly capped rows, so
    # removals per source equal v1's count minus v2's count; with
    # deterministic hash order the kept 5 are a subset of the kept 10
    v1 = SnapshotStore(spark, root).read(1)
    assert v1.count() == a1["n_released"]


def test_cut_mode_release_retains_more_rows_and_no_bench_grams(spark, sf_dir, tmp_path):
    """decontam_mode='cut' keeps (at least as many) documents as the
    boolean drop gate while still shipping zero benchmark n-grams."""
    import pytest

    docs = load_table(spark, sf_dir, "documents").limit(200)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    corpus = docs.where(F.col("doc_id") % 20 != 0)

    drop = build_release(
        spark, corpus, bench, str(tmp_path / "drop"), decontam_ngram=3
    )
    cut = build_release(
        spark, corpus, bench, str(tmp_path / "cut"),
        decontam_ngram=3, decontam_mode="cut",
    )
    assert cut["n_after_decontamination"] >= drop["n_after_decontamination"]
    # no benchmark trigram survives in the cut release's text
    from npm_mirror_spark.operators.curation import (
        benchmark_shingles,
        decontaminate,
    )

    released = SnapshotStore(spark, str(tmp_path / "cut")).read(cut["version"])
    still = decontaminate(released, bench, "text", "doc_id", 3).where(
        F.col("contaminated")
    )
    assert still.count() == 0
    with pytest.raises(ValueError, match="decontam_mode"):
        build_release(spark, corpus, bench, str(tmp_path / "bad"),
                      decontam_mode="nope")


def test_cut_mode_preserves_untouched_text_bytes(spark, tmp_path):
    """Review finding: an uncontaminated doc must ship its ORIGINAL
    byte-exact text in cut mode — clean_text's normalized rebuild may
    only replace documents that actually lost a span."""
    bench = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    pristine = (
        "This Document Keeps Mixed Case and   doubled spacing while the "
        "narrative wanders through gardens, harbors, libraries and train "
        "stations collecting distinct vocabulary so every trigram stays "
        "unique and the quality gate is satisfied without any repetition."
    )
    quoting = (
        "this long enough document mentions that the secret benchmark "
        "answer is forty two exactly which leaks and it keeps going with "
        "plenty of additional words to satisfy the gate afterwards here"
    )
    docs = spark.createDataFrame(
        [(1, pristine, "s"), (2, quoting, "s")],
        "doc_id long, text string, source string",
    )
    audit = build_release(
        spark, docs, bench, str(tmp_path / "st"),
        decontam_ngram=3, decontam_mode="cut", capacity=512,
    )
    released = {
        r["doc_id"]: r["text"]
        for r in SnapshotStore(spark, str(tmp_path / "st"))
        .read(audit["version"]).collect()
    }
    assert released[1] == pristine, "untouched text must stay byte-exact"
    if 2 in released:
        assert "secret benchmark answer" not in released[2]


def test_contract_gate_aborts_and_records(spark, sf_dir, tmp_path):
    """The input contract gate: a failing constraint aborts the release
    BEFORE any curation work; enforce_contracts=False records the
    verdicts in the audit and proceeds; a passing contract is invisible
    except for its audit entry."""
    import pytest

    docs = load_table(spark, sf_dir, "documents").limit(100)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    # doc_id repeats nowhere -> passes; source repeats -> fails
    passing = [("ids_unique", "uniqueness", "doc_id", 1.0)]
    failing = passing + [("source_unique", "uniqueness", "source", 1.0)]

    with pytest.raises(ValueError, match="source_unique"):
        build_release(
            spark, corpus, bench, str(tmp_path / "gated"),
            contracts=failing,
        )

    audit = build_release(
        spark, corpus, bench, str(tmp_path / "recorded"),
        contracts=failing, enforce_contracts=False, token="r1",
    )
    assert audit["contracts"]["ids_unique"]["ok"] is True
    assert audit["contracts"]["source_unique"]["ok"] is False
    assert audit["n_released"] > 0  # record-only mode still releases

    audit2 = build_release(
        spark, corpus, bench, str(tmp_path / "clean"),
        contracts=passing, token="r1",
    )
    assert audit2["contracts"] == {"ids_unique": {"metric": 1.0, "ok": True}}
