"""Model registry (model_store.py) + the model-gated release stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from npm_mirror_spark.model_store import load_model, save_model
from npm_mirror_spark.operators.classifier import (
    hashed_features,
    score_logreg,
    train_logreg,
)
from npm_mirror_spark.tables import load_table


def _trained(spark, sf_dir, dim=64):
    docs = load_table(spark, sf_dir, "documents").limit(120)
    labels = docs.select(
        "doc_id", F.col("text").contains("spark").cast("int").alias("label")
    )
    return docs, train_logreg(
        hashed_features(docs, dim=dim), labels, dim=dim, iters=3
    )


def test_logreg_round_trip_scores_identically(spark, sf_dir, tmp_path):
    docs, model = _trained(spark, sf_dir)
    p = save_model(str(tmp_path / "m" / "quality.json"), model, kind="logreg")
    loaded = load_model(p, kind="logreg")
    a = score_logreg(hashed_features(docs, dim=64), loaded).collect()
    b = score_logreg(hashed_features(docs, dim=64), model).collect()
    assert sorted((r["doc_id"], r["score"]) for r in a) == sorted(
        (r["doc_id"], r["score"]) for r in b
    )


def test_kind_mismatch_fails_loudly(tmp_path):
    p = save_model(str(tmp_path / "x.json"), {"merges": [["a", "b"]]}, kind="bpe")
    with pytest.raises(ValueError, match="kind='bpe'"):
        load_model(p, kind="logreg")
    bpe = load_model(p, kind="bpe")
    assert bpe["merges"] == [("a", "b")]


def test_bpe_round_trip_segments_identically(spark, sf_dir, tmp_path):
    from npm_mirror_spark.operators.tokenizer import bpe_segment, train_bpe

    docs = load_table(spark, sf_dir, "documents").limit(50)
    model = train_bpe(docs, n_merges=30)
    p = save_model(str(tmp_path / "bpe.json"), model, kind="bpe")
    loaded = load_model(p, kind="bpe")
    assert loaded["merges"] == model["merges"]
    assert bpe_segment("sparkling", loaded["merges"]) == bpe_segment(
        "sparkling", model["merges"]
    )


def test_model_gated_release(spark, sf_dir, tmp_path):
    """build_release with a trained quality_model: the model gate must
    only ever REMOVE rows relative to the ungated run, the audit
    reflects it, and the committed snapshot round-trips."""
    from npm_mirror_spark.release import build_release
    from npm_mirror_spark.snapshot_store import SnapshotStore

    docs = load_table(spark, sf_dir, "documents").limit(150)
    bench = spark.createDataFrame(
        [(1, "benchmark question text unlikely to collide")], "bid long, text string"
    )
    _, model = _trained(spark, sf_dir)

    plain = build_release(
        spark, docs, bench, str(tmp_path / "plain"), capacity=256
    )
    gated = build_release(
        spark, docs, bench, str(tmp_path / "gated"), capacity=256,
        quality_model=model, min_model_score=0.5,
    )
    assert gated["n_after_quality"] <= plain["n_after_quality"]
    assert gated["n_released"] <= plain["n_released"]
    # advice finding: rule-gate and model-gate attrition are separate —
    # the model's independent kill count must be recoverable
    assert gated["n_rule_pass"] == plain["n_rule_pass"]
    assert gated["n_model_pass"] <= gated["n_rule_pass"]
    assert gated["n_after_quality"] == gated["n_model_pass"]
    # no model gate -> pass-through equality
    assert plain["n_model_pass"] == plain["n_rule_pass"] == plain["n_after_quality"]
    got = SnapshotStore(spark, str(tmp_path / "gated")).read(gated["version"])
    assert got.count() == gated["n_released"]
