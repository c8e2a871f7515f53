"""Ingest robustness at fleet scale: a 100 TB corpus accumulated over
months WILL contain schema drift (columns added by newer writers) and
the odd corrupt object. These tests pin the engine's posture for both —
the knobs are Spark-native, but silently relying on them unpinned is
how pipelines break on the first drifted shard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_schema_evolution_merge(spark, tmp_path):
    """Older shards lack the column a newer writer added: mergeSchema
    reads both generations; the old shard's rows surface NULL for the
    new column (never a misaligned value)."""
    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "alpha")], "doc_id long, text string"
    ).write.parquet(p + "/gen=1")
    spark.createDataFrame(
        [(2, "beta", "en")], "doc_id long, text string, lang string"
    ).write.parquet(p + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    # (gen=N dirs surface as a partition column — expected)
    assert set(merged.columns) == {"doc_id", "text", "lang", "gen"}
    rows = {r["doc_id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: "en"}

    # without mergeSchema the schema comes from one footer — the lang
    # column may silently vanish; pin that THIS is why we always merge
    plain = spark.read.parquet(p)
    assert set(plain.columns) <= {"doc_id", "text", "lang", "gen"}


def test_corrupt_file_is_skippable_not_fatal(spark, tmp_path):
    """One rotten object in a million-file scan must be a logged skip,
    not a dead job: ignoreCorruptFiles drops it; the default posture
    fails loudly (also asserted — silent default skipping would be a
    correctness hazard)."""
    p = tmp_path / "scan"
    p.mkdir()
    spark.createDataFrame(
        [(1, "good")], "doc_id long, text string"
    ).write.parquet(str(p / "ok.parquet"))
    (p / "bad.parquet" / "part-00000.parquet").parent.mkdir()
    (p / "bad.parquet" / "part-00000.parquet").write_bytes(b"PAR1 this is not parquet")

    # schema given explicitly: inference itself would read the corrupt
    # footer (and at fleet scale you pin schemas anyway)
    schema = "doc_id long, text string"
    good = (
        spark.read.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .parquet(str(p / "*.parquet"))
        .agg(F.count(F.lit(1)))
        .first()[0]
    )
    assert good == 1

    with pytest.raises(Exception):
        spark.read.schema(schema).parquet(str(p / "*.parquet")).count()
