"""Physical-plan inspection: turn .explain() prose into assertions.

At 100 TB the difference between a good and a bad plan is not visible in a
row-count test — it's visible here: did the filter reach the parquet scan
(PushedFilters), did the scan read only projected columns (ReadSchema), did
the small side broadcast (BroadcastHashJoin), how many exchanges does the
plan pay. tests/test_plans.py pins these properties for the headline
queries so a regression in plan shape fails CI like a wrong answer would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


from contextlib import contextmanager


@contextmanager
def large_scale_plan(spark):
    """Plan as a 1000-executor run would see it: AQE off (static plan) and
    broadcast disabled (no side fits in memory). Build the DataFrame
    INSIDE this context — Datasets cache their plans."""
    was_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    was_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", was_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", was_bc)


@contextmanager
def no_aqe(spark):
    """Plan without AdaptiveSparkPlan wrapping (static-plan assertions).
    Build the DataFrame INSIDE this context — Datasets cache their plans."""
    was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", was)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    text = explain_str(df, "formatted")
    return re.findall(r"PushedFilters: \[([^\]]*)\]", text)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column names each file scan actually reads (column pruning check)."""
    text = explain_str(df, "formatted")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", text)
    return [
        [c.split(":")[0].strip() for c in s.split(",") if c.strip()] for s in schemas
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    """True if any join in the plan builds a broadcast side (equi joins
    compile to BroadcastHashJoin; non-equi ones, e.g. the ANN probe cross
    join, to BroadcastNestedLoopJoin — both avoid shuffling the big side)."""
    text = explain_str(df, "simple")
    return "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (each is a full shuffle of its input)."""
    return explain_str(df, "simple").count("Exchange ")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen subtrees the plan compiled — >0 means the
    hot path runs generated code, not interpreted expressions. (Parsed from
    the 'codegen' explain mode; the simple mode hides markers under AQE.)"""
    # NB: under AQE the static plan reports 0 subtrees until execution;
    # construct the DataFrame with spark.sql.adaptive.enabled=false when
    # asserting on this (see no_aqe() below).
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", explain_str(df, "codegen"))
    return int(m.group(1)) if m else 0
