"""Filters / predicates / routing (SURVEY.md §2.3, F1-F10).

These are plain Catalyst predicates. Expressed declaratively they are pushed
down to the parquet scan (``PushedFilters`` in .explain) — the reference had
to hand-order its size check before the download (mirror.ts:107,119 vs the
consumer's late filter at changes_consumer.py:149-199); Catalyst does that
re-ordering for free as long as no Python UDF sits in between.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the reference's MAX_SIZE = 10e6 (changes_consumer.py:20)
MAX_SIZE = 10_000_000


def filter_not_null(df: DataFrame, *cols: str) -> DataFrame:
    """F1: skip change if ``doc`` missing (changes_consumer.py:129-130)."""
    out = df
    for c in cols:
        out = out.filter(F.col(c).isNotNull())
    return out


def filter_max_size(df: DataFrame, size_col: str, max_size: float = MAX_SIZE) -> DataFrame:
    """F2/F3: size threshold. In the row model the doc and its tarball are
    columns of one row, so F4's cascading invalidation (delete the pair,
    changes_consumer.py:175-199) collapses into a single row drop.
    """
    return df.filter(F.col(size_col) <= F.lit(max_size))


def filter_http_ok(df: DataFrame, status_col: str = "fetch_status") -> DataFrame:
    """F5: keep only status==200 downloads (changes_consumer.py:167,190-199)."""
    return df.filter(F.col(status_col) == 200)


def route_by_flag(
    df: DataFrame,
    flag: Column | str,
    when_true: str,
    when_false: str,
    out_col: str = "route",
) -> DataFrame:
    """F6: deleted-flag routing (changes_consumer.py:256-264) as a routing
    column — downstream sinks filter on it; one plan, no duplicated scans.
    """
    f = F.col(flag) if isinstance(flag, str) else flag
    return df.withColumn(out_col, F.when(f, F.lit(when_true)).otherwise(F.lit(when_false)))


def retention_eligible(
    df: DataFrame, mod_cnt: str, ver_cnt: str, slack: int = 2
) -> DataFrame:
    """F7: run GC only when ``len(time) - len(versions) == 2`` — i.e. only
    the implicit 'created'+'modified' keys are extra, so no versions were
    unpublished (changes_consumer.py:249-254).
    """
    return df.filter((F.col(mod_cnt) - F.col(ver_cnt)) == slack)


def stage_router(df: DataFrame, stage_expr: Column, out_col: str = "stage") -> DataFrame:
    """F8/F9/K2: tag each row with its destination stage topic; the
    streaming sink fans out per stage inside one foreachBatch — one routed
    DataFrame replaces the reference's five imperative produce calls
    (changes_consumer.py:332-370).
    """
    return df.withColumn(out_col, stage_expr)
