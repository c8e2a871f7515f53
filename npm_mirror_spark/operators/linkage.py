"""Record linkage: blocked pairwise scoring (Fellegi–Sunter style).

Entity resolution across tables that share no key — the structured-data
sibling of text dedup (operators/dedup.py): candidate pairs come from
EQUI-JOIN BLOCKING (never a cross product), each candidate is scored by
a sum of per-field agree/disagree weights (integer log-likelihood
surrogates, Fellegi & Sunter 1969 — public literature), and an optional
argmax keeps the best match per left record.

Scale shape: the block join is the ONLY corpus-sized shuffle, keyed on
the blocking columns — block-size skew is the quality/cost knob exactly
as in LSH banding (a too-coarse block is the celebrity-key problem;
measure with operators/skew.py::skew_report before running at 100 TB).
Field comparators are in-row JVM expressions (levenshtein, abs, equality
— whole-stage codegen, no Python); the best-match window partitions by
the left id, bounded by that record's block fan-out.

Determinism contract: integer weights summed over boolean matches; NULL
in any compared field counts as DISAGREEMENT (never NULL-poisons the
score); levenshtein and abs-diff thresholds are exact — the whole score
replays relationally, which is what makes q_record_linkage
oracle-checkable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# rule kinds: ("exact", None) | ("levenshtein", max_dist) | ("absdiff", max_abs)
Rule = tuple[str, str, str, str, object, int, int]


def _match(kind: str, param, ca: Column, cb: Column) -> Column:
    if kind == "exact":
        m = ca == cb
    elif kind == "levenshtein":
        m = F.levenshtein(ca, cb) <= F.lit(int(param))
    elif kind == "absdiff":
        m = F.abs(ca - cb) <= F.lit(float(param))
    else:  # pragma: no cover - caller contract
        raise ValueError(f"unknown comparator kind: {kind}")
    # NULL field -> disagreement, not a NULL score
    return F.coalesce(m, F.lit(False))


def link_records(
    a: DataFrame,
    b: DataFrame,
    block_on: list[tuple[str, str]],
    rules: list[Rule],
    min_score: int,
    a_id: str | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Score blocked candidate pairs; keep score >= min_score.

    ``block_on``: [(a_col, b_col)] equi blocking keys — the join
    condition, hence the only corpus shuffle.  ``rules``: one tuple
    (name, a_col, b_col, kind, param, agree_w, disagree_w) per compared
    field; the output carries a boolean ``m_<name>`` per rule plus the
    integer ``score``.  Column names of ``a`` and ``b`` must be
    disjoint (caller renames).  With ``a_id`` set, only the best match
    per left record survives (score desc, then ``tie_cols`` asc — pass
    a unique right key to make the argmax total).
    """
    overlap = set(a.columns) & set(b.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, shared: {sorted(overlap)}")
    cond = reduce(
        lambda x, y: x & y, [a[ka] == b[kb] for ka, kb in block_on]
    )
    j = a.join(b, cond)
    matches = {
        f"m_{name}": _match(kind, param, a[ca], b[cb])
        for name, ca, cb, kind, param, _, _ in rules
    }
    score = reduce(
        lambda x, y: x + y,
        [
            F.when(matches[f"m_{name}"], F.lit(int(aw))).otherwise(F.lit(int(dw)))
            for name, _, _, _, _, aw, dw in rules
        ],
    )
    out = j.select(
        *[a[c] for c in a.columns],
        *[b[c] for c in b.columns],
        *[m.alias(n) for n, m in matches.items()],
        score.cast("int").alias("score"),
    ).where(F.col("score") >= F.lit(int(min_score)))
    if a_id is not None:
        order = [F.desc("score")] + [F.asc(c) for c in (tie_cols or [])]
        w = Window.partitionBy(a_id).orderBy(*order)
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    return out
