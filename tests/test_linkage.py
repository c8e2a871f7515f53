"""Record linkage (operators/linkage.py): comparator semantics, NULL
handling, blocking, and the best-match argmax — the behaviors the value
oracle (q_record_linkage) exercises only at one parameterization."""

from __future__ import annotations

import pytest

from npm_mirror_spark.operators.linkage import link_records


def _frames(spark):
    a = spark.createDataFrame(
        [
            (1, "smith", 10, 100.0),
            (2, "jones", 10, 50.0),
            (3, "brown", 20, 75.0),
            (4, None, 10, 10.0),
        ],
        "a_id long, a_name string, a_blk int, a_val double",
    )
    b = spark.createDataFrame(
        [
            (101, "smith", 10, 101.0),   # exact name + close val to a1
            (102, "smyth", 10, 500.0),   # lev 1 from smith, far val
            (103, "jones", 30, 50.0),    # right fields, WRONG block
            (104, "brawn", 20, 70.0),    # lev 1 from brown, close val
            (105, None, 10, 10.0),       # null name
        ],
        "b_id long, b_name string, b_blk int, b_val double",
    )
    return a, b


RULES = [
    ("name", "a_name", "b_name", "levenshtein", 1, 4, -2),
    ("val", "a_val", "b_val", "absdiff", 5.0, 2, -1),
]


def test_blocking_excludes_cross_block_pairs(spark):
    a, b = _frames(spark)
    out = link_records(a, b, [("a_blk", "b_blk")], RULES, min_score=-100)
    pairs = {(r["a_id"], r["b_id"]) for r in out.collect()}
    # b103 matches a2 on every field but sits in block 30 -> never paired
    assert (2, 103) not in pairs
    assert (3, 104) in pairs


def test_scores_and_null_is_disagreement(spark):
    a, b = _frames(spark)
    out = link_records(a, b, [("a_blk", "b_blk")], RULES, min_score=-100)
    rows = {(r["a_id"], r["b_id"]): r for r in out.collect()}
    r = rows[(1, 101)]
    assert r["m_name"] and r["m_val"] and r["score"] == 6
    r = rows[(1, 102)]
    assert r["m_name"] and not r["m_val"] and r["score"] == 3
    # NULL on either side of the name rule scores as disagreement
    assert rows[(4, 101)]["m_name"] is False
    assert rows[(1, 105)]["m_name"] is False
    # null-name pair to null-name pair: still disagreement, but the val
    # rule can agree on its own
    assert rows[(4, 105)]["score"] == -2 + 2


def test_best_match_per_left_record(spark):
    a, b = _frames(spark)
    out = link_records(
        a, b, [("a_blk", "b_blk")], RULES, min_score=0,
        a_id="a_id", tie_cols=["b_id"],
    )
    rows = {r["a_id"]: r for r in out.collect()}
    # a1 has two candidates above 0 (101: 6, 102: 3) -> argmax keeps 101
    assert rows[1]["b_id"] == 101 and rows[1]["score"] == 6
    assert rows[3]["b_id"] == 104
    # one row per surviving left record
    assert out.count() == len(rows)


def test_threshold_filters(spark):
    a, b = _frames(spark)
    out = link_records(a, b, [("a_blk", "b_blk")], RULES, min_score=6)
    assert {(r["a_id"], r["b_id"]) for r in out.collect()} == {(1, 101), (3, 104)}


def test_exact_rule_and_disjoint_column_guard(spark):
    a, b = _frames(spark)
    out = link_records(
        a, b, [("a_blk", "b_blk")],
        [("name", "a_name", "b_name", "exact", None, 1, 0)],
        min_score=1,
    )
    names = {(r["a_id"], r["b_id"]) for r in out.collect()}
    assert names == {(1, 101)}  # only the exact in-block name match
    with pytest.raises(ValueError, match="disjoint"):
        link_records(a, a, [("a_blk", "a_blk")], RULES, 0)
