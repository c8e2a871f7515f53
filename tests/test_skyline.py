"""Skyline operator: the prefix-max reduction must agree with the
textbook NOT-EXISTS dominance definition (Börzsönyi et al., ICDE'01)
computed brute-force, on synthetic edge cases and on real table data."""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_mirror_spark.operators.skyline import skyline2d


def _brute_skyline(rows, mn, mx):
    """O(n^2) NOT EXISTS form: p survives iff no q is <= on mn, >= on
    mx, and strictly better on at least one axis."""
    out = []
    for p in rows:
        dominated = any(
            q[mn] <= p[mn]
            and q[mx] >= p[mx]
            and (q[mn] < p[mn] or q[mx] > p[mx])
            for q in rows
        )
        if not dominated:
            out.append(p)
    return out


def _key(rows, mn, mx, extra):
    return sorted((r[mn], r[mx], r[extra]) for r in rows)


def test_skyline_synthetic_edge_cases(spark):
    # ties on both axes (duplicates co-survive), ties on one axis,
    # strictly dominated interior points, a single-point frontier step
    data = [
        (1, 10.0, 5),   # frontier
        (2, 10.0, 5),   # exact duplicate of 1 -> co-survives
        (3, 10.0, 4),   # same price, worse size -> dominated by 1
        (4, 12.0, 5),   # worse price, same size -> dominated by 1
        (5, 11.0, 7),   # frontier (pays more, gets more)
        (6, 11.5, 7),   # dominated by 5 (same size, pricier)
        (7, 20.0, 9),   # frontier
        (8, 25.0, 8),   # dominated by 7
        (9, 9.0, 1),    # frontier (cheapest)
    ]
    df = spark.createDataFrame(data, ["id", "price", "size"])
    got = [r.asDict() for r in skyline2d(df, "price", "size").collect()]
    want = _brute_skyline(
        [dict(zip(("id", "price", "size"), t)) for t in data],
        "price",
        "size",
    )
    assert _key(got, "price", "size", "id") == _key(
        want, "price", "size", "id"
    )
    assert {r["id"] for r in got} == {1, 2, 5, 7, 9}


def test_skyline_matches_not_exists_on_part(spark, sf_dir):
    from npm_mirror_spark.tables import load_table

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    got = [
        r.asDict()
        for r in skyline2d(part, "p_retailprice", "p_size").collect()
    ]
    rows = [r.asDict() for r in part.collect()]
    want = _brute_skyline(rows, "p_retailprice", "p_size")
    assert _key(got, "p_retailprice", "p_size", "p_partkey") == _key(
        want, "p_retailprice", "p_size", "p_partkey"
    )
    assert 0 < len(got) < len(rows)


def test_prior_max_is_strictly_prior(spark):
    """_with_prior_max over a distinct axis: __prior_max at x must be
    max(val over order < x), NULL at the minimum."""
    from npm_mirror_spark.operators.skyline import _with_prior_max

    data = [(1, 3), (2, 9), (4, 1), (7, 5), (9, 9)]
    g = spark.createDataFrame(data, ["o", "v"])
    got = {
        r["o"]: r["__prior_max"]
        for r in _with_prior_max(g, "o", "v", n_buckets=2).collect()
    }
    assert got == {1: None, 2: 3, 4: 9, 7: 9, 9: 9}
