"""Hilbert-curve layout key: exact known values, a pure-Python replay
adversary (the layout keys are engine-portable integers, so == not
approx), adjacency (the defining Hilbert property Morton lacks), and
the locality audit against the Z-order twin."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _hilbert_xy2d(x: int, y: int, bits: int) -> int:
    """Reference implementation of the classical rotate-and-accumulate
    loop (Wikipedia 'Hilbert curve' convert_xy_to_d)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_order1_known_values(spark):
    """The first-order curve visits (0,0) -> (0,1) -> (1,1) -> (1,0)."""
    from npm_mirror_spark.operators.layout import with_hilbert_key

    rows = [(0, 0), (0, 1), (1, 1), (1, 0)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["hkey"]
        for r in with_hilbert_key(df, ["x", "y"], bits=1).collect()
    }
    assert got == {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}


def test_hilbert_full_grid_matches_reference(spark):
    """Every cell of the 8x8 grid must match the classical loop, and the
    64 keys must be a permutation of 0..63."""
    from npm_mirror_spark.operators.layout import with_hilbert_key

    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["hkey"]
        for r in with_hilbert_key(df, ["x", "y"], bits=3).collect()
    }
    want = {(x, y): _hilbert_xy2d(x, y, 3) for x, y in rows}
    assert got == want
    assert sorted(got.values()) == list(range(64))


def test_hilbert_adjacency(spark):
    """THE Hilbert property (and the one Morton lacks): consecutive
    curve positions are always 4-neighbors — |dx| + |dy| == 1."""
    from npm_mirror_spark.operators.layout import with_hilbert_key

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        r["hkey"]: (r["x"], r["y"])
        for r in with_hilbert_key(df, ["x", "y"], bits=4).collect()
    }
    for d in range(255):
        (x0, y0), (x1, y1) = got[d], got[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (d, got[d], got[d + 1])


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 10_000)),
        min_size=2,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_hilbert_key_bit_exact_vs_python_replay(spark, rows):
    """Scaling + transform replayed in pure Python must match exactly
    (the engine-portability contract the q_zorder oracle pins for
    Morton)."""
    from npm_mirror_spark.operators.layout import with_hilbert_key

    bits = 8
    df = spark.createDataFrame(rows, "x long, y long")
    got = [
        (r["x"], r["y"], r["hkey"])
        for r in with_hilbert_key(df, ["x", "y"], bits=bits).collect()
    ]
    lox, hix = min(x for x, _ in rows), max(x for x, _ in rows)
    loy, hiy = min(y for _, y in rows), max(y for _, y in rows)
    top = (1 << bits) - 1

    def scale(v, lo, hi):
        return 0 if hi - lo <= 0 else ((v - lo) * top) // (hi - lo)

    for x, y, hkey in got:
        want = _hilbert_xy2d(scale(x, lox, hix), scale(y, loy, hiy), bits)
        assert hkey == want, (x, y, hkey, want)


def test_hilbert_locality_not_worse_than_morton(spark, sf_dir):
    """On the events fixture, the total per-shard bounding-box area of
    the Hilbert layout must not exceed the Morton layout's — the
    locality claim made in the docstring, measured by the same audit
    both faces expose."""
    from npm_mirror_spark.operators.layout import (
        hilbert_shard_stats,
        zorder_shard_stats,
    )
    from npm_mirror_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("x"),
        (F.col("value") * 100).cast("long").alias("y"),
    )

    def area(stats):
        rows = stats.collect()
        return sum(
            (r["max_x"] - r["min_x"] + 1) * (r["max_y"] - r["min_y"] + 1)
            for r in rows
        )

    a_h = area(hilbert_shard_stats(ev, ["x", "y"], bits=8, shard_bits=4))
    a_z = area(zorder_shard_stats(ev, ["x", "y"], bits=8, shard_bits=4))
    assert a_h <= a_z, (a_h, a_z)


def test_hilbert_rejects_bad_arity_and_width(spark):
    import pytest

    from npm_mirror_spark.operators.layout import with_hilbert_key

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError, match="exactly two"):
        with_hilbert_key(df, ["a", "b", "c"])
    with pytest.raises(ValueError, match="exceeds"):
        with_hilbert_key(df, ["a", "b"], bits=32)


def test_write_hilbert_clustered_roundtrip(spark, tmp_path):
    """The write path: same rows back, and per-file row groups must be
    range-clustered — each output file's x-span strictly smaller than
    the global span (the pruning payoff a planner reads)."""
    from npm_mirror_spark.operators.layout import write_hilbert_clustered

    rows = [(x, (x * 7919) % 1000) for x in range(1000)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = str(tmp_path / "hclustered")
    write_hilbert_clustered(df, out, ["x", "y"], bits=8, num_files=4)
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    stats = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    assert len(stats) >= 2
    assert all(r["hi"] - r["lo"] < 999 for r in stats)


def test_layout_keys_reject_overflowing_spans(spark):
    """r11 advisor finding: the ((v - lo) * (2^bits - 1)) scale multiply
    is bigint with no overflow guard, so a span past (2^63-1) div
    (2^bits-1) WRAPPED silently in non-ANSI mode and produced wrong
    (but deterministic) keys.  Both layout keys now stage a raise on
    such spans instead; a span just inside the bound still works."""
    import pytest

    from npm_mirror_spark.operators.layout import (
        with_hilbert_key,
        with_zorder_key,
    )

    bits = 16
    max_span = (2**63 - 1) // ((1 << bits) - 1)
    over = spark.createDataFrame(
        [(0, 0), (max_span + 1, 3)], "a long, b long"
    )
    with pytest.raises(Exception, match="overflows the int64 scale"):
        with_hilbert_key(over, ["a", "b"], bits=bits).collect()
    with pytest.raises(Exception, match="overflows the int64 scale"):
        with_zorder_key(over, ["a", "b"], bits=bits).collect()
    under = spark.createDataFrame(
        [(0, 0), (max_span, 3)], "a long, b long"
    )
    hk = {r["a"]: r["hkey"] for r in with_hilbert_key(under, ["a", "b"], bits=bits).collect()}
    zk = {r["a"]: r["zkey"] for r in with_zorder_key(under, ["a", "b"], bits=bits).collect()}
    # the max-span row scales to the TOP coordinate in both dimensions
    # exactly (review finding: the previous assertion was a tautology):
    # Morton interleave of (top, top) is all ones; Hilbert d of
    # (top, top) matches the pure-python replay
    top = (1 << bits) - 1
    assert zk[0] == 0 and hk[0] == 0
    assert zk[max_span] == (1 << (2 * bits)) - 1
    assert hk[max_span] == _hilbert_xy2d(top, top, bits)
    # a span whose subtraction itself overflows int64 must raise, not
    # silently zero every coordinate through a '<= 0' branch: under
    # ANSI (the session default) the raw hi - lo raises natively
    # (ARITHMETIC_OVERFLOW); under non-ANSI it wraps negative and the
    # operators' span < 0 staged raise catches it
    wrap = spark.createDataFrame(
        [(-(2**62), 0), (2**62, 3)], "a long, b long"
    )
    with pytest.raises(Exception, match="wrapped int64|ARITHMETIC_OVERFLOW|long overflow"):
        with_hilbert_key(wrap, ["a", "b"], bits=bits).collect()
    with pytest.raises(Exception, match="wrapped int64|ARITHMETIC_OVERFLOW|long overflow"):
        with_zorder_key(wrap, ["a", "b"], bits=bits).collect()
