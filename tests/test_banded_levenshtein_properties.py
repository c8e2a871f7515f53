"""Property adversaries for the r10 banded-Levenshtein refactor.

edit1_join/edit2_join verify candidates with ``levenshtein(a, b, k)``
(Spark's diagonal-band DP) instead of the full O(len^2) DP.  The
refactor is only sound if the banded form returns the EXACT distance
whenever it is <= k and a sentinel (-1) otherwise — a threshold-form
bug would silently change which pairs the fuzzy joins emit.  These
properties pin that contract against both the full-DP Spark expression
and a pure-Python reference, over adversarial short strings (repeats,
shared prefixes, transpositions — the regimes deletion-neighborhood
blocking actually feeds the verifier)."""

from __future__ import annotations

import pytest as _pytest

# slow tier (r15, r14 verdict item 1): algorithm re-derivation /
# brute-force sweep suite — guards development-time regressions,
# not per-round results.  Runs with --runslow / SPARK_GRAFT_SLOW_TESTS=1.
pytestmark = _pytest.mark.slow


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


_ALPHA = st.text(alphabet="abc ", min_size=0, max_size=8)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=st.lists(st.tuples(_ALPHA, _ALPHA), min_size=1, max_size=24))
def test_banded_levenshtein_exact_within_threshold(spark, pairs):
    """For every threshold k in {1, 2}: banded == full DP when full <= k,
    and banded == -1 when full > k.  One Spark job per example batch."""
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(
        "a",
        "b",
        F.levenshtein("a", "b").alias("full"),
        F.levenshtein("a", "b", 1).alias("t1"),
        F.levenshtein("a", "b", 2).alias("t2"),
    ).collect()
    for r in rows:
        ref = _py_lev(r["a"], r["b"])
        assert r["full"] == ref, (r["a"], r["b"])
        assert r["t1"] == (ref if ref <= 1 else -1), (r["a"], r["b"])
        assert r["t2"] == (ref if ref <= 2 else -1), (r["a"], r["b"])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(names=st.lists(st.text(alphabet="ab", min_size=1, max_size=6),
                      min_size=2, max_size=12, unique=True))
def test_edit1_join_matches_brute_force(spark, names):
    """End-to-end: edit1_join over random short keys equals the all-pairs
    brute force (every i<j pair with true distance <= 1) — blocking must
    be lossless and hashed keys / banded verify must not change the
    emitted pair set or its dist values."""
    from npm_mirror_spark.operators.dedup import edit1_join

    df = spark.createDataFrame(list(enumerate(names)), "id long, s string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit1_join(df, "s", "id").collect()
    }
    want = {
        (i, j, _py_lev(a, b))
        for i, a in enumerate(names)
        for j, b in enumerate(names)
        if i < j and _py_lev(a, b) <= 1
    }
    assert got == want
