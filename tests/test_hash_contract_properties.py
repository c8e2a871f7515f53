"""Property-based cross-engine adversary for the md5 hash contract —
``md5_hash64`` / ``md5_key64`` are the primitive under every sketch
register, LSH bucket, epoch-shuffle rank and split assignment; their
DuckDB replay expression (('0x' || substr(md5(v), 1, 15))::BIGINT) is
embedded in dozens of oracles.  The oracles exercise it only over
fixture values; this adversary feeds ARBITRARY unicode through both
engines and demands bit equality."""

from __future__ import annotations

import pytest as _pytest

# slow tier (r15, r14 verdict item 1): algorithm re-derivation /
# brute-force sweep suite — guards development-time regressions,
# not per-round results.  Runs with --runslow / SPARK_GRAFT_SLOW_TESTS=1.
pytestmark = _pytest.mark.slow


import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from npm_mirror_spark.operators.dedup import md5_hash64, md5_key64

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable unicode without surrogates; includes whitespace, quotes,
# digits, CJK, emoji — everything a doc corpus throws at the hash
_TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), min_codepoint=32, max_codepoint=0x2FFFF
    ),
    min_size=0,
    max_size=60,
)


@settings(**_SETTINGS)
@given(values=st.lists(_TEXT, min_size=1, max_size=25, unique=True))
def test_md5_hash64_matches_duckdb_replay(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = {
        r["v"]: r["h"]
        for r in df.select("v", md5_hash64("v").alias("h")).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT v, ('0x' || substr(md5(v), 1, 15))::BIGINT FROM "
            "(SELECT unnest(?) AS v)",
            [values],
        ).fetchall()
    )
    assert got == want
    # 60-bit contract: non-negative and below 2^60 (conv() stays in int64)
    assert all(0 <= h < (1 << 60) for h in got.values())


@settings(**_SETTINGS)
@given(
    values=st.lists(_TEXT, min_size=1, max_size=15, unique=True),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_md5_key64_matches_duckdb_replay(spark, values, seed):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = {
        r["v"]: r["h"]
        for r in df.select("v", md5_key64("v", seed).alias("h")).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT v, ('0x' || substr(md5({seed} || ':' || v), 1, 15))"
            "::BIGINT FROM (SELECT unnest(?) AS v)",
            [values],
        ).fetchall()
    )
    assert got == want
