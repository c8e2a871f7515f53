"""Property fuzz for the change-feed parser (S3/F9): ARBITRARY bytes on
the feed must never fail the batch — malformed lines parse to a null
struct and get routed (the reference's catch-all at
changes_consumer.py:393-405), valid change lines round-trip their seq,
and the row count is conserved (nothing silently dropped)."""

from __future__ import annotations

import pytest as _pytest

# slow tier (r15, r14 verdict item 1): algorithm re-derivation /
# brute-force sweep suite — guards development-time regressions,
# not per-round results.  Runs with --runslow / SPARK_GRAFT_SLOW_TESTS=1.
pytestmark = _pytest.mark.slow


import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from npm_mirror_spark.sources.changes import parse_changes

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# garbage lines: truncated JSON, wrong types, control-char payloads
_GARBAGE = st.one_of(
    st.text(min_size=0, max_size=40),
    st.text(alphabet="{}[],:\"'\\", min_size=1, max_size=20),
    st.just('{"seq": "not-an-int", "id": 3}'),
    st.just('{"seq": 1, "doc": "not-an-object"}'),
)

_VALID_SEQS = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=1, max_size=10,
    unique=True,
)


@settings(**_SETTINGS)
@given(seqs=_VALID_SEQS, garbage=st.lists(_GARBAGE, min_size=0, max_size=10))
def test_parser_conserves_rows_and_routes_malformed(spark, seqs, garbage):
    valid = [
        json.dumps(
            {"seq": s, "id": f"pkg{s}", "deleted": False, "doc": {"_id": f"pkg{s}"}}
        )
        for s in seqs
    ]
    lines = valid + garbage
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    out = parse_changes(raw).cache()
    try:
        # row conservation: permissive mode never drops a line
        assert out.count() == len(lines)
        # every valid line round-trips its seq
        got_seqs = {
            r["seq"]
            for r in out.filter(F.col("seq").isNotNull()).collect()
        }
        assert set(seqs) <= got_seqs
        # every line is either parsed or routable by the null-doc filter —
        # the F9 catch-all sees exactly the rows with no usable doc
        routable = out.filter(F.col("doc").isNull()).count()
        parsed_docs = out.filter(F.col("doc").isNotNull()).count()
        assert routable + parsed_docs == len(lines)
        assert parsed_docs >= len(seqs)  # all valid docs parse
    finally:
        out.unpersist()
