"""Property adversaries for the LSH signature machinery: MinHash
(shingle base hash -> affine family -> per-seed min) and 16-bit SimHash
must match independent pure-Python brute-force reimplementations on
ARBITRARY text.  The oracles replay these signatures in DuckDB over
fixture corpora; this file removes the fixture limitation."""

from __future__ import annotations

import pytest as _pytest

# slow tier (r15, r14 verdict item 1): algorithm re-derivation /
# brute-force sweep suite — guards development-time regressions,
# not per-round results.  Runs with --runslow / SPARK_GRAFT_SLOW_TESTS=1.
pytestmark = _pytest.mark.slow


import hashlib
import re as _re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from npm_mirror_spark.operators.dedup import (
    MINHASH_PRIME,
    _minhash_a,
    _minhash_b,
    minhash_signature,
    simhash16,
    word_shingles,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# word-ish text: tokens of ascii letters/digits joined by messy whitespace
_WORDS = st.lists(
    st.text(
        alphabet=st.characters(
            min_codepoint=33, max_codepoint=0x2FF,
            blacklist_categories=("Cs",),
        ),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=15,
)
_SEP = st.sampled_from([" ", "  ", "\t", " \n "])


def _normalize(text: str) -> str:
    # ASCII whitespace ONLY: Java (Spark) and RE2 (DuckDB) \s does not
    # match U+00A0 etc., unlike Python's unicode-aware \s — the engines
    # are the contract.  Likewise F.trim strips ASCII space only.
    return _re.sub(r"[ \t\n\r\f\v]+", " ", text.lower()).strip(" ")


def _brute_shingles(text: str, n: int = 3) -> list[str]:
    words = _normalize(text).split(" ")
    if len(words) < n:
        return [_normalize(text)]
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def _brute_minhash(text: str, num_hashes: int = 8) -> list[int]:
    bases = [
        int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        for s in _brute_shingles(text)
    ]
    return [
        min((_minhash_a(k) * b + _minhash_b(k)) % MINHASH_PRIME for b in bases)
        for k in range(num_hashes)
    ]


def _brute_simhash(text: str) -> int:
    tokens = _normalize(text).split(" ")
    sums = [0] * 16
    for t in tokens:
        v = int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
        for j in range(16):
            sums[j] += 1 if (v >> j) & 1 else -1
    return sum(1 << j for j in range(16) if sums[j] > 0)


@settings(**_SETTINGS)
@given(words=_WORDS, sep=_SEP)
def test_minhash_signature_matches_brute_force(spark, words, sep):
    text = sep.join(words)
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        word_shingles("t").alias("sh"),
        minhash_signature("t").alias("sig"),
        simhash16("t").alias("sim"),
    ).collect()[0]
    assert list(row["sh"]) == _brute_shingles(text)
    assert list(row["sig"]) == _brute_minhash(text)
    assert row["sim"] == _brute_simhash(text)


_ASCII_WORDS = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=15,
)


@settings(**_SETTINGS)
@given(words=_ASCII_WORDS)
def test_signatures_are_whitespace_normalization_invariant(spark, words):
    """The whole dedup family's first axiom: signatures depend on the
    normalized token stream only.  (ASCII words: Unicode upper->lower is
    not bijective — 'µ' uppercases to Greek Μ — so the case round-trip
    part of this property only holds on ASCII.)"""
    messy = "  \t".join(w.upper() for w in words) + " \n"
    clean = " ".join(w.lower() for w in words)
    df = spark.createDataFrame([(messy, clean)], "a string, b string")
    row = df.select(
        minhash_signature("a").alias("sa"),
        minhash_signature("b").alias("sb"),
        simhash16("a").alias("ha"),
        simhash16("b").alias("hb"),
    ).collect()[0]
    assert list(row["sa"]) == list(row["sb"])
    assert row["ha"] == row["hb"]
