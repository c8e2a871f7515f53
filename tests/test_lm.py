"""Unigram-LM perplexity scoring (operators/text.py::unigram_nll).

q_lm_nll is rows-only in the driver (libm ln/exp, no cross-engine
oracle — see the operator docstring); this file is its correctness
contract: value parity with a pure-Python reference, the unseen-token
smoothing path, and the broadcast plan shape.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb
import pytest

from npm_mirror_spark.operators.text import unigram_nll
from npm_mirror_spark.tables import load_table


def _py_nll(texts: dict[int, str], lm_texts: list[str], k: float = 1.0):
    def toks(t):
        return re.sub(r"\s+", " ", t.lower()).strip().split(" ")

    c = Counter(t for txt in lm_texts for t in toks(txt))
    T, V = sum(c.values()), len(c)
    out = {}
    for i, txt in texts.items():
        lps = [math.log((c[t] + k) / (T + k * V)) for t in toks(txt)]
        out[i] = (len(lps), -sum(lps) / len(lps))
    return out


def test_self_perplexity_matches_python_reference(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    ref = _py_nll({i: t for i, t in rows}, [t for _, t in rows])
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll"], r["ppl"])
        for r in unigram_nll(load_table(spark, sf_dir, "documents")).collect()
    }
    assert set(got) == set(ref)
    for i, (n, nll) in ref.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(nll, rel=1e-12)
        assert got[i][2] == pytest.approx(math.exp(nll), rel=1e-12)


def test_unseen_tokens_take_smoothed_floor(spark):
    lm = spark.createDataFrame(
        [(0, "aa bb aa"), (1, "bb cc")], "doc_id long, text string"
    )
    docs = spark.createDataFrame([(7, "aa zz")], "doc_id long, text string")
    row = unigram_nll(docs, lm_docs=lm).first()
    # LM: c(aa)=2, c(bb)=2, c(cc)=1, T=5, V=3 -> p(aa)=3/8, p(zz)=1/8
    want = -(math.log(3 / 8) + math.log(1 / 8)) / 2
    assert row["n_tokens"] == 2
    assert row["nll"] == pytest.approx(want, rel=1e-12)


def test_lm_join_is_broadcast(spark, sf_dir):
    plan = (
        unigram_nll(load_table(spark, sf_dir, "documents"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


# -- bigram (interpolated) LM -------------------------------------------------


def _py_bigram_nll(
    texts: dict[int, str], lm_texts: list[str], k: float = 1.0, lam: float = 0.7
):
    def toks(t):
        return re.sub(r"\s+", " ", t.lower()).strip().split(" ")

    uni = Counter(t for txt in lm_texts for t in toks(txt))
    T, V = sum(uni.values()), len(uni)
    bi = Counter()
    hist = Counter()
    for txt in lm_texts:
        ts = toks(txt)
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] += 1
            hist[a] += 1
    out = {}
    for i, txt in texts.items():
        ts = toks(txt)
        lps = []
        for a, b in zip(ts, ts[1:]):
            p_bi = (bi[(a, b)] + k) / (hist[a] + k * V)
            p_uni = (uni[b] + k) / (T + k * V)
            lps.append(math.log(lam * p_bi + (1 - lam) * p_uni))
        if lps:
            out[i] = (len(lps), -sum(lps) / len(lps))
    return out


def test_bigram_matches_python_reference(spark, sf_dir):
    from npm_mirror_spark.operators.text import bigram_nll

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' LIMIT 200"
    ).fetchall()
    texts = {i: t for i, t in rows}
    ref = _py_bigram_nll(texts, [t for _, t in rows])
    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 200")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"], r["ppl"])
        for r in bigram_nll(docs).collect()
    }
    assert set(got) == set(ref)
    for i, (n, nll) in ref.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(nll, rel=1e-12)
        assert got[i][2] == pytest.approx(math.exp(nll), rel=1e-12)


def test_bigram_sees_word_order_unigram_cannot(spark):
    """The reason the bigram tier exists: reversing every sentence leaves
    unigram NLL untouched but must raise bigram NLL."""
    from npm_mirror_spark.operators.text import bigram_nll

    lm_rows = [(i, "the quick fox jumps over the lazy dog") for i in range(20)]
    lm = spark.createDataFrame(lm_rows, "doc_id long, text string")
    probe = spark.createDataFrame(
        [
            (100, "the quick fox jumps over the lazy dog"),
            (101, "dog lazy the over jumps fox quick the"),
        ],
        "doc_id long, text string",
    )
    b = {r["doc_id"]: r["nll"] for r in bigram_nll(probe, lm_docs=lm).collect()}
    u = {r["doc_id"]: r["nll"] for r in unigram_nll(probe, lm_docs=lm).collect()}
    assert u[100] == pytest.approx(u[101], rel=1e-12)
    assert b[101] > b[100] + 0.5


def test_bigram_short_docs_are_absent(spark):
    """< 2 tokens -> no bigram evidence -> no row (documented contract;
    callers left-join scores back and treat NULL as unscored)."""
    from npm_mirror_spark.operators.text import bigram_nll

    docs = spark.createDataFrame(
        [(0, "solo"), (1, "two tokens")], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in bigram_nll(docs).collect()}
    assert got == {1}
