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
