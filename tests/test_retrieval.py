"""BM25 ranked retrieval (operators/retrieval.py).

The rational-idf face is oracle-checked registry-wide by
test_oracle_parity (q_bm25); here the standard Lucene ``ln(1 + idf)``
face — which cannot be oracle-stable (libm) — is cross-validated against
a pure-Python reference, and the top-k plan shape is pinned.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb
import pytest

from npm_mirror_spark.operators.retrieval import bm25_topk
from npm_mirror_spark.tables import load_table

TERMS = ["spark", "join", "vector", "stream"]


def _py_bm25(sf_dir: str, terms: list[str], k1=1.2, b=0.75):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    toks = {
        i: re.sub(r"\s+", " ", t.lower()).strip().split(" ") for i, t in rows
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = Counter(t for v in toks.values() for t in set(v) if t in terms)
    scores = {}
    for i, v in toks.items():
        tf = Counter(t for t in v if t in terms)
        if not tf:
            continue
        s = 0.0
        for t, f in tf.items():
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (f * (k1 + 1)) / (f + k1 * (1 - b + b * len(v) / avgdl))
        scores[i] = s
    return scores


def test_lucene_face_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in bm25_topk(docs, TERMS, k=10, idf="lucene").collect()
    }
    ref = _py_bm25(sf_dir, TERMS)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert sorted(got) == sorted(i for i, _ in want)
    for rank, (i, s) in enumerate(want, start=1):
        # the Spark face integer-scales with floor(w * 1e6): allow 1 ulp
        # of the scaled grid per term on top of float fuzz
        assert got[i][0] == pytest.approx(s, abs=5e-6)
        assert got[i][1] == rank


def test_rational_and_lucene_faces_agree_on_single_term(spark, sf_dir):
    """For a one-term query the idf transform is monotone, so the two
    faces must return the same ranking."""
    docs = load_table(spark, sf_dir, "documents")
    a = [r["doc_id"] for r in bm25_topk(docs, ["spark"], k=10).collect()]
    c = [
        r["doc_id"]
        for r in bm25_topk(docs, ["spark"], k=10, idf="lucene").collect()
    ]
    assert a == c


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        bm25_topk(docs, TERMS, k=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_unknown_idf_variant_rejected(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="idf"):
        bm25_topk(docs, TERMS, idf="classic")
