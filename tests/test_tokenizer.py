"""Learned BPE tokenizer (operators/tokenizer.py).

Training is bit-deterministic (exact integer pair counts, lexicographic
tie-breaks) but a merge loop is not one SQL query, so q_bpe_encode is
rows-only; value semantics are pinned here: the Sennrich worked example,
determinism across runs, greedy-rank encode/train agreement, the decode
round-trip, and the one-shuffle training-scan plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_mirror_spark.operators.tokenizer import (
    END,
    bpe_segment,
    encode_bpe,
    train_bpe,
    word_type_counts,
)
from npm_mirror_spark.tables import load_table


def _toy(spark):
    # the classic BPE illustration corpus: {low:5, lower:2, newest:6, widest:3}
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_sennrich_worked_example(spark):
    """First merges on the classic corpus: 'es' (9 = 6 newest + 3
    widest), then 'est' (9), then 'est</w>' (9) — the canonical
    trace from the BPE paper (with end-of-word marker)."""
    model = train_bpe(_toy(spark), n_merges=3)
    assert model["merges"] == [("e", "s"), ("es", "t"), ("est", END)]


def test_training_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    a = train_bpe(docs, n_merges=40)
    b = train_bpe(docs, n_merges=40)
    assert a["merges"] == b["merges"]
    assert a["vocab_size"] == b["vocab_size"]


def test_encode_agrees_with_training_segmentation(spark):
    """Greedy rank-ordered encoding of an in-training word must equal
    the segmentation the trainer itself reached for that word."""
    model = train_bpe(_toy(spark), n_merges=10)
    seg = bpe_segment("newest", model["merges"])
    # after 10 merges on this tiny corpus 'newest</w>' is one symbol
    assert seg == ["newest" + END]
    # unseen word composed of seen parts segments into learned subwords
    assert bpe_segment("lowest", model["merges"])[-1].endswith(END)


def test_decode_round_trip(spark, sf_dir):
    """Concatenating tokens and splitting on the end-of-word marker
    reconstructs the normalized text exactly — nothing is lost."""
    docs = load_table(spark, sf_dir, "documents").limit(20)
    model = train_bpe(docs, n_merges=50)
    enc = encode_bpe(docs, model["merges"]).join(
        docs.select(
            "doc_id",
            F.trim(
                F.regexp_replace(F.lower("text"), r"\s+", " ")
            ).alias("norm"),
        ),
        "doc_id",
    )
    for r in enc.collect():
        rebuilt = "".join(r["tokens"]).replace(END, " ").strip()
        assert rebuilt == r["norm"]
        assert r["n_tokens"] == len(r["tokens"])


def test_more_merges_fewer_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    few = train_bpe(docs, n_merges=5)
    many = train_bpe(docs, n_merges=100)
    n_few = (
        encode_bpe(docs, few["merges"]).agg(F.sum("n_tokens")).first()[0]
    )
    n_many = (
        encode_bpe(docs, many["merges"]).agg(F.sum("n_tokens")).first()[0]
    )
    assert n_many < n_few


def test_training_scan_is_one_shuffle(spark, sf_dir):
    """The corpus-size-dependent step is ONE (word) shuffle of integer
    counts; the merge loop never touches the corpus again."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        word_type_counts(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_unicode_whitespace_parity_with_jvm(spark):
    """Review finding: Java's \\s is ASCII-only, Python's is unicode-
    aware. A non-breaking space joins two words into ONE type for the
    JVM trainer; the encode kernel must treat it identically or encoded
    tokens desync from the trained vocabulary."""
    doc = spark.createDataFrame(
        [(0, "foo bar foo bar baz")], "doc_id long, text string"
    )
    # trainer sees 2 types: 'foo\xa0bar' and 'baz'
    types = {r["word"] for r in word_type_counts(doc).collect()}
    assert types == {"foo bar", "baz"}
    model = train_bpe(doc, n_merges=30)
    enc = encode_bpe(doc, model["merges"]).first()
    rebuilt = "".join(enc["tokens"]).replace(END, " ").strip()
    assert rebuilt == "foo bar foo bar baz"


def test_null_text_yields_empty_tokens(spark):
    """Advice finding: a NULL-text row must encode to an empty token
    list (n_tokens=0) — the trainer drops null docs entirely, so
    str(None) would emit phantom 'none' tokens the vocabulary never
    saw."""
    docs = spark.createDataFrame(
        [(0, "none none banana"), (1, None), (2, "banana")],
        "doc_id long, text string",
    )
    model = train_bpe(docs, n_merges=10)
    rows = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in encode_bpe(docs, model["merges"]).collect()
    }
    assert rows[1] == ([], 0)
    # the literal word 'none' still tokenizes normally when it IS text
    assert rows[0][1] > 0
    # and the null row's absence of tokens is not a general empty bug
    assert rows[2][1] > 0


def test_min_count_vs_rank_truncation_bias(spark):
    """min_count (threshold cut, standard practice) vs max_word_types
    (rank cut): on a corpus where the rank cut lands INSIDE a count
    plateau, the two vocabularies — and hence the learned merges —
    differ; the threshold cut keeps the whole plateau and matches the
    unbounded trainer, while the rank cut drops the lexicographically
    larger plateau members (the documented truncation bias)."""
    # counts: 'aa' x5 | plateau at n=2: 'xb','yb','zb' | hapax: 'qq'
    words = ["aa"] * 5 + ["xb", "yb", "zb"] * 2 + ["qq"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    full = train_bpe(docs, n_merges=5)
    thresh = train_bpe(docs, n_merges=5, min_count=2)
    # threshold cut: drops only the hapax; every n>=2 word survives, so
    # pair stats over the kept set are plateau-complete
    assert thresh["n_word_types"] == 4
    # rank cut inside the plateau (top-2 of 5 types): keeps 'aa' and
    # only the lexicographically smallest plateau member
    ranked = train_bpe(docs, n_merges=5, max_word_types=2)
    assert ranked["n_word_types"] == 2
    # the bias is real: the rank-cut merges diverge from the
    # threshold-cut merges (which see the whole 'b'-suffix plateau)
    assert ranked["merges"] != thresh["merges"]
    # ('b', '</w>') dominates the plateau-complete vocabularies: count 6
    # beats any 'aa' pair (5); both full and threshold training agree
    assert full["merges"][0] == ("b", END)
    assert thresh["merges"][0] == ("b", END)
    # but the rank cut sees only ONE b-word (count 2 < 5) and merges an
    # 'aa' pair first — the plateau truncation changed the argmax
    assert ranked["merges"][0] != ("b", END)
