"""Connected components + keep-set: the pairs->clusters->canonical-doc
terminal step of fuzzy dedup (min-label propagation; convergence needs
multiple rounds on chain graphs, which near-clique LSH clusters never do —
the chain here exercises the iteration+convergence logic)."""

from __future__ import annotations

from npm_mirror_spark.operators.dedup import connected_components, dedup_keepset


def test_components_on_chain_and_clique(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (11, 12)],
        "id_a long, id_b long",
    )
    labels = {
        r["node"]: r["label"] for r in connected_components(edges).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10}


def test_keepset_keeps_representative_and_unpaired(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 13)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    kept = sorted(r["doc_id"] for r in dedup_keepset(docs, pairs).collect())
    # 2,3 collapse into 1; 11 into 10; everything unpaired survives
    assert kept == [1, 4, 5, 6, 7, 8, 9, 10, 12]


def test_components_converge_on_long_chain(spark):
    """Diameter 9: label 0 must propagate the full length (pins the
    fixpoint loop + convergence check, not just one round)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    labels = connected_components(edges).collect()
    assert all(r["label"] == 0 for r in labels)
    assert len(labels) == 10


def test_components_round_count_and_exhaustion(spark):
    """Chain of diameter 9: the seed fuses round 1 (label = min of self +
    direct neighbors), then each round moves labels one hop further, plus
    one witness round to observe the fixpoint — so rounds is bounded by
    ~diameter and far below max_iter. Exhausting max_iter must raise, not
    return a half-propagated labeling (it is not a valid partition)."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    stats = {}
    labels = connected_components(edges, stats=stats).collect()
    assert all(r["label"] == 0 for r in labels)
    assert 2 <= stats["rounds"] <= 10

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_cluster_split_no_leakage(spark, sf_dir):
    """No duplicate cluster may straddle train/val, and both sides must be
    non-empty at the default 90/10 threshold."""
    from npm_mirror_spark.queries import QUERIES

    df = QUERIES["q_cluster_split"](spark, sf_dir)
    from pyspark.sql import functions as F

    straddling = (
        df.groupBy("cluster")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddling == 0, "a dup cluster crosses the train/val boundary"
    sides = {r["split"]: r["n"] for r in
             df.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sides.get("train", 0) > 0 and sides.get("val", 0) > 0


def test_dup_ngram_fraction_exact(spark):
    """Hand-computable fixture: doc 1 and 2 share one trigram ('b c d'),
    doc 3 shares nothing, doc 4 is a short-text singleton shingle."""
    from npm_mirror_spark.operators.dedup import dup_ngram_fraction

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # shingles: 'a b c', 'b c d'
            (2, "b c d e"),          # shingles: 'b c d', 'c d e'
            (3, "x y z w"),          # shingles: 'x y z', 'y z w'
            (4, "q r"),              # short text -> whole text shingle
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_ngram_fraction(df).collect()}
    assert got[1]["n_shingles"] == 2 and got[1]["dup_frac"] == 0.5
    assert got[2]["n_shingles"] == 2 and got[2]["dup_frac"] == 0.5
    assert got[3]["dup_frac"] == 0.0
    assert got[4]["n_shingles"] == 1 and got[4]["dup_frac"] == 0.0


def test_dup_spans_islands_exact(spark):
    """Hand-computed span algebra for l=3.

    Docs 1/2 share 'b c d e' (two overlapping shared trigrams at doc-1
    positions 1,2 -> ONE merged span of 4 tokens); docs 1/3 share
    'x y z' (one trigram at doc-1 position 6 -> a SECOND span of 3
    tokens, disjoint because the position gap 6-2 exceeds l-1). Doc 4
    duplicates nothing; doc 5 is a short-text whole-doc dup of doc 6
    (span clamps to n_tokens, not l)."""
    from npm_mirror_spark.operators.dedup import dup_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e q x y z"),  # 9 tokens; spans [1..4] and [6..8]
            (2, "b c d e m n o"),      # shares 'b c d', 'c d e'
            (3, "k x y z"),            # shares 'x y z'
            (4, "p p2 p3 p4"),         # nothing shared
            (5, "t u"),                # whole-text shingle, dup of 6
            (6, "t u"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_spans(df, l=3).collect()}
    assert got[1]["n_tokens"] == 9
    assert got[1]["n_dup_spans"] == 2
    # span A: grams at pos 1,2 -> 2-1+3 = 4 tokens; span B: pos 6 -> 3
    assert got[1]["dup_tokens"] == 7
    assert got[1]["max_span_tokens"] == 4
    assert abs(got[1]["dup_frac"] - 7 / 9) < 1e-12
    assert got[2]["n_dup_spans"] == 1 and got[2]["dup_tokens"] == 4
    assert got[3]["n_dup_spans"] == 1 and got[3]["dup_tokens"] == 3
    assert got[4]["n_dup_spans"] == 0 and got[4]["dup_frac"] == 0.0
    # short docs: the whole-text shingle span clamps to n_tokens (2), not l
    assert got[5]["dup_tokens"] == 2 and got[5]["dup_frac"] == 1.0
    assert got[6]["dup_tokens"] == 2


def test_cut_dup_spans_keep_first_carrier(spark):
    """The removal half: the FIRST carrier keeps its text; later carriers
    lose exactly the duplicated coverage; a doc that is entirely a later
    copy cuts to empty."""
    from npm_mirror_spark.operators.dedup import cut_dup_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e q x y z"),
            (2, "b c d e m n o"),
            (3, "k x y z"),
            (4, "p p2 p3 p4"),
            (5, "t u"),
            (6, "t u"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in cut_dup_spans(df, l=3).collect()}
    assert got[1]["clean_text"] == "a b c d e q x y z"  # first carrier
    assert got[2]["clean_text"] == "m n o" and got[2]["kept_tokens"] == 3
    assert got[3]["clean_text"] == "k"
    assert got[4]["clean_text"] == "p p2 p3 p4"  # nothing duplicated
    assert got[5]["clean_text"] == "t u"  # first carrier of the short dup
    assert got[6]["clean_text"] == "" and got[6]["kept_tokens"] == 0
    # exactly one copy of every duplicated substring survives corpus-wide
    all_clean = " ".join(r["clean_text"] for r in got.values())
    assert all_clean.count("b c d e") == 1
    assert all_clean.count("x y z") == 1
    assert all_clean.count("t u") == 1


def test_containment_degenerate_candidates_get_null_not_nan(spark):
    """r6 advice finding: a NULL / empty / whitespace-only candidate has
    no shingle evidence — c on that side must be NULL (explicit
    no-verdict) with contained=false, never NaN, and two blank docs must
    NOT 'contain' each other via the whole-text '' fallback shingle."""
    import math

    from npm_mirror_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "real text with actual words here")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 4), (3, 4)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(pairs, docs, "doc_id", "text", 3).collect()
    }
    for key in [(1, 2), (1, 4), (3, 4)]:
        r = got[key]
        for side in ("c_a", "c_b"):
            v = r[side]
            assert v is None or not math.isnan(v), (key, side, v)
        assert r["contained"] is False, key
    assert got[(1, 2)]["n_a"] == 0 and got[(1, 2)]["n_b"] == 0
    assert got[(1, 2)]["c_a"] is None
    assert got[(1, 4)]["c_b"] == 0.0  # real side: genuinely disjoint, not NULL
    assert got[(3, 4)]["c_a"] is None  # NULL text side: no verdict


def test_containment_is_directional_where_jaccard_is_not(spark):
    """The quote case: short doc fully inside a long one — containment
    flags it (c_a = 1.0, directional verdict) while Jaccard stays far
    below any dedup threshold."""
    from pyspark.sql import functions as F

    from npm_mirror_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    long = (
        "a very long essay begins here with many original words "
        + quote
        + " and then continues with plenty more original analysis after it"
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, long), (3, "unrelated text entirely different")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(pairs, docs, "doc_id", "text", 3).collect()
    }
    r12 = got[(1, 2)]
    assert r12["c_a"] == 1.0 and r12["c_b"] < 0.6
    assert r12["contained"] is True
    r13 = got[(1, 3)]
    assert r13["inter"] == 0 and r13["contained"] is False
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(pairs, docs, "doc_id", "text", 3).collect()
    }
    assert jac[(1, 2)] < 0.5, "Jaccard must under-score the quote case"
