"""Edge-case unit tests for the scalar function library (the reference's
quirky inputs: scoped names, short names, special chars, deletions)."""

from __future__ import annotations

from pyspark.sql import functions as F

import npm_mirror_spark.functions as nf


def _one(spark, expr, **cols):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} string" for k in cols)
    )
    return df.select(expr.alias("out")).collect()[0]["out"]


def test_split_last_scoped_and_plain(spark):
    assert _one(spark, nf.split_last("s"), s="@scope/pkg") == "pkg"
    assert _one(spark, nf.split_last("s"), s="plain") == "plain"
    assert _one(spark, nf.split_last("s"), s="a/b/c") == "c"


def test_scrub_special_chars(spark):
    assert _one(spark, nf.scrub_special_chars("s"), s="a.b-c_d~e/f") == "abcd" + "e/f"
    assert _one(spark, nf.scrub_special_chars("s"), s="...") == ""


def test_prefix_bucket_short_names(spark):
    # names shorter than the bucket width use what's there (reference
    # fallback, changes_consumer.py:102-107)
    assert _one(spark, nf.prefix_bucket("s"), s="ab") == "AB"
    assert _one(spark, nf.prefix_bucket("s"), s="a") == "A"
    assert _one(spark, nf.prefix_bucket("s"), s="abcdef") == "ABC"


def test_artifact_filename_deleted_prefix(spark):
    df = spark.createDataFrame([("p", "1-a", True), ("p", "1-a", False)],
                               "n string, r string, d boolean")
    out = [r["f"] for r in df.select(
        nf.artifact_filename("n", "r", "d").alias("f")).collect()]
    assert out == ["Deleted-p_1-a.zip", "p_1-a.zip"]


def test_iso_roundtrip_preserves_micros(spark):
    df = spark.sql("SELECT TIMESTAMP '2024-02-29 23:59:59.000001' AS ts")
    rt = df.select(nf.iso_to_ts(nf.ts_to_iso("ts")).alias("rt"),
                   F.col("ts")).collect()[0]
    assert rt["rt"] == rt["ts"]


def test_normalize_text_collapses_whitespace(spark):
    assert _one(spark, nf.normalize_text("s"), s="  A\t b\n\nC ") == "a b c"


def test_word_shingles_short_doc(spark):
    out = _one(spark, nf.word_shingles("s", 3), s="one two")
    assert out == ["one two"]  # whole-text fallback, never empty
    out3 = _one(spark, nf.word_shingles("s", 3), s="a b c d")
    assert out3 == ["a b c", "b c d"]


def test_jaccard_bounds(spark):
    df = spark.sql("SELECT array('a','b') AS x, array('a','b') AS y, array('c') AS z")
    r = df.select(nf.jaccard(F.col("x"), F.col("y")).alias("same"),
                  nf.jaccard(F.col("x"), F.col("z")).alias("disj")).collect()[0]
    assert r["same"] == 1.0 and r["disj"] == 0.0


def test_simhash_duplicate_invariance(spark):
    a = _one(spark, nf.simhash16("s"), s="the quick brown fox")
    b = _one(spark, nf.simhash16("s"), s="the  quick   brown fox")  # ws noise
    assert a == b
    assert 0 <= a < 2**16


def test_language_id_stopword_signals(spark):
    assert _one(spark, nf.language_id("s"), s="the cat and the dog is here") == "en"
    assert _one(spark, nf.language_id("s"), s="der hund und die katze ist") == "de"
    assert _one(spark, nf.language_id("s"), s="xyzzy plugh") == "und"


def test_fingerprint_order_insensitive(spark):
    a = _one(spark, nf.fingerprint("s"), s="alpha beta gamma")
    b = _one(spark, nf.fingerprint("s"), s="gamma alpha beta alpha")
    assert a == b


def test_minhash_signature_shape_and_determinism(spark):
    a = _one(spark, nf.minhash_signature("s", 8), s="w1 w2 w3 w4 w5")
    b = _one(spark, nf.minhash_signature("s", 8), s="w1 w2 w3 w4 w5")
    assert a == b and len(a) == 8 and all(v >= 0 for v in a)


def test_hashed_embedding_exact_algebra(spark):
    """The hashing-trick embedding is an exact integer SUM of per-token
    sign vectors, so two algebraic identities hold bit-for-bit:
    permutation invariance and concatenation additivity — the properties
    that make it safe to compute distributively in any partition order."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(1, 40))) for _ in range(25)]
    rows = []
    for i, t in enumerate(texts):
        toks = t.split(" ")
        rng.shuffle(toks)
        rows.append((i, t, " ".join(toks), texts[(i + 1) % len(texts)]))
    df = spark.createDataFrame(rows, "i long, a string, aperm string, b string")
    out = df.select(
        nf.hashed_embedding("a", 16).alias("ea"),
        nf.hashed_embedding("aperm", 16).alias("eap"),
        nf.hashed_embedding("b", 16).alias("eb"),
        nf.hashed_embedding(F.concat_ws(" ", "a", "b"), 16).alias("eab"),
    ).collect()
    for r in out:
        assert list(r["ea"]) == list(r["eap"]), "permutation must not change it"
        assert [x + y for x, y in zip(r["ea"], r["eb"])] == list(r["eab"]), (
            "concatenation must add exactly"
        )


def test_srp_signature_determinism_and_range(spark):
    from npm_mirror_spark.operators.similarity import srp_signs

    signs = srp_signs(16, 4)
    df = spark.createDataFrame(
        [([0.5, -0.25, 0.125, 1.0],), ([0.5, -0.25, 0.125, 1.0],)],
        "v array<double>",
    )
    vals = [r[0] for r in df.select(nf.srp_signature("v", signs)).collect()]
    assert vals[0] == vals[1]
    assert 0 <= vals[0] < 2**16


def test_filter_lines_rules(spark):
    """Each line rule in isolation: word minimum, terminal punctuation,
    blocklist phrase, and the rebuilt text preserves survivor order."""
    from npm_mirror_spark.operators.text import filter_lines

    text = "\n".join([
        "A proper first sentence stays here.",   # keep
        "too short.",                             # < 3 words
        "No terminal punctuation on this line",   # no punct
        "This site uses Cookie consent banners.", # blocklist (case-insens)
        'A quoted line ends with a quote"',       # keep (quote terminal)
        "   padded line with three words.   ",    # keep (trimmed)
        "",                                       # empty
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = filter_lines(df).collect()[0]
    assert r["n_lines"] == 7
    assert r["kept_lines"] == 3
    assert r["clean_text"].split("\n") == [
        "A proper first sentence stays here.",
        'A quoted line ends with a quote"',
        "   padded line with three words.   ",
    ]
    # knobs: relax punctuation, tighten words
    r2 = filter_lines(df, require_terminal_punct=False, min_words=5).collect()[0]
    # first (6 words) + no-punct (6) + quoted (7) + padded (5); the
    # blocklisted and short lines stay out
    assert r2["kept_lines"] == 4
    # zero shuffle: pure projection
    from npm_mirror_spark import plans

    assert plans.shuffle_count(filter_lines(df)) == 0


def test_filter_lines_counts_whitespace_runs(spark):
    """Review finding: 'a  b.' (double space) is TWO words, and
    tab-separated words count individually."""
    from npm_mirror_spark.operators.text import filter_lines

    text = "\n".join([
        "a  b.",                   # 2 words -> dropped at min_words=3
        "one\ttwo\tthree words.",  # 4 words -> kept
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = filter_lines(df).collect()[0]
    assert r["kept_lines"] == 1
    assert r["clean_text"] == "one\ttwo\tthree words."


def test_language_margin_semantics(spark):
    """margin = winner's stopword hits minus runner-up's; ambiguous
    bilingual text gets margin 0 (never 'confident')."""
    from npm_mirror_spark.operators.text import language_id, language_margin

    rows = {
        # de/es 'en'-free: 'der hund und die katze' -> de=3 hits, others low
        "der hund und die katze": ("de", 3),
        # genuinely ambiguous: 'la de' scores 2 for BOTH es and fr
        "la de": (None, 0),
        "xyzzy plugh": ("und", 0),
    }
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    got = {
        r["text"]: (r["lang"], r["m"]["top_hits"], r["m"]["margin"])
        for r in df.select(
            "text",
            language_id("text").alias("lang"),
            language_margin("text").alias("m"),
        ).collect()
    }
    lang, hits, margin = got["der hund und die katze"]
    assert lang == "de" and hits == 3 and margin >= 1
    _, hits2, margin2 = got["la de"]
    assert hits2 == 2 and margin2 == 0  # tie -> zero margin, not confident
    assert got["xyzzy plugh"][1] == 0


def test_filter_lines_tab_padding_no_phantom_words(spark):
    """Review finding: a leading/trailing TAB must not mint a phantom
    empty word (F.trim strips spaces only)."""
    from npm_mirror_spark.operators.text import filter_lines

    text = "\n".join([
        "\tfoo bar.",        # 2 real words -> dropped at min_words=3
        "real three words.\t",  # 3 real words -> kept
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = filter_lines(df).collect()[0]
    assert r["kept_lines"] == 1
    assert "real three words." in r["clean_text"]


def test_edit1_join_neighborhood_semantics(spark):
    """FastSS identity on a hand-built set: substitution, deletion,
    insertion and exact-dup pairs are found at their true distances;
    the 'ab'/'ba' transposition (distance 2, shares a deletion variant)
    is verified away."""
    from npm_mirror_spark.operators.dedup import edit1_join

    df = spark.createDataFrame(
        [(1, "abc"), (2, "axc"), (3, "ab"), (4, "ba"), (5, "abcd"), (6, "abc")],
        "id int, s string",
    )
    rows = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit1_join(df, "s", "id").collect()
    )
    assert rows == [
        (1, 2, 1), (1, 3, 1), (1, 5, 1), (1, 6, 0),
        (2, 6, 1), (3, 6, 1), (5, 6, 1),
    ]


def test_edit1_join_enforces_short_key_contract(spark):
    """The deletion neighborhood is O(len^2) bytes per row; rows past
    max_len must fail the job LOUDLY (shuffle-amplifier guard), and the
    boundary length must still pass."""
    import pytest

    from npm_mirror_spark.operators.dedup import edit1_join

    ok = spark.createDataFrame([(1, "x" * 16), (2, "x" * 15)], "id int, s string")
    rows = edit1_join(ok, "s", "id", max_len=16).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in rows] == [(1, 2, 1)]

    bad = spark.createDataFrame([(1, "y" * 17), (2, "ok")], "id int, s string")
    with pytest.raises(Exception, match="short-key contract"):
        edit1_join(bad, "s", "id", max_len=16).collect()


def test_bigram_collocations_matches_brute_force(spark):
    """Lift over adjacent bigrams must equal explicit Python counting
    (normalize: lower + whitespace-collapse, ws-split)."""
    from collections import Counter

    from npm_mirror_spark.operators.text import bigram_collocations

    texts = [
        "new york new york city",
        "New   YORK is a city",
        "the city of new york",
        "a b a b a b",
        "the the the",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["body"])
    got = {
        (r["w1"], r["w2"]): (
            r["c_xy"], r["c_x"], r["c_y"], r["n_bigrams"], r["lift"],
        )
        for r in bigram_collocations(
            df, "body", min_count=2, top_n=100
        ).collect()
    }
    uni, bi = Counter(), Counter()
    for t in texts:
        toks = t.lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n = sum(bi.values())
    want = {
        p: (c, uni[p[0]], uni[p[1]], n, c * n / (uni[p[0]] * uni[p[1]]))
        for p, c in bi.items()
        if c >= 2
    }
    assert set(got) == set(want)
    for p, (cxy, cx, cy, nb, lift) in want.items():
        g = got[p]
        assert g[:4] == (cxy, cx, cy, nb), p
        assert abs(g[4] - lift) < 1e-12, p
    # "new york" repeats within and across documents
    assert got[("new", "york")][0] == 4


def test_edit2_join_neighborhood_semantics(spark):
    """Depth-2 FastSS vs in-test brute force on a set exercising
    substitution x2, deletion x2, mixed ops, the 'ab'/'ba' transposition
    (distance 2 — radius 2 must now FIND it), and a distance-3 pair
    that must stay excluded."""
    import itertools

    from npm_mirror_spark.operators.dedup import edit2_join

    data = {
        1: "abcdef", 2: "abcdxf", 3: "abXdYf", 4: "abcd",
        5: "fedcba", 6: "abcdef", 7: "aXcdefY", 8: "ab", 9: "ba",
    }
    df = spark.createDataFrame(
        sorted(data.items()), "id int, s string"
    )
    rows = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit2_join(df, "s", "id").collect()
    )

    def lev(a, b):
        import functools

        @functools.lru_cache(None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return d(len(a), len(b))

    want = sorted(
        (i, j, lev(data[i], data[j]))
        for i, j in itertools.combinations(sorted(data), 2)
        if lev(data[i], data[j]) <= 2
    )
    assert rows == want
    assert (8, 9, 2) in rows  # the transposition radius 1 verifies away


def test_edit2_join_enforces_tighter_short_key_contract(spark):
    import pytest

    from npm_mirror_spark.operators.dedup import edit2_join

    bad = spark.createDataFrame([(1, "z" * 33), (2, "ok")], "id int, s string")
    with pytest.raises(Exception, match="short-key contract"):
        edit2_join(bad, "s", "id").collect()


def test_cosine_column_helper_exact_values(spark):
    """nf.cosine is the public column-level building block the topk/dedup
    operators compose; pin its math on known geometry (parallel -> 1,
    orthogonal -> 0, antiparallel -> -1, and a hand-computed oblique)."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [2.0, 0.0], 1.0),
            (2, [1.0, 0.0], [0.0, 3.0], 0.0),
            (3, [1.0, 0.0], [-5.0, 0.0], -1.0),
            (4, [3.0, 4.0], [4.0, 3.0], 24.0 / 25.0),
        ],
        "id int, a array<double>, b array<double>, want double",
    )
    rows = df.select(
        "id", "want", nf.cosine(F.col("a"), F.col("b")).alias("got")
    ).collect()
    for r in rows:
        assert abs(r["got"] - r["want"]) < 1e-12, (r["id"], r["got"], r["want"])


def test_lsh_band_hashes_banding_semantics(spark):
    """Identical signatures agree on EVERY band key; signatures differing
    in exactly one row disagree ONLY on the band containing that row —
    the candidate-recall property the MinHash join relies on."""
    sig_a = list(range(1, 9))          # 8 rows -> 4 bands x 2 rows
    sig_b = list(sig_a)
    sig_b[5] = 99                      # perturb row 6 -> band index 2
    df = spark.createDataFrame(
        [(sig_a, sig_a), (sig_a, sig_b)], "x array<int>, y array<int>"
    )
    rows = df.select(
        nf.lsh_band_hashes(F.col("x"), bands=4, rows_per_band=2).alias("hx"),
        nf.lsh_band_hashes(F.col("y"), bands=4, rows_per_band=2).alias("hy"),
    ).collect()
    same = [hx == hy for hx, hy in zip(rows[0]["hx"], rows[0]["hy"])]
    assert same == [True, True, True, True]
    diff = [hx == hy for hx, hy in zip(rows[1]["hx"], rows[1]["hy"])]
    assert diff == [True, True, False, True]


def test_lexical_diversity_by_matches_brute_force(spark):
    from npm_mirror_spark.operators.text import lexical_diversity_by

    docs = [
        ("a", "The cat  sat"), ("a", "the CAT ran"), ("a", "   "),
        ("b", "one two two three three three"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {r["source"]: r for r in lexical_diversity_by(df, "text", "source").collect()}
    # group a tokens: the cat sat the cat ran -> types {the,cat,sat,ran}
    a = got["a"]
    assert (a["n_types"], a["n_tokens"], a["n_hapax"]) == (4, 6, 2)
    assert a["ttr"] == 4 / 6 and a["hapax_frac"] == 0.5
    b = got["b"]
    assert (b["n_types"], b["n_tokens"], b["n_hapax"]) == (3, 6, 1)
