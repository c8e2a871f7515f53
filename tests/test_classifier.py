"""Trained quality classifier (operators/classifier.py).

q_quality_classifier is rows-only for the driver (libm sigmoid + float
shuffle-sum order), so the GD math is pinned here instead:
1. the distributed GD loop matches an independent numpy full-batch GD
   to float tolerance (same features, same iterate sequence);
2. a planted keyword signal is actually LEARNED (AUC -> 1), the
   fastText/DCLM distillation claim;
3. the per-iteration plan ships only dim+1 numbers to the driver
   (gradient aggregation, no per-doc collect);
4. scoring is consistent: score > 0.5 <=> pred = 1.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from npm_mirror_spark.operators.classifier import (
    hashed_features,
    score_logreg,
    sigmoid,
    train_logreg,
)
from npm_mirror_spark.tables import load_table

DIM = 64


def _labels(docs):
    return docs.select(
        "doc_id", F.col("text").contains("spark").cast("int").alias("label")
    )


def _numpy_gd(X: np.ndarray, y: np.ndarray, iters: int, lr: float, l2: float):
    """Independent full-batch GD twin (dense matrix form)."""
    n, d = X.shape
    w = np.zeros(d)
    b = 0.0
    losses = []
    for _ in range(iters):
        z = X @ w + b
        p = np.where(z >= 0, 1 / (1 + np.exp(-np.abs(z))),
                     np.exp(-np.abs(z)) / (1 + np.exp(-np.abs(z))))
        resid = p - y
        losses.append(float(np.mean(np.log1p(np.exp(-np.abs(z))) + np.maximum(-z * (2 * y - 1), 0))))
        w = w - lr * ((X.T @ resid) / n + l2 * w)
        b = b - lr * resid.sum() / n
    return w, b, losses


def test_matches_numpy_gd(spark, sf_dir):
    """Collect the sparse features ONCE (test-only; training never
    does), densify, and require the distributed iterate sequence to
    match the numpy twin to float tolerance."""
    docs = load_table(spark, sf_dir, "documents")
    labels = _labels(docs)
    feats = hashed_features(docs, dim=DIM)
    rows = feats.collect()
    lab = {r["doc_id"]: r["label"] for r in labels.collect()}
    ids = sorted(lab)
    idx = {d: i for i, d in enumerate(ids)}
    X = np.zeros((len(ids), DIM))
    for r in rows:
        X[idx[r["doc_id"]], r["bucket"]] = r["v"]
    y = np.array([lab[d] for d in ids], dtype=float)

    iters, lr, l2 = 6, 1.0, 1e-4
    w_ref, b_ref, loss_ref = _numpy_gd(X, y, iters, lr, l2)
    model = train_logreg(feats, labels, dim=DIM, iters=iters, lr=lr, l2=l2)
    np.testing.assert_allclose(model["weights"], w_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(model["bias"], b_ref, rtol=1e-8)
    np.testing.assert_allclose(model["losses"], loss_ref, rtol=1e-8)


def test_planted_signal_is_learned(spark, sf_dir):
    """AUC -> 1 on the keyword task the registered query distills."""
    docs = load_table(spark, sf_dir, "documents")
    labels = _labels(docs)
    feats = hashed_features(docs, dim=256)
    model = train_logreg(feats, labels, dim=256, iters=15, lr=1.0)
    scored = score_logreg(feats, model).join(labels, "doc_id").collect()
    pos = sorted(r["score"] for r in scored if r["label"] == 1)
    neg = sorted(r["score"] for r in scored if r["label"] == 0)
    assert pos and neg
    # exact Mann-Whitney AUC
    import bisect

    wins = sum(bisect.bisect_left(neg, p) for p in pos)
    auc = wins / (len(pos) * len(neg))
    assert auc >= 0.97, f"planted keyword not learned: AUC={auc:.3f}"
    assert model["losses"][-1] < model["losses"][0]


def test_scores_and_preds_consistent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    labels = _labels(docs)
    feats = hashed_features(docs, dim=DIM)
    model = train_logreg(feats, labels, dim=DIM, iters=3)
    bad = (
        score_logreg(feats, model)
        .filter(
            ((F.col("score") > 0.5) & (F.col("pred") == 0))
            | ((F.col("score") < 0.5) & (F.col("pred") == 1))
        )
        .count()
    )
    assert bad == 0
    assert abs(sigmoid(0.7) - 1 / (1 + np.exp(-0.7))) < 1e-15


def test_gradient_is_cluster_aggregated(spark, sf_dir):
    """The per-round driver traffic is the dim+1-row gradient — assert
    the aggregation really groups to <= dim+1 rows (no per-doc rows
    reach collect) and the weight join side is broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    labels = _labels(docs)
    feats = hashed_features(docs, dim=DIM)
    from npm_mirror_spark.operators.classifier import _margins, _with_bias

    fb = _with_bias(feats, labels, "doc_id")
    m = _margins(fb, [0.0] * DIM, 0.0, spark, "doc_id")
    plan = m._jdf.queryExecution().executedPlan().toString()
    # r15: the weight attach is a constant-folded literal-array lookup
    # (element_at on the bucket) — no per-round weight table, no
    # broadcast build job, no join of any kind in the margin plan
    assert "element_at" in plan
    assert "Join" not in plan
    n_docs = labels.count()
    grad_rows = (
        fb.join(
            m.select("doc_id", F.lit(0.5).alias("resid")), "doc_id"
        )
        .groupBy("bucket")
        .agg(F.sum(F.col("v") * F.col("resid")).alias("g"))
        .count()
    )
    assert grad_rows <= DIM + 1 < n_docs


def test_binary_metrics_auc_matches_reference(spark, sf_dir):
    """binary_metrics' grouped-rank integer AUC must equal the
    pairwise-comparison definition (ties counted half) on the trained
    model's FLOAT scores — the algebra is score-type agnostic."""
    from npm_mirror_spark.operators.classifier import binary_metrics

    docs = load_table(spark, sf_dir, "documents")
    labels = _labels(docs)
    feats = hashed_features(docs, dim=DIM)
    model = train_logreg(feats, labels, dim=DIM, iters=4)
    scored = score_logreg(feats, model).join(labels, "doc_id")

    row = binary_metrics(scored, "score", "label").first()
    pairs = [(r["score"], r["label"]) for r in scored.collect()]
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["auc_den"] == 2 * len(pos) * len(neg)
    assert row["auc_num"] == int(round(2 * wins))
    assert abs(row["auc"] - wins / (len(pos) * len(neg))) < 1e-12
    assert row["tp"] + row["fn"] == row["n_pos"]
    assert row["fp"] + row["tn"] == row["n_neg"]


def test_pr_curve_matches_reference_on_float_scores(spark, sf_dir):
    """pr_curve's two-level bucketed prefix sums must reproduce the
    naive sort-and-cumulate definition on the trained model's FLOAT
    scores (distinct ≈ N — the regime the bucketing exists for)."""
    from npm_mirror_spark.operators.classifier import pr_curve

    docs = load_table(spark, sf_dir, "documents")
    labels = _labels(docs)
    feats = hashed_features(docs, dim=DIM)
    model = train_logreg(feats, labels, dim=DIM, iters=4)
    scored = score_logreg(feats, model).join(labels, "doc_id")

    got = {
        r["threshold"]: (r["tp"], r["fp"], r["fn"], r["precision"], r["recall"])
        for r in pr_curve(scored, "score", "label").collect()
    }
    pairs = sorted(
        ((r["score"], r["label"]) for r in scored.collect()), reverse=True
    )
    n_pos = sum(y for _, y in pairs)
    want = {}
    tp = fp = 0
    for i, (s, y) in enumerate(pairs):
        tp += y
        fp += 1 - y
        if i + 1 == len(pairs) or pairs[i + 1][0] != s:  # close the group
            want[s] = (tp, fp, n_pos - tp, tp / (tp + fp), tp / n_pos)
    assert set(got) == set(want)
    for s, (wtp, wfp, wfn, wprec, wrec) in want.items():
        gtp, gfp, gfn, gprec, grec = got[s]
        assert (gtp, gfp, gfn) == (wtp, wfp, wfn), s
        assert abs(gprec - wprec) < 1e-12 and abs(grec - wrec) < 1e-12, s


def test_tokenless_docs_get_bias_only_score(spark):
    """Review finding: a doc with empty/whitespace text has no feature
    rows; with the id universe passed, it must receive sigmoid(bias)
    instead of silently vanishing from the scored set."""
    docs = spark.createDataFrame(
        [(1, "spark things here"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    model = {"weights": [0.5] * 16, "bias": -0.3}
    feats = hashed_features(docs, dim=16)
    scored = {
        r["doc_id"]: r["score"]
        for r in score_logreg(feats, model, ids=docs).collect()
    }
    assert set(scored) == {1, 2, 3}
    want = sigmoid(-0.3)
    assert abs(scored[2] - want) < 1e-12 and abs(scored[3] - want) < 1e-12
    # without the universe, token-less docs are absent (documented)
    assert set(
        r["doc_id"] for r in score_logreg(feats, model).collect()
    ) == {1}


def test_subset_ids_define_the_scored_set(spark):
    """Advice finding: an ``ids`` that is a strict SUBSET of the feature
    table must restrict scoring to those ids — previously the extra docs
    were scored anyway, silently missing their bias term."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma")],
        "doc_id long, text string",
    )
    model = {"weights": [0.25] * 16, "bias": 0.8}
    feats = hashed_features(docs, dim=16)
    subset = docs.where("doc_id <= 2")
    scored = {
        r["doc_id"]: r["score"]
        for r in score_logreg(feats, model, ids=subset).collect()
    }
    assert set(scored) == {1, 2}, "ids outside the subset must be excluded"
    # docs 1 and 2 share identical text -> identical (bias-inclusive) score
    assert abs(scored[1] - scored[2]) < 1e-12
    full = {
        r["doc_id"]: r["score"] for r in score_logreg(feats, model).collect()
    }
    # the subset run must agree with the full run on the common ids
    # (i.e. the bias term is present either way)
    assert abs(scored[1] - full[1]) < 1e-12


def test_metrics_handle_nan_and_infinity_scores(spark):
    """Review-hardening pin: NaN/±Inf scores must (a) compute the same
    AUC as the pairwise reference under Spark's total order (NULL <
    -Inf < finite < +Inf < NaN) and (b) not poison the bucket span —
    finite scores must still spread across buckets."""
    import math

    from pyspark.sql import functions as F

    from npm_mirror_spark.operators.classifier import binary_metrics, pr_curve

    data = [(0.1, 1), (float("nan"), 0), (0.9, 1), (float("inf"), 0),
            (float("-inf"), 1), (0.5, 0), (0.3, 1), (0.7, 0)]
    df = spark.createDataFrame(data, "score double, label int")
    row = binary_metrics(df, "score").first()

    def key(s):
        if math.isnan(s):
            return (3, 0.0)
        if s == float("inf"):
            return (2, 0.0)
        if s == float("-inf"):
            return (0, 0.0)
        return (1, s)

    pos = [s for s, y in data if y == 1]
    neg = [s for s, y in data if y == 0]
    wins = sum(
        1.0 if key(p) > key(n) else (0.5 if key(p) == key(n) else 0.0)
        for p in pos for n in neg
    )
    assert abs(row["auc"] - wins / (len(pos) * len(neg))) < 1e-12
    curve = pr_curve(df, "score").collect()
    assert len(curve) == len({s for s, _ in data})
    assert all(r["tp"] + r["fn"] == row["n_pos"] for r in curve)


def test_calibration_bins_exact_on_planted_rates(spark):
    """Planted per-bin positive rates must come back exactly (counts
    are integers, one division); degenerate span lands in bin 0; a
    perfectly calibrated scorer has frac_pos == mean_score per bin."""
    from npm_mirror_spark.operators.classifier import calibration_bins

    rows = []
    # scores 0.05, 0.15, ..., 0.95: bin i gets rate i/10 positives
    for i in range(10):
        for j in range(20):
            rows.append((i / 10 + 0.05, 1 if j < 2 * i else 0))
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r["bin"]: r for r in calibration_bins(df, "score", "label", 10).collect()}
    assert set(got) == set(range(10))
    for i in range(10):
        assert got[i]["n"] == 20
        assert got[i]["n_pos"] == 2 * i
        assert got[i]["frac_pos"] == (2 * i) / 20
        assert abs(got[i]["mean_score"] - (i / 10 + 0.05)) < 1e-9
    const = spark.createDataFrame([(5.0, 1), (5.0, 0)], "score double, label int")
    r = calibration_bins(const, "score", "label", 10).collect()
    assert len(r) == 1 and r[0]["bin"] == 0 and r[0]["frac_pos"] == 0.5


def test_calibration_excludes_null_and_nan_rows(spark):
    from npm_mirror_spark.operators.classifier import calibration_bins

    clean = spark.createDataFrame(
        [(i / 10, i % 2) for i in range(10)], "score double, label int"
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(float("nan"), 1), (None, 0), (0.5, None)],
            "score double, label int",
        )
    )
    a = sorted(map(tuple, calibration_bins(clean, "score", "label", 5).collect()))
    b = sorted(map(tuple, calibration_bins(dirty, "score", "label", 5).collect()))
    assert a == b


def test_gini_best_split_matches_brute_force(spark):
    from pyspark.sql import functions as F

    from npm_mirror_spark.operators.classifier import gini_best_split

    # feature separates labels imperfectly; brute-force all thresholds
    data = [
        (1, 1), (2, 1), (2, 1), (3, 0), (4, 1), (5, 0), (5, 0),
        (6, 0), (7, 1), (8, 0), (9, 0), (9, 0),
    ]
    df = spark.createDataFrame(data, "x long, y int")
    row = gini_best_split(df, "x", F.col("y") == 1).collect()[0]
    xs = sorted({x for x, _ in data})
    n = len(data)
    pos = sum(y for _, y in data)
    best = None
    for v in xs[:-1]:
        nl = sum(1 for x, _ in data if x <= v)
        pl = sum(y for x, y in data if x <= v)
        nr, pr = n - nl, pos - pl

        def g(nn, pp):
            qq = nn - pp
            return (nn * nn - pp * pp - qq * qq) / nn

        cost = (g(nl, pl) + g(nr, pr)) / n
        if best is None or (cost, v) < best[:2]:
            best = (cost, v, nl, pl, nr, pr)
    assert row["threshold"] == best[1]
    assert abs(row["gini_split"] - best[0]) < 1e-12
    assert (row["n_left"], row["pos_left"]) == (best[2], best[3])
    assert (row["n_right"], row["pos_right"]) == (best[4], best[5])
    assert (row["n_total"], row["pos_total"]) == (n, pos)


def test_gini_best_split_perfect_separator_is_zero(spark):
    from pyspark.sql import functions as F

    from npm_mirror_spark.operators.classifier import gini_best_split

    data = [(i, 1 if i <= 5 else 0) for i in range(1, 11)]
    df = spark.createDataFrame(data, "x long, y int")
    row = gini_best_split(df, "x", F.col("y") == 1).collect()[0]
    assert row["threshold"] == 5 and row["gini_split"] == 0.0


def test_gini_best_split_null_label_counts_negative(spark):
    from pyspark.sql import functions as F

    from npm_mirror_spark.operators.classifier import gini_best_split

    # NULL label rows must participate as negatives (the oracle's CASE
    # semantics), not be silently dropped
    a = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, None), (4, "fr"), (5, None)],
        "x long, lang string",
    )
    b = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "fr"), (4, "fr"), (5, "fr")],
        "x long, lang string",
    )
    ra = gini_best_split(a, "x", F.col("lang") == "en").collect()[0]
    rb = gini_best_split(b, "x", F.col("lang") == "en").collect()[0]
    assert ra["n_total"] == 5 and ra["pos_total"] == 2
    assert (ra["threshold"], ra["gini_split"]) == (rb["threshold"], rb["gini_split"])


def test_gini_best_split_empty_input_returns_zero_rows(spark):
    """agg(min(struct)) on an all-NULL feature must not emit the
    one-all-NULL-row artifact: the DuckDB oracle's ORDER BY ... LIMIT 1
    returns zero rows on the same input, and the driver compares row
    counts (advisor finding r10)."""
    from pyspark.sql import functions as F

    from npm_mirror_spark.operators.classifier import gini_best_split

    df = spark.createDataFrame(
        [(None, 1), (None, 0)], "x int, y int"
    )
    out = gini_best_split(df, "x", F.col("y") == 1)
    assert out.count() == 0
