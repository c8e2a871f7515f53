"""Trained document-quality classifier — fastText/DCLM-style logistic
regression over hashed bag-of-words features, trained DISTRIBUTED.

The modern curation pattern (DCLM, FineWeb-Edu): distill a slow or
small-sample quality signal (LLM judgments, a rule gate, human labels)
into a linear model over cheap text features, then score the whole
corpus map-side.  The reference engine has no model surface at all
(it is a ~1.4 kLoC ETL, app/changes_consumer.py); this module is
extension surface mandated by the spec's LLM-data-pipeline list.

Architecture — the parameter-server-free distributed GD loop:

- Features are a SPARSE relational table (doc_id, bucket, v): tokens
  hash (xxhash64 pmod dim) into buckets, presence (default) or tf
  weighted.  Built once, cached; at 100 TB this is an exploded token
  table — the same shape every inverted-index operator here shuffles.
- Each full-batch iteration is ONE Spark job over that table:
  margin_i = sum_b w[b]*v_ib + bias   (broadcast weights joined in),
  residual_i = sigmoid(margin_i) - y_i             (JVM F.exp),
  grad[b] = sum_i v_ib * residual_i                ((bucket) shuffle),
  and only dim+1 numbers ever reach the driver — weights live on the
  driver, gradients are aggregated in the cluster, exactly the
  treeAggregate pattern MLlib uses, expressed relationally.
- Scoring is map-side: broadcast-join the weight table, one pass.

Float sums shuffle-reduce in nondeterministic order, so trained weights
are reproducible only to float tolerance — like q_lm_nll this is
rows-only for the driver oracle; tests/test_classifier.py pins the math
against an independent numpy GD twin and proves learnability on a
planted-signal corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from npm_mirror_spark.operators.text import ws_tokens


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    binary: bool = True,
) -> DataFrame:
    """Sparse hashed-BoW features: (id, bucket, v).  One explode + one
    (id, bucket) aggregation.

    ``binary=True`` (default): v = 1 if any token of the doc hashes to
    the bucket — presence features, the right scaling for a linear
    model whose signal is keyword-like (tf features shrink as 1/len and
    need ~len-times more GD steps to move the same margin).
    ``binary=False``: v = tf (count / doc token count).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(ws_tokens(text_col)).alias("__tok"),
    ).filter(F.col("__tok") != "")
    counts = toks.groupBy(
        id_col, F.pmod(F.xxhash64("__tok"), F.lit(dim)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    if binary:
        return counts.select(id_col, "bucket", F.lit(1.0).alias("v"))
    totals = counts.groupBy(id_col).agg(F.sum("__cnt").alias("__tot"))
    return counts.join(totals, id_col).select(
        id_col,
        "bucket",
        (F.col("__cnt").cast("double") / F.col("__tot").cast("double")).alias("v"),
    )


BIAS_BUCKET = -1  # the always-on feature: bias-as-a-feature folds the
# intercept gradient AND the mean loss into the same single groupBy that
# produces the weight gradients — one job, one dim+1-row collect per round


def _with_bias(feats: DataFrame, ids: DataFrame, id_col: str) -> DataFrame:
    bias_rows = ids.select(
        F.col(id_col), F.lit(BIAS_BUCKET).cast("long").alias("bucket"),
        F.lit(1.0).alias("v"),
    )
    return feats.select(id_col, "bucket", "v").unionByName(bias_rows)


_MARGIN_LITERAL_MAX_DIM = 4096


def _margins(
    feats_b: DataFrame,
    weights: list[float],
    bias: float,
    spark: SparkSession,
    id_col: str,
) -> DataFrame:
    # Literal-array weight lookup (r15, guide §1.2 step 2 / §5 driver
    # latency): the former createDataFrame + broadcast-join path paid a
    # driver->JVM table ship and a broadcast build JOB per call — and
    # gd_step calls this once per GD round, so a 5-round trainer ran 5
    # extra broadcast jobs whose wall is pure scheduler latency at any
    # scale.  A constant-foldable array literal indexed by the bucket is
    # the same per-row double w[bucket] (buckets are pmod-bounded to
    # [0, dim) and BIAS_BUCKET rows take the bias scalar), the same
    # v*w products into the same groupBy — row-identical, so the
    # streaming/batch parity twins (both route through here) move
    # together.  Guard: a plan-bloating dim falls back to the join
    # (literal arrays scale the plan linearly with dim; the r14 IVF
    # literal-centroid revert is the cautionary measurement).
    if len(weights) <= _MARGIN_LITERAL_MAX_DIM:
        w_arr = F.array(*[F.lit(float(x)) for x in weights])
        w_expr = F.when(
            F.col("bucket") == F.lit(int(BIAS_BUCKET)), F.lit(float(bias))
        ).otherwise(
            F.element_at(w_arr, (F.col("bucket") + F.lit(1)).cast("int"))
        )
        return (
            feats_b.groupBy(id_col)
            .agg(F.sum(F.col("v") * w_expr).alias("margin"))
        )
    w = spark.createDataFrame(
        [(BIAS_BUCKET, float(bias))]
        + [(b, float(x)) for b, x in enumerate(weights)],
        "bucket long, w double",
    )
    return (
        feats_b.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("v") * F.col("w")).alias("margin"))
    )


def train_logreg(
    feats: DataFrame,
    labels: DataFrame,
    dim: int = 256,
    iters: int = 10,
    lr: float = 0.5,
    l2: float = 1e-4,
    id_col: str = "doc_id",
    label_col: str = "label",
) -> dict:
    """Full-batch gradient descent; ONE Spark job per iteration.

    ``labels``: (id, label in {0,1}).  Returns {"weights": [dim floats],
    "bias": float, "losses": [per-iter mean log-loss]} — dim+1 numbers
    per round cross the cluster/driver boundary, nothing else.
    """
    fb = _with_bias(feats, labels, id_col).persist()
    try:
        n = labels.count()
        w = [0.0] * dim
        b = 0.0
        losses: list[float] = []
        # (the bias rows have v=1 exactly once per doc, so gd_step's one
        # aggregation simultaneously carries every weight gradient, the
        # intercept gradient and the mean loss)
        for _ in range(iters):
            w, b, ml = gd_step(
                fb, labels, w, b, n, lr, l2, dim, id_col, label_col
            )
            losses.append(ml)
        return {"weights": w, "bias": b, "losses": losses}
    finally:
        fb.unpersist()


def score_logreg(
    feats: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    ids: DataFrame | None = None,
) -> DataFrame:
    """Map-side corpus scoring: broadcast the dim-row weight table, one
    aggregation keyed on the id — (id, score in (0,1), pred).

    Pass ``ids`` (the id universe) when documents may have ZERO feature
    rows (empty/whitespace-only text): the feature table cannot name
    them, so without it they would get no score at all; with it they
    get the bias-only score sigmoid(bias) like any other doc.  ``ids``
    DEFINES the scored set: feature rows for ids outside it are
    dropped (semi-join) — otherwise a strict-subset ``ids`` would
    silently score the extras WITHOUT their bias term (bias rows are
    built from ``ids`` only), a margin missing the intercept."""
    if ids is None:
        ids = feats.select(id_col).distinct()
    else:
        ids = ids.select(id_col).distinct()
        # corpus-sized universe: plain semi-join, let AQE pick the
        # strategy (broadcasting ids here would ship the whole corpus)
        feats = feats.join(ids, id_col, "left_semi")
    m = _margins(
        _with_bias(feats, ids, id_col),
        model["weights"], model["bias"], feats.sparkSession, id_col,
    )
    return m.select(
        id_col,
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("score"),
        (F.col("margin") > 0).cast("int").alias("pred"),
    )


def sigmoid(z: float) -> float:
    """Driver-side twin of the JVM expression (tests/numpy parity)."""
    if z >= 0:
        return 1.0 / (1.0 + math.exp(-z))
    e = math.exp(z)
    return e / (1.0 + e)


def _with_prior_sums(
    grouped: DataFrame,
    score_col: str,
    sum_cols: tuple[str, ...],
    descending: bool = False,
    n_buckets: int = 1024,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Distributed prefix sums over the distinct-score axis — the
    two-level cumulative that replaces an ungrouped ``Window.orderBy``
    (a single-partition sort: with raw float scores distinct ≈ N and the
    whole axis would land on one reducer at 100 TB).

    Level 1: scores hash to an ORDER-PRESERVING value-range bucket
    (min/max come from a broadcast 1-row aggregate, so the bucket
    expression stays one lazy plan — no driver collect); per-bucket
    totals (≤ ``n_buckets`` rows) take their own cumulative window —
    single-partition but BOUNDED by construction, the same contract as
    pack_sequences' per-shard prefix sums.  Level 2: a window
    PARTITIONED BY bucket runs within each bucket in parallel, and the
    broadcast bucket offset lifts it to a global prefix sum.

    Adds ``__prior_<c>`` per ``c`` in ``sum_cols``: the sum of ``c``
    over all strictly-prior distinct scores (prior = smaller when
    ascending, larger when ``descending``).  A NULL score group (rows
    whose score is NULL) gets bucket -1, matching Spark's nulls-first
    ascending / nulls-last descending ordering of the ungrouped form.
    Value-range bucketing can skew if distinct scores concentrate in a
    narrow band, but the worst case degrades to the old single-window
    shape, never below it.  Non-NUMERIC score columns (a string sample
    key, say) take the same degradation BY TYPE: bucketing applies only
    when the column's declared type is numeric, every other
    type lands wholesale in bucket 0 and the within-bucket window
    (ordered by the ORIGINAL column, so string order is honored)
    computes the prefix exactly — correct but single-reducer; callers
    with corpus-scale string axes should map the key to a numeric
    proxy first.  The type gate matters twice: under ANSI mode a plain
    cast of a non-numeric string crashes mid-stage, and a
    NUMERIC-VALUED string would bucket numerically but sort
    lexicographically — inconsistent global order, silently wrong
    priors (both found by the r11 systematic-sample tests).

    ``stats``: optional pre-built 1-row (__mn, __mx) frame — callers
    with the RAW row table pass a scalar min/max over it (scan +
    partial agg, no hash shuffle; min/max over raw rows equals min/max
    over distinct scores), avoiding a second derivation of the grouped
    table on the stats branch.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import NumericType

    s = F.col(score_col)
    bucketable = isinstance(grouped.schema[score_col].dataType, NumericType)
    if bucketable:
        if stats is None:
            stats = grouped.agg(*_range_stats(s))
        span = F.col("__mx") - F.col("__mn")
        s_d = s.cast("double")
        # Non-finite scores take explicit edge buckets consistent with
        # Spark's total order (NULL first, then -Inf, finite, +Inf, NaN
        # last ascending): without this, a single NaN poisons span and
        # every row degrades into one bucket — still CORRECT (it is the
        # old single-window shape) but silently single-reducer again.
        # NaN and +Inf share the top bucket; the within-bucket orderBy
        # separates them.
        bkt = (
            F.when(s.isNull(), F.lit(-1))
            .when(F.isnan(s_d), F.lit(n_buckets - 1))
            .when(s_d == F.lit(float("inf")), F.lit(n_buckets - 1))
            .when(s_d == F.lit(float("-inf")), F.lit(0))
            .when(span.isNull() | (span <= 0), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor((s_d - F.col("__mn")) / span * n_buckets).cast(
                        "int"
                    ),
                )
            )
        )
        g = (
            grouped.crossJoin(F.broadcast(stats))
            .withColumn("__bkt", bkt)
            .drop("__mn", "__mx")
        )
    else:
        # non-numeric axis: single bucket (NULLs still lead) — the
        # documented bounded-window degradation, exact by construction
        g = grouped.withColumn(
            "__bkt", F.when(s.isNull(), F.lit(-1)).otherwise(F.lit(0))
        )
    per_bucket = g.groupBy("__bkt").agg(
        *[F.sum(c).alias(f"__bt_{c}") for c in sum_cols]
    )
    border = F.col("__bkt").desc() if descending else F.col("__bkt").asc()
    wb = Window.orderBy(border).rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "__bkt",
        *[
            F.coalesce(F.sum(f"__bt_{c}").over(wb), F.lit(0)).alias(f"__off_{c}")
            for c in sum_cols
        ],
    )
    sorder = s.desc() if descending else s.asc()
    ww = (
        Window.partitionBy("__bkt")
        .orderBy(sorder)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = g.join(F.broadcast(offsets), "__bkt")
    for c in sum_cols:
        out = out.withColumn(
            f"__prior_{c}",
            F.col(f"__off_{c}") + F.coalesce(F.sum(c).over(ww), F.lit(0)),
        )
    return out.drop("__bkt", *[f"__off_{c}" for c in sum_cols])


def _range_stats(s: F.Column) -> list:
    """min/max over the FINITE score values only (one-row broadcast
    frame for _with_prior_sums): Spark's max treats NaN as the largest
    value, so an unfiltered max poisons the bucket span.  try_cast, not
    cast: a non-numeric score column yields NULL bounds (-> the
    single-bucket degradation) instead of an ANSI mid-stage crash."""
    d = s.try_cast("double")
    finite = F.when(
        F.isnan(d)
        | (d == F.lit(float("inf")))
        | (d == F.lit(float("-inf"))),
        F.lit(None),
    ).otherwise(d)
    return [F.min(finite).alias("__mn"), F.max(finite).alias("__mx")]


def binary_metrics(
    df: DataFrame,
    score_col: str,
    label_col: str = "label",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact evaluation of a binary scorer in ONE pass: confusion counts
    at ``threshold`` plus the exact tie-corrected Mann-Whitney AUC.

    AUC algebra in pure integers (oracle-checkable even though scores
    may be floats): group rows by score -> (cnt, cnt_pos) per distinct
    score; a running count over the score axis gives cnt_less; each
    positive in a group carries the doubled average rank
    R2 = 2*cnt_less + cnt + 1, and
        AUC = (sum_pos R2 - 2 * n1 * (n1 + 1) / 2) / (2 * n1 * n0)
            = (auc_num) / (auc_den).
    The shuffle carries (score, cnt, cnt_pos) — counts, never rows —
    and the running count is the bucket-partitioned two-level prefix
    sum of :func:`_with_prior_sums`, so the distinct-score axis (≈ N
    for raw float scores) never lands on one reducer.  Output one row:
    n_pos, n_neg, tp, fp, tn, fn, auc_num, auc_den, auc.
    """
    y = F.col(label_col).cast("long")
    s = F.col(score_col)
    grouped = df.groupBy(s.alias("__s")).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(y).alias("__pos"),
    )
    raw_stats = df.agg(*_range_stats(s))
    with_less = _with_prior_sums(
        grouped, "__s", ("__cnt",), stats=raw_stats
    ).withColumnRenamed("__prior___cnt", "__less")
    pred_pos = F.col("__s") > F.lit(float(threshold))
    agg = with_less.agg(
        F.sum("__pos").alias("n_pos"),
        F.sum(F.col("__cnt") - F.col("__pos")).alias("n_neg"),
        F.sum(F.when(pred_pos, F.col("__pos")).otherwise(F.lit(0))).alias("tp"),
        F.sum(
            F.when(pred_pos, F.col("__cnt") - F.col("__pos")).otherwise(F.lit(0))
        ).alias("fp"),
        F.sum(
            F.when(~pred_pos, F.col("__cnt") - F.col("__pos")).otherwise(F.lit(0))
        ).alias("tn"),
        F.sum(F.when(~pred_pos, F.col("__pos")).otherwise(F.lit(0))).alias("fn"),
        F.sum(
            F.col("__pos") * (2 * F.col("__less") + F.col("__cnt") + 1)
        ).alias("__sum_r2"),
    )
    return agg.select(
        "n_pos", "n_neg", "tp", "fp", "tn", "fn",
        (F.col("__sum_r2") - F.col("n_pos") * (F.col("n_pos") + 1)).alias(
            "auc_num"
        ),
        (2 * F.col("n_pos") * F.col("n_neg")).alias("auc_den"),
        (
            (F.col("__sum_r2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast(
                "double"
            )
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str = "label",
) -> DataFrame:
    """Exact precision-recall curve: one row per DISTINCT score
    threshold t (predict positive where score >= t), with integer
    confusion counts and precision/recall as one exact division each.

    Same grouped shape as binary_metrics: group to (score, cnt, pos),
    then running sums DESCENDING over the distinct-score axis give the
    cumulative tp/fp at each threshold — counts shuffle, rows never do,
    and the running sums are the two-level bucket-partitioned prefix
    sums of :func:`_with_prior_sums` (inclusive = strict-prior + own),
    so no single-partition sort over the distinct-score axis.
    """
    y = F.col(label_col).cast("long")
    grouped = df.groupBy(F.col(score_col).alias("threshold")).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(y).alias("__pos"),
    )
    tot = df.agg(F.sum(y).alias("__n_pos"))
    raw_stats = df.agg(*_range_stats(F.col(score_col)))
    cum = (
        _with_prior_sums(
            grouped, "threshold", ("__cnt", "__pos"),
            descending=True, stats=raw_stats,
        )
        .select(
            "threshold",
            (F.col("__prior___pos") + F.col("__pos")).alias("tp"),
            (
                F.col("__prior___cnt")
                + F.col("__cnt")
                - F.col("__prior___pos")
                - F.col("__pos")
            ).alias("fp"),
        )
        .crossJoin(F.broadcast(tot))
    )
    return cum.select(
        "threshold",
        "tp",
        "fp",
        (F.col("__n_pos") - F.col("tp")).alias("fn"),
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("precision"),
        (F.col("tp").cast("double") / F.col("__n_pos").cast("double")).alias(
            "recall"
        ),
    )


def gd_step(
    fb: DataFrame,
    labels: DataFrame,
    w: list[float],
    b: float,
    n: int,
    lr: float,
    l2: float,
    dim: int,
    id_col: str = "doc_id",
    label_col: str = "label",
) -> tuple[list[float], float, float]:
    """One full-batch gradient step over a bias-augmented feature table
    — the round body of train_logreg, factored out so the streaming
    trainer (streaming/incremental_logreg.py) can apply the identical
    arithmetic per micro-batch.  Returns (w', b', mean_loss)."""
    spark = fb.sparkSession
    m = _margins(fb, w, b, spark, id_col)
    r = m.join(labels, id_col).select(
        id_col,
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))
         - F.col(label_col).cast("double")).alias("resid"),
        (
            F.when(
                F.col("margin") * (F.col(label_col).cast("double") * 2 - 1) > 0,
                F.log1p(F.exp(-F.abs(F.col("margin")))),
            ).otherwise(
                F.abs(F.col("margin")) + F.log1p(F.exp(-F.abs(F.col("margin"))))
            )
        ).alias("loss"),
    )
    rows = (
        fb.join(r, id_col)
        .groupBy("bucket")
        .agg(
            F.sum(F.col("v") * F.col("resid")).alias("g"),
            F.avg("loss").alias("ml"),
        )
        .collect()
    )
    grad = [0.0] * dim
    gb = 0.0
    ml = 0.0
    for row in rows:
        if row["bucket"] == BIAS_BUCKET:
            gb = row["g"]
            ml = row["ml"]
        else:
            grad[row["bucket"]] = row["g"]
    w2 = [wi - lr * (gi / n + l2 * wi) for wi, gi in zip(w, grad)]
    return w2, b - lr * (gb / n), ml


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram (calibration curve) for a scored binary
    signal: equi-width score bins, per-bin observed positive rate vs
    mean score — the third leg of the eval family beside the exact AUC
    (binary_metrics) and the PR curve.  A well-calibrated quality
    scorer's frac_pos tracks its mean_score; divergence tells a
    curation pipeline its threshold semantics have drifted.

    Scale shape: the same histogram economics as binned_quantiles —
    one 1-row min/max frame broadcast for the bin expression, ONE
    (bin) integer shuffle with map-side partials, read-out on the
    <= bins-row table.  Exactness: counts are integers, mean_score
    sums the score as DECIMAL(28,6) (exact for integer-valued and
    fixed-point scores), frac_pos and mean_score close with one IEEE
    division each — fully oracle-replayable.

    Returns (bin, n, n_pos, frac_pos, mean_score), bins without any
    row absent.  Degenerate span (all scores equal) puts everything
    in bin 0.
    """
    s = F.col(score_col).cast("double")
    lab = F.col(label_col).cast("int")
    # NULL/NaN scores or NULL labels are excluded up front (a NaN score
    # would poison the span; a NULL label would desync n from n_pos)
    df = df.where(
        s.isNotNull() & ~F.isnan(s) & lab.isNotNull()
        & (s != F.lit(float("inf"))) & (s != F.lit(float("-inf")))
    )
    stats = df.agg(F.min(s).alias("__mn"), F.max(s).alias("__mx"))
    span = F.col("__mx") - F.col("__mn")
    b = (
        F.when(span <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(bins - 1),
                F.floor((s - F.col("__mn")) / span * bins).cast("int"),
            )
        )
        .cast("int")
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .select(b.alias("bin"), s.alias("__s"), lab.alias("__l"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__l").cast("long").alias("n_pos"),
            # scale-0 decimal (score pre-scaled by 10^6, exact) — the
            # same one-rounding double-conversion contract as
            # linear_trend's moments
            F.sum(
                (F.col("__s").cast("decimal(28,6)") * F.lit(1000000)).cast(
                    "decimal(34,0)"
                )
            ).alias("__ssum"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
                "frac_pos"
            ),
            (
                (F.col("__ssum").cast("double") / F.lit(1000000.0))
                / F.col("n").cast("double")
            ).alias("mean_score"),
        )
    )


def gini_best_split(df: DataFrame, value: str, label) -> DataFrame:
    """Best decision-stump threshold by exact weighted Gini impurity:
    over every candidate split ``x <= v`` of an integer feature, the
    impurity cost ``(nL·gini_L + nR·gini_R)/N`` — the single-feature
    audit behind "is this quality signal actually separating the
    classes?" and the CART root-node computation.

    Exactness: per-threshold (nL, posL) come from inclusive cumulative
    counts over the distinct-value axis (``_with_prior_sums`` — bounded
    two-level buckets, never a raw-row window); each weighted Gini term
    is ``(n² − pos² − neg²)/n`` with the numerator exact DECIMAL(38,0),
    so every threshold's cost is the same fixed IEEE sequence in any
    engine and the (cost, threshold) struct-min argmin is deterministic
    (the q_ks_stat pattern).  The last value (empty right side) is
    excluded.

    1-row output: threshold, gini_split, n_left, pos_left, n_right,
    pos_right, n_total, pos_total.
    """
    g = df.select(
        F.col(value).alias("__x"),
        # NULL label counts as negative — the q_rank_sum two-group
        # convention, and what the oracle's CASE WHEN replays (review
        # finding: a NULL-label filter would silently drop rows the
        # oracle keeps)
        F.when(label, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("__y"),
    ).filter(F.col("__x").isNotNull())
    vals = g.groupBy("__x").agg(
        F.sum("__y").alias("__p"),
        F.sum(F.lit(1) - F.col("__y")).alias("__q"),
    )
    pri = _with_prior_sums(vals, "__x", ("__p", "__q"))
    tot = g.agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("__y").alias("pos_total")
    )
    cum_p = F.col("__prior___p") + F.col("__p")
    cum_q = F.col("__prior___q") + F.col("__q")
    j = pri.crossJoin(F.broadcast(tot)).select(
        "__x",
        "n_total",
        "pos_total",
        cum_p.alias("__pl"),
        (cum_p + cum_q).alias("__nl"),
    )
    d38 = "decimal(38,0)"

    def _term(n, pos):
        neg = n - pos
        num = (
            n.cast(d38) * n.cast(d38)
            - pos.cast(d38) * pos.cast(d38)
            - neg.cast(d38) * neg.cast(d38)
        ).cast(d38)
        return num.cast("double") / n.cast("double")

    nl, pl = F.col("__nl"), F.col("__pl")
    nr = F.col("n_total") - nl
    pr = F.col("pos_total") - pl
    cost = (_term(nl, pl) + _term(nr, pr)) / F.col("n_total").cast("double")
    scored = j.filter(nr > 0).select(
        F.struct(
            cost.alias("gini_split"),
            F.col("__x").alias("threshold"),
            nl.alias("n_left"),
            pl.alias("pos_left"),
            nr.alias("n_right"),
            pr.alias("pos_right"),
            F.col("n_total"),
            F.col("pos_total"),
        ).alias("__s")
    )
    # a global agg(min(struct)) yields ONE all-NULL row on empty input
    # (all-NULL feature column, or no candidate with nr > 0), while the
    # oracle's ORDER BY ... LIMIT 1 yields ZERO rows — filter the NULL
    # struct so both engines agree on degenerate input (advisor finding)
    best = scored.agg(F.min("__s").alias("b")).where(F.col("b").isNotNull())
    return best.select(
        F.col("b.threshold").alias("threshold"),
        F.col("b.gini_split").alias("gini_split"),
        F.col("b.n_left").alias("n_left"),
        F.col("b.pos_left").alias("pos_left"),
        F.col("b.n_right").alias("n_right"),
        F.col("b.pos_right").alias("pos_right"),
        F.col("b.n_total").alias("n_total"),
        F.col("b.pos_total").alias("pos_total"),
    )


def mcc_cells(df: DataFrame, label, pred) -> DataFrame:
    """Matthews correlation cells from the exact confusion counts —
    the single-number binary verdict :func:`binary_metrics` stops
    short of (it reports the counts and AUC; MCC balances all four
    cells at once, the property accuracy and F1 lack on skewed
    labels).  The coefficient itself needs a sqrt, so the face emits
    the SIGNED SQUARE instead: ``mcc_signed_sq = (num * |num|) /
    den_sq`` with ``num = tp*tn - fp*fn`` and ``den_sq =
    (tp+fp)(tp+fn)(tn+fp)(tn+fn)`` — both exact DECIMAL(38,0)
    integers cast once to double, ONE IEEE division, and
    ``sign(mcc_signed_sq) = sign(mcc)`` with ``|mcc| =
    sqrt(|mcc_signed_sq|)`` as the consumer one-liner.  Degenerate
    margins (any factor 0) yield NULL, the standard convention.

    Shape: ONE map-side-combined aggregate over (label, pred) — four
    conditional counts, nothing else moves.

    1-row output: n_rows, tp, fp, tn, fn, mcc_num, mcc_den_sq,
    mcc_signed_sq.
    """
    l_ = label.cast("boolean")
    p_ = pred.cast("boolean")
    m = df.select(l_.alias("__l"), p_.alias("__p")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum((F.col("__l") & F.col("__p")).cast("long")).alias("tp"),
        F.sum((~F.col("__l") & F.col("__p")).cast("long")).alias("fp"),
        F.sum((~F.col("__l") & ~F.col("__p")).cast("long")).alias("tn"),
        F.sum((F.col("__l") & ~F.col("__p")).cast("long")).alias("fn"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")
    num = (
        d38(F.col("tp")) * d38(F.col("tn"))
        - d38(F.col("fp")) * d38(F.col("fn"))
    ).cast("double")
    den = (
        d38(F.col("tp") + F.col("fp"))
        * d38(F.col("tp") + F.col("fn"))
        * d38(F.col("tn") + F.col("fp"))
        * d38(F.col("tn") + F.col("fn"))
    ).cast("double")
    return m.select(
        "n_rows",
        "tp",
        "fp",
        "tn",
        "fn",
        num.alias("mcc_num"),
        den.alias("mcc_den_sq"),
        F.when(den > 0, (num * F.abs(num)) / den).alias("mcc_signed_sq"),
    )


def lift_gains_cells(
    df: DataFrame, score: str, label, k: int = 10
) -> DataFrame:
    """Decile lift / cumulative-gains table — the targeting verdict
    beside the threshold confusion counts (:func:`binary_metrics`),
    the rank AUC, and the equi-width reliability bins
    (:func:`calibration_bins`): if we act on the TOP score decile,
    how many times the base positive rate do we capture, and how much
    of all positives have we swept after d deciles (the marketing /
    data-curation gains curve)?

    Tie-safe deterministic bucketing: rows collapse to the distinct-
    score axis, strictly-prior counts come from the bucketed two-level
    prefix (:func:`_with_prior_sums`, DESCENDING — no single-reducer
    window), and a whole tie-group lands in the bucket of its FIRST
    rank: ``bucket = (prior * k) DIV N`` — pure integer arithmetic,
    identical in any engine, never splitting tied scores.  Buckets
    can therefore be uneven under heavy ties; n_d says so.

    Cells are exact integers; the cumulative window runs over the
    <= k bucket rows (bounded by construction).  Each report column
    is ONE IEEE division on exact-cast doubles: ``lift = (pos_d * N)
    / (n_d * P)``, ``gain = cum_pos / P``, ``depth = cum_n / N``.

    Output per bucket: bucket, n_d, pos_d, cum_n, cum_pos, n_total,
    pos_total, lift, gain, depth — ordered by bucket (0 = top
    scores).
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(score).alias("__x"), label.cast("long").alias("__y")
    ).filter(F.col("__x").isNotNull())
    vals = g.groupBy("__x").agg(
        F.count(F.lit(1)).alias("__c"), F.sum("__y").alias("__p")
    )
    pri = _with_prior_sums(vals, "__x", ("__c",), descending=True)
    tot = vals.agg(
        F.sum("__c").cast("long").alias("__n"),
        F.sum("__p").cast("long").alias("__pp"),
    )
    bucketed = (
        pri.crossJoin(F.broadcast(tot))
        .withColumn(
            "__bk",
            F.expr(f"CAST(__prior___c * {int(k)} AS BIGINT) DIV __n"),
        )
        .groupBy("__bk")
        .agg(
            F.sum("__c").cast("long").alias("n_d"),
            F.sum("__p").cast("long").alias("pos_d"),
            F.max("__n").alias("n_total"),
            F.max("__pp").alias("pos_total"),
        )
    )
    w = Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, 0)
    cum = bucketed.select(
        F.col("__bk").alias("bucket"),
        "n_d",
        "pos_d",
        F.sum("n_d").over(w).cast("long").alias("cum_n"),
        F.sum("pos_d").over(w).cast("long").alias("cum_pos"),
        "n_total",
        "pos_total",
    )
    return cum.select(
        "bucket",
        "n_d",
        "pos_d",
        "cum_n",
        "cum_pos",
        "n_total",
        "pos_total",
        F.when(
            (F.col("pos_total") > 0) & (F.col("n_d") > 0),
            (F.col("pos_d").cast("double") * F.col("n_total").cast("double"))
            / (F.col("n_d").cast("double") * F.col("pos_total").cast("double")),
        ).alias("lift"),
        F.when(
            F.col("pos_total") > 0,
            F.col("cum_pos").cast("double") / F.col("pos_total").cast("double"),
        ).alias("gain"),
        (F.col("cum_n").cast("double") / F.col("n_total").cast("double")).alias(
            "depth"
        ),
    ).orderBy("bucket")
