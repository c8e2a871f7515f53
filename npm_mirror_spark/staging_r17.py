"""Early-staged registry faces for the r17 driver-window tail.

The r15 and r16 tails are already fully pre-planned (staging_r15.py /
staging_r16.py — docs/DRIVER_WINDOW.md), so late-r14 additions stage
two windows out.  Same contracts as every staged batch; the q_ndcg
oracle COMPOSES the registered q_cosine_topk / q_ann_ivf oracle SQL
(the q_mrr pattern), so its build is deferred to ``build_oracles``.

ALLOWED_BNLJ entries to add at the r17 registration:

    "q_ndcg": "probes (vec_id<5, contract-small) broadcast to corpus —
        inherited from the allowlisted q_cosine_topk / q_ann_ivf
        shapes its two arms reuse",
    "q_rbo": "probes (vec_id<5, contract-small) broadcast to corpus —
        the same q_cosine_topk / q_ann_ivf inherited shape",
    "q_weekday_anova": "1-row (n_total, grand-sum) totals broadcast
        onto the 7 weekday groups (the q_anova_cells shape)",
    "q_rank_stability": "_with_prior_sums' (min,max) stats rows, one
        per axis (the q_spearman shape)",

(q_dup_token_share plans a hash-keyed equi join + per-source fold;
q_shift_function per-group windows + a conditional-pivot fold — no
BNLJ in either.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from npm_mirror_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: log2(3) as a decimal-string literal: both engines parse the SAME
#: string to the SAME correctly-rounded double (the _POISSON1_CDF
#: precedent in stats.py), so no libm log runs at query time.
_LOG2_3 = 1.584962500721156


def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-eval nDCG@3 cells per probe — the position-AND-grade
    companion to q_ann_recall (set overlap) and q_mrr (first-hit
    position): the IVF shortlist is scored against graded relevance
    from the exact top-3 (rel = 4 - exact_rank, so the true nearest
    neighbor is worth 3, the third 1, anything else 0).  Same probes /
    k / nprobe / deterministic centroids as q_ann_ivf, so the oracle
    COMPOSES the two already-verified oracle SQLs.

    Determinism: rel1..rel3 are exact integers; DCG = rel1/1.0 +
    rel2/log2(3) + rel3/2.0 is a FIXED 3-term IEEE sequence whose only
    non-trivial constant is the literal ``_LOG2_3`` both engines parse
    identically (no runtime libm); IDCG is the same expression over
    the full judged set (3, 2, 1) — constant because every probe has
    exactly 3 judged docs — and ndcg = dcg/idcg is ONE more division.

    Output per probe: probe_id, rel1, rel2, rel3, dcg, idcg, ndcg —
    ordered by probe_id.  The corpus-level mean nDCG is the consumer
    one-liner this face refuses (a float mean in data-dependent probe
    order).
    """
    from npm_mirror_spark.operators import similarity as sim_ops
    from npm_mirror_spark.queries import _ivf_centroids

    e = _t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    judged = sim_ops.cosine_topk(e, probes, k=3).select(
        F.col("probe_id").alias("__jp"),
        F.col("neighbor_id").alias("__jn"),
        (F.lit(4) - F.col("rank")).cast("long").alias("__rel"),
    )
    run = sim_ops.ivf_topk(
        e, probes, _ivf_centroids(e), k=3, nprobe=2
    ).select(
        F.col("probe_id").alias("__p"),
        F.col("neighbor_id").alias("__n"),
        F.col("rank").alias("__r"),
    )
    j = run.join(
        judged,
        (run["__p"] == judged["__jp"]) & (run["__n"] == judged["__jn"]),
        "left",
    ).select("__p", "__r", F.coalesce("__rel", F.lit(0)).alias("__rel"))
    per = j.groupBy("__p").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("__r") == i, F.col("__rel"))), F.lit(0)
            ).alias(f"rel{i}")
            for i in (1, 2, 3)
        ]
    )
    dcg = (
        F.col("rel1").cast("double") / F.lit(1.0)
        + F.col("rel2").cast("double") / F.lit(_LOG2_3)
        + F.col("rel3").cast("double") / F.lit(2.0)
    )
    idcg = (
        F.lit(3.0) / F.lit(1.0)
        + F.lit(2.0) / F.lit(_LOG2_3)
        + F.lit(1.0) / F.lit(2.0)
    )
    return (
        per.select(
            F.col("__p").alias("probe_id"),
            "rel1",
            "rel2",
            "rel3",
            dcg.alias("dcg"),
            idcg.alias("idcg"),
            (dcg / idcg).alias("ndcg"),
        )
        .orderBy("probe_id")
    )


def _ndcg_oracle(ORACLES: dict[str, str]) -> str:
    """Compose the verified q_cosine_topk / q_ann_ivf oracle SQL into
    the nDCG replay (the q_mrr composition pattern).  Deferred to
    ``build_oracles``."""
    return f"""
WITH judged AS (
  SELECT probe_id, neighbor_id, 4 - rank AS rel
  FROM ({ORACLES["q_cosine_topk"]})
  WHERE probe_id < 5 AND rank <= 3
),
run AS (
  SELECT probe_id, neighbor_id, rank FROM ({ORACLES["q_ann_ivf"]})
),
j AS (
  SELECT run.probe_id, run.rank,
    coalesce(judged.rel, 0) AS rel
  FROM run LEFT JOIN judged
    ON run.probe_id = judged.probe_id
   AND run.neighbor_id = judged.neighbor_id
),
per AS (
  SELECT probe_id,
    coalesce(max(CASE WHEN rank = 1 THEN rel END), 0) AS rel1,
    coalesce(max(CASE WHEN rank = 2 THEN rel END), 0) AS rel2,
    coalesce(max(CASE WHEN rank = 3 THEN rel END), 0) AS rel3
  FROM j GROUP BY probe_id
)
SELECT probe_id,
  CAST(rel1 AS BIGINT) AS rel1,
  CAST(rel2 AS BIGINT) AS rel2,
  CAST(rel3 AS BIGINT) AS rel3,
  CAST(rel1 AS DOUBLE) / 1.0
    + CAST(rel2 AS DOUBLE) / {_LOG2_3!r}
    + CAST(rel3 AS DOUBLE) / 2.0 AS dcg,
  3.0 / 1.0 + 2.0 / {_LOG2_3!r} + 1.0 / 2.0 AS idcg,
  (CAST(rel1 AS DOUBLE) / 1.0
    + CAST(rel2 AS DOUBLE) / {_LOG2_3!r}
    + CAST(rel3 AS DOUBLE) / 2.0)
  / (3.0 / 1.0 + 2.0 / {_LOG2_3!r} + 1.0 / 2.0) AS ndcg
FROM per ORDER BY probe_id
"""


STAGED_QUERIES = {
    "q_ndcg": q_ndcg,
}

STAGED_ORACLES: dict[str, str] = {}


def build_oracles(registry_oracles: dict[str, str]) -> dict[str, str]:
    """Complete ``STAGED_ORACLES`` against the registry (q_ndcg and
    q_rbo nest the q_cosine_topk / q_ann_ivf oracle SQL;
    q_dup_token_share replays the shared ``_NORM``) and return it —
    the staging_r13.build_oracles pattern; idempotent."""
    from npm_mirror_spark.queries import _NORM

    STAGED_ORACLES["q_ndcg"] = _ndcg_oracle(registry_oracles)
    STAGED_ORACLES["q_rbo"] = _rbo_oracle(registry_oracles)
    STAGED_ORACLES["q_dup_token_share"] = _dup_token_share_oracle(_NORM)
    return STAGED_ORACLES


def q_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap @3 (p = 0.9) between the IVF shortlist and
    the exact top-3, per probe — the prefix-overlap curve the other
    three retrieval-eval faces don't read: recall@k sees sets, MRR
    sees the first hit, nDCG sees graded positions; RBO weights
    AGREEMENT OF PREFIXES, so a list that gets the top-1 right but
    scrambles 2-3 scores differently from one that nails 2-3 and
    misses the top-1 (Webber et al. 2010, truncated form).

    Determinism: the overlaps o1..o3 (|exact[:i] ∩ ann[:i]|) are exact
    integers from ONE equi join on (probe, neighbor); rbo = 0.1 *
    (o1/1.0 + 0.9*o2/2.0 + 0.81*o3/3.0) is a FIXED IEEE sequence whose
    p-power constants are decimal-string literals both engines parse
    identically (0.1 is the literal weight, not a runtime 1-p).

    Output per probe: probe_id, o1, o2, o3, rbo — ordered by probe_id.
    """
    from npm_mirror_spark.operators import similarity as sim_ops
    from npm_mirror_spark.queries import _ivf_centroids

    e = _t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = sim_ops.cosine_topk(e, probes, k=3).select(
        F.col("probe_id").alias("__jp"),
        F.col("neighbor_id").alias("__jn"),
        F.col("rank").alias("__re"),
    )
    run = sim_ops.ivf_topk(
        e, probes, _ivf_centroids(e), k=3, nprobe=2
    ).select(
        F.col("probe_id").alias("__p"),
        F.col("neighbor_id").alias("__n"),
        F.col("rank").alias("__ra"),
    )
    j = run.join(
        exact,
        (run["__p"] == exact["__jp"]) & (run["__n"] == exact["__jn"]),
        "inner",
    )
    per = (
        probes.select("probe_id")
        .join(
            j.groupBy("__p").agg(
                *[
                    F.sum(
                        F.when(
                            (F.col("__re") <= i) & (F.col("__ra") <= i), 1
                        ).otherwise(0)
                    ).alias(f"o{i}")
                    for i in (1, 2, 3)
                ]
            ),
            probes["probe_id"] == F.col("__p"),
            "left",
        )
        .select(
            "probe_id",
            *[F.coalesce(f"o{i}", F.lit(0)).alias(f"o{i}") for i in (1, 2, 3)],
        )
    )
    rbo = F.lit(0.1) * (
        F.col("o1").cast("double") / F.lit(1.0)
        + F.lit(0.9) * F.col("o2").cast("double") / F.lit(2.0)
        + F.lit(0.81) * F.col("o3").cast("double") / F.lit(3.0)
    )
    return per.select(
        "probe_id", "o1", "o2", "o3", rbo.alias("rbo")
    ).orderBy("probe_id")


def _rbo_oracle(ORACLES: dict[str, str]) -> str:
    """Compose the verified q_cosine_topk / q_ann_ivf oracle SQL into
    the RBO replay.  Deferred to ``build_oracles``."""
    return f"""
WITH exact AS (
  SELECT probe_id, neighbor_id, rank FROM ({ORACLES["q_cosine_topk"]})
  WHERE probe_id < 5 AND rank <= 3
),
run AS (
  SELECT probe_id, neighbor_id, rank FROM ({ORACLES["q_ann_ivf"]})
),
j AS (
  SELECT run.probe_id, exact.rank AS re, run.rank AS ra
  FROM run JOIN exact
    ON run.probe_id = exact.probe_id
   AND run.neighbor_id = exact.neighbor_id
),
agg AS (
  SELECT probe_id,
    sum(CASE WHEN re <= 1 AND ra <= 1 THEN 1 ELSE 0 END) AS o1,
    sum(CASE WHEN re <= 2 AND ra <= 2 THEN 1 ELSE 0 END) AS o2,
    sum(CASE WHEN re <= 3 AND ra <= 3 THEN 1 ELSE 0 END) AS o3
  FROM j GROUP BY probe_id
),
probes AS (SELECT DISTINCT probe_id FROM exact)
SELECT probes.probe_id,
  CAST(coalesce(o1, 0) AS BIGINT) AS o1,
  CAST(coalesce(o2, 0) AS BIGINT) AS o2,
  CAST(coalesce(o3, 0) AS BIGINT) AS o3,
  0.1 * (CAST(coalesce(o1, 0) AS DOUBLE) / 1.0
         + 0.9 * CAST(coalesce(o2, 0) AS DOUBLE) / 2.0
         + 0.81 * CAST(coalesce(o3, 0) AS DOUBLE) / 3.0) AS rbo
FROM probes LEFT JOIN agg ON probes.probe_id = agg.probe_id
ORDER BY probes.probe_id
"""


def q_weekday_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal-strength cells: one-way ANOVA of the daily
    order counts across the 7 weekday groups — how much of daily
    volume variance IS the weekly cycle?  The variance-decomposition
    reading next to q_morans_i (lag-7 co-movement) and q_seasonal_mk
    (within-weekday trend) on the same calendar; eta^2 =
    Sigma between_term / (Sigma between + Sigma within) is the
    consumer one-liner over the 7 emitted rows.
    (operators/stats.py anova_cells, the q_anova_cells machinery on
    a calendar fixture.)"""
    from npm_mirror_spark.operators.stats import anova_cells

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day")
    ).filter(F.col("day").isNotNull())
    daily = o.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    g = daily.select(F.weekday("day").alias("wd"), "n")
    return anova_cells(g, "n", "wd")


_WEEKDAY_ANOVA_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders
  WHERE o_orderdate IS NOT NULL GROUP BY CAST(o_orderdate AS DATE)
),
g AS (SELECT isodow(day) - 1 AS wd, CAST(n AS BIGINT) AS x FROM daily),
per AS (
  SELECT wd, CAST(count(*) AS BIGINT) AS n_i,
    sum(CAST(x AS HUGEINT)) AS s,
    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q
  FROM g GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
    sum(CAST(x AS HUGEINT)) AS st
  FROM g
),
m AS (
  SELECT per.wd, per.n_i, per.s, per.q, tot.n_total,
    CAST(CAST(per.s AS VARCHAR) AS DOUBLE) / CAST(per.n_i AS DOUBLE)
      AS mean_i,
    CAST(CAST(tot.st AS VARCHAR) AS DOUBLE) / CAST(tot.n_total AS DOUBLE)
      AS grand_mean
  FROM per CROSS JOIN tot
)
SELECT wd, n_i,
  CAST(CAST(s AS VARCHAR) AS DOUBLE) AS sum_i,
  mean_i,
  CAST(CAST(n_i * q - s * s AS VARCHAR) AS DOUBLE)
    / CAST(n_i AS DOUBLE) AS within_ss,
  CAST(n_i AS DOUBLE) * ((mean_i - grand_mean) * (mean_i - grand_mean))
    AS between_term,
  n_total, grand_mean
FROM m
ORDER BY wd
"""


def q_dup_token_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted exact-duplicate share per source — the curation
    metric the doc-level q_dup_rate_by_source understates: a source
    whose few duplicated docs are its LONGEST ones wastes far more
    training tokens than its doc-level dup rate suggests.  Dup status
    is corpus-wide (normalized sha256 hash count > 1), grouped by
    source; token counts are the whitespace tokenizer's exact ints;
    the share is ONE division.

    Output per source: source, n_docs, n_dup_docs, tokens_total,
    tokens_dup, dup_token_share — ordered by source.
    """
    from npm_mirror_spark.operators.dedup import text_hash
    from npm_mirror_spark.operators.text import ws_token_count

    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    ).select(
        "source",
        text_hash("text").alias("__h"),
        ws_token_count("text").cast("long").alias("__ntok"),
    )
    counts = d.groupBy("__h").agg(F.count(F.lit(1)).alias("__cnt"))
    j = d.join(counts, "__h")
    dup = F.col("__cnt") > 1
    per = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(dup, 1).otherwise(0)).alias("n_dup_docs"),
        F.sum("__ntok").alias("tokens_total"),
        F.sum(F.when(dup, F.col("__ntok")).otherwise(0)).alias(
            "tokens_dup"
        ),
    )
    return per.select(
        "source",
        "n_docs",
        "n_dup_docs",
        "tokens_total",
        "tokens_dup",
        F.when(
            F.col("tokens_total") > 0,
            F.col("tokens_dup").cast("double")
            / F.col("tokens_total").cast("double"),
        ).alias("dup_token_share"),
    ).orderBy("source")


def _dup_token_share_oracle(_NORM: str) -> str:
    """Replay with the registry's shared normalization (deferred to
    ``build_oracles`` for the same reason as q_ngram_novelty)."""
    return f"""
WITH d AS (
  SELECT source, sha256({_NORM}) AS h,
    CAST(len(str_split({_NORM}, ' ')) AS BIGINT) AS ntok
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
c AS (SELECT h, count(*) AS cnt FROM d GROUP BY h),
j AS (SELECT d.source, d.ntok, c.cnt FROM d JOIN c ON d.h = c.h)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
  CAST(sum(ntok) AS BIGINT) AS tokens_total,
  CAST(sum(CASE WHEN cnt > 1 THEN ntok ELSE 0 END) AS BIGINT)
    AS tokens_dup,
  CASE WHEN sum(ntok) > 0
       THEN CAST(sum(CASE WHEN cnt > 1 THEN ntok ELSE 0 END) AS DOUBLE)
            / CAST(sum(ntok) AS DOUBLE)
       END AS dup_token_share
FROM j GROUP BY source
ORDER BY source
"""


STAGED_QUERIES.update(
    {
        "q_rbo": q_rbo,
        "q_weekday_anova": q_weekday_anova,
        "q_dup_token_share": q_dup_token_share,
    }
)

STAGED_ORACLES["q_weekday_anova"] = _WEEKDAY_ANOVA_SQL


def q_shift_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doksum shift function at the octiles between returned-line and
    kept-line quantities — WHERE the shift q_hodges_lehmann summarizes
    as one number actually lives (flat center + divergent tail = the
    contaminated-corpus signature).  (operators/stats.py
    shift_function_cells.)"""
    from npm_mirror_spark.operators.stats import shift_function_cells

    li = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    return shift_function_cells(li, "qty", F.col("ret"))


def _octile_case(side: str) -> str:
    return " ".join(
        f"WHEN {i} THEN {side}{i}" for i in range(1, 8)
    )


_SHIFT_SQL = f"""
WITH src AS (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS v,
    coalesce(l_returnflag = 'R', FALSE) AS a
  FROM lineitem WHERE l_quantity IS NOT NULL
),
gv AS (SELECT a, v, count(*) AS c FROM src GROUP BY a, v),
pri AS (
  SELECT a, v, c,
    coalesce(sum(c) OVER (PARTITION BY a ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p,
    sum(c) OVER (PARTITION BY a) AS n
  FROM gv
),
per AS (
  SELECT a,
{",".join(
    f'''    CASE WHEN (n * {i}) % 8 = 0
         THEN min(CASE WHEN p + c >= (n * {i}) // 8 THEN v END)
              + min(CASE WHEN p + c >= (n * {i}) // 8 + 1 THEN v END)
         ELSE 2 * min(CASE WHEN p + c >= (n * {i}) // 8 + 1 THEN v END)
    END AS e{i}''' for i in range(1, 8)
)}
  FROM pri GROUP BY a, n
),
one AS (
  SELECT
{",".join(
    f"    max(CASE WHEN a THEN e{i} END) AS a{i},"
    f" max(CASE WHEN NOT a THEN e{i} END) AS b{i}" for i in range(1, 8)
)}
  FROM per
)
SELECT o.i AS octile,
  CAST(CASE o.i {_octile_case("a")} END AS DOUBLE) AS qa_2,
  CAST(CASE o.i {_octile_case("b")} END AS DOUBLE) AS qb_2,
  CAST(CASE o.i {_octile_case("a")} END
       - CASE o.i {_octile_case("b")} END AS DOUBLE) AS diff_x2
FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) o(i) CROSS JOIN one
ORDER BY octile
"""


def q_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-half rank stability of user activity: Spearman rho
    between each user's even-event-id and odd-event-id counts — the
    reliability question for any per-user ranking signal (a ranking
    that can't agree with itself across a random half-split can't be
    trusted against tomorrow's data).  Registered spearman_rho
    machinery on the deterministic parity split.  (operators/stats.py
    spearman_rho.)"""
    from npm_mirror_spark.operators.stats import spearman_rho

    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_id").isNotNull()
    )
    d = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_id") % 2 == 0, 1).otherwise(0)).alias(
            "h_even"
        ),
        F.sum(F.when(F.col("event_id") % 2 != 0, 1).otherwise(0)).alias(
            "h_odd"
        ),
    )
    out = spearman_rho(d, "h_even", "h_odd")
    # driver-hashable contract: decimal accumulators stay internal,
    # the face reports correctly-rounded doubles (the q_spearman
    # _nodec convention, paired with the oracle's VARCHAR route)
    from pyspark.sql.types import DecimalType

    return out.select(
        *[
            F.col(f.name).cast("double").alias(f.name)
            if isinstance(f.dataType, DecimalType)
            else F.col(f.name)
            for f in out.schema.fields
        ]
    )


def _rank_stability_oracle() -> str:
    head = """
WITH r0 AS (
  SELECT
    sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS x,
    sum(CASE WHEN event_id % 2 != 0 THEN 1 ELSE 0 END) AS y
  FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
  GROUP BY user_id
),"""
    tail = """
vx AS (SELECT x, count(*) AS c FROM r0 GROUP BY 1),
px AS (
  SELECT x,
         2 * coalesce(sum(c) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS rx
  FROM vx),
vy AS (SELECT y, count(*) AS c FROM r0 GROUP BY 1),
py AS (
  SELECT y,
         2 * coalesce(sum(c) OVER (ORDER BY y
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS ry
  FROM vy),
j AS (SELECT px.rx, py.ry FROM r0 JOIN px USING (x) JOIN py USING (y)),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         sum(CAST(rx AS HUGEINT)) AS s_rx,
         sum(CAST(ry AS HUGEINT)) AS s_ry,
         sum(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS s_rxx,
         sum(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS s_ryy,
         sum(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS s_rxy
  FROM j),
r AS (
  SELECT *,
         CAST(n_rows AS HUGEINT) * s_rxy - s_rx * s_ry AS rho_num,
         CAST(n_rows AS HUGEINT) * s_rxx - s_rx * s_rx AS rho_d1,
         CAST(n_rows AS HUGEINT) * s_ryy - s_ry * s_ry AS rho_d2
  FROM m)
SELECT n_rows,
       CAST(CAST(s_rx AS VARCHAR) AS DOUBLE) AS s_rx,
       CAST(CAST(s_ry AS VARCHAR) AS DOUBLE) AS s_ry,
       CAST(CAST(s_rxx AS VARCHAR) AS DOUBLE) AS s_rxx,
       CAST(CAST(s_ryy AS VARCHAR) AS DOUBLE) AS s_ryy,
       CAST(CAST(s_rxy AS VARCHAR) AS DOUBLE) AS s_rxy,
       CAST(CAST(rho_num AS VARCHAR) AS DOUBLE) AS rho_num,
       CAST(CAST(rho_d1 AS VARCHAR) AS DOUBLE) AS rho_d1,
       CAST(CAST(rho_d2 AS VARCHAR) AS DOUBLE) AS rho_d2,
       (CAST(CAST(rho_num AS VARCHAR) AS DOUBLE)
          / CAST(CAST(rho_d1 AS VARCHAR) AS DOUBLE))
         * (CAST(CAST(rho_num AS VARCHAR) AS DOUBLE)
              / CAST(CAST(rho_d2 AS VARCHAR) AS DOUBLE)) AS rho2,
       CAST(sign(CAST(CAST(rho_num AS VARCHAR) AS DOUBLE)) AS INTEGER)
         AS rho_sign
FROM r
"""
    return head + tail


STAGED_QUERIES.update(
    {
        "q_shift_function": q_shift_function,
        "q_rank_stability": q_rank_stability,
    }
)

STAGED_ORACLES["q_shift_function"] = _SHIFT_SQL
STAGED_ORACLES["q_rank_stability"] = _rank_stability_oracle()
