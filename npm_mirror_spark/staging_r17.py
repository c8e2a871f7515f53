"""Early-staged registry faces for the r17 driver-window tail.

The r15 and r16 tails are already fully pre-planned (staging_r15.py /
staging_r16.py — docs/DRIVER_WINDOW.md), so late-r14 additions stage
two windows out.  Same contracts as every staged batch; the q_ndcg
oracle COMPOSES the registered q_cosine_topk / q_ann_ivf oracle SQL
(the q_mrr pattern), so its build is deferred to ``build_oracles``.

ALLOWED_BNLJ entry to add at the r17 registration:

    "q_ndcg": "probes (vec_id<5, contract-small) broadcast to corpus —
        inherited from the allowlisted q_cosine_topk / q_ann_ivf
        shapes its two arms reuse",
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
    """Complete ``STAGED_ORACLES`` against the registry (q_ndcg nests
    the q_cosine_topk / q_ann_ivf oracle SQL) and return it — the
    staging_r13.build_oracles pattern; idempotent."""
    STAGED_ORACLES["q_ndcg"] = _ndcg_oracle(registry_oracles)
    return STAGED_ORACLES
