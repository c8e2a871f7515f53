"""Streaming mini-batch k-means (streaming/incremental_kmeans.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from npm_mirror_spark.operators.similarity import kmeans_assign, train_kmeans
from npm_mirror_spark.streaming.incremental_kmeans import StreamingKMeans
from npm_mirror_spark.tables import load_table


def _init_from_first(e, k):
    rows = e.orderBy("vec_id").limit(k).select("embedding").collect()
    return [
        [int(np.floor(float(x) * (1 << 24))) for x in r["embedding"]]
        for r in rows
    ]


def test_one_batch_equals_one_lloyd_round(spark, sf_dir):
    """Feeding ALL data as one batch from a fresh state must reproduce
    train_kmeans(n_iter=1) from the same init, bit-for-bit — the exact-
    arithmetic contract that makes the streaming face auditable."""
    e = load_table(spark, sf_dir, "embeddings")
    init = _init_from_first(e, 4)
    sk = StreamingKMeans(init)
    sk.update_batch(e)
    batch = train_kmeans(e, k=4, n_iter=1)  # same first-k init
    assert sk.centroids_q == batch["centroids_q"]


def test_batch_split_invariance(spark, sf_dir):
    """Splitting one round's data across micro-batches changes the
    algorithm (assignments drift with the centroids) — but splitting
    WITHIN one update is invisible: integer sums are associative. Here:
    two disjoint halves fed as ONE union batch equal the full batch."""
    e = load_table(spark, sf_dir, "embeddings")
    init = _init_from_first(e, 4)
    a = StreamingKMeans(init)
    a.update_batch(e)
    b = StreamingKMeans(init)
    b.update_batch(
        e.filter(F.col("vec_id") % 2 == 0).unionByName(
            e.filter(F.col("vec_id") % 2 == 1)
        )
    )
    assert a.centroids_q == b.centroids_q


def test_minibatch_sequence_improves_fit(spark, sf_dir):
    """Feeding the corpus in 4 chunks must reduce total within-cluster
    quantized squared distance vs the seed centroids."""
    e = load_table(spark, sf_dir, "embeddings")
    init = _init_from_first(e, 4)

    def cost(cents):
        """Exact total within-cluster quantized squared distance."""
        from npm_mirror_spark.operators.similarity import _quantize

        joined = e.join(kmeans_assign(e, cents), "vec_id")
        q = _quantize("embedding")
        total = 0
        for cid, c in enumerate(cents):
            d = F.aggregate(
                F.zip_with(
                    q,
                    F.array(*[F.lit(int(x)) for x in c]),
                    lambda y, z: (y - z) * (y - z),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            total += (
                joined.filter(F.col("cluster") == cid).agg(F.sum(d)).first()[0]
                or 0
            )
        return total

    sk = StreamingKMeans(init)
    for i in range(4):
        sk.update_batch(e.filter(F.col("vec_id") % 4 == i))
    assert cost(sk.centroids_q) < cost(init)


def test_foreachbatch_wiring_and_state_rows(spark, sf_dir, tmp_path):
    """Drive it through a real availableNow stream and check the state
    matches the same batches applied directly."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    init = _init_from_first(e, 4)
    src = tmp_path / "vecs"
    e.coalesce(2).write.parquet(str(src))

    sk = StreamingKMeans(init)
    stream = spark.readStream.schema(e.schema).parquet(str(src))
    q = sk.attach(stream, str(tmp_path / "cp")).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert sk.n_batches >= 1
    assert sum(sk.counts) == e.count()

    rows = sk.state_rows()
    assert len(rows) == 4 * len(init[0])
    restored = StreamingKMeans(init)
    for c, p, s, cnt in rows:
        restored.sums[c][p] = s
        if p == 0:
            restored.counts[c] = cnt
    assert restored.centroids_q == sk.centroids_q
