"""Streaming sketch maintenance (streaming/incremental_sketch.py):
split-invariance (streamed state == batch sketch, bit-equal), duplicate
insensitivity across batches for HLL, and real foreachBatch wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_mirror_spark.operators.sketches import (
    count_min_sketch,
    hll_estimate,
    hll_registers,
)
from npm_mirror_spark.streaming.incremental_sketch import (
    StreamingCardinality,
    StreamingCountMin,
)
from npm_mirror_spark.tables import load_table


def test_cms_stream_equals_batch_sketch(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    sk = StreamingCountMin("l_suppkey")
    for mod in (0, 1, 2):
        sk.update_batch(li.where(F.col("l_suppkey") % 3 == mod))
    want = sorted(
        map(tuple, count_min_sketch(li, "l_suppkey").collect())
    )
    got = sorted(map(tuple, sk.sketch_df(spark).collect()))
    assert got == want  # bit-equal to the batch sketch of the union
    est = {
        r["l_suppkey"]: r["est"]
        for r in sk.estimate(li.select("l_suppkey").distinct()).collect()
    }
    exact = {
        r["l_suppkey"]: r["c"]
        for r in li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)


def test_hll_stream_equals_batch_and_ignores_redelivery(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    sk = StreamingCardinality("o_custkey")
    sk.update_batch(o.where(F.col("o_custkey") % 2 == 0))
    sk.update_batch(o.where(F.col("o_custkey") % 2 == 1))
    # at-least-once redelivery: replaying a batch must not change state
    sk.update_batch(o.where(F.col("o_custkey") % 2 == 0))
    want = sorted(map(tuple, hll_registers(o, "o_custkey").collect()))
    got = sorted(map(tuple, sk.registers_df(spark).collect()))
    assert got == want
    batch_est = hll_estimate(hll_registers(o, "o_custkey")).first()
    stream_est = sk.estimate(spark).first()
    assert (stream_est["hll_sum"], stream_est["est"]) == (
        batch_est["hll_sum"], batch_est["est"],
    )


def test_foreachbatch_wiring(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    src = tmp_path / "keys"
    o.coalesce(3).write.parquet(str(src))
    sk = StreamingCardinality("o_custkey")
    stream = spark.readStream.schema(o.schema).parquet(str(src))
    q = sk.attach(stream, str(tmp_path / "cp")).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert sk.n_batches >= 1
    want = sorted(map(tuple, hll_registers(o, "o_custkey").collect()))
    assert sorted(map(tuple, sk.registers_df(spark).collect())) == want


def test_cms_replayed_batch_is_skipped(spark):
    """Review finding: CMS '+' merge is not idempotent, so a
    checkpoint-replayed foreachBatch delivery (same batch_id) must be a
    no-op — and the same guard holds for the SGD/k-means trainers."""
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    sk = StreamingCountMin("k", depth=2, width=256)
    sk.update_batch(df, batch_id=0)
    once = dict(sk.cells)
    sk.update_batch(df, batch_id=0)  # replay: must not double-count
    assert sk.cells == once and sk.n_batches == 1
    sk.update_batch(df, batch_id=1)  # a new batch still lands
    assert sk.n_batches == 2
    assert all(sk.cells[c] == 2 * once[c] for c in once)


def test_trainer_replay_guards(spark, sf_dir):
    from npm_mirror_spark.streaming.incremental_kmeans import StreamingKMeans

    e = load_table(spark, sf_dir, "embeddings").select("embedding").limit(50)
    from npm_mirror_spark.operators.similarity import _quantize

    seed = [r["q"] for r in e.select(_quantize("embedding").alias("q")).limit(2).collect()]
    km = StreamingKMeans(seed)
    km.update_batch(e, batch_id=0)
    counts_once = list(km.counts)
    km.update_batch(e, batch_id=0)  # replay
    assert km.counts == counts_once and km.n_batches == 1
