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


def test_cms_restore_resumes_exactly(spark):
    """Checkpoint-recovery round trip (r6 advice finding): persist the
    sketch rows + last batch_id, rehydrate a FRESH object, continue —
    the final state must be bit-equal to never having restarted, and a
    replayed delivery of the persisted batch must stay a no-op."""
    b0 = spark.createDataFrame([("a",), ("b",)], "k string")
    b1 = spark.createDataFrame([("a",), ("c",)], "k string")
    sk = StreamingCountMin("k", depth=2, width=256)
    sk.update_batch(b0, batch_id=0)
    persisted = sk.sketch_df(spark)

    sk2 = StreamingCountMin("k", depth=2, width=256)
    sk2.restore(persisted, last_batch_id=0)
    sk2.update_batch(b0, batch_id=0)  # checkpoint replay: no-op
    assert sk2.cells == sk.cells
    sk2.update_batch(b1, batch_id=1)

    ref = StreamingCountMin("k", depth=2, width=256)
    ref.update_batch(b0, batch_id=0)
    ref.update_batch(b1, batch_id=1)
    assert sk2.cells == ref.cells


def test_hll_restore_resumes_exactly(spark):
    b0 = spark.createDataFrame([("a",), ("b",)], "k string")
    b1 = spark.createDataFrame([("b",), ("c",)], "k string")
    g = StreamingCardinality("k", p=6)
    g.update_batch(b0)
    g2 = StreamingCardinality("k", p=6)
    g2.restore(g.registers_df(spark))
    g2.update_batch(b1)
    ref = StreamingCardinality("k", p=6)
    ref.update_batch(b0)
    ref.update_batch(b1)
    assert g2.regs == ref.regs


def test_trainer_restore_round_trips(spark, sf_dir):
    """StreamingKMeans/StreamingLogReg restore: rehydrated state is
    bit-equal (integer sums) / float-equal (weights), and the replay
    guard survives the restart."""
    from npm_mirror_spark.operators.similarity import _quantize
    from npm_mirror_spark.streaming.incremental_kmeans import StreamingKMeans
    from npm_mirror_spark.streaming.incremental_logreg import StreamingLogReg

    e = load_table(spark, sf_dir, "embeddings").select("embedding").limit(40)
    seed = [r["q"] for r in e.select(_quantize("embedding").alias("q")).limit(2).collect()]
    km = StreamingKMeans(seed)
    km.update_batch(e, batch_id=0)
    km2 = StreamingKMeans(seed)
    km2.restore(km.state_rows(), last_batch_id=0)
    assert km2.sums == km.sums and km2.counts == km.counts
    km2.update_batch(e, batch_id=0)  # replay: no-op
    assert km2.counts == km.counts

    d = load_table(spark, sf_dir, "documents").limit(40).select(
        "doc_id", "text", (F.col("doc_id") % 2).cast("int").alias("label")
    )
    lr = StreamingLogReg(dim=64)
    lr.update_batch(d, batch_id=0)
    lr2 = StreamingLogReg(dim=64)
    lr2.restore(lr.model, last_batch_id=0, losses=lr.losses)
    assert lr2.weights == lr.weights and lr2.bias == lr.bias
    lr2.update_batch(d, batch_id=0)  # replay: no-op
    assert lr2.weights == lr.weights


def test_bootstrap_stream_equals_batch_bit_for_bit(spark, sf_dir):
    from npm_mirror_spark.operators.stats import poisson_bootstrap_mean
    from npm_mirror_spark.streaming.incremental_sketch import StreamingBootstrap

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sk = StreamingBootstrap("doc_id", "n_chars", n_resamples=8)
    for mod in (0, 1, 2):
        sk.update_batch(d.where(F.col("doc_id") % 3 == mod), batch_id=mod)
    # at-least-once redelivery of the last batch: must be a no-op
    sk.update_batch(d.where(F.col("doc_id") % 3 == 2), batch_id=2)
    want = sorted(map(tuple, poisson_bootstrap_mean(d, "doc_id", "n_chars", 8).collect()))
    got = sorted(map(tuple, sk.result_df(spark).collect()))
    assert got == want  # exact state AND the closing doubles bit-equal


def test_event_table_stream_equals_batch_bit_for_bit(spark, sf_dir):
    from npm_mirror_spark.operators.temporal import km_cells
    from npm_mirror_spark.streaming.incremental_sketch import StreamingEventTable

    d = load_table(spark, sf_dir, "documents").select(
        F.col("source").alias("g"),
        (F.col("n_chars") % 20).cast("int").alias("t"),
        (F.col("doc_id") % 2).cast("int").alias("e"),
    )
    sk = StreamingEventTable("g", "t", "e")
    for mod in (0, 1, 2):
        sk.update_batch(d.where(F.col("t") % 3 == mod), batch_id=mod)
    # at-least-once redelivery of the last batch: must be a no-op
    sk.update_batch(d.where(F.col("t") % 3 == 2), batch_id=2)
    want = sorted(map(tuple, km_cells(d, "g", "t", "e").collect()))
    got = sorted(map(tuple, sk.result_df(spark).collect()))
    assert got == want


def test_event_table_split_invariance_random_halves(spark, sf_dir):
    """Two different batchings of the same rows must land the same
    state — additive counts are batching-independent by construction."""
    from npm_mirror_spark.streaming.incremental_sketch import StreamingEventTable

    d = load_table(spark, sf_dir, "documents").select(
        F.col("source").alias("g"),
        (F.col("n_chars") % 15).cast("int").alias("t"),
        (F.col("doc_id") % 2).cast("int").alias("e"),
    )
    a = StreamingEventTable("g", "t", "e")
    a.update_batch(d, batch_id=0)
    b = StreamingEventTable("g", "t", "e")
    b.update_batch(d.where(F.col("doc_id") % 2 == 0), batch_id=0)
    b.update_batch(d.where(F.col("doc_id") % 2 == 1), batch_id=1)
    assert a.state == b.state


def test_event_table_preserves_input_types(spark):
    """Review finding: the result schema was hardcoded string/int; it
    must rebuild the caller's group/duration types (bigint durations,
    non-string groups)."""
    from npm_mirror_spark.streaming.incremental_sketch import StreamingEventTable

    d = spark.createDataFrame(
        [(7, 20_000_000_000, 1), (7, 20_000_000_001, 0)],
        "g int, t long, e int",
    )
    sk = StreamingEventTable("g", "t", "e")
    sk.update_batch(d, batch_id=0)
    out = sk.result_df(spark)
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields) == {
        "g": "int", "t": "bigint", "n_risk": "bigint", "d": "bigint", "c": "bigint"
    }
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(7, 20_000_000_000, 2, 1, 0), (7, 20_000_000_001, 1, 0, 1)]


def test_event_table_rejects_non_binary_events(spark):
    """r11 advisor finding: update_batch cast events to int with no 0/1
    guard, so a 2 (or a 0.9, truncating to 0 after the cast) silently
    corrupted c = n - d while the batch km_cells raised on the same
    input — breaking the documented bit-equality.  Both now raise, and
    the validation runs on the DOUBLE view before the int cast."""
    import pytest

    from npm_mirror_spark.streaming.incremental_sketch import StreamingEventTable

    for bad in (2, -1):
        sk = StreamingEventTable("g", "t", "e")
        d = spark.createDataFrame([("a", 1, bad)], "g string, t int, e int")
        with pytest.raises(Exception, match="must be 0/1"):
            sk.update_batch(d, batch_id=0)
    # float 0.9 would truncate to 0 under an after-cast check
    sk = StreamingEventTable("g", "t", "e")
    d = spark.createDataFrame([("a", 1, 0.9)], "g string, t int, e double")
    with pytest.raises(Exception, match="must be 0/1"):
        sk.update_batch(d, batch_id=0)
    # the valid boundary values still pass
    sk = StreamingEventTable("g", "t", "e")
    d = spark.createDataFrame(
        [("a", 1, 0), ("a", 1, 1)], "g string, t int, e int"
    )
    sk.update_batch(d, batch_id=0)
    assert sk.state[("a", 1)] == (2, 1, 1)


def test_digit_pref_stream_equals_batch_bit_for_bit(spark, sf_dir):
    from npm_mirror_spark.operators.checks import digit_preference_cells
    from npm_mirror_spark.streaming.incremental_sketch import (
        StreamingDigitPreference,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"), "o_orderkey"
    )
    sk = StreamingDigitPreference("v")
    for mod in (0, 1, 2):
        sk.update_batch(o.where(F.col("o_orderkey") % 3 == mod), batch_id=mod)
    # at-least-once redelivery of the last batch: must be a no-op
    sk.update_batch(o.where(F.col("o_orderkey") % 3 == 2), batch_id=2)
    want = sorted(map(tuple, digit_preference_cells(o, "v").collect()))
    got = sorted(map(tuple, sk.result_df(spark).collect()))
    assert got == want
    assert len(got) == 10  # zero-filled full axis, like the batch face


def test_digit_pref_split_invariance(spark):
    from npm_mirror_spark.streaming.incremental_sketch import (
        StreamingDigitPreference,
    )

    rows = [(float(i) + 0.7,) for i in range(57)]
    df = spark.createDataFrame(rows, "v double")
    a = StreamingDigitPreference("v")
    a.update_batch(df, batch_id=0)
    b = StreamingDigitPreference("v")
    # deterministic predicate split (a limit() split can pick different
    # rows per job and fake a split-variance failure)
    b.update_batch(df.where(F.col("v") < 20), batch_id=0)
    b.update_batch(df.where(F.col("v") >= 20), batch_id=1)
    assert a.counts == b.counts and a.total == b.total
