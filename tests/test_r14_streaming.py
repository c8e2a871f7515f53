"""StreamingMoments: stream/batch bit-parity for the power-sum moment
sketch (the StreamingDigitPreference discipline — additive exact
integer state, redelivery no-op, split invariance, and a real
availableNow drain through attach())."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from npm_mirror_spark.tables import load_table


def test_moments_stream_equals_batch_bit_for_bit(spark, sf_dir):
    from npm_mirror_spark.operators.stats import moments_jb_cells
    from npm_mirror_spark.streaming.incremental_sketch import StreamingMoments

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_id"
    ).filter(F.col("day").isNotNull())
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    sk = StreamingMoments("n")
    # deterministic predicate split on the day axis
    for mod in (0, 1, 2):
        sk.update_batch(
            daily.where(F.dayofmonth("day") % 3 == mod), batch_id=mod
        )
    # at-least-once redelivery of the last batch: must be a no-op
    sk.update_batch(daily.where(F.dayofmonth("day") % 3 == 2), batch_id=2)
    want = moments_jb_cells(daily, "n").collect()[0]
    got = sk.result_df(spark).collect()[0]
    assert tuple(got) == tuple(want)  # bit-equal, including jb


def test_moments_split_invariance(spark):
    from npm_mirror_spark.streaming.incremental_sketch import StreamingMoments

    rows = [(i * i % 37 - 11,) for i in range(61)]
    df = spark.createDataFrame(rows, "v long")
    a = StreamingMoments("v")
    a.update_batch(df, batch_id=0)
    b = StreamingMoments("v")
    b.update_batch(df.where(F.col("v") < 5), batch_id=0)
    b.update_batch(df.where(F.col("v") >= 5), batch_id=1)
    assert (a.n, a.s) == (b.n, b.s)


def test_moments_empty_and_null_batches(spark):
    from npm_mirror_spark.streaming.incremental_sketch import StreamingMoments

    sk = StreamingMoments("v")
    sk.update_batch(spark.createDataFrame([], "v long"), batch_id=0)
    sk.update_batch(
        spark.createDataFrame([(None,), (3,)], "v long"), batch_id=1
    )
    assert (sk.n, sk.s) == (1, [3, 9, 27, 81])
    r = sk.result_df(spark).collect()[0]
    assert r["n_rows"] == 1 and r["jb"] is None  # m2 = 0 for one row


def test_moments_available_now_drain(spark, tmp_path):
    """A real readStream -> attach() drain over a rate-limited file
    source equals the batch fold of the same files."""
    from npm_mirror_spark.operators.stats import moments_jb_cells
    from npm_mirror_spark.streaming.incremental_sketch import StreamingMoments

    src = tmp_path / "src"
    src.mkdir()
    batch = spark.createDataFrame(
        [(i % 13,) for i in range(200)], "v long"
    )
    batch.coalesce(2).write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema("v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sk = StreamingMoments("v")
    q = sk.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert sk.n_batches >= 2  # maxFilesPerTrigger forced multiple batches
    want = moments_jb_cells(
        spark.read.parquet(str(src)), "v"
    ).collect()[0]
    got = sk.result_df(spark).collect()[0]
    assert tuple(got) == tuple(want)


# --------------------------------------------------- StreamingRecords


def test_records_stream_equals_batch_bit_for_bit(spark, sf_dir):
    """Ordered day-range batches over the per-priority daily order
    counts reproduce foster_stuart_cells exactly (order-dependent
    state under the ordered-replay contract)."""
    from npm_mirror_spark.operators.stats import foster_stuart_cells
    from npm_mirror_spark.streaming.incremental_sketch import (
        StreamingRecords,
    )

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    cuts = ["1993-01-01", "1995-01-01", "1997-01-01"]
    sk = StreamingRecords("o_orderpriority", "day", "n")
    lo = None
    for i, hi in enumerate(cuts + [None]):
        b = daily
        if lo is not None:
            b = b.where(F.col("day") >= lo)
        if hi is not None:
            b = b.where(F.col("day") < hi)
        sk.update_batch(b, batch_id=i)
        lo = hi
    # at-least-once redelivery of the final batch: no-op
    sk.update_batch(daily.where(F.col("day") >= cuts[-1]), batch_id=3)
    want = foster_stuart_cells(daily, "o_orderpriority", "day", "n").collect()
    got = sk.result_df(spark).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_records_out_of_order_batch_raises(spark):
    import datetime as dt

    from npm_mirror_spark.streaming.incremental_sketch import (
        StreamingRecords,
    )

    D = dt.date
    sk = StreamingRecords("g", "d", "v")
    early = spark.createDataFrame(
        [("A", D(2024, 1, 5), 3)], "g string, d date, v long"
    )
    sk.update_batch(early, batch_id=0)
    late = spark.createDataFrame(
        [("A", D(2024, 1, 2), 9)], "g string, d date, v long"
    )
    with pytest.raises(ValueError, match="ordered-replay"):
        sk.update_batch(late, batch_id=1)


def test_records_available_now_drain(spark, tmp_path):
    """A real readStream -> attach() drain over two sequentially
    written files (oldest-first file source order) equals the batch
    operator over their union."""
    import datetime as dt

    from npm_mirror_spark.operators.stats import foster_stuart_cells
    from npm_mirror_spark.streaming.incremental_sketch import (
        StreamingRecords,
    )

    D = dt.date
    src = tmp_path / "src"
    src.mkdir()
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
    rows = [("G", D(2024, 1, i + 1), v) for i, v in enumerate(vals)]
    schema = "g string, d date, v long"
    spark.createDataFrame(rows[:10], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    first_files = {p for p in src.iterdir() if p.suffix == ".parquet"}
    spark.createDataFrame(rows[10:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    second_files = {
        p for p in src.iterdir() if p.suffix == ".parquet"
    } - first_files
    # the file source orders by modification time: pin distinct mtimes
    # explicitly so coarse-mtime filesystems can't flip the two files
    # (StreamingRecords would raise its ordered-replay error)
    import os
    import time as _time

    now = _time.time()
    for i, group in enumerate((first_files, second_files)):
        for part in group:
            os.utime(part, (now - 10 + i, now - 10 + i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    sk = StreamingRecords("g", "d", "v")
    q = sk.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert sk.n_batches >= 2
    want = foster_stuart_cells(
        spark.createDataFrame(rows, schema), "g", "d", "v"
    ).collect()
    got = sk.result_df(spark).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
