"""Streaming sketch maintenance — the continuous-ingest face of
operators/sketches.py (Count-Min and HyperLogLog).

Mergeable sketches ARE streaming state: a micro-batch's sketch folds
into the running sketch cell-wise (+ for CMS counts, max for HLL
ranks), and because both operators use exact integer arithmetic with
seeded md5 hashes, the streamed state after any drain is BIT-EQUAL to
the batch sketch of everything ingested so far — split-invariance the
tests pin exactly (the same discipline as StreamingKMeans, which this
module mirrors structurally).

Per micro-batch: one bounded-output aggregation job (depth x width /
2^p rows to the driver-held dict), nothing corpus-sized retained.
State is checkpointable as plain (r, b, c) / (idx, mreg) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from npm_mirror_spark.operators.sketches import (
    count_min_estimate,
    count_min_sketch,
    hll_estimate,
    hll_registers,
)


class StreamingCountMin:
    """Running Count-Min over a stream of keys.

    After any number of ``update_batch`` calls, ``cells`` equals the
    batch ``count_min_sketch`` of the concatenated input exactly."""

    def __init__(self, key_col: str, depth: int = 4, width: int = 64):
        self.key_col = key_col
        self.depth = depth
        self.width = width
        self.cells: dict[tuple[int, int], int] = {}
        self.n_batches = 0
        self._last_batch: int | None = None

    def update_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        # review finding: CMS '+' merge is NOT idempotent (unlike HLL
        # max), so a checkpoint-replayed foreachBatch micro-batch must
        # be skipped by its batch_id — the same transactional-sink
        # contract SnapshotStore.commit(token=...) applies
        if batch_id is not None and batch_id == self._last_batch:
            return
        rows = count_min_sketch(
            batch_df, self.key_col, self.depth, self.width
        ).collect()
        for r in rows:
            key = (r["r"], r["b"])
            self.cells[key] = self.cells.get(key, 0) + r["c"]
        self.n_batches += 1
        self._last_batch = batch_id

    def sketch_df(self, spark) -> DataFrame:
        rows = [(r, b, c) for (r, b), c in sorted(self.cells.items())]
        return spark.createDataFrame(rows or [], "r int, b int, c long")

    def restore(self, sketch_df: DataFrame, last_batch_id: int | None = None) -> None:
        """Rehydrate the sketch from a persisted ``sketch_df`` (the
        (r, b, c) rows this object wrote) plus the batch_id it was
        persisted AFTER — the missing half of checkpoint recovery (r6
        advice finding): a restarted driver resumes the stream from the
        checkpoint, so without restoring the cells the committed
        batches are silently lost and every estimate undercounts.
        Persist (sketch_df, last applied batch_id) transactionally with
        each batch (e.g. SnapshotStore.commit(token=batch_id)) and
        restore both before re-attaching."""
        self.cells = {
            (r["r"], r["b"]): r["c"] for r in sketch_df.collect()
        }
        self._last_batch = last_batch_id

    def estimate(self, probes: DataFrame) -> DataFrame:
        return count_min_estimate(
            self.sketch_df(probes.sparkSession),
            probes,
            self.key_col,
            self.depth,
            self.width,
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        """Wire onto a stream.  State lives on THIS object, not in the
        checkpoint: recovering a restarted driver from ``checkpoint``
        requires :meth:`restore` with the last persisted sketch first
        (or a fresh checkpoint dir to replay the source from scratch) —
        attaching empty to an advanced checkpoint undercounts."""
        return (
            stream.writeStream.foreachBatch(self.update_batch)
            .option("checkpointLocation", checkpoint)
        )


class StreamingCardinality:
    """Running HyperLogLog distinct-count over a stream of keys.

    Register merge is cell-wise max, so the state is insensitive to
    duplication ACROSS batches too — re-delivered keys (at-least-once
    sources) cannot inflate the estimate, which is exactly why HLL, not
    a counter, is the streaming distinct gauge."""

    def __init__(self, key_col: str, p: int = 8):
        self.key_col = key_col
        self.p = p
        self.regs: dict[int, int] = {}
        self.n_batches = 0

    def update_batch(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        rows = hll_registers(batch_df, self.key_col, self.p).collect()
        for r in rows:
            if r["mreg"] > self.regs.get(r["idx"], 0):
                self.regs[r["idx"]] = r["mreg"]
        self.n_batches += 1

    def registers_df(self, spark) -> DataFrame:
        rows = sorted(self.regs.items())
        return spark.createDataFrame(rows or [], "idx int, mreg int")

    def restore(self, registers_df: DataFrame) -> None:
        """Rehydrate from persisted (idx, mreg) rows before re-attaching
        a recovered stream.  No batch_id needed: register max-merge is
        idempotent, so even a replayed batch folds harmlessly."""
        self.regs = {r["idx"]: r["mreg"] for r in registers_df.collect()}

    def estimate(self, spark) -> DataFrame:
        return hll_estimate(self.registers_df(spark), self.p)

    def attach(self, stream: DataFrame, checkpoint: str):
        """State lives on THIS object: recovering a restarted driver
        from ``checkpoint`` requires :meth:`restore` with the last
        persisted registers first (or a fresh checkpoint dir); an empty
        gauge against an advanced checkpoint undercounts distincts."""
        return (
            stream.writeStream.foreachBatch(self.update_batch)
            .option("checkpointLocation", checkpoint)
        )


class StreamingBootstrap:
    """Running Poisson-bootstrap moments over a stream of (id, value)
    rows — the continuous-ingest face of
    operators/stats.py:poisson_bootstrap_fold.

    Mergeable BY CONSTRUCTION: each micro-batch contributes exact
    per-resample (n, Σw·x) integer pairs (per-row weights are a
    deterministic function of the row id, independent of batching), so
    '+' folds them and the state after any drain is BIT-EQUAL to the
    batch fold of everything ingested.  Like CMS — and unlike HLL max —
    '+' is NOT idempotent, so a checkpoint-replayed micro-batch must be
    skipped by its batch_id (the transactional-sink contract).

    Per micro-batch: one bounded-output job (n_resamples rows to the
    driver-held dict); nothing corpus-sized retained.  ``result_df``
    closes the exact state through the identical IEEE arithmetic as
    ``poisson_bootstrap_mean`` (int → double correctly rounded, one
    division), so the report is bit-equal too.
    """

    def __init__(self, id_col: str, value_col: str, n_resamples: int = 32):
        self.id_col = id_col
        self.value_col = value_col
        self.n_resamples = n_resamples
        self.state: dict[int, tuple[int, int]] = {
            b: (0, 0) for b in range(n_resamples)
        }
        self.n_batches = 0
        self._last_batch: int | None = None

    def update_batch(
        self, batch_df: DataFrame, batch_id: int | None = None
    ) -> None:
        from npm_mirror_spark.operators.stats import poisson_bootstrap_fold

        if batch_id is not None and batch_id == self._last_batch:
            return
        rows = poisson_bootstrap_fold(
            batch_df, self.id_col, self.value_col, self.n_resamples
        ).collect()
        for r in rows:
            n, s = self.state[r["resample"]]
            self.state[r["resample"]] = (
                n + int(r["n_eff"]),
                s + int(r["s"]),
            )
        self.n_batches += 1
        self._last_batch = batch_id

    def result_df(self, spark) -> DataFrame:
        rows = [
            (
                b,
                n,
                float(s),
                (float(s) / float(n)) if n > 0 else None,
            )
            for b, (n, s) in sorted(self.state.items())
        ]
        return spark.createDataFrame(
            rows, "resample int, n_eff long, sum_wx double, mean double"
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.update_batch(df, batch_id=bid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


class StreamingEventTable:
    """Running Kaplan–Meier event table over a stream of
    (group, duration, event) rows — the continuous-ingest face of
    operators/temporal.py:km_cells.

    Mergeable BY CONSTRUCTION: km_cells' per-(group, t) (n, d, c)
    triples are pure additive counts, so '+' folds a micro-batch's
    triples into the running state and the state after any drain is
    BIT-EQUAL to the batch counts of everything ingested; the at-risk
    column n_risk(t) = group_total − Σ_{u<t} n_u is NOT stored (it is
    a read-time derivation over the bounded state, recomputed by
    ``result_df`` with the exact integer arithmetic of the batch
    operator).  Like CMS/bootstrap — and unlike HLL max — '+' is not
    idempotent, so a checkpoint-replayed micro-batch is skipped by its
    batch_id (the transactional-sink contract).

    Per micro-batch: one bounded-output job (≤ |groups| × |distinct
    durations| rows to the driver-held dict — the bounded-by-domain
    contract km_cells documents); nothing corpus-sized retained.
    """

    def __init__(self, group_col: str, duration_col: str, event_col: str):
        self.group_col = group_col
        self.duration_col = duration_col
        self.event_col = event_col
        # (group, t) -> (n, d, c)
        self.state: dict[tuple, tuple[int, int, int]] = {}
        self.n_batches = 0
        self._last_batch: int | None = None
        # group/duration Spark type names, captured from the first
        # batch so result_df rebuilds the caller's actual schema — a
        # hardcoded "string, int" broke bigint durations / non-string
        # groups (review finding)
        self._gtype: str | None = None
        self._ttype: str | None = None

    def update_batch(
        self, batch_df: DataFrame, batch_id: int | None = None
    ) -> None:
        from pyspark.sql import functions as F

        if batch_id is not None and batch_id == self._last_batch:
            return
        if self._gtype is None:
            self._gtype = batch_df.schema[self.group_col].dataType.simpleString()
            self._ttype = batch_df.schema[
                self.duration_col
            ].dataType.simpleString()
        # contract guard, same staged-raise as the batch km_cells: an
        # event value outside {0,1} silently corrupts c = n - d, and it
        # must be validated on the DOUBLE view BEFORE the int cast — a
        # float 0.9 truncates to 0 and would sail through an after-cast
        # check (breaking the documented bit-equality with km_cells,
        # which raises on the same input).
        ed = batch_df[self.event_col].cast("double")
        e = F.when(
            ed.isNotNull() & ~ed.isin(0.0, 1.0),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"StreamingEventTable: {self.event_col} must be "
                        "0/1, got "
                    ),
                    ed.cast("string"),
                )
            ).cast("int"),
        ).otherwise(ed.cast("int"))
        g = batch_df.select(
            batch_df[self.group_col].alias("g"),
            batch_df[self.duration_col].alias("t"),
            e.alias("e"),
        ).filter(
            F.col("g").isNotNull()
            & F.col("t").isNotNull()
            & F.col("e").isNotNull()
        )
        rows = (
            g.groupBy("g", "t")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("e").alias("d"),
                F.sum(F.lit(1) - F.col("e")).alias("c"),
            )
            .collect()
        )
        for r in rows:
            k = (r["g"], r["t"])
            n, d, c = self.state.get(k, (0, 0, 0))
            self.state[k] = (n + int(r["n"]), d + int(r["d"]), c + int(r["c"]))
        self.n_batches += 1
        self._last_batch = batch_id

    def result_df(self, spark) -> DataFrame:
        """The km_cells-shaped report: (group, t, n_risk, d, c), with
        n_risk derived from the exact counts at read time — identical
        integer arithmetic to the batch operator, so the output is
        bit-equal to km_cells over the concatenated input."""
        by_group: dict[object, list] = {}
        for (g, t), (n, d, c) in self.state.items():
            by_group.setdefault(g, []).append((t, n, d, c))
        out = []
        for g, rows in sorted(by_group.items()):
            rows.sort()
            total = sum(n for _, n, _, _ in rows)
            prior = 0
            for t, n, d, c in rows:
                out.append((g, t, total - prior, d, c))
                prior += n
        gt = self._gtype or "string"
        tt = self._ttype or "int"
        return spark.createDataFrame(
            out,
            f"{self.group_col} {gt}, t {tt}, n_risk long, d long, c long",
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.update_batch(df, batch_id=bid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


class StreamingDigitPreference:
    """Incremental last-digit preference audit — the streaming twin of
    :func:`~npm_mirror_spark.operators.checks.digit_preference_cells`
    (same shape the StreamingEventTable/km_cells pair pins): per
    micro-batch, ONE bounded job folds the batch to at most 10
    (digit, count) rows, which add into a 10-slot driver dict — '+' on
    exact counts is batching-independent, so the read-time report is
    BIT-EQUAL to the batch operator over the concatenated input under
    any split.  Like the other additive sketches, '+' is not
    idempotent, so a checkpoint-replayed micro-batch is skipped by its
    batch_id (the transactional-sink contract).

    State: exactly 10 integers + a total — nothing corpus-sized.
    """

    def __init__(self, value_col: str):
        self.value_col = value_col
        self.counts: dict[int, int] = {d: 0 for d in range(10)}
        self.total = 0
        self.n_batches = 0
        self._last_batch: int | None = None

    def update_batch(
        self, batch_df: DataFrame, batch_id: int | None = None
    ) -> None:
        from pyspark.sql import functions as F

        if batch_id is not None and batch_id == self._last_batch:
            return
        d = batch_df.select(
            # cast('long') truncates toward zero — the batch operator's
            # trunc-not-round digit extraction, verbatim
            (F.abs(F.col(self.value_col).cast("long")) % 10)
            .cast("int")
            .alias("digit")
        ).filter(F.col("digit").isNotNull())
        for r in d.groupBy("digit").agg(F.count(F.lit(1)).alias("n")).collect():
            self.counts[int(r["digit"])] += int(r["n"])
            self.total += int(r["n"])
        self.n_batches += 1
        self._last_batch = batch_id

    def result_df(self, spark) -> DataFrame:
        """The digit_preference_cells-shaped report: always 10 rows,
        zero-filled, with dev_x10 = 10*n - N and its square derived
        from the exact counts at read time — identical integer
        arithmetic to the batch operator."""
        out = []
        for digit in range(10):
            n = self.counts[digit]
            dev = 10 * n - self.total
            out.append((digit, n, dev, dev * dev))
        return spark.createDataFrame(
            out, "digit int, n long, dev_x10 long, sq_dev_x100 long"
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.update_batch(df, batch_id=bid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


class StreamingMoments:
    """Incremental power-sum moment sketch — the streaming twin of
    :func:`~npm_mirror_spark.operators.stats.moments_jb_cells` (the
    StreamingDigitPreference shape): per micro-batch, ONE bounded job
    folds the batch to a single (n, S1, S2, S3, S4) row, which adds
    into five driver-held python ints (arbitrary precision — the
    stream state is EXACTER than the batch DECIMAL(38,0) fold, never
    less exact; both agree whenever the batch contract's 1e38 range
    bound holds).  '+' on exact integers is batching-independent, so
    the read-time Jarque-Bera report is BIT-EQUAL to the batch
    operator over the concatenated input under any split.  Like the
    other additive sketches, '+' is not idempotent, so a
    checkpoint-replayed micro-batch is skipped by its batch_id (the
    transactional-sink contract).

    State: exactly five integers — nothing corpus-sized.
    """

    def __init__(self, value_col: str):
        self.value_col = value_col
        self.n = 0
        self.s = [0, 0, 0, 0]  # S1..S4
        self.n_batches = 0
        self._last_batch: int | None = None

    def update_batch(
        self, batch_df: DataFrame, batch_id: int | None = None
    ) -> None:
        from pyspark.sql import functions as F

        if batch_id is not None and batch_id == self._last_batch:
            return
        d38 = "decimal(38,0)"
        x = F.col(self.value_col).cast(d38)
        row = (
            batch_df.filter(F.col(self.value_col).isNotNull())
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(x).cast(d38).alias("s1"),
                F.sum((x * x).cast(d38)).cast(d38).alias("s2"),
                F.sum((x * x * x).cast(d38)).cast(d38).alias("s3"),
                F.sum((x * x * x * x).cast(d38)).cast(d38).alias("s4"),
            )
            .collect()[0]
        )
        self.n += int(row["n"])
        for i, c in enumerate(("s1", "s2", "s3", "s4")):
            if row[c] is not None:
                self.s[i] += int(row[c])
        self.n_batches += 1
        self._last_batch = batch_id

    def result_df(self, spark) -> DataFrame:
        """The moments_jb_cells-shaped 1-row report, replaying the
        batch operator's EXACT op order: integer central-moment
        combinations, then the same fixed IEEE expression sequence
        (python doubles round identically to Spark's decimal->double
        cast and double arithmetic)."""
        n, (s1, s2, s3, s4) = self.n, self.s
        m2 = n * s2 - s1 * s1
        m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
        m4 = (
            n**3 * s4
            - 4 * n * n * s1 * s3
            + 6 * n * s1 * s1 * s2
            - 3 * s1**4
        )
        if m2 > 0:
            m2d, m3d, m4d = float(m2), float(m3), float(m4)
            skew_sq = (m3d * m3d) / (m2d * m2d * m2d)
            kurt = m4d / (m2d * m2d)
            jb = float(n) / 6.0 * (
                (m3d * m3d) / (m2d * m2d * m2d)
                + (m4d / (m2d * m2d) - 3.0)
                * (m4d / (m2d * m2d) - 3.0)
                / 4.0
            )
        else:
            skew_sq = kurt = jb = None
        return spark.createDataFrame(
            [
                (
                    n,
                    float(s1),
                    float(m2),
                    float(m3),
                    float(m4),
                    skew_sq,
                    kurt,
                    jb,
                )
            ],
            "n_rows long, s1 double, m2_xn double, m3_xn2 double, "
            "m4_xn3 double, skew_sq double, kurt_b2 double, jb double",
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.update_batch(df, batch_id=bid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


class StreamingRecords:
    """Incremental running-extreme record counter — the streaming twin
    of :func:`~npm_mirror_spark.operators.stats.foster_stuart_cells`
    (the StreamingMoments shape, but ORDER-DEPENDENT state): per
    group it holds exactly five scalars (n, running max, running min,
    upper records U, lower records L), so a new day updates in O(1)
    and the read-time report is BIT-EQUAL to the batch operator over
    the concatenated ordered input.

    Unlike the additive sketches, records do not commute: the class
    therefore enforces the ORDERED-REPLAY contract — each batch's
    days must all be strictly later than every day already absorbed
    for that group (the availableNow event-time-ordered drain;
    violations raise instead of silently corrupting U/L).  Within a
    batch, rows are folded in ascending day order.  A
    checkpoint-redelivered micro-batch is skipped by its batch_id
    (the transactional-sink contract).

    Per batch, ONE bounded job collects the batch's (group, day,
    value) rows — bounded by the calendar x group domain (the
    q_drift_weekly contract), never the raw corpus.
    """

    def __init__(self, group_col: str, day_col: str, value_col: str):
        self.group_col = group_col
        self.day_col = day_col
        self.value_col = value_col
        #: group -> [n, running_max, running_min, upper, lower, last_day]
        self.state: dict = {}
        self.n_batches = 0
        self._last_batch: int | None = None

    def update_batch(
        self, batch_df, batch_id: int | None = None
    ) -> None:
        from pyspark.sql import functions as F

        if batch_id is not None and batch_id == self._last_batch:
            return
        rows = (
            batch_df.select(
                F.col(self.group_col).alias("g"),
                F.col(self.day_col).alias("d"),
                F.col(self.value_col).alias("v"),
            )
            .filter(F.col("d").isNotNull() & F.col("v").isNotNull())
            .collect()
        )
        ordered = sorted(rows, key=lambda r: (str(r["g"]), r["d"]))
        # validate the WHOLE batch before touching any state: a
        # mid-batch raise after partial mutation would wedge the
        # sketch (the corrected resubmission then re-collides with
        # the half-applied groups)
        seen: dict = {}
        for r in ordered:
            g, d = r["g"], r["d"]
            floor_d = seen.get(g)
            if floor_d is None and g in self.state:
                floor_d = self.state[g][5]
            if floor_d is not None and d <= floor_d:
                raise ValueError(
                    f"ordered-replay violation for group {g!r}: day {d}"
                    f" not after {floor_d} (records state is order-"
                    "dependent; drain in event-time order)"
                )
            seen[g] = d
        for r in ordered:
            g, d, v = r["g"], r["d"], r["v"]
            st = self.state.get(g)
            if st is None:
                self.state[g] = [1, v, v, 0, 0, d]
                continue
            st[0] += 1
            if v > st[1]:
                st[3] += 1
                st[1] = v
            if v < st[2]:
                st[4] += 1
                st[2] = v
            st[5] = d
        self.n_batches += 1
        self._last_batch = batch_id

    def result_df(self, spark):
        """The foster_stuart_cells-shaped report: per group n_days,
        upper_records, lower_records, d_stat, s_stat — identical
        integer arithmetic to the batch operator, ordered by group.
        Group keys are reported as STRINGS (the state-dict keys);
        callers with non-string groups compare after a cast."""
        out = [
            (str(g), st[0], st[3], st[4], st[3] - st[4], st[3] + st[4])
            for g, st in sorted(self.state.items(), key=lambda kv: str(kv[0]))
        ]
        return spark.createDataFrame(
            out,
            f"{self.group_col} string, n_days long, upper_records long,"
            " lower_records long, d_stat long, s_stat long",
        )

    def attach(self, stream, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.update_batch(df, batch_id=bid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
