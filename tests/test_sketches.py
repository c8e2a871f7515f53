"""Count-Min sketch (operators/sketches.py): the mergeable-sketch
algebra, the one-sided error guarantee, and collision behavior — the
properties the value oracle (q_count_min) can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_mirror_spark.operators.sketches import (
    count_min_estimate,
    count_min_sketch,
)
from npm_mirror_spark.tables import load_table


def test_merge_of_halves_equals_whole(spark, sf_dir):
    """The defining sketch property: CMS(a) + CMS(b) == CMS(a ∪ b),
    cell-wise — which is exactly what Spark's partial aggregation does
    map-side; here we pin it end-to-end by unioning two half-sketches
    and re-aggregating."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_orderkey") % 2 == 0)
    b = li.where(F.col("l_orderkey") % 2 == 1)
    whole = count_min_sketch(li, "l_suppkey")
    merged = (
        count_min_sketch(a, "l_suppkey")
        .unionByName(count_min_sketch(b, "l_suppkey"))
        .groupBy("r", "b")
        .agg(F.sum("c").alias("c"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_estimates_upper_bound_exact_counts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sk = count_min_sketch(li, "l_suppkey", depth=4, width=64)
    probes = li.select("l_suppkey").distinct()
    est = count_min_estimate(sk, probes, "l_suppkey", 4, 64)
    exact = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("exact"))
    rows = est.join(exact, "l_suppkey").collect()
    assert rows
    assert all(r["est"] >= r["exact"] for r in rows)
    # width 64 < distinct suppliers at sf>=0.01 -> collisions must
    # actually occur (otherwise the test proves nothing)
    if probes.count() > 64:
        assert any(r["est"] > r["exact"] for r in rows)


def test_wide_sketch_is_exact_and_absent_key_reads_zero(spark):
    df = spark.createDataFrame(
        [(k,) for k in ("a", "a", "a", "b")], "k string"
    )
    sk = count_min_sketch(df, "k", depth=4, width=4096)
    probes = spark.createDataFrame([("a",), ("b",), ("never",)], "k string")
    got = {
        r["k"]: r["est"]
        for r in count_min_estimate(sk, probes, "k", 4, 4096).collect()
    }
    # with width >> keys, collisions are (near-)impossible: exact counts
    assert got["a"] == 3 and got["b"] == 1
    assert got["never"] == 0  # untouched cells read zero


def test_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 2), ("b", 10)], "k string, w long"
    )
    sk = count_min_sketch(df, "k", depth=4, width=4096, weight_col="w")
    got = {
        r["k"]: r["est"]
        for r in count_min_estimate(
            sk, df.select("k"), "k", 4, 4096
        ).collect()
    }
    assert got == {"a": 7, "b": 10}


def test_sketch_size_is_bounded_and_shuffle_is_single(spark, sf_dir):
    """Scale contract: output rows <= depth*width no matter the input,
    and the plan is one (r, b) shuffle with a map-side partial
    aggregate (the mergeable property in physical form)."""
    from npm_mirror_spark import plans

    li = load_table(spark, sf_dir, "lineitem")
    sk = count_min_sketch(li, "l_suppkey", depth=4, width=64)
    assert sk.count() <= 4 * 64
    assert plans.shuffle_count(sk) == 1
    text = plans.explain_str(sk, "simple")
    assert "partial_sum" in text or "partial_count" in text


def test_hll_registers_merge_cellwise(spark, sf_dir):
    """HLL's mergeable property: union the registers of two halves and
    take the cell-wise max == registers of the whole."""
    from npm_mirror_spark.operators.sketches import hll_registers

    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderkey") % 2 == 0)
    b = o.where(F.col("o_orderkey") % 2 == 1)
    whole = hll_registers(o, "o_custkey")
    merged = (
        hll_registers(a, "o_custkey")
        .unionByName(hll_registers(b, "o_custkey"))
        .groupBy("idx")
        .agg(F.max("mreg").alias("mreg"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hll_estimate_accuracy(spark):
    """The raw estimator must land within the theoretical error band:
    sigma = 1.04/sqrt(m) ~ 6.5% at m=256; allow 3 sigma. Planted
    cardinality large enough that the uncorrected raw form applies
    (n >> 2.5m)."""
    from npm_mirror_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    n = 50_000
    df = spark.range(n).select(F.col("id").alias("k"))
    row = hll_estimate(hll_registers(df, "k", p=8), p=8).first()
    assert row["m"] == 256
    assert row["zero_registers"] == 0  # n >> m: every register touched
    assert abs(row["est"] - n) / n < 3 * 1.04 / (256 ** 0.5)


def test_hll_estimate_is_duplicate_insensitive(spark):
    """Cardinality, not count: feeding each key 7 times must give the
    identical registers and estimate."""
    from npm_mirror_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    once = spark.range(2000).select(F.col("id").alias("k"))
    many = once.crossJoin(spark.range(7)).select("k")
    r1 = hll_estimate(hll_registers(once, "k"), 8).first()
    r7 = hll_estimate(hll_registers(many, "k"), 8).first()
    assert (r1["hll_sum"], r1["est"]) == (r7["hll_sum"], r7["est"])


def test_hll_empty_registers_defined_estimate(spark):
    """Review finding: zero ingested rows must yield the defined
    all-zero-registers value (hll_sum = m * 2^kappa), never NULL."""
    from npm_mirror_spark.operators.sketches import hll_estimate

    empty = spark.createDataFrame([], "idx int, mreg int")
    row = hll_estimate(empty, p=8).first()
    assert row["zero_registers"] == 256
    assert row["hll_sum"] == 256 * (1 << 53)
    # the raw closed form gives alpha*m when every register is zero —
    # exactly why zero_registers ships alongside (consumers apply
    # linear counting: m*ln(m/V) = 0 when V = m)
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    assert row["est"] is not None
    assert abs(row["est"] - alpha * 256) < 1e-9


def test_binned_quantiles_within_one_bin_of_exact(spark, sf_dir):
    """Error contract: each estimate lies within one bin width of the
    exact percentile; all values equal -> exact readback; merge: bin
    histograms add, so union quantiles come from summed counts."""
    import pytest

    from npm_mirror_spark.operators.sketches import binned_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    got = {r["q"]: r["est"] for r in binned_quantiles(
        li, "l_extendedprice", qs=(0.5, 0.9, 0.99), bins=256).collect()}
    lo, hi = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice")
    ).first()
    bin_w = (float(hi) - float(lo)) / 256
    exact = li.selectExpr(
        "percentile(l_extendedprice, array(0.5, 0.9, 0.99)) AS p"
    ).first()["p"]
    for q, ex in zip((0.5, 0.9, 0.99), exact):
        assert abs(got[q] - ex) <= bin_w, (q, got[q], ex)
    # degenerate span reads back the constant exactly
    const = spark.createDataFrame([(7.5,)] * 10, "v double")
    row = binned_quantiles(const, "v", qs=(0.5,)).first()
    assert row["est"] == 7.5 and row["n"] == 10
    with pytest.raises(ValueError, match="quantiles"):
        binned_quantiles(const, "v", qs=(0.0,))


def test_cms_join_size_one_sided_and_exact_when_collision_free(spark):
    """The AMS-style join-size estimate must upper-bound the true size,
    and with a width far above the key count (no bucket collisions in
    some hash row) it recovers the exact self-join size; the two-table
    direction multiplies per-key counts."""
    from pyspark.sql import functions as F

    from npm_mirror_spark.operators.sketches import count_min_join_size

    # 3 keys with counts 4, 2, 1 -> F2 = 16 + 4 + 1 = 21
    df = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 2 + [("c",)], "k string"
    )
    wide = count_min_join_size(df, "k", df, "k", depth=4, width=4096).first()
    assert wide["est_join_rows"] == 21
    tight = count_min_join_size(df, "k", df, "k", depth=4, width=2).first()
    assert tight["est_join_rows"] >= 21  # collisions only ever add
    # two-table: join with (a:1, b:3) -> true size 4*1 + 2*3 = 10
    other = spark.createDataFrame([("a",)] + [("b",)] * 3, "k string")
    two = count_min_join_size(df, "k", other, "k", depth=4, width=4096).first()
    assert two["est_join_rows"] == 10
    # disjoint keys: estimate 0 via the re-anchored depth axis
    dis = spark.createDataFrame([("zzz",)], "k string")
    z = count_min_join_size(df, "k", dis, "k", depth=4, width=4096).first()
    assert z["est_join_rows"] == 0


def test_hll_union_is_the_registers_of_the_union(spark):
    """Merge law: hll_union(regs(A), regs(B)) must be BIT-EQUAL to
    hll_registers(A union B) — the mergeable-sketch property that lets
    set algebra run without raw keys — and the inclusion-exclusion
    intersection estimate lands near the exact overlap."""
    from pyspark.sql import functions as F

    from npm_mirror_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
        hll_union,
    )

    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(2000, 5000).select(F.col("id").alias("k"))
    ra, rb = hll_registers(a, "k"), hll_registers(b, "k")
    merged = sorted(map(tuple, hll_union(ra, rb).collect()))
    direct = sorted(map(tuple, hll_registers(a.union(b), "k").collect()))
    assert merged == direct
    est_a = hll_estimate(ra).first()["est"]
    est_b = hll_estimate(rb).first()["est"]
    est_u = hll_estimate(hll_union(ra, rb)).first()["est"]
    inter = est_a + est_b - est_u
    # true intersection = 1000; p=8 raw HLL: ~several-% per operand,
    # inclusion-exclusion compounds it — generous band, but it must be
    # in the right regime (not 0, not the union size)
    assert 400 < inter < 1800, inter


def test_grouped_hll_rolls_up_to_global_registers(spark, sf_dir):
    """The cube law: max over GROUPS of hll_registers_by == the global
    hll_registers of the same keys — per-group sketches answer the
    coarser grouping without revisiting raw data."""
    from npm_mirror_spark.operators.sketches import (
        hll_registers,
        hll_registers_by,
    )

    ev = load_table(spark, sf_dir, "events")
    grouped = hll_registers_by(ev, ["event_type"], "user_id", p=6)
    rolled = sorted(
        (r["idx"], r["mreg"])
        for r in grouped.groupBy("idx")
        .agg(F.max("mreg").alias("mreg"))
        .collect()
    )
    direct = sorted(
        (r["idx"], r["mreg"])
        for r in hll_registers(ev, "user_id", p=6).collect()
    )
    assert rolled == direct


def test_grouped_hll_single_group_equals_global_estimate(spark, sf_dir):
    """hll_estimate_by on one group must reproduce hll_estimate of that
    group's rows exactly (same fold, keyed vs global)."""
    from npm_mirror_spark.operators.sketches import (
        hll_estimate,
        hll_estimate_by,
        hll_registers,
        hll_registers_by,
    )

    ev = load_table(spark, sf_dir, "events")
    one = ev.where(F.col("event_type") == "click")
    by = hll_estimate_by(
        hll_registers_by(one, ["event_type"], "user_id", p=7),
        ["event_type"],
        p=7,
    ).first()
    glob = hll_estimate(hll_registers(one, "user_id", p=7), p=7).first()
    assert by["hll_sum"] == glob["hll_sum"]
    assert by["zero_registers"] == glob["zero_registers"]
    assert by["est"] == glob["est"]


def test_grouped_quantiles_within_one_group_bin_width(spark, sf_dir):
    """Per-group estimates must sit within one bin width of that
    GROUP's exact quantile — the per-group-span adaptation claim."""
    from npm_mirror_spark.operators.sketches import binned_quantiles_by

    d = load_table(spark, sf_dir, "documents")
    got = {
        (r["source"], r["q"]): r["est"]
        for r in binned_quantiles_by(
            d, ["source"], "n_chars", qs=(0.5, 0.9), bins=128
        ).collect()
    }
    import numpy as np

    pdf = d.select("source", "n_chars").toPandas()
    for src, grp in pdf.groupby("source"):
        vals = np.sort(grp["n_chars"].to_numpy())
        width = (vals[-1] - vals[0]) / 128.0
        n = len(vals)
        for q in (0.5, 0.9):
            # the sketch's rank semantics: the bin holding rank
            # ceil(q*n) — the order statistic at that rank provably
            # shares the estimate's bin, so |est - v_r| <= bin width
            # (np.quantile's linear interpolation can jump a
            # distribution gap and is NOT the pinned contract)
            exact = float(vals[int(np.ceil(q * n)) - 1])
            assert abs(got[(src, q)] - exact) <= width + 1e-9, (src, q)


def test_grouped_quantiles_single_group_matches_global(spark, sf_dir):
    """One group -> the keyed fold must reproduce the global sketch's
    estimates exactly (same arithmetic, keyed vs scalar)."""
    from npm_mirror_spark.operators.sketches import (
        binned_quantiles,
        binned_quantiles_by,
    )

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "g", F.lit("all")
    )
    by = {
        r["q"]: (r["est"], r["n"])
        for r in binned_quantiles_by(li, ["g"], "l_extendedprice").collect()
    }
    glob = {
        r["q"]: (r["est"], r["n"])
        for r in binned_quantiles(li, "l_extendedprice").collect()
    }
    assert by == glob


def test_quantile_bins_near_equal_frequency_and_ordered(spark, sf_dir):
    """Deciles: each bucket holds n/10 +- the histogram-error slack,
    buckets are value-ordered and non-overlapping, NaN gets NULL."""
    from npm_mirror_spark.operators.sketches import quantile_bins

    li = load_table(spark, sf_dir, "lineitem")
    out = quantile_bins(li, "l_extendedprice", n_bins=10)
    stats = (
        out.groupBy("qbin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .orderBy("qbin")
        .collect()
    )
    assert [r["qbin"] for r in stats] == list(range(10))
    n_total = sum(r["n"] for r in stats)
    for r in stats:
        assert abs(r["n"] - n_total / 10) <= 0.05 * n_total, r
    for prev, cur in zip(stats, stats[1:]):
        assert prev["hi"] <= cur["lo"]
    # non-finite rows -> NULL bin
    bad = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (float("nan"),)], "v double"
    )
    rows = quantile_bins(bad, "v", n_bins=2).collect()
    import math

    nan_rows = [r for r in rows if math.isnan(r["v"])]
    assert nan_rows and all(r["qbin"] is None for r in nan_rows)


def test_hll_cumulative_matches_per_prefix_sketch(spark):
    """The running-max register series must equal the sketch built from
    scratch on each prefix: for every axis value w, hll_cumulative_by's
    row == hll_estimate over the keys with axis <= w."""
    from npm_mirror_spark.operators.sketches import (
        hll_cumulative_by,
        hll_estimate,
        hll_registers,
    )

    rows = [(w, f"u{i % (10 * (w + 1))}") for w in range(4) for i in range(50)]
    df = spark.createDataFrame(rows, "week int, user string")
    series = {
        r["week"]: (r["zero_registers"], r["hll_sum"], r["est"])
        for r in hll_cumulative_by(df, "week", "user", p=8).collect()
    }
    assert set(series) == {0, 1, 2, 3}
    for w in range(4):
        prefix = df.where(df.week <= w)
        one = hll_estimate(hll_registers(prefix, "user", p=8), p=8).first()
        assert series[w] == (one["zero_registers"], one["hll_sum"], one["est"]), w


def test_kmv_sketch_properties(spark):
    """Under-full sketch returns the exact count; a full sketch's
    estimate lands within 3/sqrt(k) relative error; duplicates don't
    move the sketch (distinct semantics); k<2 rejected."""
    import pytest

    from npm_mirror_spark.operators.sketches import kmv_sketch

    small = spark.createDataFrame([(i,) for i in range(10)], "u int")
    r = kmv_sketch(small, "u", k=64).first()
    assert (r["n_obs"], r["est"]) == (10, 10.0)

    big = spark.createDataFrame([(i,) for i in range(5000)], "u int")
    r = kmv_sketch(big, "u", k=64).first()
    assert r["n_obs"] == 64
    assert abs(r["est"] - 5000) / 5000 < 3 / (64 ** 0.5)

    dup = big.unionAll(big)
    assert kmv_sketch(dup, "u", k=64).first() == r

    with pytest.raises(ValueError):
        kmv_sketch(big, "u", k=1)


def test_heavy_hitters_twopass_equals_exact_at_any_width(spark):
    """The contract: the CMS pass only PRUNES (one-sided error makes
    candidates a superset of the true heavy hitters), so the verified
    output EQUALS the plain groupBy-HAVING answer — at a comfortable
    width, AND at a degenerate width=2 where nearly every key collides
    into every cell (maximum false candidates, zero false negatives)."""
    import pytest

    from npm_mirror_spark.operators.sketches import heavy_hitters_twopass
    from pyspark.sql import functions as F

    rows = (
        [("a",)] * 50 + [("b",)] * 20 + [("c",)] * 19
        + [(f"tail{i}",) for i in range(200)] * 2
    )
    df = spark.createDataFrame(rows, "k string")
    exact = {
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 20)
        .collect()
    }
    for width in (256, 2):
        got = {
            (r["k"], r["cnt"])
            for r in heavy_hitters_twopass(
                df, "k", threshold=20, width=width
            ).collect()
        }
        assert got == exact, (width, got ^ exact)
    assert exact == {("a", 50), ("b", 20)}
    with pytest.raises(ValueError):
        heavy_hitters_twopass(df, "k", threshold=0)
