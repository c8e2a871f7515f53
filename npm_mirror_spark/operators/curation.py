"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, PII redaction, sequence packing, stratified sampling.

The reference has no analogue (it mirrors artifacts verbatim;
changes_consumer.py stores whatever the feed hands it) — these are the
operations a pretraining pipeline runs between "mirrored corpus" and
"training shards", implemented Spark-first:

- decontamination: membership of any document n-gram in a benchmark
  suite's n-gram set. The benchmark side is SMALL by construction (eval
  suites are MBs, the corpus is TBs) -> distinct benchmark shingles are
  broadcast; the corpus side explodes shingles map-side and probes the
  broadcast hash set; the only shuffle is the per-doc hit count keyed on
  doc_id (hits only — typically a sliver of the corpus).
- PII redaction: chained ``regexp_replace`` entirely inside whole-stage
  codegen. Patterns are written in the common Java-regex/RE2 subset so
  the DuckDB oracle applies the identical automaton.
- sequence packing: the concat-and-chunk layout (GPT-style): documents
  are concatenated in deterministic order within a shard and cut into
  fixed-capacity token blocks. Per-shard prefix sums via a window — the
  partition key IS the shard, so no global ordering bottleneck: each
  shard packs independently, exactly how a production writer shards
  output files.
- stratified sampling: deterministic per-stratum rate thresholding on a
  multiplicative id hash (Knuth 2654435761). Hash-threshold sampling is
  reproducible across engines and re-runs (no RNG state), and at 100 TB
  it is a pure map-side filter — zero shuffle, prunable columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from npm_mirror_spark.operators.dedup import word_shingles

# -- decontamination ---------------------------------------------------------


def benchmark_shingles(bench: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-grams of the benchmark suite, one per row.

    The distinct() here is load-bearing at scale: it collapses the
    benchmark to its shingle vocabulary BEFORE the broadcast, so the
    broadcast payload is bounded by vocabulary size, not suite size.
    """
    return (
        bench.select(F.explode(word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    bench_sh: DataFrame | None = None,
) -> DataFrame:
    """Per-document benchmark-overlap: (id, n_hits, contaminated).

    Plan shape (the one you'd want at 100 TB): corpus shingles explode
    map-side -> broadcast-hash-join against the benchmark shingle
    vocabulary (no corpus shuffle) -> count distinct hit shingles per doc
    (one shuffle of the HIT rows only) -> right-broadcast... no: the
    final left join back onto the corpus ids is a plain shuffle-free
    map-side null-fill only if hits are broadcast; hits are small
    (contamination is rare), so broadcast them.

    ``bench_sh`` (r15): a caller that runs SEVERAL decontamination
    stages over the same suite (release.py::cut_decontaminate — gate
    and seam-guard) can pass the :func:`benchmark_shingles` frame it
    already built (persisted), so the suite's scan + shingle explode +
    distinct runs once instead of once per stage.  Must be exactly
    ``benchmark_shingles(bench, text_col, n)`` — same values, so the
    output is unchanged by construction.
    """
    sh = corpus.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    if bench_sh is None:
        bench_sh = benchmark_shingles(bench, text_col, n)
    hits = (
        sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(F.broadcast(hits), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_report(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str,
    bench_id_col: str,
    n: int = 3,
) -> DataFrame:
    """Per benchmark ITEM, how much of it leaks into the corpus:
    (bench_id, n_grams, n_matched, coverage in [0,1]).

    The inverse direction of :func:`decontaminate` (which flags corpus
    docs): an eval-leakage AUDIT — a benchmark item with coverage ~1 is
    memorizable from training data even if no single corpus doc holds
    all of it, which the boolean per-doc gate cannot see.

    Plan shape at 100 TB: the benchmark shingle vocabulary broadcasts
    (bounded by suite vocabulary); corpus shingles explode MAP-SIDE and
    semi-join against it, so the only shuffle of corpus-derived data is
    the distinct() over the HIT grams — bounded by the benchmark
    vocabulary, not the corpus.  The per-item rollup then runs on
    |bench| rows.
    """
    bench_grams = bench.select(
        F.col(bench_id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    ).distinct()
    vocab = bench_grams.select("shingle").distinct()
    corpus_hits = (
        corpus.select(F.explode(word_shingles(text_col, n)).alias("shingle"))
        .join(F.broadcast(vocab), "shingle", "left_semi")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        bench_grams.join(F.broadcast(corpus_hits), "shingle", "left")
        .groupBy(bench_id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_matched"),
        )
        .select(
            bench_id_col,
            "n_grams",
            "n_matched",
            (F.col("n_matched").cast("double") / F.col("n_grams").cast("double"))
            .alias("coverage"),
        )
    )


def cut_contaminated_spans(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    bench_sh: DataFrame | None = None,
) -> DataFrame:
    """Span-level decontamination — the surgical sibling of
    :func:`decontaminate`: instead of killing every document that
    shares an n-gram with the benchmark, rebuild its text with the
    benchmark-overlapping SPANS deleted.  The right tool for long
    documents that merely QUOTE an eval item (dropping them wholesale
    wastes tokens; keeping them leaks the answer key).

    Same span machinery as operators/dedup.py::cut_dup_spans — shared
    via :func:`~npm_mirror_spark.operators.dedup.cut_spans_rebuild` —
    with the cut condition swapped: a token is cut iff some n-gram
    covering it appears in the benchmark vocabulary.  Scale shape: the
    bench gram vocabulary BROADCASTS (bounded by the suite), corpus
    gram positions filter map-side through it, the per-doc island
    window sees only HIT positions (bounded by bench overlap, normally
    tiny), and bodies move exactly once for the rebuild join.  Returns
    (id, text, clean_text, n_tokens, kept_tokens).
    """
    from npm_mirror_spark.operators.dedup import (
        cut_spans_rebuild,
        normalize_text,
        word_shingles,
    )

    words = F.split(normalize_text(text_col), " ")
    if bench_sh is None:
        # (callers sharing the suite vocabulary across stages pass it
        # prebuilt — see decontaminate's ``bench_sh`` contract)
        bench_sh = benchmark_shingles(bench, text_col, n)
    base = corpus.select(
        F.col(id_col),
        F.size(words).alias("n_tokens"),
        F.posexplode(word_shingles(text_col, n)).alias("pos", "shingle"),
    )
    cut_pos = base.join(F.broadcast(bench_sh), "shingle", "left_semi").select(
        id_col, "n_tokens", "pos"
    )
    return cut_spans_rebuild(corpus, cut_pos, text_col, id_col, n)


# -- epoch shuffling ----------------------------------------------------------


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    n_shards: int | None = None,
    target_shard_rows: int = 1_000_000,
) -> DataFrame:
    """Deterministic seeded epoch shuffle into training shards:
    (id, shard, pos) — the shard-writer pattern of LLM training
    pipelines (each epoch re-reads the corpus in a fresh pseudo-random
    order that is bit-reproducible across runs, engines and restarts).

    The rank key is md5(epoch ':' id) (first 15 hex chars as int64) — a
    seeded pseudo-random total order with no RNG state to checkpoint.
    shard = key mod n_shards is a plain hash partition, and pos is a
    row_number WITHIN each shard — so the plan is one hash shuffle plus
    a per-shard sort, exactly the work of physically writing shard
    files (sortWithinPartitions), never a global sort.  md5 ties break
    on the id so the order is total even under hash collisions.

    Shard COUNT is the scale knob (the r6 verdict's advisory: a
    fixture-scale constant here silently becomes an 8-reducer
    bottleneck on a 100 TB epoch).  Pass ``n_shards`` explicitly to pin
    it (reproducible shard assignment requires the same count across
    re-runs — shard = key mod n_shards); leave it ``None`` to derive
    ceil(rows / target_shard_rows) from one count() job, so the
    per-shard sort stays memory-bounded at any corpus size.  Sizing
    rule in docs/SCALE.md: target the shard a single writer task
    should hold (~1M rows / the file size your loader wants), never
    the cluster's core count.
    """
    import math

    from pyspark.sql import Window

    from npm_mirror_spark.operators.dedup import md5_key64

    if n_shards is None:
        if target_shard_rows < 1:
            raise ValueError("target_shard_rows must be >= 1")
        n_shards = max(1, math.ceil(df.count() / target_shard_rows))
    key = md5_key64(id_col, epoch)
    keyed = df.select(
        F.col(id_col), key.alias("__key"),
        F.pmod(key, F.lit(int(n_shards))).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return keyed.select(
        id_col, "shard", F.row_number().over(w).alias("pos")
    )


# -- PII redaction -----------------------------------------------------------

# Java-regex / RE2 common subset (no lookaround, no backrefs) so the
# DuckDB oracle runs the same patterns verbatim.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
}
# Order matters: emails contain dots/digits that could partially match
# later patterns; replace the most specific first. Phone before ipv4 is
# irrelevant (disjoint shapes), email first is not.
_PII_ORDER = ("email", "ipv4", "phone")


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Replace PII spans with [TYPE] tokens and count matches per type.

    One projection, all ``regexp_replace``/``regexp_count`` — stays in
    whole-stage codegen; at scale this is a free rider on whatever scan
    already touches the text column.
    """
    red = F.col(text_col)
    counts = {}
    for name in _PII_ORDER:
        pat = PII_PATTERNS[name]
        counts[f"n_{name}"] = F.regexp_count(red, F.lit(pat))
        red = F.regexp_replace(red, pat, f"[{name.upper()}]")
    return df.withColumns({**counts, "redacted": red})


def luhn_valid16(c: Column) -> Column:
    """True iff ``c`` (a 16-digit string) passes the Luhn checksum —
    the validation step that separates real payment-card numbers from
    arbitrary 16-digit runs, cutting the false-positive rate of
    regex-only PAN scanning (a digits-only pattern flags timestamps,
    ids, hashes...).

    Pure expression arithmetic: per position p (1-based from the left)
    the digit doubles when its from-the-right index 17-p is even, with
    the classic >9 fold; ``aggregate`` sums the 16 contributions and
    checks mod 10.  No lookaround (RE2-safe), no UDF — whole-stage
    codegen, and the DuckDB oracle replays the identical
    list_transform/list_sum arithmetic."""

    def contrib(p: Column) -> Column:
        d = F.substr(c, p, F.lit(1)).cast("int")
        doubled = d * 2
        return F.when(
            (F.lit(17) - p) % 2 == 1, d
        ).otherwise(F.when(doubled > 9, doubled - 9).otherwise(doubled))

    total = F.aggregate(
        F.transform(F.sequence(F.lit(1), F.lit(16)), contrib),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return total % 10 == 0


# -- sequence packing --------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    shard_col: str,
    order_col: str,
    capacity: int,
) -> DataFrame:
    """Concat-and-chunk block assignment: within each shard, documents are
    laid end-to-end in ``order_col`` order and cut into ``capacity``-token
    blocks; emit each document's byte, er, token offset and the block
    range it lands in.

    ``first_block == last_block`` means the doc fits one training
    sequence; docs spanning blocks are the chunk-boundary crossers a
    loader either splits or re-buckets. The window partitions on the
    shard key, so prefix sums never serialize the corpus through one
    partition — shards pack independently (that is also the file-writer
    parallelism at production scale).

    Zero-token docs (empty after cleaning) occupy the empty interval
    [start, start): ``floor((end-1)/capacity)`` would land one block LEFT
    of ``first_block`` whenever start sits exactly on a block boundary —
    an inverted range that breaks downstream ``sequence(first, last)``
    explodes (Spark generates a DESCENDING sequence, not an empty one).
    ``last_block`` is therefore clamped to ``first_block``.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum(token_count_col).over(w).cast("long")
    start = (end - F.col(token_count_col)).cast("long")
    first_block = F.floor(start / capacity).cast("long")
    return df.withColumns(
        {
            "offset": start,
            "first_block": first_block,
            "last_block": F.greatest(
                first_block, F.floor((end - 1) / capacity).cast("long")
            ),
        }
    )


# -- stratified sampling -----------------------------------------------------

KNUTH = 2654435761  # golden-ratio multiplicative hash constant


def sample_bucket(id_col: str, buckets: int = 1000) -> F.Column:
    """Deterministic engine-portable bucket in [0, buckets): Knuth
    multiplicative hash on the id, reduced mod 2^31 BEFORE the multiply
    so the product stays under 2^63 for EVERY int64 id — the naive
    id * KNUTH wraps silently in Spark but raises in DuckDB for ids
    >= ~3.5e9, exactly the id range a 100 TB corpus reaches (same fix as
    cap_per_group; production could use xxhash64, but DuckDB cannot
    replay it — portability is the point of the oracle, determinism is
    the point of the operator)."""
    return F.pmod(F.pmod(F.col(id_col), F.lit(2**31)) * F.lit(KNUTH), F.lit(buckets))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Deterministic exact-k cap per group: keep at most ``k`` rows of
    each group, chosen by Knuth-hash order on the id — the uniform-ish,
    seed-free, engine-portable version of per-group reservoir sampling.

    The 100 TB use case is bounding any one source's contribution to a
    training mix (rate-based ``stratified_sample`` cannot promise an
    exact cap when strata sizes are unknown). One shuffle on the group
    key; the rank is a WindowGroupLimit-optimized row_number, so each
    partition retains only k rows before the exchange at top-N sizes
    Spark recognizes.

    The id is reduced mod 2^31 BEFORE the Knuth multiply so the product
    stays under 2^63 for every int64 id: the naive ``id * KNUTH`` wraps
    silently in Spark but raises an overflow error in DuckDB for ids
    >= ~3.5e9 — exactly the id range a 100 TB corpus reaches. Ids that
    collide mod 2^31 fall back to the deterministic id tiebreak.
    """
    from pyspark.sql.window import Window

    h = F.pmod(F.pmod(F.col(id_col), F.lit(2**31)) * F.lit(KNUTH), F.lit(2**31))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
    buckets: int = 1000,
) -> DataFrame:
    """Keep each row iff its id-hash bucket falls under its stratum's
    rate threshold. Pure map-side filter — no shuffle, no RNG, stable
    under re-runs and engine swaps; this is how a 100 TB pipeline takes
    a reproducible 3%-of-web / 20%-of-books mix."""
    bucket = sample_bucket(id_col, buckets)
    thresh = F.lit(int(default_rate * buckets))
    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        val = F.lit(int(rate * buckets))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    thresh = expr.otherwise(thresh) if expr is not None else thresh
    return df.where(bucket < thresh)


def temperature_mix(
    df: DataFrame,
    source_col: str,
    temperature: float = 2.0,
) -> DataFrame:
    """Per-source temperature-scaled mixture weights: the knob a
    pretraining mix uses to up-weight small sources without letting any
    one source dominate — w_s ∝ (n_s/N)^(1/T), T=1 keeps natural
    proportions, T→∞ approaches uniform.

    One count aggregation, then two windowed normalizations over the
    per-source aggregate (|sources| rows — the empty-partition window is
    bounded, same pattern as q_new_users_daily's day axis). For T=2 the
    scaling runs through sqrt(), which is IEEE-correctly-rounded and
    therefore bit-reproducible across engines (the DuckDB oracle path);
    other temperatures use pow(), whose last-ulp behavior is
    libm-specific — fine for production, not for value-hash parity.
    Returns (source, n_docs, share, temp_weight).
    """
    from pyspark.sql.window import Window

    if not float(temperature) > 0.0:
        raise ValueError(
            f"temperature must be > 0 (got {temperature}): T<=0 has no "
            "mixture-weight meaning (negative T would invert the weighting)"
        )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    wall = Window.partitionBy()
    share = (F.col("n_docs").cast("double") / F.sum("n_docs").over(wall)).alias(
        "share"
    )
    staged = counts.select(source_col, "n_docs", share)
    if temperature == 2.0:
        scaled = F.sqrt(F.col("share"))
    else:
        scaled = F.pow(F.col("share"), F.lit(1.0 / float(temperature)))
    return staged.select(
        source_col,
        "n_docs",
        "share",
        (scaled / F.sum(scaled).over(wall)).alias("temp_weight"),
    )


def temperature_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    target_docs: int,
    temperature: float = 2.0,
    buckets: int = 1000,
) -> DataFrame:
    """APPLY a temperature mix: sample each source down to its
    :func:`temperature_mix` share of ``target_docs`` — the step between
    "here are the mixture weights" (a report) and "here is the mixed
    corpus" (rows).  Per-source keep probability
    p_s = min(1, w_s * target_docs / n_s) becomes an integer bucket
    threshold floor(p_s * buckets) on the same deterministic id-hash
    axis as :func:`stratified_sample` — reproducible across runs and
    engines, no RNG state.

    Determinism clamp: w_s is rounded to 9 decimals first (its
    denominator is a cross-row float sum whose last ulp depends on
    summation order — the q_temperature_mix contract); everything after
    is fixed-shape IEEE arithmetic both engines evaluate identically,
    so even the floor'd thresholds replay exactly.

    Scale shape: the rate table is |sources| rows (broadcast); the
    sample itself is a map-side filter — zero corpus shuffle beyond the
    one source-count aggregation that prices the weights.  The sampled
    count per source is binomial-ish around p_s * n_s, not exact-k; use
    :func:`cap_per_group` when a hard cap matters more than rate
    fidelity."""
    w = temperature_mix(df, source_col, temperature)
    p = F.least(
        F.lit(1.0),
        F.round(F.col("temp_weight"), 9)
        * F.lit(float(target_docs))
        / F.col("n_docs").cast("double"),
    )
    rates = w.select(
        source_col, F.floor(p * buckets).cast("long").alias("__thresh")
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .where(sample_bucket(id_col, buckets) < F.col("__thresh"))
        .drop("__thresh")
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple = (("train", 90), ("val", 5), ("test", 5)),
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column.

    ``splits`` is an ordered tuple of (name, integer weight); the
    bucket is md5(seed ':' id) mod sum(weights) — EXACT integer
    thresholds (no float fraction ambiguity), engine-portable (the
    oracle replays the same hash), seedable (a new seed is a fresh
    independent assignment), and membership is a pure function of the
    id: adding documents later never moves an existing document across
    splits — the property that keeps eval sets stable as the corpus
    grows.  Zero shuffle: one map-side expression.
    """
    denom = sum(w for _, w in splits)
    if denom <= 0 or any(w < 0 for _, w in splits):
        raise ValueError("split weights must be non-negative, sum > 0")
    from npm_mirror_spark.operators.dedup import md5_key64

    key = F.pmod(md5_key64(id_col, seed), F.lit(denom))
    expr = None
    acc = 0
    for name, w in splits[:-1]:
        acc += w
        cond = key < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def token_budget_select(
    df: DataFrame,
    token_col: str,
    budget: int,
    group_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    n_buckets: int = 1024,
) -> DataFrame:
    """Assemble a corpus slice under a PER-GROUP token budget: within
    each ``group_col`` partition, documents take a deterministic
    md5(seed ':' id) priority order and survive while the running
    token total (inclusive) stays <= ``budget``.

    The standard "give me N tokens per source" corpus-assembly step:
    deterministic (re-runs pick the identical slice; a seed change is a
    fresh independent draw) and never overshoots the budget.  Output
    adds ``cum_tokens`` (inclusive running total).  A GLOBAL budget
    should be expressed as per-group budgets (budget/n_groups) rather
    than a single-partition window.

    Scale shape — the TWO-LEVEL bucketed prefix sum (the
    classifier._with_prior_sums pattern), NOT a per-group unbounded
    window: at 100 TB a single source ("web") is terabytes, and a
    ``Window.partitionBy(group)`` prefix sum would land that whole
    group on one reducer.  Instead the md5 priority key — uniform on
    [0, 2^60) by construction — right-shifts into ``n_buckets``
    ORDER-PRESERVING buckets (no min/max stats pass needed, unlike the
    float-score axis in _with_prior_sums); per-(group, bucket) token
    sums roll up to a bounded |groups| x n_buckets offset table whose
    own prefix window runs per group over <= n_buckets rows; the
    broadcast offsets then lift a window PARTITIONED BY
    (group, bucket) — parallel within each group — to the global
    per-group running total.  Same deterministic (key, id) total
    order, so results are bit-identical to the single-window form (the
    DuckDB oracle is unchanged).

    Documents individually larger than the budget are dropped BEFORE
    the prefix (map-side filter): they can never fit, and leaving them
    in would let one huge early-priority doc consume the running total
    and block an entire group.  The survivors still follow strict
    prefix semantics — a doc that doesn't fit the REMAINING budget ends
    its group's intake (first-fit repacking would break the
    "deterministic priority prefix" contract).
    """
    from pyspark.sql import Window

    from npm_mirror_spark.operators.dedup import md5_key64

    if n_buckets < 1 or (n_buckets & (n_buckets - 1)) != 0:
        raise ValueError(f"n_buckets must be a power of two (got {n_buckets})")
    df = df.where(F.col(token_col) <= F.lit(int(budget)))
    # md5_key64 = first 15 md5 hex chars as int64: uniform on [0, 2^60),
    # so the top bits ARE an order-preserving uniform bucket.
    shift = 60 - (n_buckets.bit_length() - 1)
    keyed = df.withColumn("__key", md5_key64(id_col, seed)).withColumn(
        "__bkt", F.shiftright(F.col("__key"), shift).cast("int")
    )
    per_bucket = keyed.groupBy(group_col, "__bkt").agg(
        F.sum(F.col(token_col)).alias("__bt")
    )
    wb = (
        Window.partitionBy(group_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        group_col,
        "__bkt",
        F.coalesce(F.sum("__bt").over(wb), F.lit(0)).alias("__off"),
    )
    ww = (
        Window.partitionBy(group_col, "__bkt")
        .orderBy("__key", F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        keyed.join(F.broadcast(offsets), [group_col, "__bkt"])
        .withColumn(
            "cum_tokens", F.col("__off") + F.sum(F.col(token_col)).over(ww)
        )
        .where(F.col("cum_tokens") <= F.lit(int(budget)))
        .drop("__key", "__bkt", "__off")
    )


# -- Domain-level filtering ----------------------------------------------------
#
# Web-corpus curation's first gate (C4/RefinedWeb/Dolma all start here):
# drop documents from blocklisted hosts (UT1-style lists) before any
# text-level work — it is the cheapest filter and removes whole-site
# noise. Pure JVM regex + broadcast semi/anti join; the blocklist is
# config-sized (UT1 ~4M hosts still broadcasts in tens of MB; beyond
# that, flip the hint off and it becomes a plain shuffle semi join).
# The reference filters its feed by per-record predicates only
# (app/changes_consumer.py ~L100); host gating is extension surface for
# the WARC ingest path (sources/warc.py::warc_to_documents's url).

_HOST_PATTERN = r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(col: Column | str) -> Column:
    """Lowercased registrable host of a URL (scheme and userinfo
    stripped, port excluded); '' when the value does not parse."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(F.lower(c), _HOST_PATTERN, 1)


# Tracking query parameters every web-corpus canonicalizer strips (the
# C4/CC-index convention): analytics decorations that fragment one page
# into many "distinct" URLs and defeat URL-level dedup.
_TRACKING_PARAM = r"(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref_src)"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of a URL for URL-level dedup / frontier keys:

    - scheme and host lowercased (path/query case preserved — it is
      significant on most servers);
    - fragment stripped (never sent to the server);
    - default ports removed (http:80, https:443);
    - tracking query parameters stripped (``_TRACKING_PARAM``), with
      separator cleanup so no dangling ``?``/``&`` survives;
    - bare authority gets the canonical "/" path.

    Pure JVM expression chain in the Java-regex/RE2 common subset, so
    the DuckDB oracle replays every step verbatim (the redact_pii
    pattern-sharing discipline). Query-parameter ORDER is preserved:
    reordering changes semantics on some endpoints, so sorting is a
    policy decision left to callers. Non-URL strings pass through
    lowercased-scheme-less and untouched otherwise.
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.trim(c)
    # 1. drop the fragment
    u = F.regexp_replace(u, r"#.*", "")
    # 2. lowercase scheme and host[:port]; userinfo is case-SIGNIFICANT
    #    (r6 advice finding: folding 'User:Pass@' corrupts credentialed
    #    frontier keys) so it is split out of the fold — the last '@'
    #    in the authority delimits it, per RFC 3986.  A userinfo
    #    containing ':' also defeats the default-port strip below
    #    (pre-existing, documented limitation).
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    tail = F.substring(u, F.length(head) + F.lit(1), F.lit(1 << 30))
    scheme = F.regexp_extract(head, r"^([^:]*)://", 1)
    userinfo = F.regexp_extract(head, r"^[^:]*://(.*@)?[^@]*$", 1)
    hostport = F.regexp_extract(head, r"^[^:]*://(?:.*@)?([^@]*)$", 1)
    u = F.when(head == "", u).otherwise(
        F.concat(
            F.lower(scheme), F.lit("://"), userinfo, F.lower(hostport), tail
        )
    )
    # 3. strip default ports (no lookahead — RE2/DuckDB replays this)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80($|[/?#].*)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443($|[/?#].*)", r"$1$2")
    # 4. strip tracking params from the QUERY STRING only (review
    #    finding: '&' is a legal path character, so an unanchored strip
    #    would eat from a path-embedded '&utm_...' through the real
    #    query). Split at the first '?', clean the query in isolation,
    #    reassemble — dropping the '?' when nothing survives.
    qpos = F.instr(u, "?")
    path = F.when(qpos > 0, F.substring(u, F.lit(1), qpos - 1)).otherwise(u)
    query = F.when(
        qpos > 0, F.substring(u, qpos + 1, F.lit(1 << 30))
    ).otherwise(F.lit(""))
    query = F.regexp_replace(query, r"&" + _TRACKING_PARAM + r"=[^&]*", "")
    query = F.regexp_replace(query, r"^" + _TRACKING_PARAM + r"=[^&]*&", "")
    query = F.regexp_replace(query, r"^" + _TRACKING_PARAM + r"=[^&]*$", "")
    u = F.when(query == "", path).otherwise(F.concat(path, F.lit("?"), query))
    # 5. bare authority -> canonical '/'
    u = F.regexp_replace(u, r"^([A-Za-z][a-z0-9+.\-]*://[^/?#]+)$", r"$1/")
    return u


def filter_blocked_hosts(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    id_col: str = "doc_id",
    include_subdomains: bool = True,
) -> DataFrame:
    """Drop rows whose URL host (or any parent domain, when
    ``include_subdomains`` — blocklists name registrable domains, pages
    live on subdomains) appears in ``blocked`` (one ``host_col``
    column).

    Every join is an EQUI join: without subdomains, one broadcast anti
    join on the host. With subdomains each row first expands to its
    <=depth domain suffixes (bounded fan-out ~3-5, JVM-side), the
    exploded suffixes broadcast-SEMI-join the blocklist to an id list,
    and the corpus anti-joins that id list — never a nested-loop
    condition against the blocklist (an array_contains predicate would
    be |corpus| x |blocklist| condition evals)."""
    h = url_host(F.col(url_col))
    bh = F.broadcast(blocked.select(F.col(host_col).alias("__bh")))
    if not include_subdomains:
        return df.join(bh, h == F.col("__bh"), "left_anti")
    parts = F.split(h, r"\.")
    n = F.size(parts)
    # suffixes of length >= 2 plus the full host: a.b.c.d -> [a.b.c.d,
    # b.c.d, c.d]; non-parsing URLs ('' host, n=1) get no suffixes at
    # all — sequence(0, n-2) would throw on a negative stop
    # single-label hosts (n=1, e.g. 'localhost') still match exactly —
    # the suffix list is just [host]; only a non-parsing URL ('') gets
    # no suffixes (sequence(0, n-2) would throw on a negative stop)
    suffixes = F.when(n >= 2, F.filter(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
        ),
        lambda s: s != "",
    )).otherwise(
        F.when(h != "", F.array(h)).otherwise(F.array().cast("array<string>"))
    )
    blocked_ids = (
        df.select(F.col(id_col), F.explode(suffixes).alias("__sfx"))
        .join(bh, F.col("__sfx") == F.col("__bh"), "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(blocked_ids, id_col, "left_anti")


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    splits: tuple = (("train", 90), ("val", 5), ("test", 5)),
    seed: int = 0,
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: documents connected by a dup-pair edge (MinHash/LSH
    candidates, embedding near-dups, …) are assigned AS A CLUSTER — the
    hash that picks the split is keyed on the cluster label (min id in
    the component), not the individual id.  Without this, a plain
    per-doc :func:`split_assign` over an undeduplicated corpus puts one
    copy of a near-dup pair in train and its twin in test, and the eval
    set silently measures memorization (the classic contamination bug
    train/test splits of scraped corpora ship with).

    Composition, all existing scale shapes: connected components over
    key-only edges (dedup.connected_components — bounded rounds, edge
    volume shuffles only), a left join to attach labels (unpaired docs
    keep their own id as label — identical assignment to split_assign's
    for them), then the md5-mod split on the label.  Document bodies
    never shuffle; the added cost over per-doc assignment is the CC
    rounds the dedup pipeline already runs anyway — reuse its output.

    Returns (id, cluster_label, split) — one row per INPUT doc, same
    grain as split_assign, plus the audit column cluster_label.
    """
    from npm_mirror_spark.operators.dedup import connected_components

    comp = connected_components(pairs, max_iter=25)
    labeled = (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("label"), F.col(id_col)).alias("cluster_label"),
        )
    )
    return split_assign(
        labeled, id_col="cluster_label", splits=splits, seed=seed
    ).select(id_col, "cluster_label", "split")


def systematic_sample_by_weight(
    df: DataFrame, key: str, weight: str, step: int
) -> DataFrame:
    """Weighted SYSTEMATIC sample: walk the corpus in deterministic
    ``key`` order, accumulate integer ``weight`` (tokens, chars, bytes),
    and keep exactly the rows that cross a ``step``-boundary of
    cumulative weight — one representative per ``step`` weight-units,
    selection probability proportional to size, ZERO randomness (the
    q_hash_sample determinism discipline, but proportional-to-weight
    instead of uniform-per-row).  The classic use: a token-proportional
    eval/calibration subset where heavyweight documents must not be
    underrepresented by a uniform row sample.

    A row with prior cumulative P and weight w is kept iff
    ``P div step < (P + w) div step`` — exact integer division, so both
    engines agree bit-for-bit; rows heavier than ``step`` are always
    kept (they cross at least one boundary).

    Shape: cumulative weights come from the bounded two-level prefix
    over the key axis (``_with_prior_sums`` — per-window rows bounded
    by the range-bucket contract, never a raw-corpus single-reducer
    window); the boundary test is a map-side filter.

    Weight contract (advisor finding): weights must be >= 0 — a
    negative weight breaks the monotone cumulative walk, and integer
    division of negative operands diverges cross-engine (Spark ``div``
    truncates toward zero, DuckDB ``//`` floors), so a negative weight
    raises at scan time (the edit2_join guard pattern: declarative
    ``raise_error``, no driver-side pass).  Zero-weight keys never
    cross a boundary and are never sampled; NULL weights contribute
    nothing to a key's sum, and a key whose weights are ALL NULL has a
    NULL total, fails the boundary test, and is never sampled.

    Output: (key, weight, prior_weight, sample-kept rows only).
    """
    from npm_mirror_spark.operators.classifier import _with_prior_sums

    if step < 1:
        raise ValueError("step must be >= 1")
    w_guard = F.when(
        F.col(weight) < 0,
        F.raise_error(
            F.concat(
                F.lit(
                    f"systematic_sample_by_weight: negative {weight} breaks "
                    "the monotone cumulative walk (and negative integer "
                    "division diverges cross-engine); offending key: "
                ),
                F.col(key).cast("string"),
            )
        ),
    ).otherwise(F.col(weight))
    # collapse duplicate keys FIRST: the prefix window orders by key
    # alone, so tied keys would take shuffle-order-dependent priors
    # (review finding) — summing weights per key makes the walk
    # deterministic and the sample unit the KEY, which for unique keys
    # (the normal case) is identical to the per-row walk
    g = (
        df.select(F.col(key).alias("__k"), w_guard.alias("__w"))
        .groupBy("__k")
        .agg(F.sum("__w").alias("__w"))
    )
    pri = _with_prior_sums(g, "__k", ("__w",))
    kept = pri.where(
        F.expr("__prior___w div " + str(int(step)))
        < F.expr("(__prior___w + __w) div " + str(int(step)))
    )
    return kept.select(
        F.col("__k").alias(key),
        F.col("__w").alias(weight),
        F.col("__prior___w").alias("prior_weight"),
    )
