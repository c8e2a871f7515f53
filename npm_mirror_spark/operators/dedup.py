"""Deduplication operators — exact through fuzzy.

The reference's only dedup is a per-row file-existence probe
(mirror.ts:114-126) and its CouchDB sink happily writes duplicates on
redelivery (changes_consumer.py:325). Here dedup is first-class, designed
for 100 TB training-data pipelines:

- exact: hash-groupBy on the key (one shuffle; map-side partial agg).
- normalized: canonicalize text (lower, collapse whitespace) -> sha2 ->
  groupBy. Same single shuffle, but keyed on a 64-hex string instead of a
  multi-KB document — the shuffle moves hashes, not bodies.
- MinHash + LSH banding: shingle -> per-seed min-hash -> band hashes ->
  bucket join. The ONLY all-pairs-free near-dup strategy that scales: cost
  is O(docs x seeds) map-side plus a shuffle keyed on (band, band_hash);
  candidate verification touches only colliding buckets. All built-in
  higher-order functions (transform/array_min) — zero Python UDFs, the
  signature computation stays inside whole-stage codegen.
- SimHash: 16-bit locality-sensitive bit signature via per-token hashing,
  folded per row with ``aggregate`` (no explode, no shuffle).
- n-gram Jaccard: exact verification for candidate pairs.

MinHash here uses lexicographic min over md5 hex digests (a permutation of
the shingle space per seed) — deterministic, engine-portable (the DuckDB
oracle computes the identical signature), and needs no fitted model, unlike
MLlib's MinHashLSH.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# -- text canonicalization ----------------------------------------------------


def normalize_text(col: Column | str) -> Column:
    """lower + collapse runs of whitespace to single spaces + trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def text_hash(col: Column | str) -> Column:
    """sha2-256 of the normalized text — the normalized-dedup key."""
    return F.sha2(normalize_text(col), 256)


def md5_hash64(col: Column | str) -> Column:
    """Engine-portable 60-bit integer hash: int64 of the first 15 md5
    hex chars — the cross-engine contract behind the HLL register base
    (DuckDB replay: ('0x' || substr(md5(v), 1, 15))::BIGINT).  15 hex
    chars keep conv() inside int64; widening to 16 would overflow and
    silently break every oracle at once — this helper pins the width in
    ONE place (review finding: it was copy-pasted five times)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
    ).cast("long")


def md5_key64(col: Column | str, seed) -> Column:
    """Seeded variant of :func:`md5_hash64` over '<seed>:<value>' — the
    shared key behind epoch_shuffle / split_assign / token_budget_select
    priorities and the CMS bucket hash (DuckDB replay:
    ('0x' || substr(md5(seed || ':' || v), 1, 15))::BIGINT)."""
    # any non-Column seed coerces through int() (review finding: an
    # isinstance(int) check broke numpy.int64 seeds that previously
    # worked via the inline F.lit(int(seed)))
    s = seed if isinstance(seed, Column) else F.lit(int(seed))
    c = F.col(col) if isinstance(col, str) else col
    return md5_hash64(F.concat_ws(":", s.cast("string"), c.cast("string")))


# -- exact / normalized dedup -------------------------------------------------


def dedup_exact(df: DataFrame, keys: list[str]) -> DataFrame:
    """Exact dedup on a key set. ``dropDuplicates`` compiles to a
    hash-aggregate on the keys — one shuffle, arbitrary survivor."""
    return df.dropDuplicates(keys)


def dedup_normalized(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Group by normalized-text hash; keep the smallest id as the canonical
    survivor (deterministic, unlike dropDuplicates). Returns
    (text_hash, keep_id, dup_count)."""
    return (
        df.select(text_hash(text_col).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# -- shingling ----------------------------------------------------------------


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles over normalized text, as an array<string>.

    Linear construction: n shifted ``slice``s of the word array folded
    pairwise with ``zip_with``. (The tempting alternative — ``transform``
    over an offset sequence with ``element_at(words, i+j)`` — embeds the
    whole split expression INSIDE the lambda, so Spark re-splits the text
    once per shingle: quadratic per document.) Documents shorter than n
    words yield a single whole-text shingle (never an empty set, so
    downstream min-hash is total).
    """
    words = F.split(normalize_text(col), " ")
    k = F.size(words)
    m = k - F.lit(n - 1)  # number of shingles
    shifted = [F.slice(words, F.lit(j + 1), m) for j in range(n)]
    grams = shifted[0]
    for s in shifted[1:]:
        grams = F.zip_with(grams, s, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(k >= n, grams).otherwise(F.array(normalize_text(col)))


# -- MinHash ------------------------------------------------------------------

# Affine hash family over a 32-bit base hash: h_s(x) = (A_s*base + B_s) mod P.
# ONE md5 per shingle (the base), then seeds are two integer ops each —
# 8x less hashing than md5-per-(seed, shingle). Constants are mirrored
# verbatim in the DuckDB oracle; products stay < 2^48 (ANSI-safe).
MINHASH_PRIME = 1_000_000_007


def _minhash_a(s: int) -> int:
    return 10_007 + 2 * s


def _minhash_b(s: int) -> int:
    return 7_919 * s + 12_345


def shingle_base_hash(sh: Column) -> Column:
    """First 8 hex chars of md5 as a 32-bit integer — the per-shingle base
    all seed hashes derive from."""
    return F.conv(F.substring(F.md5(sh), 1, 8), 16, 10).cast("long")


def minhash_signature(
    col: Column | str, num_hashes: int = 8, shingle_n: int = 3
) -> Column:
    """array<long> of length ``num_hashes``: per seed, the min affine hash
    over the doc's shingles. (Column-expression form; for DataFrame-scale
    work use ``minhash_bands``, which stages the base-hash pass so it is
    computed once, not once per seed.)"""
    shingles = word_shingles(col, shingle_n)
    bases = F.transform(shingles, shingle_base_hash)
    return F.array(
        *[
            F.array_min(F.transform(bases, _affine_hasher(s)))
            for s in range(num_hashes)
        ]
    )


def _affine_hasher(s: int):
    a, c = _minhash_a(s), _minhash_b(s)
    # one-arg lambda on purpose: PySpark binds extra lambda params to the
    # array index
    return lambda b: (F.lit(a) * b + F.lit(c)) % F.lit(MINHASH_PRIME)


def lsh_band_hashes(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Fold a signature into ``bands`` bucket keys: md5 of the concatenated
    rows of each band. Docs agreeing on ANY band land in the same bucket."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(sig, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )


def minhash_bands(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, band_hash) — one row per (doc, band). This is the LSH
    index; a groupBy/self-join on (band, band_hash) yields candidates.

    Staged as three separate projections (shingles -> signature -> band
    hashes) ON PURPOSE: each stage's output is referenced many times by the
    next, which stops Catalyst's CollapseProject from inlining the expensive
    subtree into every consumer. Collapsed into one expression, the
    split+normalize would re-execute per shingle per seed — quadratic per
    document (observed 126s for 500 docs; staged: sub-second).
    """
    rows_per_band = num_hashes // bands

    # widen a narrow input before the signature kernel: the shingle +
    # per-seed md5/affine pass is the expensive part and runs BEFORE the
    # band-key exchange, so with a single-file scan it would execute at
    # one-task parallelism (r10 stage audit: the signature stage carried
    # 7.7 s in 3 tasks under q_dedup_keepset).  No-op on wide inputs.
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    shingled = df.select(
        F.col(id_col), word_shingles(text_col, shingle_n).alias("__shingles")
    )
    # one md5 per shingle, staged so the seed loop below reuses it
    based = shingled.select(
        F.col(id_col),
        F.transform(F.col("__shingles"), shingle_base_hash).alias("__bases"),
    )
    sig = based.select(
        F.col(id_col),
        *[
            F.array_min(F.transform(F.col("__bases"), _affine_hasher(s))).alias(
                f"__mh{s}"
            )
            for s in range(num_hashes)
        ],
    )
    band_cols = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"__mh{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        F.col(id_col),
        F.posexplode(band_cols).alias("band", "band_hash"),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) that collide in >=1 band.

    The self-join is keyed on (band, band_hash) — shuffle moves only
    (id, hash) pairs. At 100 TB this is the standard fuzzy-dedup plan:
    bucket sizes are small by construction (hash collisions), so the join
    explodes only within real near-duplicate clusters. Skewed buckets
    (e.g. boilerplate docs) are handled by AQE skew-join splitting.
    """
    b = minhash_bands(df, text_col, id_col, num_hashes, bands, shingle_n)
    # Pre-partition the LSH index on the join key: both self-join sides then
    # share ONE identical exchange subtree, which Spark's ReuseExchange
    # dedupes — the md5 signature pass over the corpus runs once, not twice.
    b = b.repartition("band", "band_hash")
    left = b.withColumnRenamed(id_col, "id_a")
    right = b.withColumnRenamed(id_col, "id_b")
    # SHUFFLE_HASH pin (r14): without it the planner BROADCASTS the
    # narrow (id, band, band_hash) index whenever its size estimate is
    # under the auto-broadcast threshold — and the broadcast build side
    # is its own subtree, so the exchange-reuse above silently dies and
    # the signature pass runs twice (profiled: the executed bench-scale
    # plan showed BroadcastHashJoin + two full signature evaluations).
    # At 100 TB a corpus-sized LSH index can never broadcast, so the
    # shuffled-hash pin is also the only scale-truthful plan; bucket
    # partitions are small by construction (hash collisions), so the
    # per-partition hash build is bounded and sort-free (guide §3.1).
    return (
        left.join(right.hint("shuffle_hash"), ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# -- n-gram Jaccard verification ----------------------------------------------


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two string arrays (distinct semantics), as double."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return (inter.cast("double") / union.cast("double"))


def ngram_jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard.

    ``pairs`` has (id_a, id_b); docs' shingle arrays are joined in — only
    candidate rows pay the set arithmetic. Returns (id_a, id_b, jaccard).
    """
    sh = docs.select(
        F.col(id_col), F.array_distinct(word_shingles(text_col, shingle_n)).alias("__sh")
    )
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sh", "__sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sh", "__sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("__sh_a"), F.col("__sh_b")).alias("jaccard"),
        )
    )
    if threshold > 0.0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def containment_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """ASYMMETRIC overlap verification for candidate pairs: shingle-set
    containment in both directions — c_a = |A∩B| / |A| (how much of doc
    A lies inside doc B) and c_b likewise.

    The quote/subset detector Jaccard structurally under-scores: a
    short doc fully embedded in a long one has Jaccard ≈ |A|/|B| (tiny)
    but c_a = 1.0 — and the right curation action is DIRECTIONAL (drop
    the contained doc, keep the superset), which symmetric similarity
    cannot express. Returns (id_a, id_b, n_a, n_b, inter, c_a, c_b,
    contained) where ``contained`` marks either direction exceeding
    ``threshold``.

    Scale shape: identical to ngram_jaccard_pairs — only CANDIDATE rows
    (from LSH/banding/known lineage) pay the in-row set arithmetic; the
    shingle arrays join in on the id equi keys, no extra shuffle
    family.

    Degenerate candidates (NULL / empty-after-normalization text) get
    an EMPTY shingle set here — word_shingles' whole-text fallback
    would otherwise let two blank docs "contain" each other via the ''
    shingle — and a zero-sized side yields NULL c_a/c_b with
    ``contained`` false (r6 advice finding): an explicit no-verdict,
    distinguishable from genuinely disjoint pairs (c = 0.0)."""
    norm_len = F.length(normalize_text(text_col))
    sh = docs.select(
        F.col(id_col),
        F.when(
            norm_len > 0,
            F.array_distinct(word_shingles(text_col, shingle_n)),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__sh"),
    )
    inter = F.size(F.array_intersect(F.col("__sh_a"), F.col("__sh_b")))
    n_a, n_b = F.size("__sh_a"), F.size("__sh_b")
    c_a = F.when(n_a > 0, inter.cast("double") / n_a.cast("double"))
    c_b = F.when(n_b > 0, inter.cast("double") / n_b.cast("double"))
    thr = F.lit(float(threshold))
    return (
        pairs.join(
            sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            n_a.alias("n_a"),
            n_b.alias("n_b"),
            inter.alias("inter"),
            c_a.alias("c_a"),
            c_b.alias("c_b"),
            (
                F.coalesce(c_a >= thr, F.lit(False))
                | F.coalesce(c_b >= thr, F.lit(False))
            ).alias("contained"),
        )
    )


# -- SimHash ------------------------------------------------------------------


def simhash16(col: Column | str) -> Column:
    """16-bit SimHash over whitespace tokens, entirely with higher-order
    functions — per row, no explode/shuffle.

    Each token hashes to 16 bits (first 4 hex chars of md5); each bit
    contributes +1/-1; the signature bit is the sign of the sum. Near-dup
    docs differ in few bits (compare with ``bit_count(a ^ b)``).
    """
    tokens = F.split(normalize_text(col), " ")
    # stage 1: one 16-bit hash per token (md5 evaluated once per token —
    # keeping it out of the per-bit lambda below)
    tok_vals = F.transform(
        tokens, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int")
    )
    # (v >> j) & 1 — value-identical to the floor(v / 2^j) % 2 form for
    # the non-negative 16-bit hash values, but pure integer ops: this is
    # the hottest expression of the signature pass (16 evals per TOKEN),
    # and the double pow/floor/mod chain it replaces dominated its
    # per-task CPU (guide §1.2 step 2: per-task work after plan shape)
    bit_contrib = lambda v: F.array(  # noqa: E731
        *[
            F.when(
                F.shiftright(v, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))
            for j in range(16)
        ]
    )
    sums = F.aggregate(
        tok_vals,
        F.array_repeat(F.lit(0), 16),
        lambda acc, v: F.zip_with(acc, bit_contrib(v), lambda a, b: a + b),
    )
    # fold sign bits into one int: sum(2^j for j where sums[j] > 0)
    return F.aggregate(
        F.zip_with(
            sums,
            F.sequence(F.lit(0), F.lit(15)),
            lambda s, j: F.when(s > 0, F.pow(F.lit(2.0), j.cast("double")).cast("int")).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Scale path: block on the two halves of the signature (pigeonhole —
    for 16-bit sigs and distance <=3, near-dups almost always share one
    half), so the self-join is bucketed, not all-pairs.

    Physical shape (r14): the signature pass runs ONCE — each doc's two
    (leg, block) keys posexplode out of a single signature row, and the
    pre-partitioned (leg, block) index feeds BOTH self-join sides
    through one reused exchange (the minhash_candidate_pairs
    discipline).  The previous two-leg union evaluated the corpus-wide
    simhash16 expression once per leg on the scan's natural (narrow)
    partitioning — a profiled 2x signature cost plus a 3-task
    serialization at bench scale (guide §2.4 remove shuffles/share
    subplans, §2.5 input skew).  The leg key keeps the candidate set
    byte-identical to the old lo/hi-leg union (a lo half may equal
    another doc's hi half; without the leg those cross-leg collisions
    would join — harmlessly, the hamming filter + distinct make the
    OUTPUT equal either way, but keeping the leg also keeps the join
    volume identical).  Widened before the signature kernel like
    minhash_bands: the per-token md5 pass is the expensive part and
    runs before the exchange.
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    sigs = df.select(F.col(id_col), simhash16(text_col).alias("__sig"))
    keyed = sigs.select(
        F.col(id_col),
        F.col("__sig"),
        F.posexplode(
            F.array(
                (F.col("__sig") % 256).cast("int"),
                F.floor(F.col("__sig") / 256).cast("int"),
            )
        ).alias("__leg", "__blk"),
    ).repartition("__leg", "__blk")
    a = keyed.select(
        F.col(id_col).alias("id_a"),
        F.col("__sig").alias("__sig_a"),
        "__leg",
        "__blk",
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"),
        F.col("__sig").alias("__sig_b"),
        "__leg",
        "__blk",
    )
    # same SHUFFLE_HASH pin as minhash_candidate_pairs: keeps the
    # planner off the broadcast path that would duplicate the signature
    # subtree instead of reusing the one (leg, block) exchange
    pairs = (
        a.join(b.hint("shuffle_hash"), ["__leg", "__blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .drop("__leg", "__blk")
        .distinct()
    )
    hamming = F.bit_count(F.col("__sig_a").bitwiseXOR(F.col("__sig_b")))
    return pairs.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# -- pairs -> clusters -> keep-set --------------------------------------------


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over undirected dup-pair edges by minimum-label
    propagation: every node's label converges to the smallest node id in
    its component. Returns (node, label).

    Scale shape: each round is two bounded shuffles (edge join + per-node
    min), volume O(|edges|); rounds needed = component diameter, and LSH
    dup clusters are near-cliques (diameter 2-3), so the loop exits after a
    handful of rounds via the convergence check. ``localCheckpoint``
    truncates the growing lineage each round — without it the plan doubles
    per iteration. Alternating large/small-star halves round counts on
    high-diameter graphs; for dedup graphs plain propagation is already
    round-optimal.

    The convergence witness (sum of labels, strictly decreasing until the
    fixpoint) is folded INTO each round's job: the checkpoint is lazy and
    the sum aggregate is the action that materializes it, so each round is
    exactly one job — no separate driver-side probe pass. Raises
    ``RuntimeError`` if ``max_iter`` rounds pass without convergence
    (labels at that point are NOT a valid partition into components —
    silently returning them would merge or split clusters downstream).

    ``stats``, if given, receives ``{"rounds": n}`` for observability.
    """
    # materialize the raw edge list FIRST, via localCheckpoint rather than
    # persist: the upstream pair pipeline must run exactly once, and it
    # must run as its OWN optimized plan — wrapping it in an
    # InMemoryRelation (persist) or fusing it into the loop plan defeats
    # its internal exchange reuse / staged projections (measured 4x slower
    # for the MinHash pair producer). The checkpoint stores only the edge
    # rows; everything in the loop derives from them.
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # seed labels with round 1 fused in: label0 = min(self, direct
    # neighbors) via ONE groupBy — replaces distinct-then-propagate and
    # saves a full round on near-clique graphs (they converge immediately)
    # lazy checkpoint + sum-aggregate action = ONE job that both
    # materializes the round's labels and yields the convergence witness
    labels = (
        sym.select(F.col("a").alias("node"), F.col("b").alias("label"))
        .unionByName(sym.select(F.col("a").alias("node"), F.col("a").alias("label")))
        .groupBy("node")
        .agg(F.min("label").alias("label"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    rounds = 0
    converged = False
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        new = (
            labels.join(nbr, labels["node"] == nbr["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        # labels only ever DECREASE, so the label sum is a strictly
        # monotone convergence witness — and this aggregate is the action
        # that materializes the lazy checkpoint, so witness + round share
        # one job
        new_sum = new.agg(F.sum("label")).first()[0]
        labels = new
        rounds += 1
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (rounds needed = largest component diameter)"
        )
    return labels


def dedup_keepset(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The terminal step of fuzzy dedup: collapse pair edges into clusters
    and keep ONE canonical doc per cluster (the min id — swap the label
    choice for a quality-argmax to keep the best copy instead).

    Docs outside any pair pass through; cluster non-representatives are
    anti-joined away. The anti-join side is (node, label) pairs — key-only
    columns, never document bodies.
    """
    comp = connected_components(pairs, max_iter=25)
    drop = comp.filter(F.col("label") != F.col("node")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")


def dedup_keepset_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware keep-set: within each duplicate cluster keep the
    HIGHEST-``score_col`` member (ties -> lowest id) instead of the
    blanket min-id — what a curation pipeline actually wants when dup
    copies differ in OCR quality, truncation, or boilerplate.

    Same shuffle shape as ``dedup_keepset``: components over key-only
    edges, plus one hash-agg argmax per cluster label carrying
    (label, score, id) triples — document bodies still never shuffle.
    """
    comp = connected_components(pairs, max_iter=25)
    scored = comp.join(
        docs.select(F.col(id_col).alias("node"), F.col(score_col)), "node"
    )
    # max(struct(score, -id)) = max score, min id on ties — one aggregate,
    # no per-cluster window sort (same trick as similarity.ivf_assign)
    best = (
        scored.groupBy("label")
        .agg(
            F.max(
                F.struct(F.col(score_col).alias("s"), (-F.col("node")).alias("ni"))
            ).alias("__m")
        )
        .select((-F.col("__m")["ni"]).alias("__keep_id"))
    )
    in_cluster = comp.select(F.col("node").alias(id_col))
    losers = in_cluster.join(
        best.select(F.col("__keep_id").alias(id_col)), id_col, "left_anti"
    )
    return docs.join(losers, id_col, "left_anti")


def dup_ngram_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document duplicate n-gram fraction: what share of the doc's
    DISTINCT shingles also appear in at least one OTHER document — the
    corpus-level memorization diagnostic behind substring-dedup decisions
    (docs with a high fraction are near-boilerplate even when no single
    pair-level dup fires).

    Scale shape: explode to DISTINCT (doc, shingle-hash) pairs — bodies
    never shuffle, each shingle rides as one xxhash64 long — then the
    carrier count is groupBy(hash).count() JOINED back on the hash, NOT
    a count-window: the groupBy gets map-side PARTIAL aggregation (a
    boilerplate shingle carried by 1e8 docs contributes one partial row
    per map task, not 1e8 rows in one window partition), and the attach
    join is an equi sort-merge join that AQE's skew-join splitting can
    subdivide — a window partition has no such mitigation. The corpus is
    NOT scanned twice: both join inputs derive from the same distinct
    exchange, which the planner dedupes (ReusedExchange — pinned by
    tests/test_plans.py under the no-broadcast large-scale context).
    A 64-bit hash collision merges two shingles' counts (overcounts
    dup_frac by at most 1/n_shingles per affected doc) — the classic
    space/exactness trade, negligible below ~1e9 distinct shingles per
    job. Returns (doc_id, n_shingles, dup_frac).
    """
    ex = (
        df.select(
            F.col(id_col),
            F.explode(word_shingles(text_col, shingle_n)).alias("__sh"),
        )
        .select(id_col, F.xxhash64("__sh").alias("__h"))
        .distinct()
    )
    carriers = ex.groupBy("__h").agg(F.count(F.lit(1)).alias("__nd"))
    return (
        ex.join(carriers, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            (
                F.sum((F.col("__nd") >= 2).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("dup_frac"),
        )
    )


def jaccard_pairs_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT Jaccard-similar pairs (J >= threshold) without the all-pairs
    product OR the naive co-shingle join: PREFIX FILTERING (Bayardo et
    al.'s AllPairs / Chaudhuri's SSJoin, public literature).

    Every doc orders its distinct shingles by GLOBAL rarity (frequency
    asc, hash asc — a total order) and indexes only its first
    n - ceil(t*n) + 1 shingles. Lossless: for any pair with J >= t, the
    globally-smallest shared shingle sits within both prefixes (if all
    shared shingles hid in A's last ceil(t*|A|)-1 positions, then
    |A∩B| < t*|A| <= |A∪B|*t — contradiction). The candidate join is
    therefore keyed on the RAREST shingles of each doc — boilerplate
    shingles (the skew killers of the naive inverted-index join) are
    exactly the ones the prefix drops, so bucket sizes stay small by
    construction. Exact intersections are then counted only for
    candidate pairs (|cand| x doc-size rows), and Jaccard comes from the
    per-doc set sizes.

    Shuffles move shingle-hash keys and per-doc hash SETS, never text:
    frequency count (partial-agg), per-doc rank window (doc-sized
    partitions), prefix equi-join, then verification joins that attach
    each candidate side's hash set (one array<long> per doc, bounded by
    the doc's distinct-shingle count — the same volume the former
    exploded semi-join + count aggregate moved as ~52 narrow rows per
    candidate, minus the row-per-shingle key duplication and the
    aggregate shuffle; |A∩B| is a per-row ``array_intersect``). Returns
    (id_a, id_b, jaccard). A 64-bit shingle-hash collision can merge two
    shingles (same caveat as dup_ngram_fraction).

    Physical shape (r10): the input is widened to the session's default
    parallelism BEFORE the shingle explode when the upstream scan is
    narrower (a small single-file scan otherwise pins the explode and
    every downstream stage to a handful of tasks — the r10 stage audit
    read 3-4 tasks carrying 8-14 s each at sf0.1; at cluster scale the
    scan is already wide and the guard is a no-op).  ``ex`` (consumed
    by sizes/freq/prefix/intersection — five evaluations uncached),
    ``sizes`` (x3) and ``prefix`` (both join sides) are persisted.

    Candidate pruning (r14, guide §2.2 shuffle fewer bytes): the r14
    stage profile put 2/3 of the face's executor time in the
    verification join (each candidate pair expands id_a's full shingle
    list), so the PPJoin-family filters (Xiao et al., public
    literature) cut candidates BEFORE that expansion — both lossless
    for J >= t:
    - size filter: J >= t forces t*|A| <= |B| (and symmetrically), so
      mismatched sizes never verify;
    - positional filter: a shared prefix shingle at ranks (pa, pb)
      bounds |A∩B| <= min(pa, pb) + min(|A|-pa, |B|-pb) (shared
      shingles at-or-before h occupy ranks <= pa in A and <= pb in B
      under the shared global order; the rest sit after h in both), and
      J >= t needs |A∩B| >= ceil(t/(1+t)*(|A|+|B|)) — candidates whose
      tightest bound over shared prefix shingles falls short are
      dropped.  (The tempting stronger bound 1 + min(|A|-pa, |B|-pb)
      is valid only for the globally-first shared shingle and would
      prune true pairs — measured at sf0.1: 596k candidates with no
      filter, 448k with these, 170k with the INVALID bound.)
    The pair groupBy that applies the bound replaces the former
    ``distinct()`` at the same shuffle count.
    """
    sc = df.sparkSession.sparkContext
    src = df.select(F.col(id_col), F.col(text_col))
    if src.rdd.getNumPartitions() < sc.defaultParallelism:
        src = src.repartition(sc.defaultParallelism)
    # one row per doc carrying its distinct shingle-hash SET — built in
    # the same projection that word_shingles already materializes
    # per-row, so no groupBy is spent re-assembling it; sizes fall out
    # as size(__hs) instead of a dedicated aggregate (r14)
    sets = src.select(
        F.col(id_col).alias("__id"),
        F.transform(
            F.array_distinct(word_shingles(text_col, shingle_n)),
            lambda s: F.xxhash64(s),
        ).alias("__hs"),
    ).persist()
    ex = sets.select("__id", F.explode("__hs").alias("__h")).persist()
    sizes = sets.select("__id", F.size("__hs").alias("__n"))
    freq = ex.groupBy("__h").agg(F.count(F.lit(1)).alias("__cnt"))
    from pyspark.sql.window import Window

    rk = F.row_number().over(
        Window.partitionBy("__id").orderBy(F.asc("__cnt"), F.asc("__h"))
    )
    prefix_len = F.col("__n") - F.ceil(F.lit(float(threshold)) * F.col("__n")) + 1
    prefix = (
        ex.join(freq, "__h")
        .join(sizes, "__id")
        .withColumn("__rk", rk)
        .filter(F.col("__rk") <= prefix_len)
        .select("__id", "__h", "__rk", "__n")
        .persist()
    )
    t = F.lit(float(threshold))
    need = F.ceil(
        F.lit(float(threshold) / (1.0 + float(threshold)))
        * (F.col("__na") + F.col("__nb"))
    )
    ubound = F.least(F.col("__pa"), F.col("__pb")) + F.least(
        F.col("__na") - F.col("__pa"), F.col("__nb") - F.col("__pb")
    )
    cand = (
        prefix.select(
            F.col("__id").alias("id_a"),
            "__h",
            F.col("__rk").alias("__pa"),
            F.col("__n").alias("__na"),
        )
        .join(
            prefix.select(
                F.col("__id").alias("id_b"),
                "__h",
                F.col("__rk").alias("__pb"),
                F.col("__n").alias("__nb"),
            ),
            "__h",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("__nb") >= t * F.col("__na"))
        .filter(F.col("__na") >= t * F.col("__nb"))
        .select("id_a", "id_b", ubound.alias("__ub"), need.alias("__need"))
        .groupBy("id_a", "id_b")
        .agg(F.min("__ub").alias("__ub"), F.first("__need").alias("__need"))
        .filter(F.col("__ub") >= F.col("__need"))
        .select("id_a", "id_b")
    )
    return (
        cand.join(
            sets.select(
                F.col("__id").alias("id_a"), F.col("__hs").alias("__ha")
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("__id").alias("id_b"), F.col("__hs").alias("__hb")
            ),
            "id_b",
        )
        .withColumn("__inter", F.size(F.array_intersect("__ha", "__hb")))
        .withColumn(
            "jaccard",
            F.col("__inter").cast("double")
            / (
                F.size("__ha") + F.size("__hb") - F.col("__inter")
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l: int = 4,
) -> DataFrame:
    """Maximal duplicated-span extraction — the exact-substring-dedup
    signal (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better") re-expressed as set ops + windows instead of a
    suffix array: a token position is "duplicated" when some l-gram
    covering it also appears in ANOTHER document; maximal spans are the
    merged islands of duplicated l-gram positions (two grams merge when
    their token coverage overlaps OR is contiguous, i.e. position gap
    <= l — a span is a maximal contiguous RUN of duplicated tokens,
    cross-validated against a direct coverage-union reference in
    tests/test_curation_properties.py). Returns
    one row per input doc: (doc_id, n_tokens, n_dup_spans, dup_tokens,
    max_span_tokens, dup_frac) with zeros when nothing is duplicated —
    the per-doc evidence behind cut-the-span curation decisions.

    Scale shape: the cross-doc step shuffles DISTINCT (gram-hash,
    doc_id) pairs — bodies never move, map-side partial aggregation
    collapses boilerplate grams, and the carrier attach is an equi join
    AQE can skew-split (same plan family as dup_ngram_fraction, which
    documents the 64-bit collision trade). The island merge is a lag +
    running-sum window partitioned BY DOCUMENT — state bounded by one
    doc's gram count, never corpus-wide. A suffix array would find
    duplicated substrings at ANY length; fixing the probe length l (the
    dedup literature uses 50 tokens at web scale) is what makes the
    computation a pair of hash shuffles instead of a global sort, and
    spans shorter than l are simply not probed — the documented
    resolution limit, not a bug.
    """
    from pyspark.sql import Window

    words = F.split(normalize_text(text_col), " ")
    base = df.select(
        F.col(id_col),
        F.size(words).alias("n_tokens"),
        F.posexplode(word_shingles(text_col, l)).alias("pos", "__g"),
    ).select(id_col, "n_tokens", "pos", F.xxhash64("__g").alias("__h"))
    carriers = (
        base.select("__h", id_col)
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") >= 2)
    )
    dup_pos = base.join(carriers.select("__h"), "__h").select(
        id_col, "n_tokens", "pos"
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = dup_pos.withColumn(
        "__new",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > l),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__island",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = islands.groupBy(id_col, "n_tokens", "__island").agg(
        F.least(
            F.max("pos") - F.min("pos") + F.lit(l), F.col("n_tokens")
        ).alias("__span_tokens")
    )
    per_doc = spans.groupBy(id_col, "n_tokens").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("__span_tokens").alias("dup_tokens"),
        F.max("__span_tokens").alias("max_span_tokens"),
    )
    all_docs = df.select(F.col(id_col), F.size(words).alias("n_tokens"))
    return all_docs.join(per_doc, [id_col, "n_tokens"], "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.coalesce("max_span_tokens", F.lit(0)).alias("max_span_tokens"),
        (
            F.coalesce("dup_tokens", F.lit(0)).cast("double")
            / F.col("n_tokens")
        ).alias("dup_frac"),
    )


def cut_spans_rebuild(
    df: DataFrame,
    cut_pos: DataFrame,
    text_col: str,
    id_col: str,
    l: int,
) -> DataFrame:
    """Shared span-cut machinery (review finding: previously duplicated
    between cut_dup_spans and curation.cut_contaminated_spans): given
    ``cut_pos`` = (id, n_tokens, pos) rows naming the start positions of
    l-grams whose token coverage must be deleted, merge them into
    maximal islands (gap <= l), derive per-doc cut ranges, and rebuild
    each document's text with one in-row higher-order filter.

    Scale shape: islands merge per document (window state bounded by
    one doc's hit positions); the rebuild joins each doc to its OWN cut
    ranges on the id equi key — no token-level shuffle, bodies move
    exactly once, untouched docs pass through the left join.  Returns
    (id, text, clean_text, n_tokens, kept_tokens)."""
    from pyspark.sql import Window

    words = F.split(normalize_text(text_col), " ")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = cut_pos.withColumn(
        "__new",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > l),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__island",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ranges = (
        islands.groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("s"),
            F.least(
                F.max("pos") + F.lit(l - 1), F.first("n_tokens") - F.lit(1)
            ).alias("e"),
        )
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("s", "e")).alias("__ranges"))
    )
    kept = F.filter(
        words,
        lambda x, i: ~F.exists(
            F.col("__ranges"), lambda r: (i >= r["s"]) & (i <= r["e"])
        ),
    )
    return (
        df.join(ranges, id_col, "left")
        .withColumn("__ranges", F.coalesce("__ranges", F.array()))
        .select(
            id_col,
            F.col(text_col).alias("text"),
            F.array_join(kept, " ").alias("clean_text"),
            F.size(words).alias("n_tokens"),
            F.size(kept).alias("kept_tokens"),
        )
    )


def cut_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l: int = 4,
) -> DataFrame:
    """Span-cut curation — the REMOVAL half of :func:`dup_spans` (Lee et
    al. 2021 cut the duplicated substring from all but one occurrence):
    rebuild each document's text with its duplicated spans deleted,
    keeping the FIRST carrier. A token position in doc D is cut iff some
    l-gram covering it also occurs in a document with a SMALLER doc_id —
    so exactly one copy of every duplicated substring survives the pass
    corpus-wide (the lowest-id carrier, the same canonical-survivor
    convention as dedup_keepset), and distinct docs never cut each
    other symmetrically.

    Scale shape: carrier minima shuffle (gram-hash, doc_id) pairs with
    map-side partial min; the island merge + rebuild is the shared
    :func:`cut_spans_rebuild` (bounded per-doc window state, bodies
    move exactly once). Returns
    (doc_id, text, clean_text, n_tokens, kept_tokens).
    """
    words = F.split(normalize_text(text_col), " ")
    base = df.select(
        F.col(id_col),
        F.size(words).alias("n_tokens"),
        F.posexplode(word_shingles(text_col, l)).alias("pos", "__g"),
    ).select(id_col, "n_tokens", "pos", F.xxhash64("__g").alias("__h"))
    first_carrier = base.groupBy("__h").agg(F.min(id_col).alias("__first"))
    cut_pos = (
        base.join(first_carrier, "__h")
        .filter(F.col("__first") < F.col(id_col))
        .select(id_col, "n_tokens", "pos")
    )
    return cut_spans_rebuild(df, cut_pos, text_col, id_col, l)


def edit1_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_len: int = 128,
) -> DataFrame:
    """Similarity SELF-join under Levenshtein distance <= 1 by
    deletion-neighborhood blocking (the FastSS / SymSpell scheme) —
    (id_a, id_b, name_a, name_b, dist) with id_a < id_b.

    Why not a cross join: edit-distance joins are the classic
    quadratic trap.  The deletion-neighborhood identity bounds it: two
    strings within distance 1 ALWAYS share a member of each other's
    {self} ∪ {single-char deletions} sets (equal: the string itself;
    substitution at i: both i-deletions coincide; insert/delete: the
    longer string's deletion hits the shorter) — so emitting len+1
    keys per string turns the join into an EQUI-join on the variant
    key, with a cheap Levenshtein verify killing the false candidates
    that share a deletion but differ twice (e.g. 'ab' / 'ba').  Per
    string: len+1 key rows (key-only shuffle); per bucket: strings
    sharing one specific variant — bounded by data similarity, never
    by corpus size.  All JVM built-ins (transform/substr/levenshtein);
    exact-replay oracle via DuckDB's identical levenshtein.

    The reference has no fuzzy-match surface (SURVEY §2.9 extension);
    public-pattern citation: Bocek et al., "Fast Similarity Search in
    Large Dictionaries" (FastSS, 2007).

    SHORT-KEY CONTRACT (enforced): the deletion neighborhood emits
    len+1 keys each of length len-1 — O(len^2) bytes per row, a
    shuffle amplifier on document-length text.  This operator is for
    SHORT KEYS (names, identifiers, titles); rows longer than
    ``max_len`` fail the job loudly (a one-comparison-per-row
    raise_error guard, negligible next to the explode) instead of
    silently exploding the shuffle.  For long text, use the MinHash /
    SimHash family; a SymSpell prefix-truncation variant would slot in
    here if a long-key edit join is ever actually needed.
    """
    # stage the guard as its OWN projection (one evaluation per row;
    # referencing it from inside the transform lambda would re-evaluate
    # per element — the minhash_bands staging lesson)
    guard = F.when(
        F.length(F.col(text_col)) > max_len,
        F.raise_error(
            F.concat(
                F.lit(
                    f"edit1_join: {text_col} exceeds the short-key "
                    f"contract (max_len={max_len}); use MinHash/SimHash "
                    "for long text. Offending prefix: "
                ),
                F.substring(F.col(text_col), 1, 40),
            )
        ),
    ).otherwise(F.col(text_col))
    df = df.select(F.col(id_col), guard.alias(text_col))
    s = F.col(text_col)
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - 1),
            F.substr(s, i + 1, F.length(s)),
        ),
    )
    # join on the xxhash64 of each variant, not the variant string: the
    # key table shuffles len+1 rows per input row, and an 8-byte long
    # roughly halves those shuffle bytes vs a len-1-char key (and sorts
    # cheaper under SMJ).  Equal strings hash equal, so no pair is ever
    # lost; a 64-bit collision can only ADD a candidate, which the exact
    # verify below kills — output is byte-identical to the string join.
    # repartition ON THE JOIN KEY: this is the exchange the shuffled
    # join needs anyway (hash-distributed on __k, computed once and
    # reused by both aliases), made explicit so the expensive part —
    # candidate fan-out + banded verify — never inherits the parallelism
    # of a narrow upstream scan.  Without it, a small single-file input
    # lets the planner broadcast one side and run the whole probe
    # (explode x len amplification + DP verify) in ONE task pinned to
    # the scan partitioning (r10 stage audit: 1 task, 5.6 s of 8.9 s
    # wall at sf0.1; 3.7 s wall with the exchange).
    keys = df.select(
        F.col(id_col).alias("__id"),
        s.alias("__s"),
        F.explode(F.array_distinct(F.array_append(dels, s))).alias("__kstr"),
    ).select("__id", "__s", F.xxhash64("__kstr").alias("__k")).repartition("__k")
    a, b = keys.alias("a"), keys.alias("b")
    cand = a.join(
        b,
        (F.col("a.__k") == F.col("b.__k"))
        & (F.col("a.__id") < F.col("b.__id")),
    ).select(
        F.col("a.__id").alias("id_a"),
        F.col("b.__id").alias("id_b"),
        F.col("a.__s").alias("name_a"),
        F.col("b.__s").alias("name_b"),
    )
    # banded verify BEFORE the dedup shuffle: levenshtein(a, b, k) runs
    # the O(len*k) diagonal-band DP and returns the EXACT distance when
    # <= k, -1 otherwise — same kept rows and dist values as the full
    # O(len^2) DP (~len/k cheaper per candidate; the r10 profile put the
    # full-DP verify at ~70% of this operator's runtime).  Filtering
    # first means distinct() shuffles only true pairs (multiplicity <=
    # shared-key count), not the ~4x larger raw candidate stream.
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b", 1))
        .where(F.col("dist") >= 0)
        .distinct()
    )


def edit2_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_len: int = 32,
) -> DataFrame:
    """Similarity SELF-join under Levenshtein distance <= 2 — the
    depth-2 FastSS neighborhood (Bocek et al. 2007, Theorem: strings
    within edit distance k always share a member of each other's
    <=k-deletion neighborhoods, since every edit op is simulated by at
    most one deletion per side).  (id_a, id_b, name_a, name_b, dist)
    with id_a < id_b and dist <= 2.

    Keys per string: {self} ∪ {1-deletions} ∪ {2-deletions} =
    1 + len + len(len-1)/2 — QUADRATIC in length, which is why the
    short-key contract here is TIGHTER than :func:`edit1_join`'s
    (max_len=32 -> <=529 keys/row); rows past ``max_len`` fail loudly
    via the same staged raise_error projection.  The join itself is an
    EQUI-join on the variant key (never all-pairs), false candidates
    killed by one exact Levenshtein verify; 2-deletion keys are denser
    than 1-deletion keys, so the verify prunes a larger candidate set —
    the price of radius 2.  All JVM built-ins (nested transform /
    flatten / substr / levenshtein); DuckDB replays the same pair set
    by brute force inside the face's blocking key.

    The reference has no fuzzy-match surface (SURVEY §2.9 extension);
    same public-pattern citation as edit1_join.
    """
    guard = F.when(
        F.length(F.col(text_col)) > max_len,
        F.raise_error(
            F.concat(
                F.lit(
                    f"edit2_join: {text_col} exceeds the short-key "
                    f"contract (max_len={max_len}); use MinHash/SimHash "
                    "for long text. Offending prefix: "
                ),
                F.substring(F.col(text_col), 1, 40),
            )
        ),
    ).otherwise(F.col(text_col))
    df = df.select(F.col(id_col), guard.alias(text_col))
    s = F.col(text_col)
    dels1 = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - 1),
            F.substr(s, i + 1, F.length(s)),
        ),
    )
    # delete positions i < j in ONE pass over the original string:
    # concat(s[1..i-1], s[i+1..j-1], s[j+1..len]).  Gated behind
    # len >= 2: Spark's sequence(start, stop) DESCENDS when start >
    # stop, so for shorter strings the unclamped sequence(1, len-1)
    # (and the inner sequence(i+1, len)) would emit degenerate
    # negative-length deletion keys — harmless only because the exact
    # Levenshtein verify kills the spurious candidates, but the
    # candidate fan-out is unintended.  A string of length < 2 has no
    # 2-deletion neighborhood, so the empty array is the exact answer.
    dels2 = F.when(
        F.length(s) >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.length(s) - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, F.length(s)),
                    lambda j: F.concat(
                        F.substr(s, F.lit(1), i - 1),
                        F.substr(s, i + 1, j - i - 1),
                        F.substr(s, j + 1, F.length(s)),
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # hashed join key, same contract as edit1_join: equal variants hash
    # equal (no lost pair); collisions only add verify-killed candidates.
    # Depth-2 emits 1 + len + len(len-1)/2 key rows per string, so the
    # long-vs-string shuffle saving is even larger here.
    keys = df.select(
        F.col(id_col).alias("__id"),
        s.alias("__s"),
        F.explode(
            F.array_distinct(
                F.concat(F.array(s), dels1, dels2)
            )
        ).alias("__kstr"),
    ).select("__id", "__s", F.xxhash64("__kstr").alias("__k")).repartition("__k")
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__k") == F.col("b.__k"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__s").alias("name_a"),
            F.col("b.__s").alias("name_b"),
        )
    )
    # banded O(len*2) verify BEFORE the dedup shuffle, exact within the
    # radius (see edit1_join for both rationales)
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b", 2))
        .where(F.col("dist") >= 0)
        .distinct()
    )
