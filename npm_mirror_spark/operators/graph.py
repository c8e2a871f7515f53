"""Graph algorithms over edge DataFrames.

Connected components (min-label propagation) lives in operators/dedup.py
where its consumer is; this module holds the general-purpose pieces,
starting with PageRank — in a training-data pipeline, centrality over
the DUPLICATION graph ranks template/boilerplate carriers (hub documents
connected to many near-copies), a curation signal the pair lists alone
don't expose.

The reference engine has no graph surface (SURVEY §2.9 extension
mandate); the design target is the same as every iterative operator
here (kmeans, components): per round, shuffles bounded by |edges| of
key-only columns, nothing corpus-sized on the driver.

Determinism contract (what makes q_pagerank ORACLE-CHECKABLE like
q_kmeans): ranks are scaled int64 (units of 10^-12) and every step is
integer arithmetic — contribution = (rank * dampN) div (dampD * deg),
teleport = (SCALE * (dampD - dampN)) div (dampD * n) — so float
summation order never exists and an unrolled SQL replay is
bit-identical.  The quantization error per round is < deg ulps of
10^-12 — noise for ranking purposes, and BOTH engines make exactly the
same error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12  # rank unit = 1e-12; n * SCALE and rank * 85 stay << 2^63


def _symmetrize(
    pairs: DataFrame, a_col: str, b_col: str, out_a: str, out_b: str
) -> DataFrame:
    """Emit both directions of every pair IN ONE PASS: an in-row
    explode of the two orientations (r14, guide §2.4).  The former
    two-leg ``unionByName`` evaluated the pair lineage once per leg —
    for edges minted by the MinHash-LSH self-join that meant running
    the whole signature+banding pipeline twice at the symmetrized
    frame's materialization (measured: one of the two dominant stages
    of q_pagerank).  Same row multiset, so every downstream integer
    aggregate/distinct is unchanged."""
    a, b = F.col(a_col), F.col(b_col)
    return pairs.select(
        F.explode(
            F.array(
                F.struct(a.alias(out_a), b.alias(out_b)),
                F.struct(b.alias(out_a), a.alias(out_b)),
            )
        ).alias("__e")
    ).select(F.col(f"__e.{out_a}").alias(out_a), F.col(f"__e.{out_b}").alias(out_b))


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damp_num: int = 85,
    damp_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over an UNDIRECTED pair list: each input row (a, b) is
    one edge, symmetrized INTERNALLY (do NOT pre-expand to both
    directions — that would double every degree and shift the integer
    floors).  Returns (id, rank) with rank in 1e-12 units (long); ranks
    sum to ~PR_SCALE.

    Undirected-only is a real restriction, not laziness: after
    symmetrization every connected node has an out-edge, so no dangling
    mass exists and no per-round global redistribution scalar is needed
    — the whole computation stays one lazy plan.  A directed variant
    must handle dangling nodes (rank keyed by dst drops source-only
    nodes and leaks sink mass), which costs one driver-visible
    aggregate per round; that trade-off should be explicit, so directed
    input is simply not accepted here.

    Per round: contribution RATES are computed on the NODE-sized
    ``ranks ⋈ deg`` table first (same key, both node-sized), then ONE
    |edges|-bounded join fans them out and one (dst) integer-sum
    shuffle collects — the driver sees only the node COUNT.  Joining
    ranks onto edges before folding in the degree would shuffle a
    second edge-sized intermediate per round for identical integer
    algebra (the r5 verdict's efficiency finding).

    The loop-invariant ``und``/``deg`` tables are persisted
    (MEMORY_AND_DISK, spill-safe): without it every round re-evaluates
    the full edge lineage — for faces whose edges come from the
    MinHash LSH self-join, the r10 plan audit counted 300+ parquet
    scans in ONE directed-variant plan.  Persisting the symmetrized
    edge list across rounds is the standard Spark iterative-graph
    shape (GraphX/GraphFrames do exactly this); laziness is otherwise
    unchanged — ``deg.count()`` below was already the only action.
    """
    pairs = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    # one-pass symmetrize + src partitioning BEFORE the persist (r14):
    # deg's groupBy and every round's contribution join are keyed by
    # src, so one exchange establishes the layout all consumers reuse,
    # and the cached relation can never be re-broadcast per round (the
    # in-memory size estimate made the planner do exactly that — see
    # bfs_hops).  The shuffle_hash hints below keep the node-sized
    # frames as per-partition build sides against the streamed cache.
    und = (
        _symmetrize(pairs, "src", "dst", "src", "dst")
        .repartition("src")
        .persist()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    n = deg.count()
    if n == 0:
        return edges.sparkSession.createDataFrame([], "id long, rank long")
    teleport = (PR_SCALE * (damp_den - damp_num)) // (damp_den * n)
    # the literals MUST be long: with enough nodes PR_SCALE//n drops
    # under 2^31, F.lit types it IntegerType, and ANSI constant folding
    # overflows evaluating rank * damp_num in 32-bit — an SF-dependent
    # crash (found by the sf0.1 oracle sweep; smaller graphs pass only
    # because their bigger per-node rank forces LongType)
    ranks = deg.select(
        F.col("src").alias("id"),
        F.lit(PR_SCALE // n).cast("long").alias("rank"),
    )
    for _ in range(n_iter):
        rates = ranks.join(
            deg.hint("shuffle_hash"), ranks["id"] == deg["src"]
        ).select(
            "id",
            F.expr(f"(rank * {damp_num}) div ({damp_den} * deg)").alias("c"),
        )
        contrib = und.join(
            rates.hint("shuffle_hash"), und["src"] == rates["id"]
        ).select("dst", "c")
        ranks = contrib.groupBy("dst").agg(
            (F.sum("c") + F.lit(teleport).cast("long")).alias("rank")
        ).select(F.col("dst").alias("id"), "rank")
    return ranks


def _canonical_pairs(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Canonical simple undirected graph: (a, b) with a < b — self-loops
    dropped, duplicate and reversed edges collapsed, NULL endpoints out."""
    a, b = F.col(src_col), F.col(dst_col)
    return (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def drop_oversized_baskets(
    df: DataFrame, basket_col: str, max_basket: int = 64
) -> DataFrame:
    """Guard the quadratic basket-pairing faces (r7 verdict item 3):
    exclude baskets with more than ``max_basket`` rows before any
    per-basket self-join, so one adversarial 100k-item basket can
    never plan 5x10^9 pair rows.  (Row count, not distinct-item count:
    rows are what the self-join squares.)

    Whole-basket exclusion (not a top-N cap): a partial basket would
    produce arbitrary pair subsets, while dropping the basket keeps
    every emitted pair an honest co-occurrence — and mega-baskets are
    themselves a bot/boilerplate signal market-basket practice discards.
    The anti join deliberately carries NO broadcast hint: in exactly the
    adversarial regime this guard defends against (a bot/boilerplate
    flood of huge baskets) the oversized key set is unbounded, and a
    forced broadcast would OOM the driver — AQE picks broadcast when the
    set is actually small and falls back to a shuffled anti join when it
    is not.  The size count is one key-only partial aggregate.  Fixture
    baskets (TPC-H, <= 7 items) are far under any sane cap, so oracles
    are unchanged — at 100 TB the cap is the difference between a
    bounded wedge join and an accidental cross product.
    """
    if max_basket < 1:
        raise ValueError("max_basket must be >= 1")
    oversized = (
        df.groupBy(basket_col)
        .agg(F.count(F.lit(1)).alias("__bn"))
        .where(F.col("__bn") > max_basket)
        .select(basket_col)
    )
    return df.join(oversized, basket_col, "left_anti")


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int = 64,
) -> DataFrame:
    """Co-occurrence edges (src < dst) from (basket, item) rows, with
    the :func:`drop_oversized_baskets` guard applied first — the ONLY
    sanctioned route to a per-basket self-join (the registry plan lint
    treats unguarded basket pairing as an accidental cross product)."""
    guarded = drop_oversized_baskets(
        df.select(basket_col, item_col), basket_col, max_basket
    ).repartition(basket_col)
    # repartition ON THE BASKET KEY: the exchange the per-basket
    # self-join needs anyway (computed once, read by both aliases), made
    # explicit so the pair fan-out never runs at the parallelism of a
    # narrow upstream scan — with a single-file input the planner
    # otherwise broadcasts one side and squares every basket in one task
    # (the r10 q_edit_join stage-audit pathology, same cure)
    # SHUFFLE_HASH pin (r14): without it the planner broadcasts one side
    # whenever the basket frame's size estimate clears the threshold —
    # and the broadcast build side re-computes the guard + repartition
    # lineage instead of reading the shared exchange (profiled on
    # q_triangle_est: BroadcastHashJoin + a duplicated guard subtree).
    # Per-basket groups are <= max_basket rows by the guard, so the
    # per-partition hash build is bounded (guide §3.1), and at 100 TB a
    # corpus-sized basket frame could never broadcast anyway.
    x, y = guarded.alias("x"), guarded.hint("shuffle_hash").alias("y")
    return x.join(
        y,
        (F.col(f"x.{basket_col}") == F.col(f"y.{basket_col}"))
        & (F.col(f"x.{item_col}") < F.col(f"y.{item_col}")),
    ).select(
        F.col(f"x.{item_col}").alias("src"),
        F.col(f"y.{item_col}").alias("dst"),
    )


def _degrees(pairs: DataFrame) -> DataFrame:
    return (
        pairs.select(F.col("a").alias("id"))
        .unionByName(pairs.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def kcore(
    edges: DataFrame,
    k: int,
    n_rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core peeling, FIXED round count: repeatedly delete nodes whose
    degree in the CURRENT subgraph is < k; returns (id, deg) for the
    nodes surviving ``n_rounds`` peels, with their subgraph degree.

    The k-core (maximal subgraph where every node has >= k neighbors)
    separates genuinely dense communities from stars and chains — for
    the duplication graph, core membership distinguishes template
    ecosystems (mutually near-duplicating clusters) from hub-and-spoke
    copies that PageRank alone ranks similarly.  Peeling converges in
    <= |V| rounds but in practice a handful (each round removes every
    currently-under-k node at once); a FIXED round count makes it
    oracle-checkable by unrolling — the same trade q_pagerank/q_kmeans
    pin.  Use :func:`kcore_fixpoint` when the true fixpoint is
    required.

    Per round: one degree count (map-side partial agg) + two key-only
    semi-joins, then the peeled edge list MATERIALIZES
    (localCheckpoint).  Materializing is load-bearing, not a nicety:
    each round reads ``e`` three times (degrees + both semi-joins), so
    a fully lazy unroll duplicates the prior round's subtree ~4x per
    round — an O(4^rounds) logical plan that OOMs the driver compiling
    a 20-edge graph at 6 rounds (found by the prefix-of-fixpoint
    test).  Values are unaffected; the driver still sees no row data.
    """
    e = _canonical_pairs(edges, src_col, dst_col).localCheckpoint()
    for _ in range(n_rounds):
        keep = _degrees(e).where(F.col("deg") >= k).select("id")
        e = (
            e.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .localCheckpoint()
        )
    return _degrees(e)


def kcore_fixpoint(
    edges: DataFrame,
    k: int,
    max_rounds: int = 30,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """:func:`kcore` iterated to the TRUE fixpoint: peel until the edge
    count stops changing (the driver sees one scalar per round — the
    same convergence probe as connected components).  Materializes each
    round's edge set to keep lineage bounded."""
    e = _canonical_pairs(edges, src_col, dst_col).localCheckpoint()
    prev = e.count()
    for _ in range(max_rounds):
        keep = _degrees(e).where(F.col("deg") >= k).select("id")
        e = (
            e.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .localCheckpoint()
        )
        cur = e.count()
        if cur == prev:
            break
        prev = cur
    return _degrees(e)


def label_propagation(
    edges: DataFrame,
    n_rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al. 2007, made deterministic): every node starts labeled with its
    own id; each round it adopts the label that is most frequent among
    its neighbors' PREVIOUS-round labels, breaking count ties toward the
    SMALLEST label.  Returns (id, label) after ``n_rounds``.

    Where components (dedup.py) answers "connected at all?" and kcore
    answers "mutually dense?", label propagation finds the
    mesoscale communities a duplication/affinity graph organizes into —
    the template-family view curation acts on.  The classic algorithm
    is randomized (scan order + uniform tie-break); this variant fixes
    BOTH (synchronous rounds, min-label ties), which is what makes it
    oracle-replayable like the other unrolled-iteration operators
    (pagerank, kmeans, kcore).

    Per round: one edge-sized join stamping neighbor labels, one
    (node, label) count shuffle with map-side partials, one argmax
    aggregate via max(struct(count, -label)) — no windows, nothing on
    the driver.  Isolated nodes never appear in the message join and
    keep their own id via the left join.  Fixed small ``n_rounds`` keeps
    the lazy plan bounded (the kcore lesson: each round adds three
    operators to the tree, so beyond ~4 rounds callers should
    localCheckpoint between rounds).

    CONTRACT: node ids must be NUMERIC (the min-label tie-break rides a
    unary negation inside the struct max; on strings that negation
    would implicitly cast to double and yield NULL, silently corrupting
    ties).  Validated loudly here — dictionary-encode string ids first
    (e.g. ``F.xxhash64`` or a monotonically-assigned id map), the
    standard graph-engine practice.
    """
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    from pyspark.sql.types import NumericType

    for c in (src_col, dst_col):
        dt = edges.schema[c].dataType
        if not isinstance(dt, NumericType):
            raise TypeError(
                f"label_propagation requires numeric node ids; column "
                f"{c!r} is {dt.simpleString()} — dictionary-encode string "
                "ids first (the min-label tie-break negates labels)"
            )
    pairs = _canonical_pairs(edges, src_col, dst_col)
    # symmetrized in one pass and persisted (r14): adj is consumed by
    # every round's message join AND the node derivation — unpersisted,
    # each consumer re-ran the canonical-pair lineage twice (two union
    # legs); the iterative-lineage discipline the other loop operators
    # already follow
    adj = (
        _symmetrize(pairs, "a", "b", "u", "v").repartition("v").persist()
    )
    nodes = adj.select(F.col("u").alias("id")).distinct().persist()
    labels = nodes.select("id", F.col("id").alias("label"))
    for _ in range(n_rounds):
        msgs = adj.join(
            labels.select(F.col("id").alias("v"), "label"), "v"
        ).select("u", "label")
        counts = msgs.groupBy("u", "label").agg(
            F.count(F.lit(1)).alias("__c")
        )
        best = (
            counts.groupBy("u")
            .agg(
                F.max(
                    F.struct(
                        F.col("__c"), (-F.col("label")).alias("__nl")
                    )
                ).alias("__m")
            )
            .select(F.col("u").alias("id"), (-F.col("__m.__nl")).alias("label"))
        )
        labels = nodes.join(best, "id", "left").select(
            "id", F.coalesce(F.col("label"), F.col("id")).alias("label")
        )
    return labels


def _orient(pairs: DataFrame, deg: DataFrame) -> DataFrame:
    """Degree-ordered orientation of canonical (a, b) pairs: every edge
    points from the (deg, id)-lexicographically smaller endpoint to the
    larger, with the destination's (deg, id) key carried as ``sd`` so
    wedge legs enumerate once in orientation order.  The
    Chiba–Nishizeki bound lives here: oriented out-degree <= O(sqrt(2m))
    for every node, hubs included."""
    stamped = (
        pairs.join(
            deg.select(F.col("id").alias("a"), F.col("deg").alias("__da")), "a"
        ).join(
            deg.select(F.col("id").alias("b"), F.col("deg").alias("__db")), "b"
        )
    )
    # a < b by canonicalization, so the (deg, id) tie-break on equal
    # degrees is simply a→b
    lt = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    return stamped.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("dst"),
        # the DESTINATION's (deg, id) key orders wedge legs so each
        # successor pair is enumerated once, in orientation order
        F.when(lt, F.col("__db")).otherwise(F.col("__da")).alias("sd"),
    )


def _closed_wedges(centers: DataFrame, oriented: DataFrame) -> DataFrame:
    """(u, v, w) triangles discovered as wedges centered at ``centers``
    rows (an oriented-edge subset — the full set for exact counting, a
    sampled-src subset for the estimator) closed by the FULL oriented
    edge set."""
    x, y = centers.alias("x"), centers.alias("y")
    wedges = x.join(
        y,
        (F.col("x.src") == F.col("y.src"))
        & (
            (F.col("x.sd") < F.col("y.sd"))
            | ((F.col("x.sd") == F.col("y.sd")) & (F.col("x.dst") < F.col("y.dst")))
        ),
    ).select(
        F.col("x.src").alias("u"), F.col("x.dst").alias("v"), F.col("y.dst").alias("w")
    )
    return wedges.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
        "left_semi",
    )


def triangle_count_sampled(
    edges: DataFrame,
    rate_den: int = 5,
    seed: int = 0,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Unbiased FULL-GRAPH triangle-count estimator by deterministic
    center sampling (r7 verdict item 4) — one row:
    (rate_den, sampled_triangles, est_triangles).

    Under degree-ordered orientation each triangle has exactly ONE
    center (the (deg, id)-least vertex, the one with both out-edges),
    so counting triangles whose center lands in a 1/rate_den vertex
    sample and scaling by rate_den is an unbiased estimate of the total
    — and the expensive wedge self-join runs on the sampled-center
    out-edges only, cutting wedge volume by ~rate_den while the closure
    semi-join stays against the full oriented edge set.  This is the
    face that prices the FULL co-purchase graph (q_triangles' registered
    face slices 1/5 of baskets instead; see docs/BENCH_NOTES.md for the
    exact-vs-estimate cross-check).

    Exact-replay contract: the sample is md5(seed ':' center) %
    rate_den == 0 (md5_key64 — uniform on [0, 2^60), so % equals pmod)
    and the estimate is the exact integer product sampled * rate_den —
    no floats anywhere, so the DuckDB oracle replays bit-for-bit in the
    q_kmeans/q_pagerank exact-replay style.
    """
    from npm_mirror_spark.operators.dedup import md5_key64

    if rate_den < 1:
        raise ValueError("rate_den must be >= 1")
    # persisted: deg stamps both endpoints in _orient, and oriented is
    # consumed three times (both wedge legs + the closure semi-join) —
    # uncached, each consumption re-evaluates the full edge-source
    # lineage (for the registered face, a basket self-join)
    pairs = _canonical_pairs(edges, src_col, dst_col).persist()
    deg = _degrees(pairs).persist()
    oriented = _orient(pairs, deg).persist()
    # eager materialization (r14): the wedge legs and the closure
    # semi-join become concurrent jobs at execution and raced the
    # unmaterialized cache chain, re-running the edge-source lineage
    # per consumer (the q_link_pred profile finding); one count pins
    # oriented (and, transitively, pairs/deg) first
    oriented.count()
    centers = oriented.where(
        F.pmod(md5_key64(F.col("src"), seed), F.lit(int(rate_den))) == 0
    )
    # narrowed closure (r15, guide §2.3 project before the exchange):
    # the estimator only needs the NUMBER of closed wedges, never their
    # center identity, so the center column is dropped from the wedge
    # rows before they cross the closure exchange — the r14 profile put
    # the face's largest shuffle (73.5 MB at sf0.1) on the (u, v, w)
    # wedge rows feeding the closure semi-join.  A left-semi join
    # preserves left-side multiplicity, so counting (v, w) wedge rows
    # with a matching oriented edge is the same exact integer the
    # (u, v, w) form counted.  (The full pre-aggregation to
    # (v, w, count) was tried and REVERTED: (v, w) wedge keys are
    # near-unique on this graph, so the extra hash-aggregate exchange
    # cost 0.8-1.0 s without reducing rows — see OPTIMIZATION_r15.md.
    # triangle_counts keeps the row-per-wedge form: its per-node
    # credit needs the center column.)
    wedge_vw = (
        centers.alias("x")
        .join(
            centers.alias("y"),
            (F.col("x.src") == F.col("y.src"))
            & (
                (F.col("x.sd") < F.col("y.sd"))
                | (
                    (F.col("x.sd") == F.col("y.sd"))
                    & (F.col("x.dst") < F.col("y.dst"))
                )
            ),
        )
        .select(F.col("x.dst").alias("v"), F.col("y.dst").alias("w"))
    )
    closed = wedge_vw.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
        "left_semi",
    )
    return closed.agg(
        F.lit(int(rate_den)).cast("long").alias("rate_den"),
        F.count(F.lit(1)).alias("sampled_triangles"),
        (F.count(F.lit(1)) * F.lit(int(rate_den))).alias("est_triangles"),
    )


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected pair list.  Returns (id, deg, triangles, lcc) — one row
    per node of the canonicalized graph (self-loops dropped, duplicate
    and reversed edges collapsed).

    Triangle counting is the canonical "curse of the last reducer"
    problem (Suri & Vassilvitskii, WWW'11): the naive wedge join keyed
    on the shared vertex puts deg(v)^2 candidate rows on one reducer,
    and a single celebrity node kills the job at scale.  The fix is
    DEGREE-ORDERED ORIENTATION (Chiba–Nishizeki): orient every edge
    from the (degree, id)-lexicographically smaller endpoint to the
    larger, so each triangle {a ≺ b ≺ c} is discovered exactly once as
    the wedge (a→b, a→c) closed by the oriented edge b→c — and the
    oriented out-degree of EVERY node, hubs included, is bounded by
    O(sqrt(2m)): a node can only point at neighbors of equal-or-higher
    degree, and fewer than sqrt(2m) nodes have degree above sqrt(2m).
    The wedge join's total size is therefore Σ outdeg(v)^2 ≤
    2m·sqrt(2m) regardless of skew, vs Σ deg(v)^2 (quadratic in the
    hub degree) for the unoriented join.

    Shuffle inventory (all key-only columns, nothing wide): canonical
    (lo, hi) distinct; degree count (map-side partial agg); two
    node-sized degree joins to stamp endpoint degrees; the wedge
    self-join on the oriented source; a (v, w) equi semi-join closing
    the wedges; a 3-role union + count for per-node credit.  No
    driver-side data beyond the plan.

    Determinism contract (what makes q_triangles oracle-checkable):
    counts and degrees are exact integers; lcc = 2T / (deg·(deg-1)) is
    ONE division of exact ints (IEEE-identical in any engine), defined
    0.0 for deg < 2.
    """
    # same persist rationale as triangle_count_sampled (deg additionally
    # anchors the final per-node credit join); same eager pin — the
    # wedge legs + closure semi-join race the lazy cache otherwise
    pairs = _canonical_pairs(edges, src_col, dst_col).persist()
    deg = _degrees(pairs).persist()
    oriented = _orient(pairs, deg).persist()
    oriented.count()
    tris = _closed_wedges(oriented, oriented)
    credit = (
        tris.select(F.col("u").alias("id"))
        .unionByName(tris.select(F.col("v").alias("id")))
        .unionByName(tris.select(F.col("w").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("__t"))
    )
    return (
        deg.join(credit, "id", "left")
        .select(
            "id",
            "deg",
            F.coalesce(F.col("__t"), F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("deg") >= 2,
                (F.lit(2.0) * F.coalesce(F.col("__t"), F.lit(0)).cast("double"))
                / (F.col("deg") * (F.col("deg") - F.lit(1))).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def pagerank_directed(
    edges: DataFrame,
    n_iter: int = 3,
    damp_num: int = 85,
    damp_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a DIRECTED edge list WITH dangling-mass handling —
    the variant :func:`pagerank` deliberately refuses, its documented
    trade made explicit.  Input rows are distinct (src, dst) arcs;
    returns (id, rank) with rank in 1e-12 units (long).

    Dangling nodes (no out-arc — e.g. pristine originals in a
    copies-point-at-originals attribution graph) would leak their rank:
    keying the new rank by dst alone drops them AND loses the mass they
    should redistribute.  Handled the standard way, kept exact-integer:

    - the node UNIVERSE (distinct src ∪ dst) left-joins each round's
      (dst)-keyed sums, so sink/source-only nodes keep receiving
      teleport + dangling share instead of vanishing;
    - each round folds the dangling nodes' total rank into ONE
      singleton aggregate — a 1-row frame CROSS-JOINED (broadcast)
      back, never a driver collect, so the whole computation stays one
      lazy plan — and every node receives
      (dangling_mass * damp_num) div (damp_den * n).

    Per-round cost over :func:`pagerank`: the node-sized left join and
    the 1-row dangling aggregate; the only edge-sized work remains the
    single fan-out join + (dst) integer-sum shuffle.  Same determinism
    contract (scaled int64, integer div/sum throughout — both engines
    floor identically on non-negative values), so the DuckDB oracle
    unrolls round-for-round bit-identically.

    Persistence (r10): the loop invariants (``pairs``, ``nodes``,
    ``outdeg``) are persisted, and so is each round's ``rd`` — ``rd``
    feeds BOTH the rates branch and the dangling aggregate, so an
    unpersisted plan doubles the evaluated lineage every round
    (2^rounds subtree copies; the r10 audit counted 306 parquet scans
    in one 3-round plan over LSH-derived edges).  All cached tables
    are node- or edge-sized, MEMORY_AND_DISK.
    """
    # partitioned by src before the persist (r14): outdeg's groupBy and
    # every round's contribution join are src-keyed, so one exchange
    # serves all consumers and the cached edge relation is never picked
    # as a per-round broadcast build (see pagerank/bfs_hops)
    pairs = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .repartition("src")
        .persist()
    )
    nodes = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    outdeg = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame([], "id long, rank long")
    teleport = (PR_SCALE * (damp_den - damp_num)) // (damp_den * n)
    # long literals for the same ANSI constant-folding reason as pagerank
    ranks = nodes.select(
        "id", F.lit(PR_SCALE // n).cast("long").alias("rank")
    )
    for _ in range(n_iter):
        # persisted: rd feeds BOTH rates and dangling below — uncached,
        # each round would re-evaluate the entire prior-round lineage
        # twice (2^rounds blowup, see docstring)
        rd = ranks.join(
            outdeg.hint("shuffle_hash"), ranks["id"] == outdeg["src"], "left"
        ).select("id", "rank", "deg").persist()
        rates = rd.where(F.col("deg").isNotNull()).select(
            "id",
            F.expr(f"(rank * {damp_num}) div ({damp_den} * deg)").alias("c"),
        )
        dangling = rd.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("__dm")
        )
        contrib = pairs.join(
            rates.hint("shuffle_hash"), pairs["src"] == rates["id"]
        ).select("dst", "c")
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("__s"))
        ranks = (
            nodes.join(sums, nodes["id"] == sums["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.coalesce(F.col("__s"), F.lit(0)).cast("long")
                    + F.expr(f"(__dm * {damp_num}) div ({damp_den} * {n})")
                    + F.lit(teleport).cast("long")
                ).cast("long").alias("rank"),
            )
        )
    return ranks


def pagerank_personalized(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    damp_num: int = 85,
    damp_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "id",
) -> DataFrame:
    """PERSONALIZED PageRank over a directed arc list: teleport AND
    dangling mass return only to the ``seeds`` set (uniformly), so rank
    measures proximity to the seeds rather than global centrality —
    the similarity-expansion primitive ("documents in the duplication
    neighborhood of THESE templates", "parts co-purchased around THIS
    basket") that global PageRank can't express.  Returns (id, rank)
    in 1e-12 units; mass concentrates near seeds and decays with graph
    distance.

    Same structure and exact-integer determinism contract as
    :func:`pagerank_directed` — node-universe left join keeps sinks
    alive, per-round 1-row dangling aggregate broadcast back — with
    the teleport/dangling credit gated by seed membership (a node-sized
    left-join flag, never a driver-side list).  Seeds not present in
    the graph are ignored (semi-join); an empty effective seed set is
    an error.  Initial rank is uniform ON THE SEEDS (PR_SCALE // |S|),
    zero elsewhere — the standard restart-distribution start, which
    also makes the unrolled oracle replay exact from round one.

    Same persistence discipline as :func:`pagerank_directed`: loop
    invariants (``pairs``, ``nodes``, ``outdeg``, ``flagged``) and the
    per-round twice-consumed ``rd`` are persisted, keeping the
    evaluated lineage linear in rounds instead of 2^rounds.
    """
    # partitioned by src before the persist (r14): outdeg's groupBy and
    # every round's contribution join are src-keyed, so one exchange
    # serves all consumers and the cached edge relation is never picked
    # as a per-round broadcast build (see pagerank/bfs_hops)
    pairs = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .repartition("src")
        .persist()
    )
    nodes = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    outdeg = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    seedset = (
        seeds.select(F.col(seed_col).alias("id"))
        .distinct()
        .join(nodes, "id", "left_semi")
        .localCheckpoint()  # reused every round: flag join + |S| scalar
    )
    s = seedset.count()
    if s == 0:
        raise ValueError("no seed is a node of the graph")
    teleport = (PR_SCALE * (damp_den - damp_num)) // (damp_den * s)
    flagged = nodes.join(
        seedset.withColumn("__is_seed", F.lit(True)), "id", "left"
    ).select(
        "id", F.coalesce("__is_seed", F.lit(False)).alias("__is_seed")
    ).persist()
    ranks = flagged.select(
        "id",
        F.when(F.col("__is_seed"), F.lit(PR_SCALE // s).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("rank"),
    )
    for _ in range(n_iter):
        # persisted: consumed by both rates and dangling (see directed)
        rd = ranks.join(
            outdeg.hint("shuffle_hash"), ranks["id"] == outdeg["src"], "left"
        ).select("id", "rank", "deg").persist()
        rates = rd.where(F.col("deg").isNotNull()).select(
            "id",
            F.expr(f"(rank * {damp_num}) div ({damp_den} * deg)").alias("c"),
        )
        dangling = rd.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("__dm")
        )
        contrib = pairs.join(
            rates.hint("shuffle_hash"), pairs["src"] == rates["id"]
        ).select("dst", "c")
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("__s"))
        ranks = (
            flagged.join(sums, flagged["id"] == sums["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.coalesce(F.col("__s"), F.lit(0)).cast("long")
                    + F.when(
                        F.col("__is_seed"),
                        F.expr(
                            f"(__dm * {damp_num}) div ({damp_den} * {s})"
                        )
                        + F.lit(teleport).cast("long"),
                    ).otherwise(F.lit(0).cast("long"))
                ).cast("long").alias("rank"),
            )
        )
    return ranks


_D38 = "decimal(38,0)"


def hits(
    edges: DataFrame,
    n_iter: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg '99) over a DIRECTED arc
    list, UNNORMALIZED: per round, hub(u) = Σ_{u→v} auth(v) then
    auth(v) = Σ_{u→v} hub(u), starting from auth ≡ 1.  Dropping the
    per-round normalization keeps every value an exact integer — the
    normalizer is a GLOBAL scalar, so the rankings (and every ratio
    between two nodes' scores) are identical to the normalized
    iteration's, and the oracle can replay the rounds relationally
    bit-for-bit (the q_pagerank determinism contract, without even
    needing scaled-int division).

    Scores accumulate as DECIMAL(38,0): unnormalized values grow like
    d_max^(2·n_iter), which exceeds int64 on hub-heavy graphs at modest
    depth but stays far inside 38 digits for any realistic n_iter ≤ 4.

    Per round: two |arcs|-bounded equi-joins + two integer-sum shuffles
    — the pagerank loop shape.  The arc list (the loop invariant) is
    persisted once; auth/hub tables stay SPARSE during rounds (a node
    missing from the table contributes exactly 0), and the zero-filled
    dense report joins once at the end.

    Output per node: (id, auth, hub) as exact DECIMAL(38,0); registered
    faces cast via the no-decimal contract.
    """
    if not 1 <= n_iter <= 4:
        # scores grow like d_max^(2*n_iter); past 4 rounds a hub-heavy
        # graph overflows even DECIMAL(38,0), and the zero-filled report
        # would mask the NULL as score 0 (review finding) — fail loudly
        raise ValueError("n_iter must be in [1, 4]")
    arcs = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
        .persist()
    )
    nodes = (
        arcs.select(F.col("src").alias("id"))
        .unionByName(arcs.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    auth = nodes.select("id", F.lit(1).cast(_D38).alias("auth"))
    hub = nodes.select("id", F.lit(0).cast(_D38).alias("hub"))
    for _ in range(n_iter):
        hub = (
            arcs.join(auth.hint("shuffle_hash"), arcs["dst"] == auth["id"])
            .groupBy("src")
            .agg(F.sum("auth").cast(_D38).alias("hub"))
            .select(F.col("src").alias("id"), "hub")
        )
        auth = (
            arcs.join(hub.hint("shuffle_hash"), arcs["src"] == hub["id"])
            .groupBy("dst")
            .agg(F.sum("hub").cast(_D38).alias("auth"))
            .select(F.col("dst").alias("id"), "auth")
        )
    return (
        nodes.join(auth.withColumnRenamed("id", "__ia"),
                   F.col("id") == F.col("__ia"), "left")
        .join(hub.withColumnRenamed("id", "__ih"),
              F.col("id") == F.col("__ih"), "left")
        .select(
            "id",
            F.coalesce(F.col("auth"), F.lit(0).cast(_D38)).alias("auth"),
            F.coalesce(F.col("hub"), F.lit(0).cast(_D38)).alias("hub"),
        )
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Multi-source BFS over the undirected simple graph: the minimum
    hop distance (≤ ``max_hops``) from the seed set to every reachable
    node — the bounded-depth reachability primitive behind contamination
    blast-radius ("everything within 2 dup-hops of a benchmark doc") and
    neighborhood-expansion features.  Exact integers; the oracle unrolls
    the rounds relationally (the q_pagerank contract).

    Level-synchronous frontier iteration — the standard Spark BFS shape:
    per hop, ONE |edges|-bounded equi-join fans the frontier out, a
    distinct collapses multi-parent discoveries, and an anti join
    against the visited set keeps only first-time nodes (min-hop by
    construction: a node discovered at hop h cannot reappear later).
    The symmetrized edge list (loop invariant) and the growing visited
    set (consumed by every later round's anti join AND the final union)
    are persisted per the iterative-lineage discipline.  Seeds that
    never touch the graph still report hop 0 — the seed set is part of
    the answer, not a filter.

    Output: (id, hop) for every node within ``max_hops`` of a seed.
    """
    pairs = _canonical_pairs(edges, src_col, dst_col)
    # partitioned by the join key BEFORE the persist (r14, guide §2.4 /
    # §3.1): every round's frontier expansion joins on src, so one
    # exchange establishes the edge partitioning for all rounds and the
    # cached blocks are already co-partitioned.  Without this the
    # planner BROADCAST the cached edge relation (its in-memory size
    # estimate undercuts the frontier's conservative aggregate
    # estimate), paying a full edge-relation broadcast build per round
    # — measured as the three dominant stages of q_bfs_hops (12-14 s
    # task time each, one per hop).  At real scale the edge table could
    # never broadcast; the shuffled-hash pin below with the bounded,
    # shrinking frontier as build side is the shape that survives.
    und = _symmetrize(pairs, "a", "b", "src", "dst").repartition("src").persist()
    visited = (
        seeds.select(F.col(seeds.columns[0]).alias("id"))
        .distinct()
        .select("id", F.lit(0).cast("int").alias("hop"))
        .persist()
    )
    frontier = visited.select("id")
    for h in range(1, max_hops + 1):
        nxt = (
            und.join(
                frontier.hint("shuffle_hash"),
                und["src"] == frontier["id"],
            )
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .select("id", F.lit(h).cast("int").alias("hop"))
            .persist()
        )
        visited = visited.unionByName(nxt).persist()
        frontier = nxt.select("id")
    return visited


def common_neighbor_scores(
    edges: DataFrame,
    min_common: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Link prediction by common neighbors: for every NON-adjacent pair
    (u, w) at distance 2, the number of shared neighbors and the
    neighborhood Jaccard ``common / (deg_u + deg_w − common)`` — the
    classic "who should be connected but isn't" scores (Liben-Nowell &
    Kleinberg '03), exact integers + one IEEE division.

    Shape: the adjacency list (both directions) repartitions ON THE
    CENTER KEY (the exchange the wedge self-join needs anyway — the
    basket_pairs narrow-scan cure), the wedge join enumerates each
    center's neighbor pairs u < w on the shared-center EQUI key, one
    (u, w) count collapses wedges to common-neighbor counts, an anti
    join removes already-adjacent pairs, and two node-sized degree
    joins finish the report.  Wedge volume is Σ_c deg(c)² — bounded by
    feeding a degree-bounded graph (the q_triangles slice discipline);
    like triangle counting, exact common-neighbor counts cannot avoid
    touching every wedge.

    Output: (u, w, common, deg_u, deg_w, jaccard) for non-edges with
    ``common >= min_common``.
    """
    pairs = _canonical_pairs(edges, src_col, dst_col).persist()
    # eager materialization (r14): the degree and anti-join consumers
    # below become CONCURRENT broadcast-build jobs at execution; racing
    # an unmaterialized cache, each re-evaluated the full edge lineage
    # from the source (profiled: three identical parquet-scanning build
    # stages in one q_link_pred run).  One count pins the cache first;
    # every later consumer reads blocks.
    pairs.count()
    deg = _degrees(pairs)
    adj = _symmetrize(pairs, "a", "b", "c", "n").repartition("c").persist()
    x, y = adj.alias("x"), adj.alias("y")
    wedges = x.join(
        y, (F.col("x.c") == F.col("y.c")) & (F.col("x.n") < F.col("y.n"))
    ).select(F.col("x.n").alias("u"), F.col("y.n").alias("w"))
    cn = wedges.groupBy("u", "w").agg(F.count(F.lit(1)).alias("common"))
    cand = cn.join(
        pairs, (cn["u"] == pairs["a"]) & (cn["w"] == pairs["b"]), "left_anti"
    ).where(F.col("common") >= min_common)
    du = deg.select(F.col("id").alias("__du"), F.col("deg").alias("deg_u"))
    dw = deg.select(F.col("id").alias("__dw"), F.col("deg").alias("deg_w"))
    return (
        cand.join(du, cand["u"] == du["__du"])
        .join(dw, cand["w"] == dw["__dw"])
        .select(
            "u",
            "w",
            "common",
            "deg_u",
            "deg_w",
            (
                F.col("common").cast("double")
                / (
                    F.col("deg_u") + F.col("deg_w") - F.col("common")
                ).cast("double")
            ).alias("jaccard"),
        )
    )


def degree_assortativity(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Degree assortativity of the undirected simple graph: the Pearson
    correlation between the degrees at the two ends of every edge
    (Newman '02) — do hubs attach to hubs (r > 0, social-network shape)
    or to leaves (r < 0, dup-star/boilerplate shape)?  A one-number
    structure audit for the dedup and co-occurrence graphs.

    Exactness: over BOTH orientations of every edge the x- and y-moment
    sums coincide (Σx = Σy, Σx² = Σy²), so Pearson's r needs NO sqrt:
    r = (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²) — exact DECIMAL(38,0)
    numerator and denominator, ONE IEEE division (the q_spearman
    sqrt-free contract, with the symmetry collapsing rho² to r).

    Shape: two node-sized degree joins onto the edge list, one
    map-side-combinable 4-column moment fold, 1-row output — no
    windows, no non-equi joins.

    Output: m_edges, n_endpoints, s_x, s_xy, s_xx, r.
    """
    # pairs feeds BOTH the degree table and the ends join — persist it
    # or the basket wedge self-join runs twice (review finding)
    pairs = _canonical_pairs(edges, src_col, dst_col).persist()
    deg = _degrees(pairs).persist()
    da = deg.select(F.col("id").alias("__a"), F.col("deg").alias("dx"))
    db = deg.select(F.col("id").alias("__b"), F.col("deg").alias("dy"))
    ends = pairs.join(da, pairs["a"] == da["__a"]).join(
        db, pairs["b"] == db["__b"]
    )
    both = ends.select("dx", "dy").unionByName(
        ends.select(F.col("dy").alias("dx"), F.col("dx").alias("dy"))
    )
    xd = F.col("dx").cast(_D38)
    yd = F.col("dy").cast(_D38)
    m = both.agg(
        F.count(F.lit(1)).alias("n_endpoints"),
        F.sum(xd).cast(_D38).alias("s_x"),
        F.sum(xd * yd).cast(_D38).alias("s_xy"),
        F.sum(xd * xd).cast(_D38).alias("s_xx"),
    )
    n = F.col("n_endpoints").cast(_D38)
    num = (n * F.col("s_xy") - F.col("s_x") * F.col("s_x")).cast(_D38)
    den = (n * F.col("s_xx") - F.col("s_x") * F.col("s_x")).cast(_D38)
    return m.select(
        (F.col("n_endpoints") / 2).cast("long").alias("m_edges"),
        "n_endpoints",
        "s_x",
        "s_xy",
        "s_xx",
        # a REGULAR graph (every degree equal: cycles, perfect matchings)
        # zeroes the variance denominator — assortativity is undefined;
        # report NULL, never an ANSI divide-by-zero
        F.when(
            den.cast("double") != 0.0, num.cast("double") / den.cast("double")
        ).alias("r"),
    )


def transitivity_cells(node_stats: DataFrame) -> DataFrame:
    """Global transitivity from the per-node :func:`triangle_counts`
    output — the ONE number the per-node local coefficients don't
    give: ``transitivity = 3T / W`` where W counts wedges (paths of
    length two).  Since the per-node ``triangles`` column sums to 3T
    and ``Sigma deg*(deg-1)`` is exactly 2W, the ratio is
    ``2 * Sigma triangles / Sigma deg*(deg-1)`` — all exact
    DECIMAL(38,0) integers, ONE IEEE division.  Unlike the average of
    local coefficients (which over-weights low-degree nodes — the
    Watts-Strogatz vs Newman discrepancy), transitivity weights every
    wedge equally, so the two disagreeing flags hub-centered
    clustering.

    Shape: one 1-row aggregate over the node-stats frame (already
    O(nodes)); nothing else moves.

    1-row output: n_nodes, deg_sum, wedges_x2, tri_x3, transitivity.
    """
    agg = node_stats.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("deg").cast(_D38)).cast("double").alias("deg_sum"),
        F.sum(F.col("deg").cast(_D38) * (F.col("deg") - F.lit(1)))
        .cast("double")
        .alias("wedges_x2"),
        F.sum(F.col("triangles").cast(_D38))
        .cast("double")
        .alias("tri_x3"),
    )
    return agg.select(
        "n_nodes",
        "deg_sum",
        "wedges_x2",
        "tri_x3",
        F.when(
            F.col("wedges_x2") > 0,
            (F.lit(2.0) * F.col("tri_x3")) / F.col("wedges_x2"),
        ).alias("transitivity"),
    )


def reciprocity_cells(
    arcs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> DataFrame:
    """Directed-graph reciprocity over a weighted arc list — how often
    is an arc answered by its reverse?  Two verdicts in one row: the
    unweighted arc fraction ``n_reciprocated / n_arcs`` and the
    flow-weighted ``Sigma min(w_ab, w_ba) / Sigma w_ab``
    (Garlaschelli & Loffredo '04's reciprocated-weight share) — the
    asymmetric-flow signal a symmetric co-occurrence graph cannot
    carry (e.g. event-type transitions: VIEW->BUY >> BUY->VIEW).

    Exactness: arcs are re-aggregated to one row per (src, dst) with
    integer weights, self-loops dropped; the reverse is the SAME
    frame equi-joined on the swapped key (no second scan of the raw
    data); min/sums accumulate in DECIMAL(38,0); each verdict is ONE
    IEEE division on exact-cast doubles.

    Shape: one (src, dst) groupBy — bounded by the arc-type domain —
    one self equi-join on the swapped key, one 1-row fold.

    1-row output: n_arcs, n_reciprocated, sum_w, sum_w_min,
    reciprocity, w_reciprocity.
    """
    a = (
        arcs.filter(F.col(src) != F.col(dst))
        .groupBy(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .agg(F.sum(w).cast("long").alias("__w"))
    )
    rev = a.select(
        F.col("__d").alias("__s"),
        F.col("__s").alias("__d"),
        F.col("__w").alias("__wr"),
    )
    j = a.join(rev, ["__s", "__d"], "left").select(
        "__w", F.coalesce("__wr", F.lit(0)).alias("__wr")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_arcs"),
        F.sum((F.col("__wr") > 0).cast("long")).alias("n_reciprocated"),
        F.sum(F.col("__w").cast(_D38)).cast("double").alias("sum_w"),
        F.sum(F.least("__w", "__wr").cast(_D38))
        .cast("double")
        .alias("sum_w_min"),
        (
            F.sum((F.col("__wr") > 0).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("reciprocity"),
        (
            F.sum(F.least("__w", "__wr").cast(_D38)).cast("double")
            / F.sum(F.col("__w").cast(_D38)).cast("double")
        ).alias("w_reciprocity"),
    )


def _partition_frames(edges, labels):
    """Shared prelude of the partition-quality tier: canonical edge
    frame, (id, label) frame, degrees, per-community (n_nodes,
    degree_sum) volumes, the per-edge endpoint-labeled frame and the
    1-row m fold — factored so modularity_cells and conductance_cells
    cannot silently diverge.  A/B-measured (r14 continuation,
    BENCH_NOTES): persisting the canonical frame DOUBLED the warm wall
    at sf0.1 — the rebuild is cheaper than the materialization
    barrier, so unlike triangle_counts' pairs (reused by a quadratic
    wedge join) it stays unpersisted."""
    e = _canonical_pairs(edges, "src", "dst").select(
        F.col("a").alias("__a"), F.col("b").alias("__b")
    )
    lab = labels.select(F.col("id").alias("__id"), F.col("label").alias("__l"))
    deg = (
        e.select(F.col("__a").alias("__id"))
        .unionAll(e.select(F.col("__b").alias("__id")))
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("__deg"))
    )
    vol = (
        lab.join(deg, "__id")
        .groupBy("__l")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("__deg").cast("long").alias("degree_sum"),
        )
    )
    la = lab.select(F.col("__id").alias("__a"), F.col("__l").alias("__ca"))
    lb = lab.select(F.col("__id").alias("__b"), F.col("__l").alias("__cb"))
    ee = e.join(la, "__a").join(lb, "__b")
    m = e.agg(F.count(F.lit(1)).cast("long").alias("m_edges"))
    return e, vol, ee, m


def modularity_cells(
    edges: DataFrame, labels: DataFrame
) -> DataFrame:
    """Newman modularity cells for a node partition over an undirected
    edge list (canonicalized here: self-loops dropped, duplicate and
    reversed edges collapsed — the triangle_counts contract) — the
    quality verdict :func:`label_propagation`
    itself never reports: how much denser inside the communities is
    the graph than a degree-preserving random rewiring (Newman &
    Girvan '04)?  Q = Sigma_c [e_c/m - (d_c/2m)^2]; clearing
    denominators, ``q_term_x4m2 = 4*m*e_c - d_c^2`` is an EXACT
    integer per community and Q = Sigma q_term / (4*m^2) — the terms
    sum order-independently as integers, so the flat-repeated
    ``modularity`` is ONE IEEE division on exact-cast doubles.

    Shape: one degree aggregate + one per-community volume aggregate
    (equi joins on node id), one per-community internal-edge
    aggregate, a 1-row m fold and a 1-row term-sum fold (broadcast) —
    output bounded by the community count.

    Output per community: label, n_nodes, internal_edges, degree_sum,
    m_edges, q_term_x4m2, modularity (flat) — ordered by label.
    """
    e, vol, ee, m = _partition_frames(edges, labels)
    intern = (
        ee.filter(F.col("__ca") == F.col("__cb"))
        .groupBy(F.col("__ca").alias("__l"))
        .agg(F.count(F.lit(1)).cast("long").alias("__int"))
    )
    cells = (
        vol.join(intern, "__l", "left")
        .select(
            "__l",
            "n_nodes",
            F.coalesce("__int", F.lit(0)).cast("long").alias(
                "internal_edges"
            ),
            "degree_sum",
        )
        .crossJoin(F.broadcast(m))
        .select(
            "__l",
            "n_nodes",
            "internal_edges",
            "degree_sum",
            "m_edges",
            (
                F.lit(4) * F.col("m_edges") * F.col("internal_edges")
                - F.col("degree_sum") * F.col("degree_sum")
            )
            .cast(_D38)
            .cast("double")
            .alias("q_term_x4m2"),
        )
    )
    tot = cells.agg(
        F.sum(F.col("q_term_x4m2").cast(_D38)).cast("double").alias("__qs")
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("__l").alias("label"),
            "n_nodes",
            "internal_edges",
            "degree_sum",
            "m_edges",
            "q_term_x4m2",
            (
                F.col("__qs")
                / (
                    F.lit(4.0)
                    * F.col("m_edges").cast("double")
                    * F.col("m_edges").cast("double")
                )
            ).alias("modularity"),
        )
        .orderBy("label")
    )


def conductance_cells(
    edges: DataFrame, labels: DataFrame
) -> DataFrame:
    """Per-community conductance over an undirected edge list
    (canonicalized like :func:`modularity_cells`) — the boundary
    verdict beside :func:`modularity_cells`'
    internal-density one: ``phi_c = cut_c / min(vol_c, 2m - vol_c)``
    (cut = edges with exactly one endpoint inside; vol = degree sum).
    A community can score well on modularity yet leak through a thin
    high-traffic boundary — conductance reads exactly that.  All
    cells exact integers, the min is order-independent, ONE IEEE
    division per community (NULL when the community swallows the
    whole volume).

    Shape: the same degree / volume / per-edge label joins as
    modularity_cells, a per-community cut aggregate (each cut edge
    credited to BOTH sides), a 1-row m fold — output bounded by the
    community count.

    Output per community: label, n_nodes, degree_sum, cut_edges,
    m_edges, conductance — ordered by label.
    """
    e, vol, ee, m = _partition_frames(edges, labels)
    cross = ee.filter(F.col("__ca") != F.col("__cb"))
    cut = (
        cross.select(F.col("__ca").alias("__l"))
        .unionAll(cross.select(F.col("__cb").alias("__l")))
        .groupBy("__l")
        .agg(F.count(F.lit(1)).cast("long").alias("__cut"))
    )
    denom = F.least(
        F.col("degree_sum"),
        F.lit(2) * F.col("m_edges") - F.col("degree_sum"),
    )
    return (
        vol.join(cut, "__l", "left")
        .select(
            "__l",
            "n_nodes",
            "degree_sum",
            F.coalesce("__cut", F.lit(0)).cast("long").alias("cut_edges"),
        )
        .crossJoin(F.broadcast(m))
        .select(
            F.col("__l").alias("label"),
            "n_nodes",
            "degree_sum",
            "cut_edges",
            "m_edges",
            F.when(
                denom > 0,
                F.col("cut_edges").cast("double") / denom.cast("double"),
            ).alias("conductance"),
        )
        .orderBy("label")
    )


def attr_assortativity_cells(
    edges: DataFrame, attrs: DataFrame
) -> DataFrame:
    """Newman categorical assortativity over an undirected
    edge list (canonicalized like :func:`modularity_cells`) with a
    node attribute — do edges prefer same-attribute
    endpoints beyond what the attribute's degree mass predicts
    (Newman '03, the discrete mixing-matrix r)?  The degree flavor
    (:func:`assortativity` elsewhere in this module) reads structure;
    this one reads homophily of an EXTERNAL label.

    Clearing the mixing-matrix denominators: with ordered endpoint
    pairs (each edge both ways), ``r = (2m * same_x2 - Sigma a_i^2)
    / (4m^2 - Sigma a_i^2)`` where same_x2 counts ordered same-
    attribute pairs and a_i is attribute i's directed-endpoint mass —
    every cell an exact DECIMAL(38,0) integer, ONE IEEE division
    (NULL when the denominator is 0: a single attribute class).

    Shape: two equi joins to label the endpoints, one 1-row same-pair
    aggregate, one per-attribute mass aggregate collapsed to 1 row,
    one m fold — three 1-row frames broadcast-combined.

    1-row output: m_edges, n_cats, same_x2, sum_cat_mass_sq,
    assort_num, assort_den, assortativity.
    """
    e = _canonical_pairs(edges, "src", "dst").select(
        F.col("a").alias("__a"), F.col("b").alias("__b")
    )
    at = attrs.select(F.col("id").alias("__id"), F.col("cat").alias("__c"))
    ca = at.select(F.col("__id").alias("__a"), F.col("__c").alias("__cx"))
    cb = at.select(F.col("__id").alias("__b"), F.col("__c").alias("__cy"))
    ee = e.join(ca, "__a").join(cb, "__b")
    m = ee.agg(
        F.count(F.lit(1)).cast("long").alias("m_edges"),
        (
            F.lit(2)
            * F.sum((F.col("__cx") == F.col("__cy")).cast("long"))
        )
        .cast("long")
        .alias("same_x2"),
    )
    mass = (
        ee.select(F.col("__cx").alias("__c"))
        .unionAll(ee.select(F.col("__cy").alias("__c")))
        .groupBy("__c")
        .agg(F.count(F.lit(1)).alias("__m"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cats"),
            F.sum(F.col("__m").cast(_D38) * F.col("__m"))
            .cast("double")
            .alias("sum_cat_mass_sq"),
        )
    )
    one = m.crossJoin(F.broadcast(mass))
    two_m = F.lit(2.0) * F.col("m_edges").cast("double")
    num = two_m * F.col("same_x2").cast("double") - F.col(
        "sum_cat_mass_sq"
    )
    den = two_m * two_m - F.col("sum_cat_mass_sq")
    return one.select(
        "m_edges",
        "n_cats",
        "same_x2",
        "sum_cat_mass_sq",
        num.alias("assort_num"),
        den.alias("assort_den"),
        F.when(den != 0, num / den).alias("assortativity"),
    )


def rich_club_cells(
    edges: DataFrame, ks: tuple[int, ...] = (1, 2, 4, 8, 16)
) -> DataFrame:
    """Rich-club coefficient census over an undirected edge list
    (canonicalized like :func:`modularity_cells`) — do the high-degree
    nodes preferentially wire to EACH OTHER (Zhou & Mondragon '04)?
    For each degree threshold k: phi(k) = E_k / C(n_k, 2) where n_k
    counts nodes with deg > k and E_k the edges with BOTH endpoints
    above k.  The hub-interconnection verdict the assortativity scalar
    averages away: a network can be globally disassortative yet hide a
    tight hub club (the Internet AS graph is the textbook case).

    All cells are exact integers — per-edge membership is
    ``least(deg_a, deg_b) > k`` (equi joins on node id), per-k counts
    are conditional sums over the LITERAL k grid folded in ONE pass
    each (no edge x k explode), and phi is ONE IEEE division per
    bounded row (NULL when fewer than 2 nodes clear the bar).

    Shape: one degree aggregate, two endpoint-degree equi joins, two
    1-row conditional aggregates broadcast-combined, then an array
    explode to the |ks| output rows.

    Output per k: k, n_rich, e_rich, phi — ordered by k.
    """
    pairs = _canonical_pairs(edges, "src", "dst")
    deg = (
        pairs.select(F.col("a").alias("__id"))
        .unionAll(pairs.select(F.col("b").alias("__id")))
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("__deg"))
    )
    da = deg.select(F.col("__id").alias("a"), F.col("__deg").alias("__da"))
    db = deg.select(F.col("__id").alias("b"), F.col("__deg").alias("__db"))
    emin = pairs.join(da, "a").join(db, "b").select(
        F.least("__da", "__db").alias("__md")
    )
    ks = tuple(int(k) for k in ks)
    e_agg = emin.agg(
        *[
            F.sum((F.col("__md") > k).cast("long")).alias(f"__e{k}")
            for k in ks
        ]
    )
    n_agg = deg.agg(
        *[
            F.sum((F.col("__deg") > k).cast("long")).alias(f"__n{k}")
            for k in ks
        ]
    )
    one = e_agg.crossJoin(F.broadcast(n_agg))
    arr = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.col(f"__n{k}").alias("n_rich"),
                F.col(f"__e{k}").alias("e_rich"),
                F.when(
                    F.col(f"__n{k}") >= 2,
                    (F.lit(2.0) * F.col(f"__e{k}").cast("double"))
                    / (
                        F.col(f"__n{k}").cast("double")
                        * (F.col(f"__n{k}").cast("double") - F.lit(1.0))
                    ),
                ).alias("phi"),
            )
            for k in ks
        ]
    )
    return (
        one.select(F.explode(arr).alias("__o"))
        .select("__o.k", "__o.n_rich", "__o.e_rich", "__o.phi")
        .orderBy("k")
    )
