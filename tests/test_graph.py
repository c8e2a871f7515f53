"""PageRank (operators/graph.py) — q_pagerank's value parity is
oracle-checked registry-wide (unrolled integer rounds); here the
algorithm's semantics are pinned on crafted graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_mirror_spark.operators.graph import (
    PR_SCALE,
    pagerank,
    pagerank_directed,
)


def _und(spark, pairs):
    # RAW pairs: pagerank symmetrizes internally (pre-expanding would
    # double every degree and shift the integer floors)
    df = spark.createDataFrame(pairs, "a long, b long")
    return df.select(F.col("a").alias("src"), F.col("b").alias("dst"))


def test_hub_outranks_spokes(spark):
    """Star graph: the hub near-duplicating every spoke (the template-
    carrier shape) must outrank each spoke, and the isolated pair ranks
    lowest-degree-flat."""
    star = [(0, i) for i in range(1, 8)]
    ranks = {
        r["id"]: r["rank"]
        for r in pagerank(_und(spark, star + [(100, 101)]), n_iter=5).collect()
    }
    assert all(ranks[0] > ranks[i] for i in range(1, 8))
    assert ranks[100] == ranks[101]
    spoke_vals = {ranks[i] for i in range(1, 8)}
    assert len(spoke_vals) == 1, "symmetric spokes must tie exactly"


def test_mass_is_conserved_to_quantization(spark):
    """Integer floors lose < deg ulps of 1e-12 per node per round —
    total rank stays within that bound of PR_SCALE."""
    edges = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (2, 7)]
    out = pagerank(_und(spark, edges), n_iter=4)
    total = out.agg(F.sum("rank")).first()[0]
    n_nodes = out.count()
    assert n_nodes == 10
    slack = 4 * 3 * n_nodes * 10  # rounds * avg-deg * nodes, generous
    assert PR_SCALE - slack <= total <= PR_SCALE


def test_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0


def test_ranks_are_deterministic_across_runs(spark):
    edges = _und(spark, [(i, j) for i in range(6) for j in range(i + 1, 6) if (i + j) % 3])
    a = sorted((r["id"], r["rank"]) for r in pagerank(edges, n_iter=3).collect())
    b = sorted((r["id"], r["rank"]) for r in pagerank(edges, n_iter=3).collect())
    assert a == b


def test_matches_numpy_power_iteration(spark):
    """Independent algorithmic check (the oracle REPLAYS the integer
    steps; this verifies they implement PageRank): float power
    iteration with the same teleport/damping must agree with the
    scaled-int result to quantization tolerance."""
    import numpy as np

    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (4, 5)]
    ids = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[a], idx[b]] = 1.0
        A[idx[b], idx[a]] = 1.0
    deg = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        r = 0.15 / n + 0.85 * (A.T @ (r / deg))
    got = {
        row["id"]: row["rank"] / PR_SCALE
        for row in pagerank(_und(spark, pairs), n_iter=3).collect()
    }
    for v in ids:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])


def test_degree_folds_before_the_edge_join(spark):
    """r5 verdict efficiency finding: each round must compute the
    contribution rate on the NODE-sized ranks ⋈ deg table and touch the
    edge list exactly once — never join deg onto an edge-sized join
    output. Structurally: no Join in the optimized plan may have BOTH a
    Join child (the edge-sized intermediate) and an Aggregate child
    (the degree table) — that shape is the old two-edge-shuffle round."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "src long, dst long"
    )
    plan = pagerank(edges, n_iter=3)._jdf.queryExecution().optimizedPlan()

    def unwrap(node):
        # skip the Project/Filter shims Catalyst leaves between operators
        while node.getClass().getSimpleName() in ("Project", "Filter"):
            node = node.children().apply(0)
        return node

    def walk(node, bad):
        kids = [node.children().apply(i) for i in range(node.children().size())]
        if node.getClass().getSimpleName() == "Join":
            names = [unwrap(k).getClass().getSimpleName() for k in kids]
            if "Join" in names and "Aggregate" in names:
                bad.append(node.toString().split("\n")[0])
        for k in kids:
            walk(k, bad)
        return bad

    offenders = walk(plan, [])
    assert offenders == [], f"degree joined onto an edge-sized join: {offenders}"


def _arcs(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_directed_dangling_mass_is_conserved(spark):
    """Chain 0->1->2 plus sink 3 fed by 1: sinks (2, 3) have no out-arc;
    without the dangling fold their rank would leak every round. Total
    must stay within quantization slack of PR_SCALE, and every node in
    the universe (including pure sinks) must get a row."""
    out = pagerank_directed(_arcs(spark, [(0, 1), (1, 2), (1, 3)]), n_iter=4)
    rows = {r["id"]: r["rank"] for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3}
    total = sum(rows.values())
    slack = 4 * 4 * 10  # rounds * nodes * generous per-floor loss
    assert PR_SCALE - slack <= total <= PR_SCALE


def test_directed_matches_numpy_power_iteration(spark):
    """Float power iteration WITH the textbook dangling redistribution
    must agree with the scaled-int result to quantization tolerance —
    the independent check that the integer steps implement directed
    PageRank, not just something deterministic."""
    import numpy as np

    pairs = [(0, 1), (0, 2), (1, 2), (3, 0), (4, 0), (2, 3)]
    # node 5 only ever receives: make it a sink fed by 2
    pairs.append((2, 5))
    ids = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[a], idx[b]] = 1.0
    outdeg = A.sum(axis=1)
    dangling = outdeg == 0
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        contrib = np.where(dangling, 0.0, r / np.where(dangling, 1.0, outdeg))
        r = 0.15 / n + 0.85 * (A.T @ contrib) + 0.85 * r[dangling].sum() / n
    got = {
        row["id"]: row["rank"] / PR_SCALE
        for row in pagerank_directed(_arcs(spark, pairs), n_iter=3).collect()
    }
    for v in ids:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])


def test_directed_without_dangling_reduces_to_plain_directed_pagerank(spark):
    """On a cycle (no dangling nodes) the fold contributes zero and all
    ranks are exactly uniform."""
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    rows = pagerank_directed(_arcs(spark, cyc), n_iter=3).collect()
    vals = {r["rank"] for r in rows}
    assert len(rows) == 5 and len(vals) == 1


def test_directed_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank_directed(empty).count() == 0


def test_large_graph_int32_literal_regime(spark):
    """Regression (found by the sf0.1 oracle sweep): with enough nodes,
    PR_SCALE // n drops below 2^31 and an un-cast literal becomes
    IntegerType — ANSI constant folding then overflows on rank * 85 at
    OPTIMIZATION time. 600 nodes puts the initial rank squarely in the
    int32 range; the ranks must still compute and conserve mass."""
    n = 600
    # a ring: every node has degree 2, all connected
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    ranks = pagerank(edges, n_iter=3).collect()
    assert len(ranks) == n
    total = sum(r["rank"] for r in ranks)
    assert abs(total - PR_SCALE) < n * 10  # quantization-only loss


# --- triangle_counts -------------------------------------------------------


def _brute_triangles(edges):
    """itertools brute force: per-node triangle counts on the canonical
    simple graph."""
    from itertools import combinations

    adj = {}
    es = set()
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        if (lo, hi) in es:
            continue
        es.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    tri = {v: 0 for v in adj}
    for u, v, w in combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            tri[u] += 1
            tri[v] += 1
            tri[w] += 1
    return adj, tri


def test_triangle_counts_match_brute_force_with_hub_and_noise(spark):
    """Crafted graph with a celebrity hub (the orientation's reason to
    exist), duplicate/reversed edges and self-loops: counts and lcc
    must equal the itertools brute force on the canonicalized graph."""
    from npm_mirror_spark.operators.graph import triangle_counts

    edges = (
        [(0, i) for i in range(1, 12)]            # hub 0
        + [(i, i + 1) for i in range(1, 11)]      # rim path -> hub triangles
        + [(3, 3), (5, 4), (1, 2), (2, 1)]        # self-loop, reversed, dups
        + [(20, 21), (21, 22), (22, 20), (22, 20)]  # separate triangle
        + [(30, 31)]                              # triangle-free pair
    )
    adj, tri = _brute_triangles(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r for r in triangle_counts(df).collect()}
    assert set(got) == set(adj)
    for v in adj:
        assert got[v]["deg"] == len(adj[v]), v
        assert got[v]["triangles"] == tri[v], v
        d = len(adj[v])
        want = (2.0 * tri[v]) / (d * (d - 1)) if d >= 2 else 0.0
        assert got[v]["lcc"] == want, v
    # global count: each triangle credits exactly 3 nodes
    assert sum(tri.values()) % 3 == 0


def test_triangle_counts_complete_graph_lcc_is_one(spark):
    """K5: every node sits in C(4,2)=6 triangles and lcc == 1.0."""
    from npm_mirror_spark.operators.graph import triangle_counts

    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = triangle_counts(df).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["deg"] == 4 and r["triangles"] == 6 and r["lcc"] == 1.0


def test_triangle_counts_triangle_free_graph(spark):
    """Bipartite graphs have no triangles; every count is 0, lcc 0.0."""
    from npm_mirror_spark.operators.graph import triangle_counts

    edges = [(i, 100 + j) for i in range(4) for j in range(3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = triangle_counts(df).collect()
    assert len(rows) == 7
    assert all(r["triangles"] == 0 and r["lcc"] == 0.0 for r in rows)


# --- kcore -----------------------------------------------------------------


def _brute_kcore(edges, k):
    """Python peel to fixpoint on the canonical simple graph."""
    adj = {}
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for u in adj.pop(v):
                adj[u].discard(v)
            changed = True
    return {v: len(ns) for v, ns in adj.items()}


def test_kcore_fixpoint_matches_brute_force(spark):
    """Crafted graph: K6 clique + a chain + a star hub; the 3-core is
    exactly the clique, every survivor at its clique degree."""
    from npm_mirror_spark.operators.graph import kcore_fixpoint

    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    chain = [(10 + i, 11 + i) for i in range(5)]
    star = [(100, 200 + i) for i in range(8)]
    bridge = [(0, 10), (1, 100)]
    edges = clique + chain + star + bridge
    want = _brute_kcore(edges, 3)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["deg"] for r in kcore_fixpoint(df, k=3).collect()}
    assert got == want
    assert set(got) == set(range(6))  # the clique, nothing else
    # every survivor meets the core invariant
    assert all(d >= 3 for d in got.values())


def test_kcore_fixed_rounds_prefix_of_fixpoint(spark):
    """kcore(n_rounds) is monotone: each extra round only removes
    nodes, and once it reaches the fixpoint it equals kcore_fixpoint."""
    from npm_mirror_spark.operators.graph import kcore, kcore_fixpoint

    edges = [(i, j) for i in range(8) for j in range(i + 1, 8) if (i + j) % 3]
    df = spark.createDataFrame(edges, "src long, dst long")
    sets = []
    for r in (1, 2, 6):
        sets.append({x["id"] for x in kcore(df, k=4, n_rounds=r).collect()})
    assert sets[0] >= sets[1] >= sets[2]
    fix = {x["id"]: x["deg"] for x in kcore_fixpoint(df, k=4).collect()}
    got6 = {x["id"]: x["deg"] for x in kcore(df, k=4, n_rounds=6).collect()}
    assert got6 == fix


def test_kcore_chain_dissolves_but_cycle_survives(spark):
    """A chain has no 2-core (endpoints peel, cascade eats it all); a
    cycle IS its own 2-core (every node at exactly deg 2)."""
    from npm_mirror_spark.operators.graph import kcore_fixpoint

    chain = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(chain, "src long, dst long")
    assert kcore_fixpoint(df, k=2).count() == 0
    cycle = [(i, (i + 1) % 8) for i in range(8)]
    dfc = spark.createDataFrame(cycle, "src long, dst long")
    rows = kcore_fixpoint(dfc, k=2).collect()
    assert len(rows) == 8 and all(r["deg"] == 2 for r in rows)


# --- personalized PageRank -------------------------------------------------


def test_ppr_matches_numpy_power_iteration(spark):
    """Scaled-int PPR must track float power iteration with restart
    (teleport + dangling both to seeds) within quantization noise."""
    import numpy as np

    from npm_mirror_spark.operators.graph import (
        PR_SCALE,
        pagerank_personalized,
    )

    arcs = [
        (0, 1), (1, 2), (2, 0),            # cycle near the seed
        (3, 4), (4, 5),                     # chain ending in a sink (5)
        (0, 3), (6, 0),                     # bridge + a source
    ]
    seeds = [0]
    ids = sorted({x for e in arcs for x in e})
    idx = {v: i for i, v in enumerate(ids)}
    n, s = len(ids), len(seeds)
    out = {i: [] for i in range(n)}
    for a, b in arcs:
        out[idx[a]].append(idx[b])
    restart = np.array([1.0 / s if v in seeds else 0.0 for v in ids])
    r = restart.copy()
    d = 0.85
    for _ in range(3):
        nxt = 0.15 * restart.copy()
        dangling = sum(r[i] for i in range(n) if not out[i])
        nxt += d * dangling * restart
        for i in range(n):
            for j in out[i]:
                nxt[j] += d * r[i] / len(out[i])
        r = nxt
    df = spark.createDataFrame(arcs, "src long, dst long")
    sd = spark.createDataFrame([(v,) for v in seeds], "id long")
    got = {
        row["id"]: row["rank"] / PR_SCALE
        for row in pagerank_personalized(df, sd, n_iter=3).collect()
    }
    for v in ids:
        assert abs(got[v] - r[idx[v]]) < 1e-6, (v, got[v], r[idx[v]])
    # restart conserves mass (teleport + dangling both return to seeds)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_ppr_seed_outside_graph_is_ignored_and_empty_errors(spark):
    import pytest

    from npm_mirror_spark.operators.graph import pagerank_personalized

    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    ok = pagerank_personalized(
        df, spark.createDataFrame([(0,), (99,)], "id long"), n_iter=2
    )
    assert ok.count() == 2  # node 99 silently ignored
    with pytest.raises(ValueError, match="seed"):
        pagerank_personalized(
            df, spark.createDataFrame([(42,)], "id long"), n_iter=1
        )


def test_drop_oversized_baskets_guard(spark):
    """The max_basket guard (r7 verdict item 3): a basket above the cap
    disappears whole — its items contribute NO pairs — while every
    basket at or under the cap pairs normally."""
    from npm_mirror_spark.operators.graph import basket_pairs, drop_oversized_baskets

    rows = [("small", i) for i in range(3)]
    rows += [("edge", i) for i in range(5)]
    rows += [("mega", i) for i in range(6)]
    df = spark.createDataFrame(rows, "basket string, item int")

    kept = drop_oversized_baskets(df, "basket", max_basket=5)
    assert sorted(set(r["basket"] for r in kept.collect())) == ["edge", "small"]

    pairs = basket_pairs(df, "basket", "item", max_basket=5).collect()
    # C(3,2) + C(5,2) = 3 + 10; the mega basket contributes nothing
    assert len(pairs) == 13
    assert all(r["src"] < r["dst"] for r in pairs)

    import pytest

    with pytest.raises(ValueError):
        drop_oversized_baskets(df, "basket", max_basket=0)


def test_triangle_sampled_rate1_equals_exact(spark):
    """At rate_den=1 the estimator IS the exact count: on a graph with
    known triangles it must equal the sum of per-node credits / 3, and
    at rate_den>1 it stays deterministic (two runs identical) with
    sampled*rate == est."""
    from npm_mirror_spark.operators.graph import (
        triangle_count_sampled,
        triangle_counts,
    )

    # two triangles sharing an edge + a pendant: {1,2,3}, {2,3,4}, 5-6
    rows = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (5, 6)]
    edges = spark.createDataFrame(rows, "src int, dst int")
    exact = triangle_counts(edges).agg(F.sum("triangles")).first()[0] // 3
    assert exact == 2
    one = triangle_count_sampled(edges, rate_den=1, seed=8).first()
    assert (one["rate_den"], one["sampled_triangles"], one["est_triangles"]) == (1, 2, 2)
    a = triangle_count_sampled(edges, rate_den=2, seed=8).first()
    b = triangle_count_sampled(edges, rate_den=2, seed=8).first()
    assert a == b
    assert a["est_triangles"] == a["sampled_triangles"] * 2

    import pytest

    with pytest.raises(ValueError):
        triangle_count_sampled(edges, rate_den=0)


def test_label_propagation_deterministic_communities(spark):
    """Two triangles joined by a bridge: after two synchronous rounds
    the left clique collapses onto its min id; every step is the
    documented most-frequent/min-tiebreak rule (hand-traced), and two
    runs are identical."""
    from npm_mirror_spark.operators.graph import label_propagation

    rows = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    edges = spark.createDataFrame(rows, "src int, dst int")
    got = {r["id"]: r["label"] for r in label_propagation(edges, 2).collect()}
    # hand trace — round 1: 1->2, 2->1, 3->1, 10->3, 11->10, 12->10;
    # round 2: 1->1, 2->1, 3->1, 10->10, 11->3, 12->3
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 3, 12: 3}
    again = {r["id"]: r["label"] for r in label_propagation(edges, 2).collect()}
    assert got == again

    import pytest

    with pytest.raises(ValueError):
        label_propagation(edges, 0)


def test_label_propagation_rejects_string_ids(spark):
    """The min-label tie-break negates labels; on string ids that would
    silently NULL (implicit double cast) — the contract must fail
    loudly at plan time instead."""
    import pytest

    from npm_mirror_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    with pytest.raises(TypeError, match="numeric node ids"):
        label_propagation(edges, 1)


# ---------------------------------------------------------------------------
# r10 late batch: hits / bfs_hops / common_neighbor_scores / assortativity
# ---------------------------------------------------------------------------


def test_hits_matches_brute_force(spark):
    from npm_mirror_spark.operators.graph import hits

    arcs = [(1, 2), (1, 3), (4, 2), (4, 3), (4, 5), (2, 5), (3, 1)]
    df = spark.createDataFrame(arcs, "src long, dst long")
    got = {r["id"]: (int(r["auth"]), int(r["hub"])) for r in hits(df, n_iter=2).collect()}
    nodes = sorted({n for a in arcs for n in a})
    auth = {n: 1 for n in nodes}
    hub = {n: 0 for n in nodes}
    for _ in range(2):
        hub = {n: sum(auth[v] for u, v in arcs if u == n) for n in nodes}
        auth = {n: sum(hub[u] for u, v in arcs if v == n) for n in nodes}
    assert got == {n: (auth[n], hub[n]) for n in nodes}


def test_hits_star_authority(spark):
    """All arcs point at one center: it takes all authority, spokes all
    hub mass, and the center's hub score is 0 (no out-arc)."""
    from npm_mirror_spark.operators.graph import hits

    df = spark.createDataFrame([(i, 99) for i in range(5)], "src long, dst long")
    rows = {r["id"]: r for r in hits(df, n_iter=2).collect()}
    assert int(rows[99]["hub"]) == 0 and int(rows[99]["auth"]) > 0
    spoke_auths = {int(rows[i]["auth"]) for i in range(5)}
    assert spoke_auths == {0}
    assert len({int(rows[i]["hub"]) for i in range(5)}) == 1


def test_bfs_hops_matches_brute_force(spark):
    from npm_mirror_spark.operators.graph import bfs_hops

    # 1-2-3-4-5 path plus 10-11 island, seed at 1 and 10
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (10,)], "id long")
    got = {r["id"]: r["hop"] for r in bfs_hops(e, seeds, max_hops=3).collect()}
    assert got == {1: 0, 10: 0, 2: 1, 11: 1, 3: 2, 4: 3}


def test_bfs_hops_isolated_seed_reports_hop_zero(spark):
    from npm_mirror_spark.operators.graph import bfs_hops

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(42,)], "id long")
    got = {r["id"]: r["hop"] for r in bfs_hops(e, seeds, max_hops=2).collect()}
    assert got == {42: 0}


def test_common_neighbor_scores_matches_brute_force(spark):
    from itertools import combinations

    from npm_mirror_spark.operators.graph import common_neighbor_scores

    edges = [(1, 2), (1, 3), (2, 3), (4, 1), (4, 2), (5, 1), (5, 2), (5, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["u"], r["w"]): (r["common"], r["deg_u"], r["deg_w"], r["jaccard"])
        for r in common_neighbor_scores(e, min_common=2).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    for u, w in combinations(sorted(adj), 2):
        if w in adj[u]:
            continue
        cn = len(adj[u] & adj[w])
        if cn >= 2:
            expect[(u, w)] = (
                cn,
                len(adj[u]),
                len(adj[w]),
                cn / (len(adj[u]) + len(adj[w]) - cn),
            )
    assert got == expect


def test_assortativity_matches_brute_force(spark):
    from npm_mirror_spark.operators.graph import degree_assortativity

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (5, 1), (5, 2)]
    e = spark.createDataFrame(edges, "src long, dst long")
    row = degree_assortativity(e).collect()[0]
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    pts = [(deg[a], deg[b]) for a, b in edges] + [
        (deg[b], deg[a]) for a, b in edges
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    assert row["m_edges"] == len(edges) and row["n_endpoints"] == n
    assert float(row["s_x"]) == sx and float(row["s_xy"]) == sxy
    expect_r = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    assert abs(row["r"] - expect_r) < 1e-12


def test_assortativity_star_is_negative(spark):
    from npm_mirror_spark.operators.graph import degree_assortativity

    e = spark.createDataFrame([(0, i) for i in range(1, 7)], "src long, dst long")
    assert degree_assortativity(e).collect()[0]["r"] < 0


def test_assortativity_regular_graph_reports_null(spark):
    """Every node of a cycle has degree 2 — zero degree variance, so r
    is undefined and must come back NULL, not an ANSI crash."""
    from npm_mirror_spark.operators.graph import degree_assortativity

    cyc = [(i, (i + 1) % 6) for i in range(6)]
    e = spark.createDataFrame(cyc, "src long, dst long")
    row = degree_assortativity(e).collect()[0]
    assert row["m_edges"] == 6 and row["r"] is None


def test_hits_rejects_deep_iteration(spark):
    import pytest

    from npm_mirror_spark.operators.graph import hits

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        hits(e, n_iter=5)
