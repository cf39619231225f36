"""Integer PageRank: exact agreement with a pure-Python reference,
ranking sanity, and dangling behavior."""

from __future__ import annotations

import pytest

from data_ingestion_spark.functions.graph import PAGERANK_SCALE, pagerank_scores


def _reference(edges, iters=5, d_num=85, d_den=100):
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (PAGERANK_SCALE * (d_den - d_num)) // d_den
    r = {v: PAGERANK_SCALE for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, d in edges:
            nxt[d] += (r[s] * d_num) // (d_den * deg[s])
        r = nxt
    return r


@pytest.mark.slow
def test_pagerank_matches_python_reference_exactly(spark):
    """Bit-exact vs the reference loop — the determinism claim is
    EXACT integer equality, not approximate agreement."""
    edges = [
        (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 2), (5, 2), (5, 1),
        (6, 0), (6, 7),  # 7 is dangling (no out-edges)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_micros for r in pagerank_scores(df, iters=5).collect()}
    assert got == _reference(edges)


def test_pagerank_hub_outranks_spokes(spark):
    # star: everyone links to node 0
    edges = [(i, 0) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_micros for r in pagerank_scores(df).collect()}
    assert got[0] > max(v for k, v in got.items() if k != 0) * 3
    # spokes are symmetric -> identical ranks
    assert len({v for k, v in got.items() if k != 0}) == 1


def test_pagerank_dangling_and_repeatable(spark):
    edges = [(0, 1), (1, 2)]  # 2 is dangling, chain otherwise
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: r.rank_micros for r in pagerank_scores(df, iters=3).collect()}
    b = {r.node: r.rank_micros for r in pagerank_scores(df, iters=3).collect()}
    assert a == b == _reference(edges, iters=3)
    # the chain end accumulates more than the start (which only gets base)
    assert a[2] > a[1] > a[0]


@pytest.mark.slow
def test_cache_handles_enable_caller_unpersist(spark):
    """r10 ADVICE: persisted intermediates are not GC-reclaimed, so
    the long-lived-driver contract is caller-side cleanup via
    cache_handles. The handles are the actually-persisted frames,
    unpersist() succeeds, and the returned result stays valid (and
    identical) afterwards via lineage."""
    from data_ingestion_spark.functions.similarity import bm25_rank_batch
    from data_ingestion_spark.functions.sketches import heavy_hitters

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    e = spark.createDataFrame(edges, "src string, dst string")
    handles: list = []
    ranks = pagerank_scores(e, iters=2, cache_handles=handles)
    before = {r.node: r.rank_micros for r in ranks.collect()}
    assert len(handles) == 2 and all(h.storageLevel.useMemory for h in handles)
    for h in handles:
        h.unpersist()
    assert all(not h.storageLevel.useMemory for h in handles)
    assert {r.node: r.rank_micros for r in ranks.collect()} == before

    docs = spark.createDataFrame(
        [(1, "spark shuffles data"), (2, "ducks eat bread")], "doc_id long, text string"
    )
    qs = spark.createDataFrame([(1, "spark data")], "query_id long, query_text string")
    h2: list = []
    out = bm25_rank_batch(qs, docs, cache_handles=h2)
    got = out.collect()
    assert len(h2) == 1 and h2[0].storageLevel.useMemory
    h2[0].unpersist()
    assert [r.doc_id for r in got] == [1]

    vals = spark.createDataFrame([("x",)] * 5 + [("y",)], "v string")
    h3: list = []
    hh = heavy_hitters(vals, "v", min_count=3, cache_handles=h3)
    assert {(r.v, r.n) for r in hh.collect()} == {("x", 5)}
    assert len(h3) == 1 and h3[0].storageLevel.useMemory
    h3[0].unpersist()


def test_triangle_count_clique_and_path(spark):
    from data_ingestion_spark.functions.graph import triangle_count

    # K5: every node sits in C(4,2) = 6 triangles.
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    got = {
        (r.node, r.n_tri)
        for r in triangle_count(
            spark.createDataFrame(k5, "src long, dst long")
        ).collect()
    }
    assert got == {(n, 6) for n in range(5)}

    # A path has no triangles -> empty result, not zeros.
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    assert triangle_count(path).count() == 0


def test_triangle_count_collapses_direction_multiplicity_loops(spark):
    from data_ingestion_spark.functions.graph import triangle_count

    # One triangle encoded messily: reversed duplicates, a parallel
    # edge, and a self loop must all collapse to the simple K3.
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (2, 3), (3, 1), (1, 1)],
        "src long, dst long",
    )
    got = {(r.node, r.n_tri) for r in triangle_count(edges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_triangle_count_hub_orientation(spark):
    from data_ingestion_spark.functions.graph import triangle_count

    # Star hub + one rim edge: exactly one triangle (hub, 1, 2); the
    # high-degree hub must not inflate counts via unclosed wedges.
    star = [(100, i) for i in range(1, 9)] + [(1, 2)]
    got = {
        (r.node, r.n_tri)
        for r in triangle_count(
            spark.createDataFrame(star, "src long, dst long")
        ).collect()
    }
    assert got == {(100, 1), (1, 1), (2, 1)}


@pytest.mark.slow
def test_harmonic_centrality_path_exact_small_range(spark):
    from data_ingestion_spark.functions.graph import harmonic_centrality

    # 1->2->3->4; at p=11 the linear-counting branch is exact for
    # tiny balls, so the approximate pipeline returns the TRUE
    # truncated harmonic centralities: H(4) = 1/1 + 1/2 + 1/3.
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    got = sorted(
        (r.node, r.reach_est, r.harmonic_micros)
        for r in harmonic_centrality(e, radius=3, mode="in").collect()
    )
    assert got == [
        (1, 1, 0),
        (2, 2, 1_000_000),
        (3, 3, 1_500_000),
        (4, 4, 1_833_333),
    ]
    # out-mode is the mirror
    out = {r.node: r.harmonic_micros for r in harmonic_centrality(e, mode="out").collect()}
    assert out == {1: 1_833_333, 2: 1_500_000, 3: 1_000_000, 4: 0}


def test_harmonic_centrality_radius_truncation_and_determinism(spark):
    from data_ingestion_spark.functions.graph import harmonic_centrality

    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    r1 = {r.node: r.harmonic_micros for r in harmonic_centrality(e, radius=1).collect()}
    # radius 1: only direct predecessors count
    assert r1 == {1: 0, 2: 1_000_000, 3: 1_000_000, 4: 1_000_000}
    a = sorted(map(tuple, harmonic_centrality(e, radius=2).collect()))
    b = sorted(map(tuple, harmonic_centrality(e, radius=2).collect()))
    assert a == b  # bit-deterministic rebuild


def test_harmonic_centrality_contracts(spark):
    import pytest

    from data_ingestion_spark.functions.graph import harmonic_centrality

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="mode"):
        harmonic_centrality(e, mode="sideways")
    with pytest.raises(ValueError, match="radius"):
        harmonic_centrality(e, radius=0)


@pytest.mark.slow
def test_harmonic_centrality_accumulator_plan_depth(spark):
    """r14 verdict #7: the per-round lazy localCheckpoint on the
    harmonic accumulator caps the optimized-plan size at one round —
    radius 10 must not grow a 10-deep join tree (the HITS lineage
    lesson applied to the last iterative accumulator)."""
    from data_ingestion_spark.functions.graph import harmonic_centrality

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "src long, dst long"
    )
    out = harmonic_centrality(e, radius=10, p=7)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the accumulator chain is checkpointed: the final plan joins the
    # LAST round's scan, not 10 rounds of est-join history
    assert plan.count("Join") <= 6, plan[:2000]
    # and the result is still exact for the path graph
    got = {r.node: r.harmonic_micros for r in out.collect()}
    assert got[12] >= got[6] >= got[1]


def test_harmonic_centrality_round_stats_hook(spark):
    """round_stats receives one (round, wall, state_rows) per round,
    monotone state growth bounded by |V| * 2^p."""
    from data_ingestion_spark.functions.graph import harmonic_centrality

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "src long, dst long"
    )
    stats: list = []
    harmonic_centrality(e, radius=3, p=7, round_stats=stats).collect()
    assert [r for r, _, _ in stats] == [1, 2, 3]
    rows = [n for _, _, n in stats]
    assert rows == sorted(rows)  # balls only grow
    assert rows[-1] <= 8 * (1 << 7)  # |V| * 2^p bound
    assert all(w > 0 for _, w, _ in stats)
