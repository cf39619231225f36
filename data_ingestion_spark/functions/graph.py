"""Link-graph centrality for crawl prioritization.

Reference anchor: the reference crawls its frontier breadth-first
with no prioritization (website-ingestion-pipeline.py, the crawl
step P:166-191). At crawl scale nobody fetches in discovery order —
frontiers are ranked by link centrality (Common Crawl publishes
harmonic-centrality rankings for exactly this purpose); this module
computes that signal engine-side from the (src, dst) edge list
`discover_frontier` already produces.

Determinism: classic PageRank iterates floating-point mass, whose
cross-engine hash depends on aggregation order. This implementation
keeps every rank in INTEGER micro-units and every transfer as
integer arithmetic — ``contribution = (rank * d_num) // (d_den *
outdeg)`` with damping as the rational d_num/d_den — so per-node
sums are associative and the result is bit-identical on any engine
and any partitioning. The floor-division mass leak (< 1 micro-unit
per edge per iteration) and un-redistributed dangling mass make this
a *centrality score*, not a probability distribution; for frontier
ranking only the ordering matters.

The 100 TB shape: each iteration is one src-keyed equi-join
(edges ⋈ ranks) plus one dst-keyed sum — 2 shuffles x iters, the
canonical iterative-join pattern. Rank rows are |nodes|; edge rows
dominate, so production runs persist the edge list partitioned by
src once and let every iteration reuse it (pass a pre-persisted
edges DataFrame); iterations are unrolled into one lazy plan here,
which is fine for the default 5 but should be checkpointed per-k
for large k (lineage growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: starting rank per node, in micro-units
PAGERANK_SCALE = 1_000_000


def pagerank_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    d_num: int = 85,
    d_den: int = 100,
    materialize: bool = True,
    checkpoint_every: int | None = None,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """(src, dst) edge list → (node, rank_micros) after ``iters``
    integer power iterations with damping ``d_num/d_den``:

        R0(v)    = PAGERANK_SCALE
        R_{t+1}(v) = base + Σ_{u→v} (R_t(u) * d_num) // (d_den * outdeg(u))

    where ``base = (PAGERANK_SCALE * (d_den - d_num)) // d_den``.
    Nodes = distinct src ∪ dst; dangling nodes keep receiving the
    base term but donate nothing (documented non-redistribution).
    All arithmetic is exact BIGINT — results are bit-identical
    across engines, partitionings, and aggregation orders.

    ``checkpoint_every``: for large ``iters``, truncate the unrolled
    rank lineage every k rounds via ``localCheckpoint`` — the BPE
    trainer measured a driver-heap OOM from merely RENDERING a plan
    after ~50 unrolled iterations (BENCH_NOTES r10 addendum); the
    default 5 iterations stay far under that, so checkpointing is
    opt-in (it costs a materialization per k rounds).

    ``cache_handles``: the ``materialize`` path persists the
    degree-annotated edge list and the node set, and cached
    DataFrames are NOT reclaimed when they go out of scope (unlike
    localCheckpoint blocks). Pass a list to receive the persisted
    handles; a long-lived driver should ``.unpersist()`` each after
    materializing the returned ranks (or periodically
    ``spark.catalog.clearCache()``). Unpersisting merely drops the
    cache — the returned plan stays valid via lineage.
    """
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    )
    outdeg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    nodes = (
        e.select(F.col("__src").alias("__node"))
        .union(e.select(F.col("__dst").alias("__node")))
        .distinct()
    )
    base = (PAGERANK_SCALE * (d_den - d_num)) // d_den
    ranks = nodes.withColumn("__r", F.lit(PAGERANK_SCALE).cast("bigint"))
    contrib_edges = e.join(outdeg, "__src")
    it = 0
    if materialize:
        # every iteration joins against the degree-annotated edge
        # list and the node set; without persistence the lazy plan
        # recomputes both subtrees (scan + groupBy + distinct) once
        # PER ITERATION — this is the 'persist the edge list
        # partitioned by src' production step, spill-to-disk
        from pyspark import StorageLevel

        contrib_edges = contrib_edges.persist(StorageLevel.MEMORY_AND_DISK)
        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_handles is not None:
            cache_handles.extend([contrib_edges, nodes])
    for _ in range(iters):
        contrib = (
            contrib_edges.join(
                ranks.select(F.col("__node").alias("__src"), "__r"), "__src"
            )
            .select(
                F.col("__dst").alias("__node"),
                # SQL `div`, NOT `/` + cast: float division loses
                # exactness past 2^53 (a hub's rank x d_num at 1e9
                # nodes), integer div never does
                F.expr(f"(__r * {int(d_num)}) div ({int(d_den)} * __deg)")
                .cast("bigint")
                .alias("__c"),
            )
        )
        ranks = (
            nodes.join(
                contrib.groupBy("__node").agg(F.sum("__c").alias("__in")),
                "__node",
                "left_outer",
            )
            .select(
                "__node",
                (F.lit(base) + F.coalesce(F.col("__in"), F.lit(0)))
                .cast("bigint")
                .alias("__r"),
            )
        )
        it += 1
        if checkpoint_every and it % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        F.col("__node").alias("node"), F.col("__r").alias("rank_micros")
    )


def hits_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    materialize: bool = True,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, public algorithm) over a
    (src, dst) edge list → (node, hub_micros, auth_micros) — the
    second classic crawl-centrality signal next to ``pagerank_scores``
    (a page LINKING TO many good pages is a hub worth re-crawling for
    frontier discovery even when nothing links to it; PageRank scores
    it near zero).

    Same exact-integer determinism discipline as PageRank: scores
    live in BIGINT micro-units, each half-iteration is one equi-join
    + one grouped integer sum, and the per-round L1 normalization is
    integer — score' = (raw * 1_000_000) div Σraw — so per-node sums
    are associative and the result is bit-identical on any engine,
    partitioning, or aggregation order (the DuckDB oracle unrolls the
    identical rounds). Parallel (src, dst) duplicates collapse first:
    classic HITS is over the unweighted adjacency.

        h0(v) = 1
        a_t(v) = normL1( Σ_{u→v} h_{t-1}(u) )
        h_t(u) = normL1( Σ_{u→v} a_t(v) )

    h0 is 1, not the micro scale: normalization is invariant under
    seed scaling ((k·raw·1e6) div (k·Σraw) ≡ (raw·1e6) div Σraw), and
    a 1e6 seed would make round 1's ``raw·1e6`` = 1e12·indeg — int64
    overflow (ANSI abort / silent wrap) at in-degree > ~9.2e6, i.e.
    any crawl-scale hub page. Post-normalization rounds are safe by
    construction: Σ scores ≈ 1e6, so every later raw ≤ ~1e6.

    Nodes with no in-edges get authority 0 (and vice versa), never
    NULL. 2 shuffles per half-iteration (join + grouped sum) plus a
    1-row total broadcast — the iterative-join pattern; edges and
    nodes persist once and every round reuses them
    (``cache_handles`` receives the handles, the pagerank_scores
    contract).

    Unlike PageRank (whose damping base is a literal), the L1 total
    is DATA-DEPENDENT, so each half-round references the previous
    scores subtree twice (grouped sum + total agg) — left lazy the
    plan tree doubles per half-round (2^(2·iters): the driver OOMs
    rendering it before an executor touches a row). Each half-round
    therefore ``localCheckpoint``s its |nodes|-row result — lineage
    truncation per round, the price of data-dependent normalization
    in an iterative plan."""
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).distinct()
    nodes = (
        e.select(F.col("__src").alias("__node"))
        .union(e.select(F.col("__dst").alias("__node")))
        .distinct()
    )
    if materialize:
        from pyspark import StorageLevel

        e = e.persist(StorageLevel.MEMORY_AND_DISK)
        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_handles is not None:
            cache_handles.extend([e, nodes])

    def _half(scores: DataFrame, score_col: str, from_col: str, to_col: str, out: str):
        """One half-iteration: push ``score_col`` along ``from_col`` →
        ``to_col`` edges, sum per target, L1-normalize to micros."""
        raw = (
            e.join(
                scores.select(F.col("__node").alias(from_col), score_col), from_col
            )
            .groupBy(F.col(to_col).alias("__node"))
            .agg(F.sum(score_col).alias("__raw"))
        )
        total = raw.agg(F.sum("__raw").alias("__s"))
        return (
            nodes.join(raw, "__node", "left_outer")
            .join(F.broadcast(total))
            .select(
                "__node",
                # __s > 0 guard (r13 ADVICE): on a near-regular graph
                # past ~1e6 nodes every share can round to 0, making
                # the NEXT half-round's total 0 — the CASE keeps the
                # division un-evaluated then (no ANSI divide-by-zero
                # abort) and the scores collapse to a deterministic
                # all-zero fixpoint instead of NULLs. Identical output
                # whenever __s > 0, i.e. on every non-degenerate graph.
                F.coalesce(
                    F.when(F.col("__s") > 0, F.expr("(__raw * 1000000) div __s")),
                    F.lit(0),
                ).cast("bigint").alias(out),
            )
            .localCheckpoint(eager=True)
        )

    h = nodes.withColumn("__h", F.lit(1).cast("bigint"))
    a = None
    for _ in range(max(1, int(iters))):
        a = _half(h, "__h", "__src", "__dst", "__a")
        h = _half(a, "__a", "__dst", "__src", "__h")
    return (
        h.join(a, "__node")
        .select(
            F.col("__node").alias("node"),
            F.col("__h").alias("hub_micros"),
            F.col("__a").alias("auth_micros"),
        )
    )


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    materialize: bool = True,
    cache_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """(src, dst) edge list → (node, n_tri): per-node triangle
    participation counts over the UNDIRECTED simple graph (self
    loops dropped, direction and multiplicity collapsed). Nodes in
    no triangle are omitted — count them present-with-zero by outer
    joining the node set if needed.

    Triangle density is the local-clustering signal crawl curation
    uses to separate organic link neighborhoods from link farms
    (spam cliques are triangle-dense; navigational boilerplate is
    triangle-free), complementing the volume-based PageRank/HITS
    scores above.

    The 100 TB shape — degree-ordered node-iterator (the
    MapReduce-triangles construction of Suri & Vassilvitskii, WWW'11
    "Counting Triangles and the Curse of the Last Reducer"): orient
    every undirected edge from its lower-(degree, node) endpoint to
    the higher one. Every triangle then has EXACTLY one node with
    two out-edges (its lowest-ranked corner), so enumerating wedges
    only at out-edge pairs counts each triangle once — no /3 or /6
    correction, and the wedge fan-out at a node is its ORIENTED
    out-degree, which is O(sqrt(m)) for any graph (a node of degree
    d > sqrt(m) has < sqrt(m) higher-degree neighbors... bounded by
    counting), so the curse-of-the-last-reducer hub blowup cannot
    form: a 10^8-degree hub contributes wedges only toward its
    higher-ranked neighbors, of which there are at most O(sqrt(m)).

    Plan: degree agg (1 shuffle) → two degree-attach joins keyed on
    the endpoints → wedge self-join keyed on the wedge center (the
    oriented list arrives already hash-partitioned by __u from the
    previous join, so AQE reuses the exchange) → closing-edge
    equi-join on the (b, c) pair → posexplode of the 3 corners →
    count agg. Everything is equi-joins + aggs on (node) or (node,
    node) keys; no node ever sees more than out-degree² ≤ m wedge
    rows, Σ out-deg² = O(m^1.5) total wedge rows — the known-optimal
    bound for exact counting.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).cast("bigint").alias("__u"),
            F.greatest(F.col(src_col), F.col(dst_col)).cast("bigint").alias("__v"),
        )
        .where(F.col("__u") != F.col("__v"))
        .where(F.col("__u").isNotNull() & F.col("__v").isNotNull())
        .dropDuplicates(["__u", "__v"])
    )
    if materialize:
        # the canonical edge set feeds the degree agg (twice, via the
        # union) and both degree-attach joins; the oriented list feeds
        # the wedge self-join twice plus the closing-edge probe.
        # Without persistence the lazy plan re-runs the full
        # dedup-and-join subtree once PER REFERENCE (measured: 37
        # exchanges at sf0.001 vs 9 persisted) — the same
        # persist-the-edge-list production step as pagerank_scores.
        from pyspark import StorageLevel

        e = e.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_handles is not None:
            cache_handles.append(e)
    deg = (
        e.select(F.col("__u").alias("__n"))
        .unionAll(e.select(F.col("__v").alias("__n")))
        .groupBy("__n")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    # Orient low-rank → high-rank; rank = (degree, node id) totally
    # orders nodes, so orientation is deterministic and acyclic.
    du = deg.select(F.col("__n").alias("__u"), F.col("__d").alias("__du"))
    dv = deg.select(F.col("__n").alias("__v"), F.col("__d").alias("__dv"))
    ranked = e.join(du, "__u").join(dv, "__v")
    fwd = F.struct(F.col("__du").alias("d"), F.col("__u").alias("n")) < F.struct(
        F.col("__dv").alias("d"), F.col("__v").alias("n")
    )
    oriented = ranked.select(
        F.when(fwd, F.col("__u")).otherwise(F.col("__v")).alias("__a"),
        F.when(fwd, F.col("__v")).otherwise(F.col("__u")).alias("__b"),
        F.when(fwd, F.col("__dv")).otherwise(F.col("__du")).alias("__rb"),
    )
    if materialize:
        from pyspark import StorageLevel

        oriented = oriented.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_handles is not None:
            cache_handles.append(oriented)
    # Wedges at the lowest corner: out-edge pairs (a→b, a→c) with
    # rank(b) < rank(c) — the strict struct comparison on (degree,
    # node) dedupes the unordered pair without a second pass.
    lo = oriented.select("__a", F.col("__b").alias("__wb"), F.col("__rb").alias("__rwb"))
    hi = oriented.select("__a", F.col("__b").alias("__wc"), F.col("__rb").alias("__rwc"))
    wedges = lo.join(hi, "__a").where(
        F.struct(F.col("__rwb").alias("d"), F.col("__wb").alias("n"))
        < F.struct(F.col("__rwc").alias("d"), F.col("__wc").alias("n"))
    )
    closing = oriented.select(F.col("__a").alias("__wb"), F.col("__b").alias("__wc"))
    tri = wedges.join(closing, ["__wb", "__wc"]).select(
        F.col("__a").alias("__x"), F.col("__wb").alias("__y"), F.col("__wc").alias("__z")
    )
    return (
        tri.select(F.explode(F.array("__x", "__y", "__z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )


def harmonic_centrality(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    radius: int = 3,
    p: int = 11,
    mode: str = "in",
    round_stats: list | None = None,
) -> DataFrame:
    """Approximate truncated harmonic centrality via HyperBall
    (Boldi & Vigna, WWW'13 "In-core computation of geometric
    centralities with HyperBall") — the algorithm behind the Common
    Crawl harmonic-centrality rankings this module's header cites:

        H(v) = Σ_{r=1..radius} (|B(v, r)| − |B(v, r−1)|) · 10⁶ div r

    where |B(v, r)| is the HyperLogLog ESTIMATE of the ball of nodes
    within distance r of v (``mode="in"``: nodes that can REACH v —
    the link-authority direction rankings use; ``mode="out"``: nodes
    v can reach). Output: (node, reach_est, harmonic_micros) with
    reach_est = |B(v, radius)|.

    Exact all-pairs distance is O(n·m) and the exact
    reachable-set-per-node state is O(n²); HyperBall replaces each
    node's set with 2^p HLL registers, and the whole iteration
    becomes relational algebra over this module's sketch substrate
    (functions/sketches.py): state = (node, bucket, rho) rows,

        B_{r+1}(v) = B_r(v) ∪ ⋃_{(u,v)∈E} B_r(u)

    is one equi-join (state ⋈ edges on the ball-owner key) + one
    per-(node, bucket) max — union of HLL sketches IS register max,
    so the monotone merge is a partial-aggregated shuffle, exactly
    the pagerank iteration shape (2 shuffles × radius). Every
    register is integer-exact md5 arithmetic (the sketches.py
    discipline), the per-node estimate is ``hll_estimate_grouped``'s
    fixed-order expression, and the harmonic sum is BIGINT micros —
    the whole result is bit-deterministic under any partitioning,
    which is what lets a SQL twin unroll it round by round.

    The 100 TB shape: per-round state is ≤ |V|·2^p rows but in
    practice |V|·min(ball, 2^p) (only nonzero registers exist as
    rows); the join fans each edge by its head's nonzero register
    count. p is the precision/traffic dial — Common Crawl-scale runs
    use p=6..8 (±13–6 % on ball sizes, 64–256 registers/node);
    the p=11 default matches ``DEFAULT_HLL_P`` for report-grade
    accuracy on medium graphs. Estimate deltas are clamped at 0 (the
    HLL bias-correction branch switch can wiggle a hair negative —
    standard HyperBall practice). Per-round ``localCheckpoint``
    truncates the lineage of BOTH iterative accumulators — the sketch
    state (eager: the next round's join re-reads it) and the harmonic
    sum (lazy: referenced once, at the end — the checkpoint caps the
    join-tree depth at one round without radius extra jobs); no
    ``cache_handles`` needed — checkpoint blocks are reclaimed with
    the session (the hits_scores OOM lesson, both halves).

    ``round_stats``: pass a list to receive one
    ``(round, wall_sec, state_rows)`` tuple per completed round —
    state_rows is a count over the just-checkpointed sketch state
    (cached blocks, cheap), the number to read against the
    ``|V| * 2^p`` bound when sizing p for a new graph. The count job
    runs ONLY when the list is passed; production calls pay nothing.
    """
    if mode not in ("in", "out"):
        raise ValueError(f"mode must be 'in' or 'out', got {mode!r}")
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    from .sketches import (
        hll_build_grouped,
        hll_estimate_grouped,
        hll_merge_grouped,
    )

    e = edges.select(
        F.col(src_col).cast("bigint").alias("__eu"),
        F.col(dst_col).cast("bigint").alias("__ev"),
    ).where(F.col("__eu").isNotNull() & F.col("__ev").isNotNull())
    # ball-owner key / emit key: "in"-balls grow v's set from its
    # in-neighbors' sets (state at u flows along u→v to v)
    head, tail = ("__eu", "__ev") if mode == "in" else ("__ev", "__eu")
    nodes = (
        e.select(F.col("__eu").alias("__node"))
        .unionAll(e.select(F.col("__ev").alias("__node")))
        .distinct()
    )
    state = hll_build_grouped(
        nodes.select("__node", F.col("__node").alias("__v")), "__node", "__v", p
    ).localCheckpoint(eager=True)

    def est_of(s: DataFrame) -> DataFrame:
        return hll_estimate_grouped(s, "__node", p).select("__node", "est")

    prev = est_of(state)
    harm = nodes.select("__node", F.lit(0).cast("bigint").alias("__h"))
    for r in range(1, int(radius) + 1):
        if round_stats is not None:
            import time as _time

            _t0 = _time.perf_counter()
        contrib = (
            state.withColumnRenamed("__node", head)
            .join(e, head)
            .select(F.col(tail).alias("__node"), "bucket", "rho")
        )
        state = hll_merge_grouped("__node", state, contrib).localCheckpoint(
            eager=True
        )
        if round_stats is not None:
            round_stats.append(
                (r, _time.perf_counter() - _t0, state.count())
            )
        cur = est_of(state)
        harm = (
            harm.join(prev.select("__node", F.col("est").alias("__pe")), "__node")
            .join(cur.select("__node", F.col("est").alias("__ce")), "__node")
            .select(
                "__node",
                (
                    F.col("__h")
                    + F.expr(
                        f"(greatest(__ce - __pe, cast(0 as bigint)) * 1000000) div {r}"
                    )
                ).cast("bigint").alias("__h"),
            )
            # lazy checkpoint: truncates the radius-deep join tree the
            # accumulator would otherwise grow (r14 verdict #7) while
            # computing harm exactly once, at the final action
            .localCheckpoint(eager=False)
        )
        prev = cur
    return harm.join(
        prev.select("__node", F.col("est").alias("reach_est")), "__node"
    ).select(
        F.col("__node").alias("node"),
        "reach_est",
        F.col("__h").alias("harmonic_micros"),
    )
