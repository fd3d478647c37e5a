"""Connected components over near-duplicate pair graphs.

The reference's canonical-id resolver collapses pairwise duplicate groups
(``create_person_deduplication_table.py:560–640``) but never closes
transitive chains: A~B plus B~C leaves A and C under different canonicals.
Training-corpus dedup needs the closure — a cluster is a connected
component of the near-dup pair graph, and one document per component is
kept. This is the standard last step after MinHash/SimHash/Jaccard pair
generation.

Spark-first formulation: min-label propagation with plain DataFrame joins.
Each round is one shuffle on the node id; labels only decrease, so the
fixpoint is the component-minimum id and the round count equals the
component diameter. Near-dup clusters are shallow (stars and short chains),
so diameter rounds beat the constant-factor overhead of the O(log n)
large-star/small-star scheme (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) — swap that in for adversarially deep
graphs. ``localCheckpoint`` truncates the growing iterative lineage each
round (single-process analog of a reliable ``setCheckpointDir``
checkpoint on a real cluster); without it the plan doubles per iteration
and Catalyst re-optimizes the whole history every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Label each node of the undirected ``edges`` graph with the minimum
    node id in its connected component.

    Returns (node, label) rows for every node that appears in an edge;
    isolated nodes never enter the graph, so callers left-join and
    ``coalesce`` to the node's own id (see ``dedup_clusters``).

    Convergence is detected with a cheap existence probe (any row whose
    label still shrank this round), so the loop stops after
    diameter + 1 rounds regardless of ``max_iter``.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round — scan once
    )
    labels = sym.select(F.col("u").alias("node"), F.col("u").alias("label")).distinct()
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        new = (
            labels.join(nbr, labels["node"] == nbr["u"], "left")
            .select(
                labels["node"],
                F.least(labels["label"], F.coalesce(nbr["nbr_min"], labels["label"])).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        shrank = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") < F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if shrank == 0:
            break
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list; returns
    (node, rank) for every node appearing as a src or dst.

    Semantics (kept deliberately oracle-portable): uniform init 1/N,
    then ``rank' = (1−d)/N + d · Σ_{u→v} rank(u)/outdeg(u)`` per
    iteration. Dangling nodes (no out-edges) retain the teleport term
    only and their mass is NOT redistributed — the simple formulation,
    identical between this plan and the unrolled-SQL oracle; callers
    wanting stochastic-matrix PageRank symmetrize the edges or add a
    dangling-mass correction.

    Shuffle discipline per iteration: ONE hash shuffle keyed on the
    destination (the contributions groupBy); the edges⋈ranks join
    broadcasts nothing — both sides shuffle on the src key, and AQE picks
    BHJ while ranks fit. The edge list with precomputed out-degrees is
    localCheckpointed once and reused every round; each iteration's rank
    frame is localCheckpointed so the lineage stays one round deep
    (cluster analog: a reliable checkpoint dir). At 100 TB this is the
    textbook Pregel-on-DataFrames shape — cost is iterations × (one join
    + one keyed aggregation), no driver-side state beyond the loop
    counter.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # bounded scalar fetch: one long
    if n_nodes == 0:
        # Empty graph (r13 fuzz census): no nodes to rank — return the
        # empty typed result instead of a driver-side ZeroDivisionError
        # on the teleport term.
        return nodes.select("node", F.lit(None).cast("double").alias("rank"))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_deg = e.join(out_deg, "src").localCheckpoint(eager=True)

    teleport = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        contribs = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (F.lit(teleport) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle census of an undirected graph: one row with
    (n_nodes, n_edges, n_wedges, n_triangles, clustering_coeff) — the
    graph-cohesion profile behind community detection, link-spam
    scoring, and co-occurrence analysis (the analytics layer above the
    reference's pairwise dedup graph, which stops at components —
    ``create_person_deduplication_table.py:560–640`` never measures
    closure).

    Spark-first, skew-proof formulation (Suri & Vassilvitskii, WWW'11
    "Counting Triangles and the Curse of the Last Reducer"): canonicalize
    each edge to (min,max), then ORIENT every edge from its lower-
    (degree, id) endpoint to the higher one. Orientation bounds every
    out-list by O(√m) regardless of how skewed the raw degree
    distribution is — the celebrity node's million-edge wedge explosion
    disappears because its edges all point INTO it. Every triangle is
    counted exactly once (its minimum-(degree,id) vertex owns it). The
    wedge count is over the same orientation, so clustering_coeff =
    n_triangles / n_wedges ∈ [0, 1] (share of open oriented wedges that
    close).

    r15 optimization (guide §2.3/§2.4/§3.1): wedges are no longer
    materialized as rows — n_wedges = Σ_a C(outdeg_a, 2) exactly (the
    former o1⋈o2 self-join enumerated the same pairs only to count
    them: 135M rows on the 91%-dense 1000-node supplier graph).
    Triangles are per-edge out-neighborhood intersections
    |N⁺(a) ∩ N⁺(b)|, computed over a SPARSE WORD BITMAP: each node's
    out-list is packed into (node, word=id>>6, mask) rows — one 64-bit
    mask per populated stripe of the id space — and the intersection
    becomes an equi-join on (node, word) plus bit_count(ma & mb).
    Per-edge work is #words(a) ≤ min(outdeg_a, id-range/64) rows
    instead of an array_intersect hash-set build over outdeg_a + outdeg_b
    elements: never more rows than the old wedge join, 64× fewer where
    neighborhoods are dense, and all arithmetic stays in codegen
    (AND + POPCNT) with no per-row allocation. n_edges = Σ bit_count(m)
    and n_wedges = Σ C(d, 2) come out of the SAME words exchange
    (ReuseExchange), so the only extra branch is the n_nodes count over
    the deg aggregate that the orientation already builds."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    with_deg = e.join(du, "u").join(dv, "v")
    lo_first = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    oriented = with_deg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    # sparse bitmap of every out-list: one row per populated 64-id
    # stripe. shiftright(b, 6) is floor(b/64) and (b & 63) the matching
    # non-negative bit position for ANY long id (two's complement), so
    # the packing is total without assuming non-negative node ids.
    words = (
        oriented.groupBy("a", F.shiftright("b", 6).alias("w"))
        .agg(
            F.expr("bit_or(shiftleft(1L, CAST(b & 63 AS INT)))").alias("m")
        )
    )
    # n_edges = Σ popcount (every oriented edge sets exactly one bit);
    # n_wedges = Σ C(d, 2): d*(d-1) is even, so integer `div` is exact
    outdeg = words.groupBy("a").agg(
        F.sum(F.bit_count("m")).cast("long").alias("d")
    )
    edge_wedge = outdeg.agg(
        F.coalesce(F.sum("d"), F.lit(0).cast("long")).alias("n_edges"),
        F.coalesce(
            F.sum(F.expr("(d * (d - 1)) div 2")),
            F.lit(0).cast("long"),
        ).alias("n_wedges"),
    )
    # triangles per oriented edge (a,b) = |N⁺(a) ∩ N⁺(b)| = Σ over a's
    # words of popcount(ma & mb): expand each edge by a's word rows,
    # fetch b's word at the same stripe (left: b may have no out-edges
    # or miss that stripe), AND + POPCNT, sum. The words exchange is
    # shared with edge_wedge via ReuseExchange; the word joins stay
    # broadcast-sized whenever the packed adjacency does. (An r15
    # broadcast-map variant — adjacency folded to word→mask maps probed
    # per edge with element_at inside F.aggregate — measured 2.4× SLOWER:
    # higher-order-function lambdas evaluate interpreted per element,
    # losing to the codegen'd hash joins. Kept the join form.)
    wa = words.select(F.col("a"), F.col("w"), F.col("m").alias("ma"))
    wb = words.select(
        F.col("a").alias("b"), F.col("w"), F.col("m").alias("mb")
    )
    tri = (
        oriented.join(wa, "a")
        .join(wb, ["b", "w"], "left")
        .select(
            F.bit_count(
                F.col("ma").bitwiseAND(F.coalesce("mb", F.lit(0).cast("long")))
            ).alias("c")
        )
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles"))
    )
    counts = [
        deg.agg(F.count(F.lit(1)).alias("n_nodes")),
        edge_wedge,
        tri,
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(F.broadcast(c))  # three one-row aggregates
    return out.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                F.col("n_triangles").cast("double") / F.col("n_wedges").cast("double"),
            ),
            6,
        ).alias("clustering_coeff"),
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed edge
    list; returns (node, hub, auth) for every node appearing in an edge.
    PageRank's directional complement: a good hub POINTS AT many good
    authorities, a good authority IS POINTED AT by many good hubs — the
    natural score pair for bipartite-ish purchase/mention/link graphs
    where 'influential source' and 'popular target' are different
    questions.

    Deterministic, oracle-portable formulation: scores start uniform at
    1, each iteration computes h(u) = Σ_{u→v} a(v) then a(v) = Σ_{u→v}
    h(u), L1-normalizing after each step; every normalized score is
    ROUNDED to 12 decimals, which pins the FP chain to values any
    double-math engine reproduces (same technique as kmeans_assign's
    round-6 centroid updates). Output scores rounded to 6.

    Scale shape: identical to ``pagerank`` — per half-iteration ONE
    keyed aggregation plus a join against the (localCheckpoint-pinned)
    edge list; the L1 norm is a ONE-ROW aggregate broadcast, never a
    driver-side collect. No state grows with iteration count.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)  # reused 2× per iteration
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    auth = nodes.select("node", F.lit(1.0).alias("a"))
    hub = nodes.select("node", F.lit(1.0).alias("h"))

    def _l1_normalize(df: DataFrame, col: str) -> DataFrame:
        tot = df.agg(F.sum(col).alias("__tot"))
        return df.crossJoin(F.broadcast(tot)).select(
            "node", F.round(F.col(col) / F.col("__tot"), 12).alias(col)
        )

    for _ in range(iterations):
        h_new = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
        )
        hub = _l1_normalize(
            nodes.join(h_new, nodes["node"] == h_new["src"], "left").select(
                "node", F.coalesce("h", F.lit(0.0)).alias("h")
            ),
            "h",
        ).localCheckpoint(eager=True)
        a_new = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
        )
        auth = _l1_normalize(
            nodes.join(a_new, nodes["node"] == a_new["dst"], "left").select(
                "node", F.coalesce("a", F.lit(0.0)).alias("a")
            ),
            "a",
        ).localCheckpoint(eager=True)
    return (
        hub.join(auth, "node")
        .select("node", F.round("h", 6).alias("hub"), F.round("a", 6).alias("auth"))
    )


def bfs_distances(
    edges: DataFrame,
    source_nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 6,
) -> DataFrame:
    """Multi-source BFS over an undirected graph: (node, dist) with the
    minimum hop count from any node of ``source_nodes`` (single column
    ``node``), capped at ``max_depth``; unreached nodes are absent — the
    neighborhood/reachability primitive behind 'within-k-hops' blocking,
    influence radii, and link-distance features.

    Same Pregel-on-DataFrames shape as ``connected_components``: the
    symmetrized edge list is checkpoint-pinned once; each round expands
    the CURRENT FRONTIER ONLY (nodes first reached last round — the
    classic BFS optimization that keeps per-round cost proportional to
    the frontier, not the visited set), one keyed shuffle per round, and
    stops early when a round discovers nothing. Labels never change once
    assigned (BFS layers are exact), so no re-labeling pass exists."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = source_nodes.select(F.col("node"), F.lit(0).alias("dist")).distinct()
    visited = visited.localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            sym.join(frontier, sym["u"] == frontier["node"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(depth).alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), deterministic variant: every node starts as its own
    label; each round it adopts the most frequent label among itself
    and its neighbors, ties broken by the SMALLEST label. Returns
    (node, community) after exactly ``n_iter`` rounds.

    Determinism contract: the classic algorithm breaks ties randomly
    and runs to convergence; this variant pins BOTH knobs (min-label
    ties, fixed round count) so results are reproducible and
    SQL-replayable — the oracle unrolls the same rounds as CTEs.
    Including the node's own label in the vote damps the two-coloring
    oscillation synchronous LPA exhibits on bipartite graphs.

    Scale shape: one (node, label) count aggregate and one node-keyed
    window per round — the same keyed-shuffle-per-iteration family as
    ``pagerank``; lineage truncated per round with localCheckpoint."""
    from pyspark.sql import Window

    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    nodes = sym.select("u").distinct()
    # self-loop: each node votes for its own current label too
    sym = sym.union(nodes.select(F.col("u"), F.col("u").alias("v"))).localCheckpoint(
        eager=True
    )
    labels = nodes.select(F.col("u").alias("node"), F.col("u").alias("label"))
    w = Window.partitionBy("u").orderBy(F.col("c").desc(), F.col("label").asc())
    for _ in range(n_iter):
        votes = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))
