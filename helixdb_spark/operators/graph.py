"""Graph analytics over DataFrame edge lists.

Connected components (transitive dedup closure) lives in operators/dedup.py;
this module adds weighted PageRank — the canonical iterative graph operator.

Scale shape: the rank vector is a (node, rank) DataFrame joined to the
edge list each round — one shuffle per iteration on the edge source key
(or a broadcast when the node set fits, the common case for entity graphs
distilled from a corpus). Out-degree normalization is precomputed once.
Dangling mass is redistributed uniformly (the standard correction), so
ranks sum to 1 every round. The driver never sees per-node state — only
the fixed iteration count; contrast GraphX's Pregel, same algebra.

No reference analog (the reference has no joins at all — SURVEY.md §2.3);
this is an engine addition alongside the dedup closure operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Below this node count an iterative operator's per-round cost is Spark
# stage-scheduling overhead, not data: the vertex state is driver-sized by
# definition, so the rounds run as plain arithmetic on the collected edge
# list with the IDENTICAL update + rounding sequence (the
# power_iteration_top_eigen discipline — bit-equal under per-round rounding
# (round_dp) / integer state, asserted in tests/test_round5_ops.py; with
# round_dp=None pagerank's two paths differ at summation-order ulp level,
# the same caveat the distributed path already has across partitionings).
# The edge/weight BUILD stays distributed either
# way; only the iteration moves. Above the threshold the distributed rounds
# below are the right shape.
SMALL_GRAPH_DRIVER_NODES = 1024
SMALL_GRAPH_DRIVER_EDGES = 1 << 18
# Distributed pagerank broadcasts the (node, rank) vector into the flow
# join while |V| fits an executor comfortably (~100 MB at 4M nodes) —
# edges then never shuffle per round. Beyond this, shuffle join.
PAGERANK_BROADCAST_NODES = 1 << 22


def _rank_schema(nodes_df: DataFrame, value_name: str, value_type):
    from pyspark.sql.types import StructField, StructType

    return StructType(
        [nodes_df.schema.fields[0], StructField(value_name, value_type)]
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iterations: int = 5,
    truncate_lineage_every: int = 2,
    round_dp: int | None = None,
) -> DataFrame:
    """Weighted PageRank with uniform dangling redistribution; returns
    (node, rank) after a FIXED iteration count (deterministic — the oracle
    unrolls the same rounds as CTEs).

    ``rank' = (1-d)/N + d * (flow_in + dangling_mass/N)`` where flow
    follows out-weight-normalized edges.

    ``round_dp`` rounds the rank at the END of each iteration (with a
    +1e-9 half-even nudge) — the same per-round quantization discipline as
    power_iteration_top_eigen, so an unrolled-CTE oracle stays bit-equal
    even though the two engines sum doubles in different orders; without
    it the ~1e-15 order noise compounds across iterations.
    """
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm = e.join(out, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    )
    n = nodes.count()  # one scalar to the driver; the rank vector never moves
    norm = norm.persist()
    nodes = nodes.persist()
    # The dangling SET is static — only its rank mass changes per round.
    # Precompute it once; when it is empty (most entity graphs distilled
    # from joins), every round drops a join + aggregate + broadcast — at
    # this vector size the iteration cost is stage overhead, not data.
    dang_nodes = nodes.join(
        out.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()
    has_dangling = not dang_nodes.isEmpty()
    if (
        n <= SMALL_GRAPH_DRIVER_NODES
        and norm.count() <= SMALL_GRAPH_DRIVER_EDGES  # count BEFORE collect
    ):
        erows = [(r["src"], r["dst"], r["p"]) for r in norm.collect()]
        from pyspark.sql.types import DoubleType

        node_ids = [r["node"] for r in nodes.collect()]
        dang = (
            [r["node"] for r in dang_nodes.collect()]
            if has_dangling
            else []
        )
        rank = {v: 1.0 / n for v in node_ids}
        for _ in range(iterations):
            flow: dict = {}
            for s_, d_, p_ in erows:
                if p_ is None:
                    # zero total out-weight: the distributed
                    # F.sum(rank*p) skips the NULL; mirror it
                    continue
                flow[d_] = flow.get(d_, 0.0) + rank[s_] * p_
            dm = sum(rank[v] for v in dang) if dang else 0.0
            nxt = {}
            for v in node_ids:
                inflow = flow.get(v, 0.0)
                if has_dangling:
                    inflow = inflow + dm / n
                val = (1.0 - damping) / n + damping * inflow
                if round_dp is not None:
                    val = round(val + 1e-9, round_dp)
                nxt[v] = val
            rank = nxt
        out = norm.sparkSession.createDataFrame(
            [(v, float(rank[v])) for v in node_ids],
            _rank_schema(nodes, "rank", DoubleType()),
        )
        for c in (norm, nodes, dang_nodes):
            c.unpersist()
        return out
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    from helixdb_spark.operators.util import tracked_local_checkpoint, unpersist_on_gc

    # When the RANK VECTOR (|V| rows of (node, rank)) fits an executor —
    # the common case far beyond the driver fast path — broadcast it into
    # the flow join instead of shuffling the EDGE table on src every
    # round: per-round cost drops from 2 shuffles of |E| + |V| to one
    # map-side join over the persisted edges plus the |V|-row flow
    # aggregate (measured 2-3x on the sf0.1 shipment graph: 550k edges x
    # 5 rounds no longer move). Above the threshold (billions of nodes)
    # the plain shuffle join is the right shape. Plan-only change: the
    # arithmetic is identical either way.
    broadcast_ranks = n <= PAGERANK_BROADCAST_NODES

    def _bc(df):
        return F.broadcast(df) if broadcast_ranks else df

    cp_handles: list = []
    for it in range(iterations):
        # Iterative DataFrames grow join-on-join lineage whose Catalyst
        # analysis cost is superlinear in depth — the classic driver-side
        # blowup of loops over joins. Truncate every couple of rounds
        # (localCheckpoint materializes the ~|V|-row rank vector and cuts
        # the logical plan; swap for checkpoint() with a checkpoint dir on
        # a real cluster for executor-loss tolerance).
        if it and truncate_lineage_every and it % truncate_lineage_every == 0:
            ranks = tracked_local_checkpoint(ranks, cp_handles)
        flow = (
            norm.join(
                _bc(ranks.select(F.col("node").alias("src"), "rank")), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("flow"))
        )
        stepped = nodes.join(flow, "node", "left")
        if has_dangling:
            dangling = ranks.join(
                _bc(dang_nodes), "node", "left_semi"
            ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            stepped = stepped.crossJoin(F.broadcast(dangling))
            inflow = F.coalesce(F.col("flow"), F.lit(0.0)) + F.col("dm") / n
        else:
            inflow = F.coalesce(F.col("flow"), F.lit(0.0))
        new_rank = F.lit((1.0 - damping) / n) + F.lit(damping) * inflow
        if round_dp is not None:
            new_rank = F.round(new_rank + F.lit(1e-9), round_dp)
        ranks = stepped.select("node", new_rank.alias("rank"))
    return unpersist_on_gc(ranks, norm, nodes, dang_nodes, *cp_handles)


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation.

    The scale-safe algorithm: canonicalize to an undirected, deduped edge
    set, then ORIENT every edge from its lower-(degree, id) endpoint to the
    higher. Wedges are enumerated only at each edge's LOW endpoint — a
    node's join fan-out is its oriented out-degree, O(sqrt(m)) even for
    hubs (the classic m^1.5 bound) — and each wedge is closed with one
    equi-join back to the undirected edge set. Every triangle is counted
    exactly once, then credited to all three corners with a final groupBy.
    Three shuffles total (degree, wedge self-join key, final count);
    nothing is quadratic in a hub's raw degree.
    """
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(a.alias("a"), b.alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    ed = und.join(da, "a").join(db, "b")
    # orient low -> high by (deg, id); ties cannot happen (id breaks them)
    low_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(
            low_first, F.struct(F.col("degb").alias("d"), F.col("b").alias("n"))
        )
        .otherwise(F.struct(F.col("dega").alias("d"), F.col("a").alias("n")))
        .alias("vord"),
    ).select("u", F.col("vord.n").alias("v"), F.col("vord"))
    # wedges at the low endpoint: unordered {v, w} pairs via the (deg, id)
    # order, so each wedge appears once
    e1 = oriented.select("u", F.col("v").alias("x"), F.col("vord").alias("xord"))
    e2 = oriented.select("u", F.col("v").alias("y"), F.col("vord").alias("yord"))
    wedges = e1.join(e2, "u").where(F.col("xord") < F.col("yord")).select(
        "u", "x", "y"
    )
    closing = und.select(F.col("a").alias("ca"), F.col("b").alias("cb"))
    tri = wedges.join(
        closing,
        (F.least(F.col("x"), F.col("y")) == F.col("ca"))
        & (F.greatest(F.col("x"), F.col("y")) == F.col("cb")),
    ).select("u", "x", "y")
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("x").alias("node")))
        .unionAll(tri.select(F.col("y").alias("node")))
    )
    return (
        deg.join(
            corners.groupBy("node").agg(F.count("*").alias("n_triangles")),
            "node",
            "left",
        )
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
        )
    )


def connected_components(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round min-label propagation: every node starts labeled with
    its own id; each round every node takes the minimum label among itself
    and its neighbors. After ``rounds`` >= the graph diameter the label is
    the component's minimum node id. A FIXED round count keeps the result
    oracle-unrollable (same determinism discipline as pagerank/kcore_peel);
    under-provisioned rounds are still deterministic, just a coarser
    partition refinement.

    Returns (node, comp). The node domain is derived from the EDGE LIST:
    only nodes that appear as an endpoint are returned — an isolated node
    in the caller's wider vertex universe is silently absent. Callers that
    need singleton components should union their vertex table in afterward
    (left-anti join against this output, label = own id).

    Scale shape: each round is one shuffle (edge ⋈ label on the neighbor
    key) plus one min-aggregate — O(m) per round, nothing quadratic. For
    graphs whose diameter outgrows a fixed small round count (web-scale
    crawls), swap the propagation step for the alternating large-star /
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce", SoCC'14), which converges in O(log^2 n) rounds on the same
    join+min algebra; entity graphs distilled from joins (this module's
    use) have tiny diameters and take the simple form.
    """
    from helixdb_spark.operators.util import (
        tracked_local_checkpoint,
        unpersist_on_gc,
    )

    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(a.alias("a"), b.alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    # neighbor list in both directions: label flows along every edge.
    # Persisted: every round joins against it, and without the persist the
    # whole upstream edge build re-executes once per round.
    nbr = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    nodes = nbr.select(F.col("a").alias("node")).distinct()
    # ONE cheap count on the persisted neighbor list decides the path (it
    # also pre-materializes the cache the distributed rounds would build
    # anyway); the node set is derived in Python from the collected edges,
    # so the small path never runs a distinct job
    if nbr.count() <= 2 * SMALL_GRAPH_DRIVER_EDGES:
        erows = [(r["a"], r["b"]) for r in nbr.collect()]
        if len({v for e_ in erows for v in e_}) <= SMALL_GRAPH_DRIVER_NODES:
            # integer-exact driver rounds: same fixed-radius refinement,
            # bit-equal by construction (no floats involved at all)
            comp = {}
            for a_, b_ in erows:
                comp[a_] = a_
                comp[b_] = b_
            for _ in range(rounds):
                msgs: dict = {}
                for a_, b_ in erows:
                    cur = msgs.get(b_)
                    if cur is None or comp[a_] < cur:
                        msgs[b_] = comp[a_]
                comp = {
                    v: min(c, msgs.get(v, c)) for v, c in comp.items()
                }
            out = nbr.sparkSession.createDataFrame(
                sorted(comp.items()),
                _rank_schema(nodes, "comp", nodes.schema.fields[0].dataType),
            )
            nbr.unpersist()
            return out
    labels = nodes.select("node", F.col("node").alias("comp"))
    cp_handles: list = []
    for it in range(rounds):
        # truncate the join-on-join lineage every couple of rounds — the
        # same superlinear-Catalyst-analysis fix as pagerank; the
        # checkpoint materializes only the |V|-row label vector
        if it and it % 2 == 0:
            labels = tracked_local_checkpoint(labels, cp_handles)
        msgs = (
            nbr.join(labels.select(F.col("node").alias("a"), "comp"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        labels = labels.join(msgs, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                "comp"
            ),
        )
    return unpersist_on_gc(labels, nbr, *cp_handles)


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling on the undirected, deduped edge set:
    each round drops every node whose current degree is below ``k``
    (and the edges touching it). With enough rounds this converges to the
    k-core; a FIXED round count keeps it oracle-unrollable — the same
    determinism discipline as pagerank/power iteration. Returns
    (node, core_deg) for the survivors, core_deg their degree inside the
    surviving subgraph.

    Scale shape: each round is one degree aggregate plus two semi-joins of
    the edge set against the (node-sized, broadcastable) keep set — never
    anything quadratic; ``rounds`` bounds the lineage depth so no
    checkpointing is needed at small fixed depths.
    """
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    cur = (
        edges.select(a.alias("a"), b.alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )

    erows = None
    cur.persist()
    # one cheap count on the persisted edge set decides the path; node
    # cardinality is derived from the collected edges, never a distinct job
    if cur.count() <= SMALL_GRAPH_DRIVER_EDGES:
        erows = [(r["a"], r["b"]) for r in cur.collect()]
        if len({v for e_ in erows for v in e_}) > SMALL_GRAPH_DRIVER_NODES:
            erows = None
    if erows is not None:
        # integer-exact driver peel: identical fixed rounds, no floats
        from pyspark.sql.types import LongType

        es = list(erows)
        for _ in range(rounds):
            deg: dict = {}
            for a_, b_ in es:
                deg[a_] = deg.get(a_, 0) + 1
                deg[b_] = deg.get(b_, 0) + 1
            keep = {v for v, d in deg.items() if d >= k}
            es = [(a_, b_) for a_, b_ in es if a_ in keep and b_ in keep]
        deg = {}
        for a_, b_ in es:
            deg[a_] = deg.get(a_, 0) + 1
            deg[b_] = deg.get(b_, 0) + 1
        node_field = cur.schema.fields[0]
        from pyspark.sql.types import StructField, StructType

        out = cur.sparkSession.createDataFrame(
            sorted(deg.items()),
            StructType(
                [
                    StructField("node", node_field.dataType),
                    StructField("core_deg", LongType()),
                ]
            ),
        )
        cur.unpersist()
        return out
    cur.unpersist()
    for _ in range(rounds):
        keep = degrees(cur).where(F.col("deg") >= k).select("node")
        cur = cur.join(
            keep.withColumnRenamed("node", "a"), "a", "left_semi"
        ).join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
    return degrees(cur).select("node", F.col("deg").alias("core_deg"))


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round SYNCHRONOUS label propagation (Raghavan, Albert &
    Kumara, Phys. Rev. E 2007): every node starts labeled with its own id;
    each round every node adopts the most frequent label among its
    NEIGHBORS, ties broken toward the smallest label. Synchronous updates
    with a FIXED round count keep the result oracle-unrollable — the same
    determinism discipline as connected_components/pagerank (the classic
    algorithm's random visit order and run-to-convergence are the
    non-deterministic parts this variant deliberately drops; synchronous
    LPA can oscillate on bipartite structure, which a fixed round count
    renders harmless and reproducible).

    Returns (node, community). Node domain = edge endpoints (the
    connected_components contract; isolated nodes are the caller's union).

    Scale shape: each round is one shuffle (edge ⋈ label on the neighbor
    key) + one (node, label) count + one per-node top-1 — O(m) per round.
    The count combines map-side; the top-1 is a window over the count
    table, whose size is bounded by the number of (node, distinct
    neighbor-label) pairs <= m.
    """
    from helixdb_spark.operators.util import (
        tracked_local_checkpoint,
        unpersist_on_gc,
    )
    from pyspark.sql.window import Window as W

    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(a.alias("a"), b.alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    nbr = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    nodes = nbr.select(F.col("a").alias("node")).distinct()
    if nbr.count() <= 2 * SMALL_GRAPH_DRIVER_EDGES:
        erows = [(r["a"], r["b"]) for r in nbr.collect()]
        if len({v for e_ in erows for v in e_}) <= SMALL_GRAPH_DRIVER_NODES:
            # integer-exact driver rounds, bit-equal by construction
            lab = {v: v for e_ in erows for v in e_}
            for _ in range(rounds):
                counts: dict = {}
                for a_, b_ in erows:  # label of a flows to b
                    key = (b_, lab[a_])
                    counts[key] = counts.get(key, 0) + 1
                new = {}
                for (v, l_), n in counts.items():
                    cur = new.get(v)
                    # max count, then min label
                    if cur is None or (-n, l_) < (-cur[0], cur[1]):
                        new[v] = (n, l_)
                lab = {v: nl[1] for v, nl in new.items()}
            out = nbr.sparkSession.createDataFrame(
                sorted(lab.items()),
                _rank_schema(nodes, "community", nodes.schema.fields[0].dataType),
            )
            nbr.unpersist()
            return out
    labels = nodes.select("node", F.col("node").alias("community"))
    cp_handles: list = []
    for it in range(rounds):
        if it and it % 2 == 0:
            labels = tracked_local_checkpoint(labels, cp_handles)
        cnt = (
            nbr.join(
                labels.select(F.col("node").alias("a"), "community"), "a"
            )
            .groupBy(F.col("b").alias("node"), "community")
            .agg(F.count("*").alias("_n"))
        )
        w = W.partitionBy("node").orderBy(
            F.desc("_n"), F.asc("community")
        )
        labels = (
            cnt.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "community")
        )
    return unpersist_on_gc(labels, nbr, *cp_handles)


def link_prediction_scores(
    und_edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor link prediction over a deduped undirected edge list
    (rows with ``a < b``): for every NON-adjacent node pair that shares at
    least one neighbor, the common-neighbor count and the Adamic-Adar
    score ``sum over shared w of 1 / ln(deg(w))`` (Adamic & Adar, "Friends
    and neighbors on the web", 2003) — rare shared neighbors predict links
    more strongly than hubs.

    Scale shape: one adjacency materialization (2|E| rows), a per-node
    degree aggregate joined back on the wedge center, then the standard
    wedge self-join keyed on the center node — the triangle-counting
    exchange pattern. Candidate volume is sum of deg(w)^2 — quadratic in
    HUB degree, so a real web-scale run sets ``max_degree``: each wedge
    CENTER's adjacency is truncated to its first ``max_degree`` neighbors
    in md5(center:nbr) order (deterministic, seed-free, replayable by any
    SQL engine — the same df-cap lever the MinHash-LSH band join and the
    NN-Descent sampler use), bounding candidates at n*max_degree^2. The
    Adamic-Adar term still uses the TRUE degree (the discount must see
    the hub's real size); only the wedge fan-out is sampled, so capped
    scores are a documented under-count on pairs whose shared neighbors
    were dropped. A common neighbor has degree >= 2 by construction, so
    ln(deg) is never zero. Per-wedge scores quantize to scaled int64
    before the pair sum (exact-sum discipline).

    Returns (a, b, common_neighbors, adamic_adar) for predicted pairs.
    """
    adj = und_edges.select(
        F.col(a_col).alias("node"), F.col(b_col).alias("nbr")
    ).unionByName(
        und_edges.select(F.col(b_col).alias("node"), F.col(a_col).alias("nbr"))
    )
    deg = adj.groupBy(F.col("node").alias("w")).agg(
        F.count("*").alias("deg_w")
    )
    # wedge (x - w - y): w is adjacent to both endpoints
    cadj = adj.select(F.col("nbr").alias("w"), F.col("node").alias("x"))
    if max_degree is not None:
        from pyspark.sql.window import Window as W

        rank_w = W.partitionBy("w").orderBy(
            F.md5(
                F.concat_ws(
                    ":", F.col("w").cast("string"), F.col("x").cast("string")
                )
            ),
            F.col("x").cast("string"),
        )
        cadj = (
            cadj.withColumn("_rn", F.row_number().over(rank_w))
            .where(F.col("_rn") <= int(max_degree))
            .drop("_rn")
        )
    left = cadj
    right = cadj.select("w", F.col("x").alias("y"))
    term_q = F.round(
        F.lit(1e-9) + F.lit(1e9) / F.log(F.col("deg_w").cast("double")), 0
    ).cast("long")
    wedges = (
        left.join(right, "w")
        .where(F.col("x") < F.col("y"))
        .join(deg, "w")
        .select(
            F.col("x").alias(a_col), F.col("y").alias(b_col), term_q.alias("_tq")
        )
    )
    scored = wedges.groupBy(a_col, b_col).agg(
        F.count("*").alias("common_neighbors"),
        F.round(F.lit(1e-9) + F.sum("_tq") / F.lit(1e9), 6).alias(
            "adamic_adar"
        ),
    )
    return scored.join(und_edges.select(a_col, b_col), [a_col, b_col], "left_anti")


def harmonic_centrality(
    und_edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_hops: int = 4,
) -> DataFrame:
    """Bounded-hop harmonic centrality over a deduped undirected edge list:
    ``H(v) = sum over u reached within max_hops of 1/d(v,u)`` (Boldi &
    Vigna, "Axioms for centrality", 2014 — harmonic handles disconnected
    graphs where classic closeness breaks). Distances come from
    ``max_hops`` synchronous multi-source BFS rounds — the standard BSP
    frontier expansion: each round joins the CURRENT frontier to the
    adjacency list on the node key and anti-joins everything already
    settled, so per-round work is |frontier|·avg_deg, never |V|².
    Fixed-round semantics make the operator deterministic on any graph
    (beyond-horizon pairs simply contribute 0 — the bounded-radius
    variant used at web scale, where full APSP is unpayable).

    Per-pair terms quantize 1/d to scaled int64 before the per-node sum
    (1/3 is not binary-exact — the exact-sum discipline). Returns
    (node, n_reached, harmonic).
    """
    from helixdb_spark.operators.util import (
        tracked_local_checkpoint,
        unpersist_on_gc,
    )

    cp_handles: list = []
    # the adjacency list joins into EVERY round's frontier expansion —
    # checkpoint it once so the (possibly expensive) edge build upstream
    # runs one job, not one per round
    adj = tracked_local_checkpoint(
        und_edges.select(
            F.col(a_col).alias("node"), F.col(b_col).alias("nbr")
        ).unionByName(
            und_edges.select(
                F.col(b_col).alias("node"), F.col(a_col).alias("nbr")
            )
        ),
        cp_handles,
    )
    nodes = adj.select("node").distinct()
    settled = nodes.select(
        F.col("node").alias("src"), F.col("node").alias("dst"), F.lit(0).alias("d")
    )
    frontier = settled
    # settled feeds both the anti-join and the union every round —
    # checkpoint per round so the recompute DAG stays linear in max_hops
    for r in range(1, max_hops + 1):
        nxt = (
            frontier.join(
                adj.select(F.col("node").alias("dst"), F.col("nbr")), "dst"
            )
            .select("src", F.col("nbr").alias("dst"))
            .distinct()
            .join(settled.select("src", "dst"), ["src", "dst"], "left_anti")
            .withColumn("d", F.lit(r))
        )
        settled = tracked_local_checkpoint(
            settled.unionByName(nxt), cp_handles
        )
        frontier = settled.where(F.col("d") == r)
    term_q = F.round(F.lit(1e-9) + F.lit(1e9) / F.col("d"), 0).cast("long")
    reached = settled.where(F.col("d") > 0)
    return unpersist_on_gc(
        reached.groupBy(F.col("src").alias("node"))
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            F.round(F.lit(1e-9) + F.sum(term_q) / F.lit(1e9), 6).alias(
                "harmonic"
            ),
        ),
        *cp_handles,
    )


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 3,
    truncate_lineage_every: int = 2,
    round_dp: int | None = 9,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, "Authoritative Sources in a
    Hyperlinked Environment", JACM 1999), the L1-normalized fixed-round
    variant: per round ``a'(v) = sum over (u,v) of w * h(u)`` then
    ``a = a' / sum(a')``, and ``h'(u) = sum over (u,v) of w * a(v)`` then
    ``h = h' / sum(h')``. L1 normalization (instead of Kleinberg's L2)
    keeps every per-round number a ratio of sums — the same unrolled-CTE
    oracle discipline as ``pagerank`` — and leaves the RANKING identical
    (normalization only rescales). ``round_dp`` quantizes both vectors at
    the end of each round so engine summation order cannot compound.

    Normalization is DEFERRED to round end (r9 VERDICT #5): the hub join
    consumes the UNNORMALIZED authority vector — h' is linear in a', so
    dividing both vectors by their L1 totals afterwards reaches the same
    normalized pair — which lets ONE union-aggregate job collect both
    round totals instead of two driver round-trips per round (HITS is
    latency-bound at toy SF: halving the scalar jobs is the win).

    On a bipartite graph (e.g. supplier->customer shipments) hubs rank
    the source side and authorities the destination side — the two-sided
    importance split one PageRank cannot express.

    Scale shape: the edge table persists once; each round is two
    broadcast-or-shuffle equi-joins of edges with the PERSISTED |V|-row
    score vectors, both normalization totals ONE collected 2-row driver
    aggregate (the ``n = nodes.count()`` discipline — bounded driver
    state, and the edge joins never re-execute for the totals); lineage
    truncates every ``truncate_lineage_every`` rounds (the iterative-DAG
    discipline). Returns (node, hub, authority) for every node.
    """
    from helixdb_spark.operators.util import (
        tracked_local_checkpoint,
        unpersist_on_gc,
    )

    w = F.col(weight_col) if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    ).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # one scalar; the score vectors never move
    broadcast_scores = n <= PAGERANK_BROADCAST_NODES

    def _bc(df):
        return F.broadcast(df) if broadcast_scores else df

    def _quant(col):
        if round_dp is None:
            return col
        return F.round(col + F.lit(1e-9), round_dp)

    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auths = None
    cp_handles: list = []
    vec_caches: list = []
    for it in range(iterations):
        if it and truncate_lineage_every and it % truncate_lineage_every == 0:
            hubs = tracked_local_checkpoint(hubs, cp_handles)
        # Each half-round's raw score vector feeds BOTH the normalization
        # total and a join; persist both (|V| rows each) and pull the TWO
        # totals as ONE 2-row driver aggregate over their tagged union —
        # the `n = nodes.count()` discipline, one round-trip per round
        # instead of two (the union job's raw_h stage materializes raw_a's
        # cache through its own lineage). The hub join reads the
        # UNNORMALIZED raw_a: h' is linear in a', so normalizing both
        # vectors at round end yields the same normalized pair.
        raw_a = (
            e.join(_bc(hubs.select(F.col("node").alias("src"), "hub")), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("w") * F.col("hub")).alias("_a"))
            .persist()
        )
        raw_h = (
            e.join(_bc(raw_a.select(F.col("node").alias("dst"), "_a")), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("w") * F.col("_a")).alias("_h"))
            .persist()
        )
        vec_caches.extend((raw_a, raw_h))
        totals = {
            r["_side"]: r["_t"]
            for r in (
                raw_a.select(F.col("_a").alias("_v"), F.lit("a").alias("_side"))
                .unionByName(
                    raw_h.select(
                        F.col("_h").alias("_v"), F.lit("h").alias("_side")
                    )
                )
                .groupBy("_side")
                .agg(F.sum("_v").alias("_t"))
                .collect()  # ONE job; materializes both caches
            )
        }
        # an edgeless graph yields EMPTY raw vectors (no groupBy rows), so
        # neither total exists — divide by null to keep the old behaviour
        # of null scores instead of a driver KeyError
        tot_a = F.lit(totals.get("a"))
        tot_h = F.lit(totals.get("h"))
        auths = nodes.join(raw_a, "node", "left").select(
            "node",
            _quant(F.coalesce("_a", F.lit(0.0)) / tot_a).alias("authority"),
        )
        hubs = nodes.join(raw_h, "node", "left").select(
            "node",
            _quant(F.coalesce("_h", F.lit(0.0)) / tot_h).alias("hub"),
        )
    out = (
        hubs.join(auths, "node")
        .select("node", "hub", "authority")
        .orderBy("node")
    )
    return unpersist_on_gc(out, e, nodes, *vec_caches, *cp_handles)
