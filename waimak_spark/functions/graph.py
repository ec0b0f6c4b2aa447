"""PageRank over the customer-supplier co-purchase graph (Page, Brin,
Motwani & Winograd 1999, Stanford InfoLab TR) — the ITERATIVE-
DISTRIBUTED class of the catalog: each iteration is one join (ranks x
transition edges) + one keyed aggregation — the sparse matrix-vector
product — so at 100 TB the plan is iterations x (shuffle-on-node-id),
with the transition frame persisted once and the rank frame
checkpointed every j iterations (the k-center plan-cut recipe) so plan
depth and cached copies stay O(j).

Determinism recipe: edges are UNDIRECTED (both directions emitted), so
the walk has no dangling nodes and no leaked mass; every iteration's
rank is rounded to PAGERANK_ROUND dp before the next step, which makes
the fixpoint trajectory bit-identical across engines (the per-node
in-neighbor sums differ only in FP addition order, ~1e-16, far inside
the rounding grid) — what licenses the unrolled-CTE DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: damping factor (the classic 0.85)
PAGERANK_D = 0.85
PAGERANK_ITERS = 5
#: per-iteration rounding dp — the cross-engine lockstep grid
PAGERANK_ROUND = 6
#: supplier node ids are offset into their own range so the bipartite
#: node sets cannot collide
SUPP_OFFSET = 1_000_000
#: plan-cut cadence for the rank frame (kcenter recipe).  The cut is a
#: ``localCheckpoint`` — non-reliable by design (ADVICE r11): planning
#: stays O(cadence)-deep, but an executor loss mid-run loses the
#: truncated-lineage blocks and fails the job instead of recomputing.
#: A long cluster run that wants fault tolerance should pass
#: ``materialize=`` (parquet plan-cut) to :func:`pagerank`; the sandbox
#: keeps the cheap cut.
PAGERANK_CHECKPOINT_EVERY = 4
#: broadcast the (node, rank) / (src, out-weight) frames when the graph
#: has at most this many nodes: one ~16-byte row per node, so 4M nodes
#: ≈ 64 MB framed — comfortably inside executor memory and far under
#: Spark's 8 GB broadcast cap; beyond it the loop keeps the shuffle-join
#: plan (the decision reads the ALREADY-COUNTED node total, so it is
#: data-derived and scale-adaptive, not a sandbox tuning).  ADVICE r11:
#: at the cap the per-iteration broadcast BUILD collects ~64 MB of row
#: objects through the driver — well above the 10 MB auto-broadcast
#: default but normal explicit-hint territory (guide §3.1: "a few
#: hundred MB is usually fine"); size the driver accordingly or lower
#: this cap on memory-tight drivers.
PAGERANK_BROADCAST_MAX_NODES = 4_000_000


def _track_ckpt_release(df: DataFrame) -> None:
    """Register a localCheckpoint'd frame's RDD blocks for
    ``release_tracked()`` — the DataFrame cache manager never frees
    them (the k-center/fixpoint hygiene recipe).  Round 12 (ADVICE
    r11): releases the LogicalRDD's backing RDD via
    :func:`~waimak_spark.functions.util.free_ckpt_blocks` — the old
    ``df.rdd.unpersist`` unpersisted a freshly derived javaToPython RDD
    (storage level NONE) and freed nothing."""
    from .cache_registry import track_release
    from .util import free_ckpt_blocks

    track_release(lambda d=df: free_ckpt_blocks(d))


def copurchase_edges(lineitem: DataFrame, orders: DataFrame,
                     materialize=None) -> DataFrame:
    """``(src, dst, w)`` — undirected weighted edges between customers
    and suppliers, weight = number of lineitems linking them (multi-
    edges collapsed); both directions emitted so every node has
    out-degree >= 1 (no dangling mass).

    The collapsed pair frame is PERSISTED before the two-direction
    union: union branches get no common-subexpression elimination, so
    the un-materialized form ran the lineitem⋈orders join + pair
    aggregation once PER BRANCH, and pagerank's out-weight/nodes/
    transition consumers re-ran it again per derivation (event-log
    profile at sf0.1: three ~0.8 s executions of the same join in one
    pagerank run — now one, the rest cache reads)."""
    from .cache_registry import tracked_persist

    mat = materialize or tracked_persist
    half = mat(lineitem.join(orders,
                             lineitem["l_orderkey"] == orders["o_orderkey"])
               .groupBy(F.col("o_custkey").alias("a"),
                        (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("b"))
               .agg(F.count("*").cast("double").alias("w")))
    return (half.select(F.col("a").alias("src"), F.col("b").alias("dst"),
                        "w")
            .unionByName(half.select(F.col("b").alias("src"),
                                     F.col("a").alias("dst"), "w")))


def pagerank(edges: DataFrame, iters: int = PAGERANK_ITERS,
             d: float = PAGERANK_D, materialize=None,
             checkpoint_every: int = PAGERANK_CHECKPOINT_EVERY,
             dst_complete: bool = False) -> DataFrame:
    """``(node, rank)`` after ``iters`` power iterations of the damped
    random walk, each rank rounded to :data:`PAGERANK_ROUND` dp before
    the next step.  ``edges`` must contain every node as a ``src``
    (undirected edge lists do by construction).

    ``dst_complete``: promise that every node ALSO appears as a ``dst``
    (true for any undirected edge list — each node is a dst of its own
    edges).  The per-iteration ``nodes`` left join exists only to hand
    the teleport base rank to in-degree-0 nodes; under the promise that
    set is empty, so the join is skipped — one fewer shuffle join per
    iteration, bit-identical output (locked by
    tests/test_pagerank.py::test_dst_complete_identical_on_undirected).
    Leave False for directed graphs: a source-only node would silently
    vanish from the ranking."""
    if iters < 0:
        raise ValueError(f"iters={iters} must be >= 0")
    if not 0.0 <= d <= 1.0:
        raise ValueError(f"d={d} must be in [0, 1]")
    import math

    from .cache_registry import tracked_persist

    mat = materialize or tracked_persist
    # non-positive weights would divide into zero/negative out-weights
    # and silently leak rank mass through null/negative transition
    # probabilities — drop them up front (a zero-weight edge IS no edge)
    edges = edges.where(F.col("w") > 0)
    # one aggregation over the edge frame, not two: the out-weight
    # frame's key set IS the distinct src set, so `nodes` derives from
    # the persisted aggregate instead of a separate distinct pass
    # (guide §2.4 — the node count, the r0 frame and the transition
    # join all read the same cached k-row result)
    out_w = mat(edges.groupBy("src").agg(F.sum("w").alias("_ow")))
    nodes = out_w.select(F.col("src").alias("node"))
    n = out_w.count()
    if n == 0:
        return edges.sparkSession.createDataFrame(
            [], "node long, rank double")
    # The rank and out-weight frames carry exactly one ~16-byte row per
    # NODE — n is known (just counted), so when they fit comfortably in a
    # broadcast relation the per-iteration matvec becomes one broadcast
    # hash join over the persisted transition frame + one partially-
    # aggregated shuffle of <= n rows, instead of shuffling the (much
    # larger) edge-sized transition frame every iteration.  Past the
    # threshold the original shuffle-join plan is kept — the decision is
    # data-derived, not tuned to the sandbox.
    bounded = n <= PAGERANK_BROADCAST_MAX_NODES
    trans = (edges.join(F.broadcast(out_w) if bounded else out_w, "src")
             .select("src", "dst", (F.col("w") / F.col("_ow")).alias("p")))
    # size the persisted transition frame's partitions to the edge set
    # (the fixpoint-loop sizing recipe): a sandbox-scale graph otherwise
    # pays 32+ near-empty tasks per iteration, while a 100 TB edge set
    # keeps the session layout (the sizing only ever LOWERS the count)
    try:
        default_parts = int(edges.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        default_parts = None
    if default_parts is not None and bounded:
        # bounded => edge rows are countable driver-side at worst n^2 but
        # in practice ~avg-degree*n; approximate by node count (degree
        # >= 1 each) — only used to size tiny graphs, never to grow
        sized = max(4, min(default_parts, math.ceil(n / 500_000)))
        # hash-partition the persisted transition frame by DST: the
        # broadcast-rank matvec's groupBy("dst") distribution is then
        # already satisfied (BroadcastHashJoin preserves the streamed
        # side's partitioning through the projection), so EVERY power
        # iteration runs as a single exchange-free stage — iters
        # exchanges removed for one edge-sized shuffle paid once at
        # build.  Only taken on the bounded/broadcast path: the
        # unbounded plan joins by src, where a dst layout buys nothing.
        trans = trans.repartition(sized, "dst")
    trans = mat(trans)
    r = nodes.select("node",
                     F.round(F.lit(1.0) / F.lit(float(n)),
                             PAGERANK_ROUND).alias("rank"))
    base = (1.0 - d) / float(n)
    prev_cut: DataFrame | None = None
    for t in range(1, iters + 1):
        rk = F.broadcast(r) if bounded else r
        contrib = (trans.join(rk, trans["src"] == rk["node"])
                   .groupBy(trans["dst"].alias("node"))
                   .agg(F.sum(F.col("rank") * F.col("p")).alias("_c")))
        if dst_complete:
            # every node is a dst, so contrib already covers the node
            # set and coalesce can never fire — same expression, no join
            r = contrib.select(
                "node",
                F.round(F.lit(base)
                        + F.lit(d) * F.coalesce("_c", F.lit(0.0)),
                        PAGERANK_ROUND).alias("rank"))
        else:
            r = (nodes.join(F.broadcast(contrib) if bounded else contrib,
                            "node", "left")
                 .select("node",
                         F.round(F.lit(base)
                                 + F.lit(d) * F.coalesce("_c", F.lit(0.0)),
                                 PAGERANK_ROUND).alias("rank")))
        if t < iters and t % checkpoint_every == 0:
            # localCheckpoint, not persist: a cached frame still CARRIES
            # its full logical lineage, so the analyzer/optimizer re-walk
            # the whole t-deep nested iteration tree on every downstream
            # action — event-log profile at sf0.1 showed ~1 s of pure
            # driver planning gap before the checkpoint action at depth
            # 4.  localCheckpoint truncates the logical plan to the
            # materialized RDD (guide: "write + read back, or
            # localCheckpoint, truncates the plan"), so planning stays
            # O(checkpoint_every)-deep however many iterations run.  The
            # rank frame holds one ~16-byte row per node, distributed
            # across executor block managers — no driver collect.
            cut = r.localCheckpoint(eager=True)
            _track_ckpt_release(cut)
            if prev_cut is not None:
                from .util import free_ckpt_blocks

                free_ckpt_blocks(prev_cut)  # superseded cut: free NOW
            prev_cut, r = cut, cut
    return r.orderBy("node")


def copurchase_pagerank_sql(iters: int = PAGERANK_ITERS,
                            d: float = PAGERANK_D) -> str:
    """Unrolled materialized-CTE DuckDB oracle for PageRank over the
    co-purchase graph — iteration r's CTE is the same join+aggregate
    the Spark loop runs, with the identical rounding grid; damping
    coefficients are embedded via ``repr`` so the SQL doubles match the
    Spark literals ((1-d)/N is COMPUTED in both engines, never a
    decimal literal — 1-0.85 is not 0.15 in binary)."""
    dr = repr(float(d))
    ctes = [f"""e0 as (
            select o_custkey as a, {SUPP_OFFSET} + l_suppkey as b,
                   count(*)::DOUBLE as w
            from lineitem join orders on l_orderkey = o_orderkey
            group by 1, 2
        )""",
            """e as materialized (
            select a as src, b as dst, w from e0
            union all
            select b as src, a as dst, w from e0
        )""",
            """ws as (select src, sum(w) as ow from e group by src)""",
            """t as materialized (
            select e.src, e.dst, e.w / ws.ow as p
            from e join ws using (src)
        )""",
            """nd as materialized (select distinct src as node from e)""",
            """r0 as materialized (
            select node,
                   round(1.0 / (select count(*)::DOUBLE from nd), 6)
                       as rank
            from nd
        )"""]
    for r in range(1, iters + 1):
        ctes.append(f"""r{r} as materialized (
            select nd.node,
                   round((1 - {dr}) / (select count(*)::DOUBLE from nd)
                         + {dr} * coalesce(s.c, 0.0), 6) as rank
            from nd left join (
                select t.dst as node, sum(p.rank * t.p) as c
                from t join r{r - 1} p on t.src = p.node
                group by t.dst
            ) s using (node)
        )""")
    return ("with " + ",\n        ".join(ctes)
            + f"\n        select node, rank from r{iters} order by node")