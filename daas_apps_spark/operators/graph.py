"""GR: graph analytics over relational data — fixed-point PageRank.

Complements the connected-components operator (dedup.py k3_dedup_clusters,
min-label propagation with pointer jumping) with the other canonical
iterative graph kernel. The graph is derived relationally: the bipartite
part↔supplier co-occurrence graph of lineitem (an edge per distinct
(partkey, suppkey) pair — who supplies what), undirected, so there are no
dangling nodes and every node has out-degree ≥ 1.

Determinism is the design center: PageRank is usually float-iterated and
therefore association-order-dependent. Here every quantity is fixed-point
BIGINT — rank mass is an integer number of 1e-9 units, per-edge
contributions use integer division (``div`` in Spark, ``//`` in DuckDB,
identical on non-negatives), and the damping multiply runs as
``(85 * mass) div 100``. Integer addition is associative, so the result is
bit-identical across engines, partitionings, and iteration fusion — the
oracle hash-matches the raw fixed-point column with NO rounding discipline
at all. Truncation loses < 1e-9·|E| mass per round (documented, and
irrelevant to ranking).

Reference analogy: the per-iteration shuffle-on-key + aggregate is the
reference's keyed scatter-gather round (SparkCaller.java:245-248), with
the iteration count fixed up front the way its pipeline stages are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.registry import register

PR_SCALE = 1_000_000_000  # 1e-9 fixed-point units of rank mass
PR_ITERS = 3
PR_DAMP_NUM = 85  # damping 0.85 as an exact integer ratio
PR_DAMP_DEN = 100


def _pagerank_oracle() -> str:
    """Unrolled PR_ITERS-iteration fixed-point PageRank in DuckDB SQL."""
    prev = "pr0"
    iters = []
    for i in range(1, PR_ITERS + 1):
        iters.append(f"""
    pr{i} AS (
        SELECT d.node,
               CAST((SELECT tele FROM consts)
                    + ({PR_DAMP_NUM} * COALESCE(inb.m, 0)) // {PR_DAMP_DEN}
                    AS BIGINT) AS pr_fp
        FROM deg d LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(SUM(p.pr_fp // dd.degree) AS BIGINT) AS m
            FROM edges e
            JOIN {prev} p ON p.node = e.src
            JOIN deg dd ON dd.node = e.src
            GROUP BY e.dst
        ) inb ON inb.node = d.node
    )""")
        prev = f"pr{i}"
    return f"""
    WITH pairs AS (
        SELECT DISTINCT 'p' || l_partkey AS pnode, 's' || l_suppkey AS snode
        FROM lineitem
    ),
    edges AS (
        SELECT pnode AS src, snode AS dst FROM pairs
        UNION ALL
        SELECT snode, pnode FROM pairs
    ),
    deg AS (
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM edges GROUP BY src
    ),
    consts AS (
        SELECT ({PR_DAMP_DEN - PR_DAMP_NUM} * CAST({PR_SCALE} AS BIGINT))
               // ({PR_DAMP_DEN} * COUNT(*)) AS tele,
               CAST({PR_SCALE} AS BIGINT) // COUNT(*) AS init
        FROM deg
    ),
    pr0 AS (
        SELECT node, (SELECT init FROM consts) AS pr_fp FROM deg
    ),{",".join(iters)}
    SELECT p.node, d.degree, p.pr_fp,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY pr_fp DESC, node) AS rnk
        FROM {prev}
    ) p JOIN deg d ON d.node = p.node
    WHERE rnk <= 25
    """


@register(
    "gr1_pagerank",
    oracle=_pagerank_oracle(),
    tags=("GR1", "K3", "C1", "D1"),
)
def gr1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the part↔supplier co-occurrence graph:
    3 iterations, damping 0.85, top-25 nodes by final rank mass.

    Each iteration is one shuffle: contributions flow along edges
    (join on src), aggregate by dst, and rebind to the degree table via a
    left join (nodes with no inbound mass keep the teleport term). The
    edge list and degree table are built once; ``localCheckpoint`` after
    the (tiny) derivation is unnecessary since the loop is unrolled into
    a single lazy DAG of fixed depth — iteration count is a compile-time
    constant exactly like the reference's fixed stage list.

    Scale: |edges| = |distinct (part, supplier)| — the shuffles are keyed
    on node id and AQE handles hub skew (a part supplied by everyone) via
    skew-join splitting; for web-scale graphs the unrolled-DAG form would
    switch to an iterated-materialization loop with checkpoints every few
    rounds (the k3_dedup_clusters pattern) to cap lineage depth.
    """
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("pnode"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("snode"),
    ).distinct()
    # edges/deg/esd are consumed every iteration; materialization stops the
    # fact-table distinct re-executing per consumer (sf0.1: 5.5s → ~3.5s
    # warm; the residual loop cost is per-stage scheduling latency, which
    # amortizes at cluster scale). Same localCheckpoint rule as the LSH
    # intermediates (SCALING.md §6); checkpoint-dir at cluster scale.
    edges = (
        pairs.select(F.col("pnode").alias("src"), F.col("snode").alias("dst"))
        .union(pairs.select(F.col("snode").alias("src"), F.col("pnode").alias("dst")))
        .localCheckpoint()
    )
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint()
    )
    consts = deg.agg(
        F.expr(
            f"({PR_DAMP_DEN - PR_DAMP_NUM} * cast({PR_SCALE} as bigint))"
            f" div ({PR_DAMP_DEN} * count(*))"
        ).alias("tele"),
        F.expr(f"cast({PR_SCALE} as bigint) div count(*)").alias("init"),
    )
    # Degree is attached to the edge list ONCE (it never changes), so each
    # iteration is exactly one join + one aggregate; and because the graph
    # is undirected, every node receives inbound mass, so no left-join
    # back to the node set is needed to preserve teleport-only nodes —
    # two fewer stages per round than the naive loop.
    esd = edges.join(
        deg.select(F.col("node").alias("src"), "degree"), "src"
    ).localCheckpoint()
    pr = deg.crossJoin(F.broadcast(consts)).select(
        "node", F.col("init").alias("pr_fp")
    )
    for _ in range(PR_ITERS):
        pr = (
            esd.join(pr.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.expr("pr_fp div degree").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
            .crossJoin(F.broadcast(consts))
            .select(
                "node",
                (
                    F.col("tele")
                    + F.expr(f"({PR_DAMP_NUM} * m) div {PR_DAMP_DEN}")
                ).alias("pr_fp"),
            )
        )
    w = Window.partitionBy().orderBy(F.col("pr_fp").desc(), F.col("node").asc())
    return (
        pr.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 25)
        .join(deg, "node")
        .select("node", "degree", "pr_fp", "rnk")
    )


def _backbone_edges(li: DataFrame) -> DataFrame:
    """Significance-backbone co-supply graph shared by GR2/GR3: suppliers
    adjacent (u < v, undirected-as-ordered-pairs) iff their shared-part
    count clears mean + 2σ of the co-occurrence distribution. Exact
    integer sums feed one pinned float threshold expression, so both
    engines select the identical edge set (see gr2 docstring)."""
    # Per-part supplier sets via collect_set (dedups (pk, sk) in the same
    # shuffle), then MAP-SIDE pair generation from the sorted array — one
    # exchange replaces the distinct + self-join + re-exchange chain of
    # the naive wedge join (identical pair multiset: C(deg, 2) per part
    # either way, and both shapes colocate a part's pairs on one task, so
    # skew is no worse). sort_array pins u < v. Measured sf0.01→0.1
    # growth 1.85x vs 2.24x for the join form — the win compounds with
    # data because the joined pair relation is never shuffled.
    grp = (
        li.select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .groupBy("pk")
        .agg(F.sort_array(F.collect_set("sk")).alias("sks"))
    )
    # co is consumed TWICE (the stats aggregate AND the threshold
    # filter) and Spark has no cross-branch subexpression reuse, so
    # without materialization the whole lineitem→pairs→co pipeline
    # executes twice per backbone evaluation — and once more for
    # every downstream consumer of the returned edges. One
    # localCheckpoint bounds it at one pass per query execution
    # (repaid every run, no cross-run caching); the stored relation
    # is |co-occurring pairs| rows of three ints, the same
    # space-for-CPU trade k3 documents for its shingle relation.
    # The σ-threshold STATS ride that same materialization job as an
    # ``observe`` side output (guide §2.4 — remove the pass outright):
    # the exact integer sums are collected as metrics of the checkpoint
    # action itself, so the separate stats-aggregate job AND its
    # BroadcastExchange disappear from every backbone build. Exactness:
    # a batch observe folds each task's partial exactly once (the
    # scheduler ignores duplicate successful attempts), so the sums
    # equal the old aggregate's. The observed LONGS are re-injected as
    # literals and every cast/divide/sqrt still evaluates in the JVM —
    # the threshold expression tree is unchanged, hence bit-identical
    # edge selection (oracle hash-checked for gr2/gr3/gr4/gr5).
    # Pair rows are PACKED into one BIGINT (u << 32 | v) for the explode
    # and the (u, v) aggregate (guide §2.3 — narrower shuffle rows): the
    # raw pair multiset is ~Σ C(deg, 2) rows and its partial aggregation
    # barely reduces (most pairs are distinct per task), so the exchange
    # carries nearly every generated pair — one 8-byte long instead of a
    # 16-byte two-field row halves those bytes, the HOF emits a primitive
    # array instead of allocating a struct per pair, and the aggregate
    # hashes one long key. Exact iff node ids fit in 31 bits (u < 2^31
    # keeps the packed value positive, v < 2^32 keeps it collision-free):
    # suppkeys are dense non-negative ints — ~1e9 at the 100 TB scale
    # point, 2 orders of magnitude under the bound (a deployment on wider
    # ids densifies them first, the standard graph-engine contract).
    # Unpacking below is exact integer arithmetic, so the edge set is
    # bit-identical to the struct form (oracle-checked gr1–gr5).
    obs = Observation()
    co = (
        grp.select(
            F.explode(
                F.expr(
                    "flatten(transform(sks, (x, i) -> transform("
                    "slice(sks, i + 2, size(sks)), "
                    "y -> shiftleft(x, 32) + y)))"
                )
            ).alias("uv")
        )
        .groupBy("uv")
        .agg(F.count(F.lit(1)).alias("shared"))
        .observe(
            obs,
            F.sum("shared").alias("s"),
            F.sum(F.col("shared") * F.col("shared")).alias("ssq"),
            F.count(F.lit(1)).alias("n"),
        )
        # eager=True is the default, but obs.get BELOW blocks forever if
        # no action runs the observed plan — pin the trigger explicitly
        # so a default change fails loudly instead of hanging (ADVICE r11)
        .localCheckpoint(eager=True)
    )
    m = obs.get
    s = F.lit(m["s"]).cast("double")
    ssq = F.lit(m["ssq"]).cast("double")
    n = F.lit(m["n"]).cast("double")
    thr = s / n + 2.0 * F.sqrt(
        F.greatest((ssq - s * s / n) / n, F.lit(0.0))
    )
    # The returned frame is a NARROW filter over the checkpointed co —
    # consumers no longer need their own edges checkpoint to avoid
    # re-deriving the lineitem subtree.
    return co.filter(F.col("shared").cast("double") > thr).select(
        F.shiftright("uv", 32).alias("u"),
        F.expr("uv & 4294967295").alias("v"),
    )


# The CTE chain producing the identical backbone edge set in DuckDB —
# shared verbatim by the gr2 and gr3 oracles so the two cannot drift.
_BACKBONE_CTE = """
    pairs AS (
        SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
    ),
    co AS (
        SELECT a.sk AS u, b.sk AS v, CAST(COUNT(*) AS BIGINT) AS shared
        FROM pairs a JOIN pairs b
          ON a.pk = b.pk AND a.sk < b.sk
        GROUP BY a.sk, b.sk
    ),
    stats AS (
        SELECT CAST(SUM(shared) AS DOUBLE) AS s,
               CAST(SUM(shared * shared) AS DOUBLE) AS ssq,
               CAST(COUNT(*) AS DOUBLE) AS n
        FROM co
    ),
    edges AS (
        SELECT u, v FROM co, stats
        WHERE CAST(shared AS DOUBLE)
              > s / n + 2.0 * SQRT(GREATEST((ssq - s * s / n) / n, 0.0))
    )"""


@register(
    "gr2_triangle_count",
    oracle=f"""
    WITH {_BACKBONE_CTE},
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT u AS node FROM edges
            UNION ALL
            SELECT v AS node FROM edges
        ) t GROUP BY node
    ),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    per_node AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_count FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) t GROUP BY node
    )
    SELECT d.node AS suppkey,
           d.degree,
           COALESCE(p.tri_count, 0) AS tri_count,
           CAST(d.degree * (d.degree - 1) / 2 AS BIGINT) AS wedge_count,
           CASE WHEN d.degree >= 2
                THEN CAST(COALESCE(p.tri_count, 0) AS DOUBLE)
                     / CAST(d.degree * (d.degree - 1) / 2 AS DOUBLE)
                ELSE 0.0 END AS clustering_coeff
    FROM deg d LEFT JOIN per_node p ON p.node = d.node
    """,
    tags=("GR2", "C11", "D2"),
    bench=True,
)
def gr2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the supplier
    co-supply graph (suppliers adjacent iff their shared-part count clears the
    mean + 2σ significance threshold — the backbone extraction of gr1's
    bipartite projection. A raw co-occurrence projection of a dense
    bipartite graph is near-complete (the sf0.1 fixture yields ALL
    C(1000,2) pairs and 1.66e8 triangles); real co-occurrence analysis
    keeps only significantly-associated pairs, which also keeps the
    triangle space sparse at every scale. The threshold is derived from
    exact integer sums with one pinned float expression, so both engines
    select the identical edge set.)

    Algorithm: compact-forward with DEGREE orientation (Schank & Wagner
    2005; Suri & Vassilvitskii 2011 for the MapReduce bound): every edge
    is oriented from its lower-(degree, id) endpoint upward, each
    triangle is found exactly once as a wedge at its minimum-rank corner
    closed by the third oriented edge, and per-node counts come from
    exploding each triangle to its three corners. The result is
    orientation-invariant, so the id-ordered DuckDB oracle hash-matches.
    Everything is exact integer arithmetic; the only double is the final
    coefficient, an exact-integer division identical under IEEE on both
    engines.

    Scale: the projection join is keyed on partkey — fan-out is bounded
    by per-part supplier multiplicity (TPC-H: ≤ 4; a power-law corpus
    would cap the per-key neighbor list the way k3_ngram_jaccard caps its
    anchor posting lists). The triangle join is the standard distributed
    shape (edge list ⋈ edge list on the shared endpoint, then a hash
    semi-check against the third side); orienting edges low→high bounds
    the join fan-out by out-degree, the same trick MapReduce triangle
    counters (Suri & Vassilvitskii 2011) use to tame skew at web scale.
    """
    # Materialization discipline (§2.4, re-A/B'd each round): the co
    # relation is checkpointed INSIDE _backbone_edges (it cuts the whole
    # lineitem→backbone subtree off every consumer — the AQE-final plan
    # once re-derived it 69 times, 641 nodes, 2.94s at sf0.1), and since
    # the σ-threshold became an observed literal, `edges` is a NARROW
    # filter over that RDD — its own eager checkpoint job cost more than
    # the recompute it saved, so it is gone. `deg` keeps its checkpoint
    # (one groupBy consumed by du, dv and the final join). `oriented` is
    # NOT checkpointed: its consumers re-derive only joins over
    # checkpointed RDDs, which Exchange reuse dedupes inside the one
    # final job (A/B at sf0.1: 3.35s with the ckpt, 2.80s without).
    edges = _backbone_edges(table(spark, sf_dir, "lineitem"))
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint()
    )
    # Degree orientation (compact-forward): re-orient every edge from its
    # lower-(degree, id) endpoint to the higher one, so out-degrees are
    # bounded by O(sqrt(E)) and the wedge join's fan-out is per-node
    # out-degree², not raw degree² — the difference between 31 s and 3 s
    # at sf0.1 on this co-supply graph, and the standard skew bound for
    # web-scale triangle counting.
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias(
                "d_dst"
            ),
        )
    )
    # Wedge enumeration stays the o1⋈o2 SELF-JOIN on src: the two sides
    # are sameResult projections of `oriented`, so ReuseExchange runs
    # ONE exchange and the join stays inside whole-stage codegen. The
    # map-side collect_list alternative (the gr4/k3 shape) was A/B'd
    # this round and measured ~5% SLOWER here (2.27 vs 2.16 at sf0.1):
    # gr2 keeps wedges keyed by their midpoint for the (b, c) closing
    # join anyway, so the aggregate saves no downstream exchange and
    # its ObjectHashAggregate breaks the codegen span the join keeps.
    # (gr4 is the opposite case: its pair aggregate IS the next keyed
    # step, so the agg form wins there — see _gr4_impl.)
    o1 = oriented.select(
        "src", F.col("dst").alias("b"), F.col("d_dst").alias("db")
    )
    o2 = oriented.select(
        "src", F.col("dst").alias("c"), F.col("d_dst").alias("dc")
    )
    wedge_order = (F.col("db") < F.col("dc")) | (
        (F.col("db") == F.col("dc")) & (F.col("b") < F.col("c"))
    )
    wedges = o1.join(o2, "src").filter(wedge_order)
    e3 = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedges.join(e3, ["b", "c"]).select(
        F.col("src").alias("a"), "b", "c"
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_count"))
    )
    wedge_count_col = (F.col("degree") * (F.col("degree") - 1) / 2).cast("long")
    return (
        deg.join(per_node, "node", "left")
        .select(
            F.col("node").alias("suppkey"),
            "degree",
            F.coalesce("tri_count", F.lit(0)).alias("tri_count"),
            wedge_count_col.alias("wedge_count"),
            F.when(
                F.col("degree") >= 2,
                F.coalesce("tri_count", F.lit(0)).cast("double")
                / wedge_count_col.cast("double"),
            )
            .otherwise(0.0)
            .alias("clustering_coeff"),
        )
    )


GR3_MAX_HOPS = 4


@register(
    "gr3_bfs_hops",
    oracle=f"""
    WITH RECURSIVE {_BACKBONE_CTE},
    adj AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v, u FROM edges
    ),
    src0 AS (SELECT MIN(u) AS s FROM edges),
    walk AS (
        SELECT s AS node, 0 AS hop FROM src0
        UNION
        SELECT a.dst, w.hop + 1
        FROM walk w JOIN adj a ON a.src = w.node
        WHERE w.hop < {GR3_MAX_HOPS}
    ),
    dist AS (
        SELECT node, MIN(hop) AS hop FROM walk GROUP BY node
    )
    SELECT CAST(hop AS INTEGER) AS hop,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(node) AS min_node,
           MAX(node) AS max_node
    FROM dist GROUP BY hop
    """,
    tags=("GR3", "GR2", "K3"),
)
def gr3_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop BFS reachability census from the lowest-id supplier in
    the GR2 significance-backbone co-supply graph: per-hop node counts
    (with min/max node ids as witnesses) out to GR3_MAX_HOPS. This is the
    iterative frontier-expansion kernel — the shortest-path/k-hop
    neighborhood primitive that sits under "blast radius" and influence
    queries — expressed as unrolled rounds of (frontier ⋈ adjacency)
    de-duplicated against the visited set, the same fixed-depth unrolled
    DAG discipline as gr1's PageRank loop. Hop labels are exact minimum
    distances (a node is excluded from later frontiers via left-anti
    against visited), so the census hash-matches DuckDB's WITH RECURSIVE
    UNION-distinct walk with no rounding discipline at all.

    Scale: each round shuffles |frontier| × avg-degree candidate edges
    keyed on node id — the textbook distributed BFS (Pregel's
    message-passing round as a join). The visited set joins as left-anti
    on node id; AQE broadcast-converts it while the frontier is small.
    At web scale the unrolled form switches to an iterated-checkpoint
    loop with frontier-size-driven termination (k3_dedup_clusters
    pattern); diameter-bounded hop counts keep state linear in |V|.
    """
    edges = _backbone_edges(table(spark, sf_dir, "lineitem")).localCheckpoint()
    adj = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).union(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    src0 = edges.agg(F.min("u").alias("node"))
    visited = src0.select("node", F.lit(0).alias("hop"))
    frontier = visited
    for i in range(1, GR3_MAX_HOPS + 1):
        nxt = (
            adj.join(
                frontier.select(F.col("node").alias("src")), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(i).alias("hop"))
            .localCheckpoint()
        )
        visited = visited.union(nxt)
        frontier = nxt
    return visited.groupBy("hop").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


GR4_TOP = 25


def gr4_link_prediction_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction over the GR2 backbone: for every NON-adjacent
    supplier pair with at least one common neighbor, the common-neighbor
    count and neighborhood Jaccard |Γu∩Γv| / |Γu∪Γv| — the classic
    local-similarity predictors (Liben-Nowell & Kleinberg 2003) behind
    "suppliers likely to co-supply next". Top-25 under a total order.

    The candidate space is the 2-hop wedge join (same shape as GR2's
    triangle wedges) minus existing edges via left-anti — never all
    pairs; scores are exact integers and one exact-integer IEEE division
    (Adamic-Adar is deliberately absent: its Σ 1/log(deg) float
    accumulation is association-order-dependent — the t14 regr_* rule).

    Scale: wedge fan-out is bounded by per-node degree in the
    significance backbone (the threshold keeps it sparse at every
    scale); the anti-join is keyed on the pair. Degree attach is two
    small joins against the |V|-row degree table. The candidate space
    grows Σ deg(mid)² — the engine's worst scaling line — so
    ``mid_degree_cap`` is the declared escape valve: drop wedge
    MIDPOINTS above the cap before wedge generation (a hub that
    co-supplies with thousands of suppliers predicts little — every
    pair through it shares that hub, the classic stop-word analogy),
    bounding the candidate space at cap·|V| wedges. None (this exact default) has no candidate
    bound; ``test_gr4_mid_degree_cap_*`` pins that a cap at/above the
    max degree is a no-op and that capping only ever shrinks
    candidates.

    RETIRED from the registry (round 8, per the round-7 verdict): the
    exact form's Σ deg(mid)² candidate growth measured 2.74×/decade on
    SCALING_CURVE — not a plan one would run at 100× the data, and no
    per-midpoint bound can keep EXACT top-k without enumerating the
    hub pairs that are the blowup (a pair connected only through hubs
    can still rank first). ``gr4_capped`` is the declared GR4 form
    (SURVEY §2.2); this function stays as the unregistered reference
    the cap-equivalence tests compare against.
    """
    return _gr4_impl(spark, sf_dir, mid_degree_cap=None)


def _gr4_impl(
    spark: SparkSession, sf_dir: str, mid_degree_cap: int | None
) -> DataFrame:
    # Materialization discipline (§2.4, re-A/B'd): only co (inside
    # _backbone_edges) is checkpointed — edges became a narrow filter
    # over that RDD when the σ-threshold turned into an observed
    # literal, and the wedge self-join below became a map-side pair
    # aggregate with a SINGLE consumer, so the old edges/wedge_adj
    # eager-checkpoint jobs cost more than the recompute they saved.
    # adj/deg recompute from the co RDD with Exchange reuse inside the
    # one final job.
    edges = _backbone_edges(table(spark, sf_dir, "lineitem"))
    adj = edges.select(F.col("u").alias("a"), F.col("v").alias("b")).union(
        edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    if mid_degree_cap is not None:
        low_deg_mids = deg.filter(F.col("degree") <= mid_degree_cap).select(
            F.col("node").alias("b")
        )
        # cap applies to the MIDPOINT side only: adjacency rows whose
        # wedge-center endpoint is a super-hub are dropped before wedge
        # generation; endpoint degrees (dg_u/dg_v) stay exact. Dropping
        # hubs BEFORE the neighbor-set aggregate also bounds every
        # collected array at mid_degree_cap elements.
        wedge_adj = adj.join(low_deg_mids, "b", "left_semi")
    else:
        wedge_adj = adj
    # Candidate pairs via MAP-SIDE pair generation from each midpoint's
    # sorted neighbor set (the _backbone_edges / k3 band shape, §2.3):
    # one groupBy(b) replaces the x⋈y self-join — two shuffles of the
    # adjacency plus a join become one aggregate plus an in-task
    # explode. Pair multiset identical: the neighbors of a midpoint are
    # distinct, sort_array pins u < v, and `common` still counts one row
    # per (pair, midpoint). Skew posture unchanged — a midpoint's pairs
    # were already colocated on one task by the join's hash partitioning,
    # and the capped form bounds every array (hence every task's explode)
    # at cap neighbors / C(cap, 2) pairs.
    # Pairs packed into one BIGINT through the explode + aggregate, same
    # trade (and same 31-bit id contract) as _backbone_edges.
    cand = (
        wedge_adj.groupBy("b")
        .agg(F.sort_array(F.collect_set("a")).alias("ns"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ns, (x, i) -> transform("
                    "slice(ns, i + 2, size(ns)), "
                    "y -> shiftleft(x, 32) + y)))"
                )
            ).alias("uv")
        )
        .groupBy("uv")
        .agg(F.count(F.lit(1)).alias("common"))
        .select(
            F.shiftright("uv", 32).alias("u"),
            F.expr("uv & 4294967295").alias("v"),
            "common",
        )
    )
    nonedge = cand.join(edges, ["u", "v"], "left_anti")
    scored = (
        nonedge.join(
            deg.select(F.col("node").alias("u"), F.col("degree").alias("dg_u")),
            "u",
        )
        .join(
            deg.select(F.col("node").alias("v"), F.col("degree").alias("dg_v")),
            "v",
        )
        .select(
            "u",
            "v",
            "common",
            (
                F.col("common").cast("double")
                / (F.col("dg_u") + F.col("dg_v") - F.col("common")).cast(
                    "double"
                )
            ).alias("nbr_jaccard"),
        )
    )
    # Top-25 via orderBy().limit() — Catalyst compiles this to
    # TakeOrderedAndProject (per-partition bounded heaps, merged on the
    # driver), so the full candidate set is NEVER funneled through one
    # partition the way an unpartitioned row_number window would. rnk is
    # then derived with a window over the 25-row result only.
    topk = scored.orderBy(
        F.col("common").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(GR4_TOP)
    w = Window.partitionBy().orderBy(
        F.col("common").desc(), F.col("u").asc(), F.col("v").asc()
    )
    return topk.withColumn("rnk", F.row_number().over(w))


# Swept 16/24/32/48 at sf0.01→0.1 (round 5): absolute time falls
# monotonically with the cap (−27% at 16 vs 48) and the backbone DENSIFIES
# superlinearly with data (Σdeg² grew 1570 → 1.4M across one decade), so
# the tightest cap that keeps ranking quality is the scale posture. 16
# stays above the sf0.01 max degree (14) — a no-op at the driver's
# correctness SF — while bounding wedge work hardest where density grows.
GR4_MID_DEGREE_CAP = 16


@register(
    "gr4_capped",
    oracle=f"""
    WITH {_BACKBONE_CTE},
    adj AS (
        SELECT u AS a, v AS b FROM edges
        UNION ALL
        SELECT v, u FROM edges
    ),
    deg AS (
        SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM adj GROUP BY a
    ),
    wadj AS (
        SELECT adj.a, adj.b FROM adj
        JOIN deg ON deg.node = adj.b
        WHERE deg.degree <= {GR4_MID_DEGREE_CAP}
    ),
    cand AS (
        SELECT x.a AS u, y.a AS v, CAST(COUNT(*) AS BIGINT) AS common
        FROM wadj x JOIN wadj y ON y.b = x.b AND x.a < y.a
        GROUP BY x.a, y.a
    ),
    nonedge AS (
        SELECT c.u, c.v, c.common
        FROM cand c LEFT JOIN edges e ON e.u = c.u AND e.v = c.v
        WHERE e.u IS NULL
    )
    SELECT u, v, common,
           CAST(common AS DOUBLE)
               / CAST(dg_u + dg_v - common AS DOUBLE) AS nbr_jaccard,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT n.*, du.degree AS dg_u, dv.degree AS dg_v,
               ROW_NUMBER() OVER (ORDER BY common DESC, u, v) AS rnk
        FROM nonedge n
        JOIN deg du ON du.node = n.u
        JOIN deg dv ON dv.node = n.v
    )
    WHERE rnk <= {GR4_TOP}
    """,
    tags=("GR4", "GR2", "K4"),
    bench=True,
)
def gr4_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE declared GR4 form (since round 8): link prediction with the
    ``mid_degree_cap`` escape valve ON — the form you'd actually run at
    100 TB, oracle-checked with the cap mirrored in the SQL. The exact
    form (``gr4_link_prediction_exact``, retired from the registry —
    see its docstring for the rationale) remains the unregistered
    reference the cap-equivalence tests compare against.

    The exact form's candidate space grows Σ deg(mid)² (the engine's
    worst scaling line); capping wedge MIDPOINTS at degree ≤
    GR4_MID_DEGREE_CAP before wedge generation bounds it at cap·|V|
    wedges — and bounds every collected neighbor array at cap elements
    — turning the quadratic hub blow-up into a linear term. A hub
    that co-supplies with thousands of suppliers predicts little — every
    pair through it shares that hub (the stop-word analogy) — so the cap
    changes rankings only where the signal was weakest. Endpoint degrees
    (dg_u/dg_v) stay EXACT: only candidate generation is capped, the
    Jaccard denominators are not.

    The DuckDB oracle mirrors the cap with the same degree filter on
    the wedge-adjacency CTE (midpoint = the ``b`` column on both sides
    of its x⋈y wedge join — the same pair multiset the Spark plan now
    explodes map-side from each midpoint's sorted neighbor set), so the
    capped result is hash-matchable — "the form you run at scale is the
    form the oracle checks"."""
    return _gr4_impl(spark, sf_dir, mid_degree_cap=GR4_MID_DEGREE_CAP)


GR5_MAX_ITERS = 12


@register(
    "gr5_component_census",
    oracle=f"""
    WITH RECURSIVE {_BACKBONE_CTE},
    adj AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v, u FROM edges
    ),
    nodes AS (SELECT DISTINCT src AS node FROM adj),
    reach AS (
        SELECT node, node AS lbl FROM nodes
        UNION
        SELECT a.dst AS node, r.lbl
        FROM reach r JOIN adj a ON a.src = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
    SELECT component,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(node) AS min_node,
           MAX(node) AS max_node
    FROM comp GROUP BY component
    """,
    tags=("GR5", "GR3", "K3"),
)
def gr5_component_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component census of the GR2 backbone: every node
    labeled with the minimum node id reachable from it (min-label
    propagation — the same kernel k3_dedup_clusters runs on the
    near-dup graph, here on the supplier graph), collapsed to a
    per-component size census. The labels are exact integers, so the
    census hash-matches DuckDB's WITH RECURSIVE reachability closure
    with no discipline.

    The loop is CONVERGENCE-DRIVEN (iterate until no label changes, the
    GraphFrames/Pregel form) with GR5_MAX_ITERS as a safety bound only:
    each round materializes the |V|-row label table through a RELIABLE
    checkpoint (a named checkpoint directory, not executor-local blocks)
    and counts changed labels — zero changes ends the loop. Reliable
    checkpoints are the 100 TB discipline: an iterate-to-convergence
    lineage survives executor loss and is truncated every round, so
    round N's plan never re-derives rounds 1..N-1. An explicit
    post-verification (no edge may straddle two labels) still guards the
    safety bound — raising beats silently wrong labels.

    Scale: each round is one join + one aggregate keyed on node id;
    rounds needed = O(log diameter) via pointer jumping, and the
    convergence count is an action over the |V|-row label table — cheap
    relative to the edge join it gates.
    """
    from daas_apps_spark.sources.io import scratch_dir

    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(scratch_dir("gr5_checkpoints"))
    edges = _backbone_edges(table(spark, sf_dir, "lineitem")).localCheckpoint()
    adj = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).union(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).localCheckpoint()
    labels = adj.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    converged = False
    for _ in range(GR5_MAX_ITERS):
        nbr_min = (
            adj.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce("nbr_lbl", F.col("lbl"))).alias(
                "lbl"
            ),
        )
        # pointer jumping (label <- label-of-label): labels are node ids,
        # so chasing one hop per round makes the loop cover components of
        # diameter ~2^rounds, not rounds — the k3-clusters kernel's trick.
        lab_of = stepped.select(
            F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")
        )
        new_labels = (
            stepped.join(lab_of, "lbl", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce("lbl2", F.col("lbl"))
                ).alias("lbl"),
            )
            .checkpoint()  # reliable: truncates lineage AND survives executor loss
        )
        n_changed = (
            new_labels.join(
                labels.withColumnRenamed("lbl", "prev_lbl"), "node"
            )
            .filter(F.col("lbl") != F.col("prev_lbl"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            converged = True
            break
    if not converged:
        # safety bound hit without a fixed point — verify before trusting
        la = labels.select(F.col("node").alias("src"), F.col("lbl").alias("la"))
        lb = labels.select(F.col("node").alias("dst"), F.col("lbl").alias("lb"))
        crossing = (
            adj.join(la, "src").join(lb, "dst").filter(F.col("la") != F.col("lb"))
        )
        if crossing.limit(1).count() > 0:
            raise RuntimeError(
                f"gr5_component_census: not converged after {GR5_MAX_ITERS} rounds"
            )
    return labels.groupBy(F.col("lbl").alias("component")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )
