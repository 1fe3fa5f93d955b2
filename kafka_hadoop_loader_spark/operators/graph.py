"""Graph analytics over the relational fixtures: weighted PageRank and
multi-source BFS reachability, both as iterative DataFrame loops.

The graph is the international trade network implied by the star
schema: a directed edge (customer nation → supplier nation) per
lineitem, weighted by shipment count.  Iterative graph algorithms are
the one class the reference loader could never touch and that Spark
expresses as a driver-side *loop over lazy DataFrame transforms* — each
iteration is a join + aggregate appended to the logical plan, no data
ever returns to the driver (contrast dedup_clusters, which needs a
convergence check per round; here the iteration count is fixed, so the
whole unrolled computation is ONE Catalyst plan).

Cross-engine determinism: ranks and distances live on an integer grid
(rank scaled ×1e6, damping applied as 85/100 integer ops) — every
engine computes bit-identical BIGINTs, no float drift after 3
iterations.  The DuckDB oracles unroll the same three iterations as
chained CTEs.

Scale: edges are a groupBy of the fact join (|nations|² ≤ 625 rows here,
|V|+|E| generally); each PageRank iteration is one shuffle on dst.  At
100 TB the same loop runs with edges partitioned by src and ranks
broadcast when |V| is small — or both sides hash-partitioned on the
join key when |V| is huge, which is exactly Pregel's layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import spread, table
from kafka_hadoop_loader_spark.registry import register

_R0 = 1_000_000  # initial rank, ×1e6 fixed-point


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed weighted edges: (cust_nation → supp_nation, shipments)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            c["c_nationkey"].alias("src"),
            s["s_nationkey"].alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )


_EDGES_SQL = """
        edges AS (
            SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY src, dst
        ),
        outw AS (
            SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src
        )
"""


def _pagerank_iter_sql(prev: str, cur: str) -> str:
    return f"""
        {cur} AS (
            SELECT n.n_nationkey AS node,
                   CAST(150000 + (85 * COALESCE(SUM((p.r * e.w) // o.ow), 0)) // 100
                        AS BIGINT) AS r
            FROM nation n
            LEFT JOIN edges e ON e.dst = n.n_nationkey
            LEFT JOIN outw o ON o.src = e.src
            LEFT JOIN {prev} p ON p.node = e.src
            GROUP BY n.n_nationkey
        )
"""


@register(
    "graph_pagerank",
    oracle=f"""
        WITH {_EDGES_SQL.strip()},
        r0 AS (
            SELECT n_nationkey AS node, CAST({_R0} AS BIGINT) AS r FROM nation
        ),
        {_pagerank_iter_sql("r0", "r1").strip()},
        {_pagerank_iter_sql("r1", "r2").strip()},
        {_pagerank_iter_sql("r2", "r3").strip()}
        SELECT n.n_name AS nation, r3.r AS rank_scaled
        FROM r3 JOIN nation n ON n.n_nationkey = r3.node
        ORDER BY rank_scaled DESC, nation
    """,
    doc="""Weighted PageRank (3 fixed iterations, damping 0.85) over the
    customer-nation → supplier-nation trade graph.  Each iteration:
    contribution = (rank × edge_weight) DIV node_out_weight per edge,
    re-aggregated on dst, then damped as 150000 + 85·Σ DIV 100 — all on
    the ×1e6 fixed-point integer grid, so three chained iterations stay
    bit-identical across engines (float PageRank would drift by
    summation order).  Nodes with no in-edges settle at the teleport
    mass.  The oracle unrolls the identical three iterations as CTEs.

    Plan shape: the Python loop appends join+agg per iteration to ONE
    lazy plan — no driver action inside the loop; AQE broadcasts the
    25-row rank side of each join.  This is the fixed-iteration Pregel
    pattern (contrast dedup_clusters' converge-and-check loop).""",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    # LAZY cuts: edges is referenced by outw AND ew; ew by all 3
    # iterations.  Without them the 4-way fact join re-executed per
    # reference (58 scans in the r13 plan audit, zero reuse).
    edges = _trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = edges.join(outw, "src").localCheckpoint(eager=False)
    ranks = nation.select(
        F.col("n_nationkey").alias("node"), F.lit(_R0).cast("long").alias("r")
    )
    for _ in range(3):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select("dst", F.expr("(r * w) DIV ow").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("sc"))
        )
        ranks = (
            nation.select(F.col("n_nationkey").alias("node"))
            .join(contrib, F.col("node") == contrib.dst, "left")
            .select(
                "node",
                F.expr("150000 + (85 * COALESCE(sc, 0)) DIV 100").alias("r"),
            )
        )
    return (
        ranks.join(nation, ranks.node == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("r").alias("rank_scaled"))
        .orderBy(F.col("rank_scaled").desc(), "nation")
    )


def _bfs_iter_sql(prev: str, cur: str) -> str:
    return f"""
        {cur} AS (
            SELECT node, MIN(d) AS d FROM (
                SELECT node, d FROM {prev}
                UNION ALL
                SELECT e.dst AS node, p.d + 1 AS d
                FROM {prev} p JOIN edges e ON e.src = p.node
            ) u GROUP BY node
        )
"""


@register(
    "graph_bfs_hops",
    oracle=f"""
        WITH {_EDGES_SQL.strip()},
        seeds AS (
            SELECT n_nationkey AS node, CAST(0 AS BIGINT) AS d
            FROM nation WHERE n_name IN ('NATION_0', 'NATION_7')
        ),
        {_bfs_iter_sql("seeds", "b1").strip()},
        {_bfs_iter_sql("b1", "b2").strip()},
        {_bfs_iter_sql("b2", "b3").strip()}
        SELECT n.n_name AS nation,
               b.d AS hops
        FROM nation n JOIN b3 b ON b.node = n.n_nationkey
        ORDER BY hops, nation
    """,
    doc="""Multi-source BFS: hop distance (≤3) from the seed nations
    {NATION_0, NATION_7} through the directed trade graph, via
    iterative min-distance relaxation — frontier ∪ one-hop expansion,
    MIN(d) per node each round.  Distances are small integers; MIN is
    order-independent, so the result is engine-exact with the unrolled
    oracle.  Unreached nations are absent (inner join at the end).

    The relaxation keeps the FULL visited set each round rather than a
    delta frontier — one groupBy per iteration, no driver-side
    convergence test, one lazy plan; at billion-edge scale you switch
    to delta frontiers + an early-exit count check per round (the
    dedup_clusters pattern).""",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    edges = _trade_edges(spark, sf_dir).select("src", "dst")
    reach = nation.where(F.col("n_name").isin("NATION_0", "NATION_7")).select(
        F.col("n_nationkey").alias("node"), F.lit(0).cast("long").alias("d")
    )
    for _ in range(3):
        expanded = reach.join(edges, reach.node == edges.src).select(
            F.col("dst").alias("node"), (F.col("d") + 1).alias("d")
        )
        reach = (
            reach.unionAll(expanded).groupBy("node").agg(F.min("d").alias("d"))
        )
    return (
        reach.join(nation, reach.node == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("d").alias("hops"))
        .orderBy("hops", "nation")
    )


@register(
    "graph_triangles",
    oracle=f"""
        WITH edges AS (
            SELECT c.c_nationkey AS src, s.s_nationkey AS dst
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY src, dst
        ),
        und AS (
            SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
            FROM edges WHERE src <> dst
        ),
        tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM und e1
            JOIN und e2 ON e2.u = e1.v
            JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        nodes AS (
            SELECT unnest([a, b, c]) AS node FROM tri
        )
        SELECT n.n_name AS nation,
               CAST(COALESCE(t.cnt, 0) AS BIGINT) AS n_triangles
        FROM nation n
        LEFT JOIN (SELECT node, COUNT(*) AS cnt FROM nodes GROUP BY node) t
          ON t.node = n.n_nationkey
        ORDER BY n_triangles DESC, nation
    """,
    doc="""Triangle counting over the undirected trade graph — the
    clustering-coefficient numerator and the canonical 'join explosion
    under control' graph query.  The trick that makes it scale: edges
    are canonicalized to u < v and the wedge join enforces u < v < w,
    so each triangle is found exactly once and the join frontier is
    1/6th of the naive all-orientations size; the second join hits the
    same (tiny, broadcastable) edge list.  At real graph scale this is
    the same plan over an edge table pre-partitioned by u, with the
    degree-ordering refinement (orient edges low-degree -> high-degree)
    bounding the wedge count.  Per-nation participation counts, zeros
    kept via left join.""",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    e = (
        _trade_edges(spark, sf_dir)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
        )
    )
    nodes = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    cnt = nodes.groupBy("node").agg(F.count("*").alias("cnt"))
    return (
        nation.join(cnt, nation.n_nationkey == cnt.node, "left")
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_triangles"),
        )
        .orderBy(F.col("n_triangles").desc(), "nation")
    )


@register(
    "sql_recursive_reach",
    oracle="""
        WITH RECURSIVE edges AS (
            SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            WHERE c.c_nationkey <> s.s_nationkey
        ),
        reach(node, hop) AS (
            SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS hop
            UNION ALL
            SELECT CAST(e.dst AS BIGINT), r.hop + 1
            FROM reach r JOIN edges e ON e.src = r.node
            WHERE r.hop < 2
        )
        SELECT n.n_name AS nation,
               CAST(MIN(r.hop) AS BIGINT) AS min_hops,
               CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM reach r JOIN nation n ON n.n_nationkey = r.node
        GROUP BY nation
        ORDER BY min_hops, nation
    """,
    doc="""Recursive CTE (Spark 4 WITH RECURSIVE): bounded transitive
    closure of the trade graph from nation 0 — min-hop distance and
    path multiplicity within 2 hops, expressed in the SQL-native
    recursive form instead of the hand-unrolled iteration
    graph_bfs_hops uses.  The recursion is depth-bounded by the hop
    predicate (the engine-independent way to terminate on a cyclic
    graph) and each step is a join against the (deduplicated,
    broadcastable) edge list.  Executed through spark.sql over temp
    views — the second operator exercising the SQL parser path
    end-to-end.  Scale: each recursive step is one ordinary hash join;
    frontier size, not total graph size, bounds the working set.""",
)
def sql_recursive_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    _trade_edges(spark, sf_dir).where(F.col("src") != F.col("dst")).select(
        "src", "dst"
    ).distinct().createOrReplaceTempView("khl_rec_edges")
    table(spark, sf_dir, "nation").createOrReplaceTempView("khl_rec_nation")
    return spark.sql("""
        WITH RECURSIVE reach(node, hop) AS (
            SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS hop
            UNION ALL
            SELECT CAST(e.dst AS BIGINT), r.hop + CAST(1 AS BIGINT)
            FROM reach r JOIN khl_rec_edges e ON e.src = r.node
            WHERE r.hop < 2
        )
        SELECT n.n_name AS nation,
               CAST(MIN(r.hop) AS BIGINT) AS min_hops,
               CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM reach r JOIN khl_rec_nation n ON n.n_nationkey = r.node
        GROUP BY n.n_name
        ORDER BY min_hops, nation
    """)


@register(
    "nation_trade_balance",
    oracle="""
        WITH flows AS (
            SELECT c.c_nationkey AS cust_n, s.s_nationkey AS supp_n,
                   SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                       AS rev_c
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            WHERE c.c_nationkey <> s.s_nationkey
            GROUP BY cust_n, supp_n
        ),
        exp AS (
            SELECT supp_n AS nk, CAST(SUM(rev_c) AS BIGINT) AS exports_c
            FROM flows GROUP BY supp_n
        ),
        imp AS (
            SELECT cust_n AS nk, CAST(SUM(rev_c) AS BIGINT) AS imports_c
            FROM flows GROUP BY cust_n
        )
        SELECT n.n_name AS nation,
               CAST(COALESCE(e.exports_c, 0) AS DOUBLE) / 100.0 AS exports,
               CAST(COALESCE(i.imports_c, 0) AS DOUBLE) / 100.0 AS imports,
               CAST(COALESCE(e.exports_c, 0) - COALESCE(i.imports_c, 0)
                    AS DOUBLE) / 100.0 AS balance
        FROM nation n
        LEFT JOIN exp e ON e.nk = n.n_nationkey
        LEFT JOIN imp i ON i.nk = n.n_nationkey
        ORDER BY nation
    """,
    doc="""Trade balance per nation: cross-border revenue where the
    nation supplies (exports) vs consumes (imports), and the net — the
    economics-view closure over the same trade graph PageRank/BFS/
    triangles traverse topologically.  Domestic flows are excluded
    (they're neither).  Exact cents throughout; the balance is an
    integer difference cast once.  The flow matrix is |nations|² rows,
    so both roll-ups and the nation joins are broadcast-scale no
    matter the fact volume.""",
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    flows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("cust_n"),
            F.col("s_nationkey").alias("supp_n"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "rev_c"
            )
        )
    )
    exp = flows.groupBy(F.col("supp_n").alias("nk")).agg(
        F.sum("rev_c").alias("exports_c")
    )
    imp = flows.groupBy(F.col("cust_n").alias("nk")).agg(
        F.sum("rev_c").alias("imports_c")
    )
    return (
        n.join(F.broadcast(exp), n.n_nationkey == exp.nk, "left")
        .join(F.broadcast(imp), n.n_nationkey == imp.nk, "left")
        .select(
            F.col("n_name").alias("nation"),
            (F.coalesce("exports_c", F.lit(0)).cast("double") / 100.0).alias(
                "exports"
            ),
            (F.coalesce("imports_c", F.lit(0)).cast("double") / 100.0).alias(
                "imports"
            ),
            (
                (
                    F.coalesce("exports_c", F.lit(0))
                    - F.coalesce("imports_c", F.lit(0))
                ).cast("double")
                / 100.0
            ).alias("balance"),
        )
        .orderBy("nation")
    )


# --- Connected components: alternating large-star / small-star ---------
#
# The MapReduce-native CC algorithm (Kiveris et al., "Connected
# Components in MapReduce and Beyond", SoCC'14) and the verdict-named
# 100 TB upgrade over dedup_clusters' hash-min propagation: alternating
# large-star / small-star rounds converge in O(log^2 n) rounds
# regardless of component diameter, where hash-min needs O(diameter).
# Each phase is one groupBy-min + one join — pure integer ops, so the
# unrolled computation is engine-exact and the DuckDB oracle replays
# the identical rounds as chained CTEs (the pagerank pattern).
#
# Graph: parts co-purchased in >= 2 DISTINCT orders ("product
# families" — COUNT(DISTINCT orderkey), so a part repeated on two
# lineitems of one order does not fabricate support).  Measured
# rounds-to-fixpoint on the fixtures: 3 (sf0.001), 5 (sf0.01),
# 4 (sf0.1) — _CC_ROUNDS = 6 leaves spare rounds, and
# tests/test_llm_ops.py asserts the 6-round labels equal a union-find
# ground truth on the same edge definition.

_CC_ROUNDS = 6
_CC_MIN_SUPPORT = 2

_CC_EDGES_SQL = f"""
        pairs AS (
            SELECT a.l_partkey AS u, b.l_partkey AS v,
                   a.l_orderkey AS okey
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        ),
        e0 AS MATERIALIZED (
            SELECT u, v FROM pairs
            GROUP BY u, v
            HAVING COUNT(DISTINCT okey) >= {_CC_MIN_SUPPORT}
        )
"""


def _cc_round_sql(prev: str, cur: str) -> str:
    """One large-star + small-star round over canonical (u < v) pairs."""
    return f"""
        {cur}_sym AS MATERIALIZED (
            SELECT u, v FROM {prev}
            UNION ALL
            SELECT v AS u, u AS v FROM {prev}
        ),
        {cur}_lmin AS MATERIALIZED (
            SELECT u, LEAST(MIN(v), u) AS m FROM {cur}_sym GROUP BY u
        ),
        {cur}_ls AS MATERIALIZED (
            SELECT DISTINCT l.m AS u, s.v AS v
            FROM {cur}_sym s JOIN {cur}_lmin l ON s.u = l.u
            WHERE s.v > s.u
        ),
        {cur}_smin AS MATERIALIZED (
            SELECT v AS hi, MIN(u) AS m FROM {cur}_ls GROUP BY v
        ),
        {cur} AS MATERIALIZED (
            SELECT DISTINCT m AS u, x AS v FROM (
                SELECT s.m AS m, l.u AS x
                FROM {cur}_ls l JOIN {cur}_smin s ON l.v = s.hi
                UNION ALL
                SELECT s.m AS m, s.hi AS x FROM {cur}_smin s
            ) WHERE x <> m
        )
"""


_CC_ROUNDS_SQL = ",".join(
    _cc_round_sql(f"e{i}", f"e{i + 1}").strip() for i in range(_CC_ROUNDS)
)


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (u < v) part pairs co-purchased in >= _CC_MIN_SUPPORT
    DISTINCT orders — the shared graph for graph_connected_components
    and graph_label_propagation (the Spark mirror of _CC_EDGES_SQL;
    test_lpa_communities_nest_inside_components relies on both
    operators seeing the identical edge set).  Ends in a LAZY
    localCheckpoint: both consumers reference it repeatedly."""
    # dedup (orderkey, partkey) BEFORE the self-join: afterwards each
    # (order, u, v) appears exactly once, so the support count is a
    # plain count(*) instead of a countDistinct (which plans an extra
    # distinct-aggregate pass over the joined pairs).  Same edge set —
    # verified row-for-row at sf0.1 — with fewer joined rows and one
    # cheaper aggregate (measured r13: 2.9s -> 1.7s for the edge build).
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= _CC_MIN_SUPPORT)
        .select("u", "v")
        .localCheckpoint(eager=False)
    )


def _star_round(e: DataFrame, dedupe: bool = True) -> DataFrame:
    """One large-star + small-star phase over canonical (u < v) pairs,
    ending in a LAZY localCheckpoint lineage cut (no action).

    The body lives in ``_star_round_body`` so its PRE-checkpoint plan
    can be audited (the checkpoint cuts the SQL plan, hiding the round
    from the registered query's explain — plans/r14 captures the body).

    ``dedupe=False`` skips the round-final ``.distinct()`` — legal ONLY
    when every consumer of the round's output is duplicate-insensitive
    (``_star_labels``' groupBy-MIN, or another ``_star_round``, whose
    window MINs ignore duplicates and whose own distinct re-dedupes).
    Mid-contraction rounds MUST dedupe: each round can emit up to 2x
    its input rows (the small-star explode), so skipping the distinct
    on every round would compound row growth 2^rounds; skipping it on
    a terminal round bounds the blowup at 2x — and at fixpoint (where
    the terminal rounds run, given the consumers' headroom counts) the
    emit is already duplicate-free, so the skipped distinct was an
    Exchange + two HashAggregates over the |nodes|-sized star edge set
    deduping nothing (guide §2.4)."""
    return _star_round_body(e, dedupe).localCheckpoint(eager=False)


def _star_round_body(e: DataFrame, dedupe: bool = True) -> DataFrame:
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # large star: m = min(N(u) ∪ {u}); emit (m, v) for v > u.  NO
    # mid-phase distinct (r13): the small-star window MIN below is
    # duplicate-insensitive and the round-final distinct dedupes, so the
    # round's edge set is identical (proven row-for-row on all three
    # consumers) with one less Exchange per round; the undeduped row
    # count stays <= |e| (one emit per canonical input edge), so no
    # growth risk at scale.  m <= u < v keeps canonical order even for
    # the duplicate rows.
    ls = (
        sym.withColumn(
            "m",
            F.least(F.min("v").over(Window.partitionBy("u")), F.col("u")),
        )
        .where(F.col("v") > F.col("u"))
        .select(F.col("m").alias("u"), "v")
    )
    # small star over canonical (u < v): group by the high node v,
    # m = min(low neighbors); emit (m, x) for x in N(v) ∪ {v}, x ≠ m
    ss = (
        ls.withColumn("m", F.min("u").over(Window.partitionBy("v")))
        .select("m", F.explode(F.array(F.col("u"), F.col("v"))).alias("x"))
        .where(F.col("x") != F.col("m"))
        .select(F.col("m").alias("u"), F.col("x").alias("v"))
    )
    if dedupe:
        ss = ss.distinct()
    return ss


def _star_labels(e: DataFrame) -> DataFrame:
    """(node, comp) labels from a contracted edge set."""
    return (
        e.select(F.col("v").alias("node"), F.col("u").alias("comp"))
        .unionAll(e.select(F.col("u").alias("node"), F.col("u").alias("comp")))
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )


def star_contract(edges: DataFrame, rounds: int) -> DataFrame:
    """Alternating large-star/small-star contraction over canonical
    (u < v) edge pairs; returns (node, comp) labels for every node
    appearing in the edge set, comp = component-min node id once the
    round count reaches the graph's fixpoint.

    Reused by graph_connected_components (co-purchase parts) and
    dedup_clusters_star (MinHash near-dup docs) — each caller is
    responsible for a round count that covers its graph (pytest pins
    both against ground truth).  Every round cuts lineage with a LAZY
    localCheckpoint (no action): without it the 2-references-per-round
    lineage re-executes round i 2^(rounds-i) times.  The FINAL round
    skips its distinct: its only consumer is _star_labels' groupBy-MIN
    (see _star_round's dedupe contract)."""
    e = edges.localCheckpoint(eager=False)
    for i in range(rounds):
        e = _star_round(e, dedupe=i < rounds - 1)
    return _star_labels(e)


def star_contract_certified(
    edges: DataFrame, rounds: int
) -> tuple[DataFrame, DataFrame]:
    """``star_contract`` plus an IN-PLAN convergence certificate.

    The fixed round counts (_CC_ROUNDS, dedup's _STAR_ROUNDS) are
    fixpoint+headroom on every fixture, but graph diameters grow with
    the data — at 100 TB a fixture-fit constant is an assumption, not
    a proof.  This variant runs ONE extra round and compares the label
    sets before/after in the same lazy plan: returns ``(labels,
    cert)`` where ``cert`` is a 1-row DataFrame with a single
    ``converged`` boolean — true iff zero labels (and zero nodes)
    change in round ``rounds+1``, i.e. the edge set had already
    reached its star fixpoint.  Consumers cross-join the broadcast
    certificate onto their output, so an insufficient round count
    turns into ``converged = false`` — a value-level mismatch against
    the oracle's ``TRUE`` — instead of silently identical-but-wrong
    labels on both sides.  Still zero driver-side actions; cost is one
    extra round over an at-fixpoint (hence tiny) edge set.

    The final regular round and the certificate round both skip their
    round-final distinct (see _star_round's dedupe contract): the final
    round feeds only duplicate-insensitive consumers (_star_labels'
    groupBy-MIN twice, and the certificate round's window MINs), and
    the certificate round feeds only _star_labels — so the two skipped
    distincts each remove an Exchange + two HashAggregates over the
    near-final |nodes|-sized star edge set without changing a single
    label (proven row-identical on all three consumers' fixtures and
    on the fuzz-parity generated topologies)."""
    e = edges.localCheckpoint(eager=False)
    for i in range(rounds):
        e = _star_round(e, dedupe=i < rounds - 1)
    labels = _star_labels(e).localCheckpoint(eager=False)
    after = _star_labels(_star_round(e, dedupe=False))
    cert = (
        labels.alias("a")
        .join(after.alias("b"), F.col("a.node") == F.col("b.node"), "full")
        .select(
            F.when(F.col("a.comp").eqNullSafe(F.col("b.comp")), 0)
            .otherwise(1)
            .alias("d")
        )
        .agg((F.coalesce(F.sum("d"), F.lit(0)) == 0).alias("converged"))
    )
    return labels, cert


@register(
    "graph_connected_components",
    oracle=f"""
        WITH {_CC_EDGES_SQL.strip()},
        {_CC_ROUNDS_SQL},
        labels AS (
            SELECT node, MIN(comp) AS comp FROM (
                SELECT v AS node, u AS comp FROM e{_CC_ROUNDS}
                UNION ALL
                SELECT u AS node, u AS comp FROM e{_CC_ROUNDS}
            ) GROUP BY node
        ),
        sizes AS (
            SELECT comp, CAST(COUNT(*) AS BIGINT) AS comp_size
            FROM labels GROUP BY comp
        )
        SELECT l.node AS part_id, l.comp AS component_id, s.comp_size,
               TRUE AS converged
        FROM labels l JOIN sizes s ON l.comp = s.comp
        ORDER BY part_id
    """,
    doc="""Connected components over the co-purchase part graph
    (parts sharing >= 2 distinct orders) via alternating large-star /
    small-star rounds — the shuffle-native CC algorithm web-scale
    dedup pipelines use to turn MinHash candidate pairs into duplicate
    clusters.  Large-star hangs every higher-id neighbor off the
    group's minimum; small-star re-points the lower neighborhood; the
    component invariant holds each phase and the edge set converges to
    stars (node -> component root) in O(log^2 n) rounds vs hash-min's
    O(diameter) (see dedup_clusters, whose docstring names this as its
    scale upgrade).  _CC_ROUNDS = 6 is fixpoint+1 on every fixture
    (measured; pytest asserts equality with union-find ground truth),
    and the oracle unrolls the identical 6 rounds, so the result is
    exact by construction.  Since round 6 the output also carries a
    per-run CONVERGENCE CERTIFICATE (star_contract_certified): one
    extra in-plan round, labels compared before/after, so a graph
    whose diameter outgrows the fixed round count yields
    converged=false — a hash mismatch against the oracle's TRUE —
    instead of two engines agreeing on identically unconverged labels.

    Plan shape: the Python loop appends (union, window-min, distinct)
    x 6 to ONE lazy plan — no driver action inside the loop.  Each
    star phase computes its group minimum as a WINDOW over the node id
    rather than a groupBy + join-back: same result, but the previous
    round's subtree is referenced ~2x per round instead of ~12x, which
    keeps the unrolled logical plan at 2^6 subtree copies instead of
    12^6 (the join-back form OOMed the analyzer — DataFrame reuse
    duplicates logical subtrees; only the oracle's CTEs are shared).
    Each round's edge set is additionally cut with a LAZY
    localCheckpoint (eager=False — still no action): execution
    materializes every round exactly once instead of re-deriving
    earlier rounds 2^k times, and lineage truncation keeps AQE
    coalescing live (lazy .persist() was measured 3x slower here:
    InMemoryRelation pins the pre-AQE 64-partition shuffles and adds
    columnar-cache overhead; bare lineage re-executes rounds
    exponentially — 20s vs ~5s at sf0.1).  This is the GraphFrames CC
    checkpoint pattern, in its lazy form.  Each phase is one shuffle
    on a node id; edge rows only ever shrink.""",
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels, cert = star_contract_certified(
        _copurchase_edges(spark, sf_dir), _CC_ROUNDS
    )
    sizes = labels.groupBy("comp").agg(F.count("*").alias("comp_size"))
    return (
        labels.join(sizes, "comp")
        .select(
            F.col("node").alias("part_id"),
            F.col("comp").alias("component_id"),
            "comp_size",
        )
        .crossJoin(F.broadcast(cert))
        .orderBy("part_id")
    )


# --- Community detection: synchronous label propagation ----------------

_LPA_ROUNDS = 3


def _lpa_round_sql(prev: str, cur: str) -> str:
    """One synchronous LPA round: every node adopts the most frequent
    label among its neighbors, ties broken by MIN label — fully
    deterministic, so the unrolled rounds are exact by construction."""
    return f"""
        {cur} AS MATERIALIZED (
            SELECT u AS node, l AS label FROM (
                SELECT g.u, g.l, ROW_NUMBER() OVER (
                           PARTITION BY g.u ORDER BY g.c DESC, g.l) AS rn
                FROM (
                    SELECT s.u, p.label AS l, CAST(COUNT(*) AS BIGINT) AS c
                    FROM lpa_sym s JOIN {prev} p ON p.node = s.v
                    GROUP BY s.u, p.label
                ) g
            ) WHERE rn = 1
        )
"""


_LPA_ROUNDS_SQL = ",".join(
    _lpa_round_sql(f"l{i}", f"l{i + 1}").strip() for i in range(_LPA_ROUNDS)
)


@register(
    "graph_label_propagation",
    oracle=f"""
        WITH {_CC_EDGES_SQL.strip()},
        lpa_sym AS MATERIALIZED (
            SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
        ),
        l0 AS MATERIALIZED (
            SELECT DISTINCT u AS node, u AS label FROM lpa_sym
        ),
        {_LPA_ROUNDS_SQL},
        sizes AS (
            SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size
            FROM l{_LPA_ROUNDS} GROUP BY label
        )
        SELECT l.node AS part_id, l.label AS community_id, s.community_size
        FROM l{_LPA_ROUNDS} l JOIN sizes s ON l.label = s.label
        ORDER BY part_id
    """,
    doc=f"""Community detection by synchronous label propagation (LPA,
    Raghavan et al.) over the same distinct-order co-purchase graph as
    graph_connected_components — the fourth graph primitive
    (centrality = pagerank, reachability = bfs, components = CC,
    cohesion = triangles; communities partition a connected component
    into densely-linked clusters, which CC by definition cannot).
    Each of the {_LPA_ROUNDS} fixed rounds: every node adopts its
    neighbors' most frequent label, ties to the MIN label — the
    classic async-LPA nondeterminism is removed by synchronous rounds
    + total tie order, so the unrolled computation is engine-exact and
    the oracle replays identical rounds (the pagerank convention;
    contrast CC's run-to-fixpoint + ground-truth test).

    Plan: per round one join of the static symmetric edge list against
    the 1-reference label table (no subtree blowup — contrast CC's
    2-reference rounds needing lineage cuts), one (node, label) count
    aggregate, and a map-side-combinable MAX(struct) argmax (r13: was
    a row_number window; the agg drops the per-round Sort).  All
    shuffles key on node ids; at 100 TB this is Pregel-on-DataFrames
    with the label table as the only mutable state.""",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir)
    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        # argmax by (c DESC, l ASC) as a hash-agg MAX(struct(c, -l)) —
        # labels are positive part ids, so negating flips the tiebreak
        # to MIN label.  Replaces the row_number window (r13: the agg
        # is map-side combinable and drops the per-round Sort+Window;
        # interleaved min-of-3 6.40s -> 4.12s; results row-identical).
        labels = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u", F.col("label").alias("l"))
            .agg(F.count("*").alias("c"))
            .groupBy("u")
            .agg(
                F.max(F.struct(F.col("c"), (-F.col("l")).alias("nl"))).alias(
                    "b"
                )
            )
            .select(F.col("u").alias("node"), (-F.col("b.nl")).alias("label"))
        )
    # the final label table is referenced twice (sizes + the join
    # below) — one LAZY cut stops the whole 3-round chain re-executing
    labels = labels.localCheckpoint(eager=False)
    sizes = labels.groupBy("label").agg(F.count("*").alias("community_size"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").alias("part_id"),
            F.col("label").alias("community_id"),
            "community_size",
        )
        .orderBy("part_id")
    )


# --- k-core decomposition: iterative peeling, unrolled -----------------

_KCORE_K = 2
_KCORE_ROUNDS = 8  # measured rounds-to-fixpoint on the fixtures:
# 1 (sf0.001), 4 (sf0.01), 6 (sf0.1) — 8 leaves headroom, and the
# in-plan convergence certificate below turns the constant into a
# per-run proof (the star_contract_certified doctrine).


def _kcore_round(e: DataFrame) -> DataFrame:
    """One peel: drop every node with degree < _KCORE_K, keep only
    edges whose BOTH endpoints survive; lazy-checkpoint the result."""
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    keep = (
        sym.groupBy("u")
        .agg(F.count(F.lit(1)).alias("deg"))
        .where(F.col("deg") >= _KCORE_K)
        .select(F.col("u").alias("x"))
    )
    return (
        e.join(keep.withColumnRenamed("x", "u"), "u")
        .join(keep.withColumnRenamed("x", "v"), "v")
        .select("u", "v")
        .localCheckpoint(eager=False)
    )


def _kcore_round_sql(prev: str, cur: str) -> str:
    return f"""
        {cur}_deg AS MATERIALIZED (
            SELECT x, COUNT(*) AS deg FROM (
                SELECT u AS x FROM {prev} UNION ALL SELECT v AS x FROM {prev}
            ) GROUP BY x
        ),
        {cur}_keep AS MATERIALIZED (
            SELECT x FROM {cur}_deg WHERE deg >= {_KCORE_K}
        ),
        {cur} AS MATERIALIZED (
            SELECT e.u, e.v FROM {prev} e
            JOIN {cur}_keep a ON e.u = a.x
            JOIN {cur}_keep b ON e.v = b.x
        )
"""


_KCORE_ROUNDS_SQL = ",".join(
    _kcore_round_sql(f"k{i}" if i else "e0", f"k{i + 1}").strip()
    for i in range(_KCORE_ROUNDS)
)


@register(
    "graph_kcore",
    oracle=f"""
        WITH {_CC_EDGES_SQL.strip()},
        {_KCORE_ROUNDS_SQL}
        SELECT part_id, core_degree, TRUE AS converged FROM (
            SELECT x AS part_id, CAST(COUNT(*) AS BIGINT) AS core_degree
            FROM (
                SELECT u AS x FROM k{_KCORE_ROUNDS}
                UNION ALL
                SELECT v AS x FROM k{_KCORE_ROUNDS}
            ) GROUP BY x
        )
        ORDER BY part_id
    """,
    doc=f"""{_KCORE_K}-core decomposition of the co-purchase part graph
    (the fifth graph primitive: cohesion tiers — a node is in the
    k-core iff it keeps >= {_KCORE_K} neighbors after every weaker node
    is recursively peeled away; the periphery that connected-components
    and LPA both keep is exactly what the core drops).  Dense cores of
    a co-occurrence graph are the "always bought together" product
    families; in a dedup pair graph the same query isolates template
    clusters whose members all match many siblings — a stronger signal
    than mere connectivity.

    Implementation: {_KCORE_ROUNDS} peel rounds unrolled into ONE lazy
    plan (each round: symmetric degree count >= {_KCORE_K} -> semi-join
    both endpoints; lazy localCheckpoint per round — the star_contract
    lineage discipline), fixpoint measured at 1/4/6 rounds on the
    fixtures.  The output carries the same per-run convergence
    certificate as graph_connected_components: one EXTRA round, edge
    counts compared in-plan (peeling is monotone, so equal counts =
    fixpoint), pinned TRUE by the oracle — an undersized round count
    fails the gate instead of shipping a too-large core.  The oracle
    unrolls the identical rounds as chained CTEs.

    Scale: each round is one hash aggregate + two hash joins on node
    ids, and edge rows only ever shrink; O(peel depth) rounds total.
    Production k-core at 100 TB runs exactly this loop (GraphX/Galois
    do the same peel) with the certificate deciding when to stop.""",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    for _ in range(_KCORE_ROUNDS):
        e = _kcore_round(e)
    extra = _kcore_round(e)
    cert = (
        e.agg(F.count(F.lit(1)).alias("_c0"))
        .crossJoin(extra.agg(F.count(F.lit(1)).alias("_c1")))
        .select((F.col("_c0") == F.col("_c1")).alias("converged"))
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return (
        sym.groupBy(F.col("u").alias("part_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .crossJoin(F.broadcast(cert))
        .orderBy("part_id")
    )


# --- Link prediction: neighborhood Jaccard over 2-hop pairs ------------

_LP_TOPN = 20


@register(
    "graph_link_prediction",
    oracle=f"""
        WITH {_CC_EDGES_SQL.strip()},
        sym AS MATERIALIZED (
            SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
        ),
        deg AS (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u
        ),
        cand AS (
            SELECT a.u AS x, b.v AS y,
                   CAST(COUNT(*) AS BIGINT) AS common
            FROM sym a JOIN sym b ON a.v = b.u AND a.u < b.v
            GROUP BY a.u, b.v
        ),
        nonedge AS (
            SELECT c.x, c.y, c.common
            FROM cand c LEFT JOIN e0 e ON c.x = e.u AND c.y = e.v
            WHERE e.u IS NULL
        )
        SELECT n.x AS part_a, n.y AS part_b, n.common AS common_neighbors,
               CAST(n.common AS DOUBLE)
                   / CAST(da.d + db.d - n.common AS DOUBLE) AS jaccard
        FROM nonedge n
        JOIN deg da ON n.x = da.u
        JOIN deg db ON n.y = db.u
        ORDER BY jaccard DESC, part_a, part_b
        LIMIT {_LP_TOPN}
    """,
    doc=f"""Link prediction by neighborhood Jaccard — the classic
    missing-edge scorer ("people who buy these also buy...") over the
    co-purchase part graph: for every NON-adjacent 2-hop pair, the
    Jaccard of their neighbor sets |N(a) n N(b)| / |N(a) u N(b)|;
    top {_LP_TOPN} by score (total order: score desc, then both ids —
    the LIMIT-rides-a-total-order rule).  The same query over a
    dedup pair graph proposes "probably duplicates we have not
    verified yet" — candidate generation for active review.

    Plan: 2-hop pairs via one self-join of the symmetric edge list on
    the shared neighbor (never all-pairs — candidates only exist where
    a path exists), common counts as the group size, an anti-join
    against the edge set, then two degree joins and a TakeOrdered
    top-{_LP_TOPN} (no full sort).  All counts integer; the score is
    one IEEE division.

    Scale: 2-hop enumeration is Sum(deg^2)-bounded — the hub caveat
    every triangle/link-prediction job shares; at 100 TB you cap or
    sample hub neighborhoods first (graph_triangles documents the
    same discipline).  Shuffles: neighbor join + group on the pair,
    both on node/pair keys.""",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    e0 = _copurchase_edges(spark, sf_dir)
    sym = e0.unionAll(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    a, b = sym.alias("a"), sym.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.v") == F.col("b.u")) & (F.col("a.u") < F.col("b.v")),
        )
        .groupBy(F.col("a.u").alias("x"), F.col("b.v").alias("y"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    nonedge = cand.join(
        e0, (cand.x == e0.u) & (cand.y == e0.v), "left_anti"
    )
    da = deg.select(F.col("u").alias("x"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("y"), F.col("d").alias("db"))
    return (
        nonedge.join(da, "x")
        .join(db, "y")
        .select(
            F.col("x").alias("part_a"),
            F.col("y").alias("part_b"),
            F.col("common").alias("common_neighbors"),
            (
                F.col("common").cast("double")
                / (F.col("da") + F.col("db") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "part_a", "part_b")
        .limit(_LP_TOPN)
    )


# --- Degree assortativity ------------------------------------------------------

# Pearson r over per-edge endpoint degrees, ONE expression string shared
# verbatim by both engines (the bm25/OLS convention): all six moments
# are exact BIGINTs cast once to double, fixed +-*/ tree, sqrt is
# correctly rounded by spec.
_ASSORT_R = (
    "(CAST(ne * sxy - sx * sy AS DOUBLE) / "
    "(sqrt(CAST(ne * sxx - sx * sx AS DOUBLE))"
    " * sqrt(CAST(ne * syy - sy * sy AS DOUBLE))))"
)


@register(
    "graph_assortativity",
    # {mh} late-bound below to dedup_minhash_lsh's registered oracle.
    oracle=f"""
        WITH pairs AS ({{mh}}),
        sym AS (
            SELECT doc_id_a AS u, doc_id_b AS v FROM pairs
            UNION ALL
            SELECT doc_id_b AS u, doc_id_a AS v FROM pairs
        ),
        deg AS (
            SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM sym GROUP BY 1
        ),
        ed AS (
            SELECT da.d AS x, db.d AS y
            FROM sym s JOIN deg da ON da.node = s.u
            JOIN deg db ON db.node = s.v
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS ne,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes
            FROM ed
        )
        SELECT n_nodes, ne // 2 AS n_edges,
               CASE WHEN ne * sxx > sx * sx AND ne * syy > sy * sy
                    THEN {_ASSORT_R} END AS assortativity,
               ne * sxy < sx * sy AS disassortative
        FROM mom
    """,
    doc="""Degree assortativity (Newman's r) of the near-duplicate
    graph: the Pearson correlation of endpoint degrees over the
    symmetrized edge list — positive when hubs link to hubs (one big
    template family duplicating itself), negative when hubs link to
    leaves (a star/boilerplate pattern, typical of scraped corpora).
    This single number tells the dedup pipeline whether star
    contraction will collapse the graph in few rounds (disassortative
    stars) or needs the full budget (assortative chains) — measured
    context for the fixed round counts graph.py documents.

    Determinism: all six moments are exact BIGINT sums of integer
    degrees; r is one shared literal expression (two correctly-rounded
    sqrts, one division); the disassortative verdict is the fully
    integer cross-multiplication ne*sxy < sx*sy; the zero-variance
    edge (regular graph) yields NULL in both engines via the guarded
    CASE.

    Scale: degree = one hash aggregate over edges; the edge-degree
    join ships edge rows through two broadcastable degree lookups;
    moments are a 1-row reduce.  The oracle nests dedup_minhash_lsh's
    registered oracle verbatim.""",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.operators.dedup import _minhash_pairs

    from kafka_hadoop_loader_spark.catalog import managed_persist

    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    pairs = _minhash_pairs(d, sf_dir).select("doc_id_a", "doc_id_b")
    # sym feeds the degree aggregate AND the edge-degree join: one lazy
    # cut keeps the full LSH cascade from re-running per consumer
    # (measured 9.7s -> ~2s warm at sf0.1).
    sym = managed_persist(
        f"graph_assortativity:sym:{sf_dir}",
        pairs.select(
            F.col("doc_id_a").alias("u"), F.col("doc_id_b").alias("v")
        ).unionAll(
            pairs.select(
                F.col("doc_id_b").alias("u"), F.col("doc_id_a").alias("v")
            )
        ),
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    ed = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("d").alias("x")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("y")), "v")
        .select("x", "y")
    )
    n_nodes = deg.agg(F.count("*").cast("bigint").alias("n_nodes"))
    mom = ed.agg(
        F.count("*").cast("bigint").alias("ne"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    ).crossJoin(F.broadcast(n_nodes))
    return mom.select(
        "n_nodes",
        F.expr("ne DIV 2").alias("n_edges"),
        F.when(
            (F.col("ne") * F.col("sxx") > F.col("sx") * F.col("sx"))
            & (F.col("ne") * F.col("syy") > F.col("sy") * F.col("sy")),
            F.expr(_ASSORT_R),
        ).alias("assortativity"),
        (F.col("ne") * F.col("sxy") < F.col("sx") * F.col("sy")).alias(
            "disassortative"
        ),
    )


import dataclasses as _gdc  # noqa: E402

# the {mh} late-bind below needs dedup_minhash_lsh REGISTERED, which
# registry.load_all()'s import order guarantees but a standalone
# `import operators.graph` (tests, notebooks) does not — import the
# dependency explicitly (cycle-safe: dedup imports graph only inside
# function bodies), the same pattern pipeline.py uses
from kafka_hadoop_loader_spark.operators import dedup as _graph_dedup  # noqa: E402,F401
from kafka_hadoop_loader_spark.registry import REGISTRY as _GREG  # noqa: E402

_GREG["graph_assortativity"] = _gdc.replace(
    _GREG["graph_assortativity"],
    oracle=_GREG["graph_assortativity"].oracle.format(
        mh=_GREG["dedup_minhash_lsh"].oracle
    ),
)
