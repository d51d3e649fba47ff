"""PageRank in exact integer arithmetic (engine-reproducible).

Iterative graph algorithms are the second family (after connected
components, dedup/clusters.py) that Spark expresses as repeated
join + groupBy rounds. PageRank here runs on the customer↔supplier
transaction graph (distinct trading pairs from lineitem ⋈ orders,
one directed edge each way, so every node has outdegree ≥ 1 and no
dangling mass): which customers/suppliers sit most centrally in the
trade network.

Exactness: floating-point PageRank is not reproducible across
engines (summation order). Instead ranks live on an integer grid
(SCALE units = rank 1.0) and the update is

    r'(v) = (15·SCALE) DIV 100  +  (85 · Σ_{u→v} (r(u) DIV deg(u))) DIV 100

— floor division only, so every engine that can do BIGINT arithmetic
produces bit-identical ranks after any number of rounds. Truncation
loses < deg·1e-9 rank mass per round at SCALE=1e9: irrelevant for
ranking, priceless for verification. The oracle unrolls the loop as
SQL CTEs; the Spark side runs the same loop over DataFrames.

Scale notes: each round is one shuffle (groupBy dst) after an
edges ⋈ ranks join on src; the rank table is node-sized, the edge
table is reused every round (persist it); localCheckpoint every few
rounds would bound lineage for long runs (see dedup/clusters.py for
the precedent and its OOM rationale).

Iterative-persist memory contract (r12 verdict item 9): the per-round
lazy persists cannot be released in-function — the rounds are a LAZY
chain (nothing materializes until the caller's single action), so an
in-function unpersist would drop the cache before it is ever filled,
and an eager materialize-then-unpersist loop is the blocking per-round
construction r12 measured and removed. The bound instead comes from
construction: N_ROUNDS is a small constant, every persisted table is
node-sized, so peak cached state is O(N_ROUNDS) node tables per query
and the SESSION owner releases them between queries
(session.release_all_caches). Failure-mode note: persist does NOT
truncate RDD lineage — an executor-loss recompute of round t re-derives
rounds 1..t from the cached edge table; acceptable at these bounded
round counts, but a long-rounds variant at 100 TB should checkpoint
every K rounds to cap both recompute depth and cached-block count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SCALE = 1_000_000_000
DAMP_NUM, DAMP_DEN = 85, 100
BASE = (100 - DAMP_NUM) * SCALE // DAMP_DEN
N_ROUNDS = 3
TOP_K = 20


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer↔supplier directed edge pairs.
    Node id encoding: customer c → 2c, supplier s → 2s+1."""
    from ..sources.catalog import load_table

    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    pairs = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst"))
    rev = pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
    return fwd.unionByName(rev)


def pagerank(edges: DataFrame, n_rounds: int = N_ROUNDS) -> DataFrame:
    """(node, rank_units) after n_rounds of the integer update."""
    edges = edges.persist()
    # deg is node-sized and consumed n_rounds + 2 times (with_deg, r0,
    # every round's node-set rebuild) — without the persist each round
    # re-aggregates the full edge table (r13; at scale that is n_rounds
    # extra corpus-wide aggregations).
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    with_deg = edges.join(deg, "src").persist()
    ranks = deg.select(F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("r"))
    for _ in range(n_rounds):
        contrib = (
            with_deg.join(ranks, F.col("src") == F.col("node"))
            .select("dst", F.expr(f"r DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # every node has outdegree >= 1 in the bidirected graph, so the
        # node set is stable: re-derive from deg to keep zero-inflow rows
        ranks = (
            deg.select(F.col("src").alias("node"))
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(BASE).cast("long")
                    + F.expr(f"{DAMP_NUM} * coalesce(inflow, 0L) DIV {DAMP_DEN}")
                ).alias("r"),
            )
        )
        # Lazy persist, not localCheckpoint (r12, the graph_hits
        # finding): under AQE localCheckpoint(eager=False) executes
        # eagerly; the rounds are a sequential chain, so persist
        # truncates lineage without blocking construction.
        ranks = ranks.persist()
    return ranks.select("node", F.col("r").alias("rank_units"))


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: top-20 nodes of the trade graph after 3 integer rounds."""
    ranks = pagerank(trade_edges(spark, sf_dir))
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier").alias("node_type"),
            F.expr("node DIV 2").alias("key"),
            "rank_units",
        )
        .orderBy(F.col("rank_units").desc(), F.col("node_type").asc(), F.col("key").asc())
        .limit(TOP_K)
    )


def _round_cte(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT n.node,
         CAST({BASE} + ({DAMP_NUM} * COALESCE(i.inflow, 0)) // {DAMP_DEN} AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(p.r // d.deg) AS BIGINT) AS inflow
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) i ON i.node = n.node
)"""


GRAPH_PAGERANK_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM deg),
r0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS r FROM nodes),
{_round_cte("r0", "r1")},
{_round_cte("r1", "r2")},
{_round_cte("r2", "r3")}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       node // 2 AS key,
       r AS rank_units
FROM r3
ORDER BY rank_units DESC, node_type ASC, key ASC
LIMIT {TOP_K}
"""


# ─────────────── G7: personalized PageRank (seeded teleport) ───────────────

PPR_SEED_SUPPKEYS = (1, 2, 3)


def personalized_pagerank(
    edges: DataFrame, seeds: DataFrame, n_rounds: int = N_ROUNDS
) -> DataFrame:
    """Personalized PageRank: the teleport mass lands ONLY on the seed
    set, so rank measures PROXIMITY TO THE SEEDS rather than global
    centrality — the random-walk-with-restart recommendation primitive
    ('entities most connected to this cohort', Haveliwala 2002) the
    global gate (G2) cannot answer.

    Same exact-integer contract as `pagerank`: ranks on the SCALE
    grid, update r'(v) = [v ∈ seeds]·BASE + (85·Σ r(u) div deg(u))
    div 100 — floor division only, bit-identical across engines; r0
    puts SCALE on each seed and 0 elsewhere, so mass diffuses outward
    through the trade graph round by round.

    Scale shape identical to G2: per round one edges⋈ranks equi-join
    + one groupBy(dst); the seed table is a broadcast-sized literal."""
    edges = edges.persist()
    # Same node-sized multi-consumer persists as `pagerank` (r13): deg
    # feeds with_deg + the node table; nodes — deg ⋈ broadcast(seeds)
    # — is consumed by r0 AND every round's rank rebuild, and without
    # the persist each consumer re-derived deg from the edge table and
    # re-collected/re-broadcast the seed RDD (this was why the PPR
    # gate stayed flat while its three siblings sped up in r12: 4
    # repeated ExistingRDD broadcast builds + per-round deg
    # re-aggregation that the plain-pagerank loop did not pay).
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    with_deg = edges.join(deg, "src").persist()
    nodes = (
        deg.select(F.col("src").alias("node"))
        .join(
            F.broadcast(
                seeds.select(F.col("node").alias("node"), F.lit(1).alias("is_seed"))
            ),
            "node",
            "left",
        )
        .persist()
    )
    ranks = nodes.select(
        "node",
        F.when(F.col("is_seed") == 1, F.lit(SCALE).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("r"),
    )
    for _ in range(n_rounds):
        contrib = (
            with_deg.join(ranks, F.col("src") == F.col("node"))
            .select("dst", F.expr("r DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.when(F.col("is_seed") == 1, F.lit(BASE).cast("long")).otherwise(
                        F.lit(0).cast("long")
                    )
                    + F.expr(f"{DAMP_NUM} * coalesce(inflow, 0L) DIV {DAMP_DEN}")
                ).alias("r"),
            )
        )
        # Lazy persist, not localCheckpoint (r12, the graph_hits
        # finding): under AQE localCheckpoint(eager=False) executes
        # eagerly; the rounds are a sequential chain, so persist
        # truncates lineage without blocking construction.
        ranks = ranks.persist()
    return ranks.select("node", F.col("r").alias("rank_units"))


def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: top-20 trade-graph nodes by proximity to the supplier
    seed cohort {1, 2, 3} after 3 integer PPR rounds (seeds excluded
    from the output — the RECOMMENDATIONS, not the cohort)."""
    seeds_nodes = [2 * s + 1 for s in PPR_SEED_SUPPKEYS]
    # The seed table is a LITERAL plan (explode of a lit array over
    # range(1)), not createDataFrame: parallelized local data plans as
    # a LogicalRDD whose RDD id changes on every construction, so two
    # constructions of this gate never produce matching plan subtrees
    # — no cached subtree from an earlier identical run can be reused
    # (the r12 flat-PPR mystery: its three siblings' repeated runs in
    # one session re-served their persisted round tables; PPR rebuilt
    # every round because every plan hashed differently), and in-plan
    # exchange/subquery reuse across the seed join's two consumers is
    # likewise defeated. A literal plan canonicalizes identically.
    spark_seeds = spark.range(1).select(
        F.explode(F.array(*[F.lit(n).cast("long") for n in seeds_nodes])).alias("node")
    )
    ranks = personalized_pagerank(trade_edges(spark, sf_dir), spark_seeds)
    return (
        ranks.filter(~F.col("node").isin(seeds_nodes))
        .filter(F.col("rank_units") > 0)
        .select(
            F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier").alias("node_type"),
            F.expr("node DIV 2").alias("key"),
            "rank_units",
        )
        .orderBy(F.col("rank_units").desc(), F.col("node_type").asc(), F.col("key").asc())
        .limit(TOP_K)
    )


def _ppr_round_cte(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT n.node,
         CAST(CASE WHEN n.node IN (SELECT node FROM seeds) THEN {BASE} ELSE 0 END
              + ({DAMP_NUM} * COALESCE(i.inflow, 0)) // {DAMP_DEN} AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(p.r // d.deg) AS BIGINT) AS inflow
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) i ON i.node = n.node
)"""


_PPR_SEEDS_SQL = ", ".join(f"({2 * s + 1})" for s in PPR_SEED_SUPPKEYS)

GRAPH_PERSONALIZED_PAGERANK_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM deg),
seeds(node) AS (VALUES {_PPR_SEEDS_SQL}),
r0 AS (
  SELECT node,
         CAST(CASE WHEN node IN (SELECT node FROM seeds) THEN {SCALE} ELSE 0 END AS BIGINT) AS r
  FROM nodes
),
{_ppr_round_cte("r0", "r1")},
{_ppr_round_cte("r1", "r2")},
{_ppr_round_cte("r2", "r3")}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       node // 2 AS key,
       r AS rank_units
FROM r3
WHERE node NOT IN (SELECT node FROM seeds) AND r > 0
ORDER BY rank_units DESC, node_type ASC, key ASC
LIMIT {TOP_K}
"""
