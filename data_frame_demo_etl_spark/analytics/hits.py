"""HITS hubs & authorities on the customer→supplier trade graph (G8).

Kleinberg 1999: on a directed graph, a good HUB points at good
authorities and a good AUTHORITY is pointed at by good hubs —
a(v) = Σ_{u→v} h(u), h(u) = Σ_{u→v} a(v), normalized each round. On
the bipartite trade graph (customer → supplier edge per distinct
trading pair) hubs are customers whose order book concentrates on
well-sourced suppliers, authorities are suppliers favored by such
customers — the "who anchors the trading network" read PageRank's
undirected proximity (G2/G7) does not give.

Reference parity: the reference has no graph module at all
(src/analytics.py stops at funnel aggregates); G8 extends the engine's
graph family the same way G2/G7 did.

Exact-integer contract (the G2 grid convention, plus normalization):
scores live on the UNIT grid (10⁶ = 1.0 of L1 mass before scaling by
node count is irrelevant — only ratios matter to the ranking) and each
round ends with an exact integral L1 normalization
    x_norm(v) = x'(v) · 10¹² div Σ_u x'(u)
so both engines walk identical integers (floor division only; no
float sqrt of an L2 norm anywhere). Truncation loses < 1 unit per
node per round — 6 orders below the 10¹² grid.

Scale shape: per round, two equi-join + groupBy passes over the edge
table (a-update shuffles on dst, h-update on src) and one 1-ROW sum
broadcast per normalization (the q22 scalar shape). Round 1's
a-update needs no join at all: h0 = INIT for every src, so
a1' = INIT · indegree — one groupBy over the edge table. Edges stay
persisted for the caller's action (the session owner releases caches
— see session.release_all_caches); lineage is truncated per
normalization with a lazy persist() (see _l1_normalize's comment for
why not localCheckpoint): consumers plan against the InMemoryRelation
leaf (no Catalyst re-derivation of round subtrees) and execution
defers to the caller's single action, which cascades all
materializations in one job chain instead of the old 4 blocking
eager-checkpoint jobs + broadcast sub-jobs per construction (measured
r12: construct 25 jobs / 4.9–14.7 s → 2 jobs / 0.6–0.8 s; the
scalar-total subtree inside each normalization is deduplicated at
execution by exchange reuse).

Iterative-persist memory contract: see pagerank.py's module docstring
— the per-round persists are lazily chained, peak cached state is
O(N_ROUNDS) node-sized score tables, the session owner releases them,
and persist does not truncate RDD lineage (contra an earlier
docstring's claim; a long-rounds variant should checkpoint every K
rounds to cap executor-loss recompute depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

GRID = 1_000_000_000_000  # L1 mass after each normalization
INIT = 1_000_000  # initial per-node score (exact value irrelevant)
N_ROUNDS = 2
TOP_K = 10
DEC = "decimal(38,0)"


def _l1_normalize(df: DataFrame, score: str) -> DataFrame:
    # The scalar total and the normalized output both read `df`, so
    # the subtree appears twice in the plan — both copies end in the
    # same Exchange and execution dedupes them via ReusedExchange.
    # Lineage is truncated by the lazy persist() below, NOT a
    # localCheckpoint: under AQE, even localCheckpoint(eager=False)
    # executes every query stage at construction (AdaptiveSparkPlan
    # collapses its stages inside physicalPlan.execute() — measured
    # r12: 25–28 blocking construction jobs either way), while a
    # persisted frame is substituted as an InMemoryRelation BEFORE
    # optimization (QueryExecution.withCachedData), so each round's
    # consumers plan against a leaf, never re-deriving the round
    # subtree (the compounding the fully-lazy form measured at
    # 13.7×/decade at sf10), and nothing executes until the caller's
    # single action cascades all materializations in one job chain.
    total = df.agg(F.sum(F.col(score).cast(DEC)).alias("__t"))
    return (
        df.crossJoin(F.broadcast(total))
        .select(
            *[c for c in df.columns if c != score],
            F.expr(f"cast({score} as decimal(38,0)) * {GRID} div __t")
            .cast("long")
            .alias(score),
        )
        .persist()
    )


def hits(pairs: DataFrame, n_rounds: int = N_ROUNDS) -> DataFrame:
    """(side, key, score_units) for every node of the bipartite
    directed graph given as (src, dst) pairs: side 'hub' rows carry
    src keys, side 'authority' rows carry dst keys; scores are on the
    10¹²-L1 integer grid after `n_rounds` mutual-reinforcement
    rounds (>= 1: the authority side only exists after a round)."""
    if n_rounds < 1:
        raise ValueError(f"hits() needs n_rounds >= 1, got {n_rounds}")
    pairs = pairs.persist()
    auth = hubs = None
    for r in range(n_rounds):
        if r == 0:
            # Closed form for the first a-update: h0 = INIT for every
            # src, so Σ_{u→v} h0(u) = INIT · indegree(v) — one groupBy
            # over the edge table, no h0 node table, no first join.
            a_raw = pairs.groupBy("dst").agg(
                (F.count(F.lit(1)).cast(DEC) * F.lit(INIT)).alias("a")
            )
        else:
            a_raw = (
                pairs.join(hubs, "src")
                .groupBy("dst")
                .agg(F.sum(F.col("h").cast(DEC)).alias("a"))
            )
        auth = _l1_normalize(a_raw, "a")
        hubs = _l1_normalize(
            pairs.join(auth, "dst")
            .groupBy("src")
            .agg(F.sum(F.col("a").cast(DEC)).alias("h")),
            "h",
        )
    h_rows = hubs.select(
        F.lit("hub").alias("side"), F.col("src").alias("key"), F.col("h").alias("score_units")
    )
    a_rows = auth.select(
        F.lit("authority").alias("side"), F.col("dst").alias("key"), F.col("a").alias("score_units")
    )
    # Everything above is lazy: the caller's action materializes the
    # rounds through the persisted edge table, so the cache must
    # outlive this function — the SESSION owner releases it
    # (session.release_all_caches), the same lifecycle as minhash /
    # jaccard signature persists.
    return h_rows.unionByName(a_rows)


def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: top-10 hub customers and top-10 authority suppliers of
    the trade graph after 2 integer HITS rounds (ties → lowest key)."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    pairs = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )
    from pyspark.sql import Window

    scores = hits(pairs)
    w = Window.partitionBy("side").orderBy(
        F.col("score_units").desc(), F.col("key").asc()
    )
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("side", F.col("rk").cast("int").alias("rk"), "key", "score_units")
        .orderBy("side", "rk")
    )


def _hits_round_sql(h_prev: str, a_cur: str, h_cur: str) -> str:
    return f"""{a_cur}0 AS (
  SELECT e.dst, SUM(CAST(p.h AS HUGEINT)) AS a
  FROM edges e JOIN {h_prev} p ON p.src = e.src GROUP BY e.dst
),
{a_cur} AS (
  SELECT dst, CAST(a * {GRID} // (SELECT SUM(a) FROM {a_cur}0) AS BIGINT) AS a FROM {a_cur}0
),
{h_cur}0 AS (
  SELECT e.src, SUM(CAST(a.a AS HUGEINT)) AS h
  FROM edges e JOIN {a_cur} a ON a.dst = e.dst GROUP BY e.src
),
{h_cur} AS (
  SELECT src, CAST(h * {GRID} // (SELECT SUM(h) FROM {h_cur}0) AS BIGINT) AS h FROM {h_cur}0
)"""


GRAPH_HITS_SQL = f"""
WITH edges AS (
  SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
h0 AS (SELECT DISTINCT src, CAST({INIT} AS BIGINT) AS h FROM edges),
{_hits_round_sql("h0", "a1", "h1")},
{_hits_round_sql("h1", "a2", "h2")},
scored AS (
  SELECT 'hub' AS side, src AS key, h AS score_units FROM h2
  UNION ALL
  SELECT 'authority' AS side, dst AS key, a AS score_units FROM a2
)
SELECT side, rk, key, score_units FROM (
  SELECT side, key, score_units,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY side ORDER BY score_units DESC, key ASC
         ) AS INTEGER) AS rk
  FROM scored
) WHERE rk <= {TOP_K}
ORDER BY side, rk
"""
