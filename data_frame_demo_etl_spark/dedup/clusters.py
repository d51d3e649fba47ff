"""Duplicate-cluster resolution: near-dup PAIRS → connected components
→ one survivor per cluster.

The distributed path is the alternating large-star / small-star
contraction of Kiveris et al., "Connected Components in MapReduce and
Beyond" (SoCC 2014): each round re-points nodes at their
neighborhood minimum, which provably converges to a star forest (one
star per component, rooted at the component's minimum id) in
O(log n) rounds — unlike plain min-label propagation, whose round
count is the graph DIAMETER, so a 10⁶-node chain (pathological but
possible in transitive near-dup graphs) needs 10⁶ rounds. Each round
is two groupBy-min aggregations (map-side combinable) and an
equi-join; nothing touches the driver.

``resolve_duplicates`` then keeps the minimum-id document of every
cluster — turning pair detection into an actual deduplicated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """(id, component) for every node in `pairs`; component = min node
    id reachable.

    Hybrid execution: near-dup pair graphs are normally tiny relative
    to the corpus, so when the edge count is under
    ``driver_threshold`` the components are solved with an O(E·α)
    union-find on the driver (microseconds) instead of paying
    ~2 Spark jobs per propagation round. Larger graphs fall through to
    the distributed min-label loop below."""
    if driver_threshold:
        # take() both sizes the graph AND fetches it in one pass —
        # never compute the (possibly expensive) pair join twice.
        rows = pairs.select(src, dst).take(driver_threshold + 1)
        if len(rows) <= driver_threshold:
            return _driver_union_find(pairs.sparkSession, rows)
    return _distributed_components(pairs, src, dst, max_iter)


def _driver_union_find(spark, edge_rows) -> DataFrame:
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for row in edge_rows:
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the representative IS the component id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    rows = [(node, find(node)) for node in parent]
    return spark.createDataFrame(rows, "id long, component long")


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to
    min(Γ(u) ∪ {u}). `edges` must hold both directions."""
    mins = (
        edges.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    return (
        edges.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges (larger → smaller), then connect every smaller
    neighbor of u — and u itself — to min(Γ≤(u) ∪ {u})."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return relinked


def _distributed_components(
    pairs: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    """Alternating star contraction (see module docstring) — the
    100 TB path. Raises if `max_iter` rounds don't converge rather
    than returning silently-wrong labels."""
    nodes = (
        pairs.select(F.col(src).alias("id"))
        .unionByName(pairs.select(F.col(dst).alias("id")))
        .distinct()
        .persist()
    )
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )

    def _checksum(e: DataFrame) -> tuple:
        row = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev_chk = None
    final = None
    for _ in range(max_iter):
        grown = _large_star(edges)
        # small-star re-orients internally, so one direction suffices.
        # localCheckpoint truncates the lineage — without it the plan
        # tree doubles every round and stringification alone OOMs.
        contracted = _small_star(grown).localCheckpoint(eager=True)
        edges.unpersist()
        final = contracted
        cur = _checksum(contracted)
        if cur == prev_chk:
            break
        prev_chk = cur
        # No .distinct() here: both star ops dedup their own output,
        # and each begins with an agg/orient that absorbs duplicate
        # input edges — the explicit distinct was a wasted full
        # shuffle per round.
        edges = contracted.unionByName(
            contracted.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    else:
        nodes.unpersist()
        raise RuntimeError(f"star contraction did not converge in {max_iter} rounds")

    # converged star forest: (child → root). Roots and isolated-in-
    # pairs nodes map to themselves.
    child_to_root = final.select(F.col("u").alias("id"), F.col("v").alias("component"))
    labels = nodes.join(child_to_root, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
    return labels


def resolve_duplicates(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop all but the minimum-id member of every duplicate cluster."""
    comps = connected_components(pairs)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
