"""Entity resolution / record linkage: blocked fuzzy matching.

The classic two-phase ER shape (Fellegi-Sunter era onward, same
pattern as Dedoop/Magellan-style systems): a cheap BLOCKING key bounds
the quadratic candidate space to within-block pairs, then an
edit-distance VERIFY pass scores the survivors. Identical in spirit to
the LSH-band/prefix-filter pattern the near-dup dedup family uses —
blocking IS the relational equivalent of bucketing.

Scale shape: one equi-join on the blocking key (shuffle bounded by
block sizes — pick keys that keep blocks ≲10⁴), `levenshtein` runs
JVM-side inside codegen, and the `id_a < id_b` predicate halves the
pair space before the verify. No cartesian anywhere: a degenerate
blocking key (every row in one block — a common surname, an
empty-string key) is the ER analog of a hot LSH bucket, and since
round 7 it is capped the same way (`max_block_size`, the
`cap_hot_buckets` pattern from minhash.py): blocks larger than the
cap are DROPPED before the pair-producing self-join, bounding the
candidate space to blocks×cap²/2 regardless of key degeneracy.
Records dropped this way should be re-blocked on a finer key — the
cap turns a silent quadratic blowup into a bounded, auditable loss
(`blocked_fuzzy_dropped_blocks` reports exactly what the cap
excluded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

#: Default hot-block cap: one block of this size costs ~500k verify
#: pairs — the largest bounded cost a single degenerate key may
#: impose before we call it a blocking-key bug rather than data.
MAX_BLOCK_SIZE = 1000


def _capped_blocks(s: DataFrame, max_block_size: int | None) -> DataFrame:
    """Drop blocks larger than the cap before any self-join.
    groupBy-count (map-side partial agg — the hot block's rows reduce
    to one count per map task, never gathered) → left-anti join on the
    over-cap keys (≤ n_rows / cap by construction; join strategy left
    to AQE — see minhash.cap_hot_buckets for why the broadcast must
    not be forced). The r8 re-plan of the minhash.cap_hot_buckets
    pattern: the former count window put a hot block's ENTIRE row set
    in one task's window buffer before dropping it — a straggler AQE
    cannot split (window partitions are exempt from skew
    mitigation)."""
    if max_block_size is None:
        return s
    hot = (
        s.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_block_size)
        .select("blk")
    )
    return s.join(hot, "blk", "left_anti")


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_edit: int = 1,
    max_block_size: int | None = MAX_BLOCK_SIZE,
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, edit_distance) for within-block
    pairs whose names are within ``max_edit`` Levenshtein distance.

    Blocks with more than ``max_block_size`` members are dropped
    before the self-join (pass ``None`` to disable): a hot block is
    quadratic in its size, and at corpus scale one degenerate key
    dominates the whole job. Use `blocked_fuzzy_dropped_blocks` to
    audit what a given cap excludes.

    Scale shape (the round-7 re-plan, same construction as the image
    pair dedup): the Levenshtein verify runs over DISTINCT (blk, name)
    VALUES — a corpus with d exact copies per name otherwise pays
    d² verify comparisons per name pair (measured 36.6× wall for 10×
    data on a 10×-name-duplicated corpus; 2.0× after). Row pairs are
    then EXPANDED from the matched value pairs (cross-name) plus the
    within-name C(copies, 2) pairs at edit 0 — output is row-for-row
    what the uncollapsed join produces, and the remaining cost IS the
    quadratic-under-duplication pair listing itself."""
    s = df.select(
        F.col(id_col).alias("id"), F.col(name_col).alias("name"), block.alias("blk")
    )
    s = _capped_blocks(s, max_block_size).persist()
    vals = s.select("blk", "name").distinct()
    va = vals.select("blk", F.col("name").alias("name_a"))
    vb = vals.select("blk", F.col("name").alias("name_b"))
    vpairs = (
        va.join(vb, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_distance") <= max_edit)
    )
    ra = s.select("blk", F.col("name").alias("name_a"), F.col("id").alias("__ida"))
    rb = s.select("blk", F.col("name").alias("name_b"), F.col("id").alias("__idb"))
    cross = (
        vpairs.join(ra, ["blk", "name_a"])
        .join(rb, ["blk", "name_b"])
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
            F.when(F.col("__ida") < F.col("__idb"), F.col("name_a"))
            .otherwise(F.col("name_b"))
            .alias("name_a"),
            F.when(F.col("__ida") < F.col("__idb"), F.col("name_b"))
            .otherwise(F.col("name_a"))
            .alias("name_b"),
            "edit_distance",
        )
    )
    m1 = s.select("blk", "name", F.col("id").alias("id_a"))
    m2 = s.select("blk", "name", F.col("id").alias("id_b"))
    within = (
        m1.join(m2, ["blk", "name"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.col("name").alias("name_a"),
            F.col("name").alias("name_b"),
            F.lit(0).cast("long").alias("edit_distance"),
        )
    )
    return within.unionByName(cross).orderBy("id_a", "id_b")


def blocked_fuzzy_dropped_blocks(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_block_size: int = MAX_BLOCK_SIZE,
) -> DataFrame:
    """(blk, n_records) for every block the cap would drop — the
    explicit accounting side of `blocked_fuzzy_pairs`: run it with the
    same key and cap to see exactly which records never entered the
    verify join (and re-block those on a finer key)."""
    s = df.select(F.col(id_col).alias("id"), block.alias("blk"))
    return (
        s.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(F.col("n_records") > max_block_size)
        .orderBy("blk")
    )


def supplier_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: near-identical supplier names (≤1 edit) blocked on the
    first 7 digits of the name's numeric suffix — blocks of ≤100
    records at every scale factor, so the verify join is bounded."""
    supplier = load_table(spark, "supplier", sf_dir)
    return blocked_fuzzy_pairs(
        supplier,
        id_col="s_suppkey",
        name_col="s_name",
        block=F.substring("s_name", 10, 7),
        max_edit=1,
        max_block_size=MAX_BLOCK_SIZE,
    )


SUPPLIER_FUZZY_MATCHES_SQL = f"""
WITH s0 AS (
  SELECT s_suppkey AS id, s_name AS name, SUBSTRING(s_name, 10, 7) AS blk
  FROM supplier
),
s AS (
  SELECT * FROM (
    SELECT s0.*, COUNT(*) OVER (PARTITION BY blk) AS bn FROM s0
  ) WHERE bn <= {MAX_BLOCK_SIZE}
)
SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
       CAST(LEVENSHTEIN(a.name, b.name) AS BIGINT) AS edit_distance
FROM s a
JOIN s b ON a.blk = b.blk AND a.id < b.id
WHERE LEVENSHTEIN(a.name, b.name) <= 1
ORDER BY id_a, id_b
"""


# Fellegi–Sunter field weights in integer centi-bits, PRE-COMPUTED so
# no engine evaluates a log: w = round(100·log2(m/u)) for agreement,
# round(100·log2((1−m)/(1−u))) for disagreement, with (m, u) the
# match/unmatch agreement probabilities per field. Standard record-
# linkage priors for a name-edit field and a categorical field.
FS_WEIGHTS = {
    # field: (agree_centibits, disagree_centibits)
    "name": (971, -656),    # m=0.98, u=0.005 → log2 ≈ 9.71 / −6.56
    "nation": (458, -423),  # m=0.95, u=0.044 → log2 ≈ 4.58 / −4.23
}
FS_THRESHOLD = 500  # centibits: ≥ 5 bits of evidence → link


def fellegi_sunter_scores(
    pairs: DataFrame,
    name_agree: "Column",
    nation_agree: "Column",
) -> DataFrame:
    """Attach the Fellegi–Sunter composite match weight (integer
    centi-bits) and the link/possible/non-link decision to candidate
    pairs. Exact integer arithmetic; the classic two-threshold rule
    collapses to one threshold here (audit review band omitted)."""
    na_w = F.when(name_agree, F.lit(FS_WEIGHTS["name"][0])).otherwise(
        F.lit(FS_WEIGHTS["name"][1])
    )
    nt_w = F.when(nation_agree, F.lit(FS_WEIGHTS["nation"][0])).otherwise(
        F.lit(FS_WEIGHTS["nation"][1])
    )
    return pairs.withColumn(
        "fs_centibits", (na_w + nt_w).cast("long")
    ).withColumn("is_link", F.col("fs_centibits") >= FS_THRESHOLD)


def supplier_er_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: Fellegi–Sunter scoring over the blocked supplier
    candidate pairs (K8's blocking+verify, now with the probabilistic
    decision layer real record linkage runs): name agreement = edit
    distance ≤ 1, nation agreement = same s_nationkey; composite
    weight in exact integer centi-bits, link decision at ≥ 5 bits."""
    supplier = load_table(spark, "supplier", sf_dir)
    s = supplier.select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nation"),
        F.substring("s_name", 10, 7).alias("blk"),
    )
    # Same round-7 distinct-value collapse as blocked_fuzzy_pairs: the
    # verify join runs over DISTINCT (blk, name, nation) triples, and
    # row pairs expand from the matched triple pairs. edit_distance,
    # fs_centibits and is_link depend only on the triple pair, so they
    # are computed once per VALUE pair, never per row pair.
    s = _capped_blocks(s, MAX_BLOCK_SIZE).persist()
    vals = s.select("blk", "name", "nation").distinct()
    va = vals.select(
        "blk", F.col("name").alias("name_a"), F.col("nation").alias("nation_a")
    )
    vb = vals.select(
        "blk", F.col("name").alias("name_b"), F.col("nation").alias("nation_b")
    )
    vpairs = (
        va.join(vb, "blk")
        .filter(
            F.struct("name_a", "nation_a") < F.struct("name_b", "nation_b")
        )
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_distance") <= 2)
    )
    scored_vals = fellegi_sunter_scores(
        vpairs,
        name_agree=F.col("edit_distance") <= 1,
        nation_agree=F.col("nation_a") == F.col("nation_b"),
    )
    ra = s.select(
        "blk", F.col("name").alias("name_a"), F.col("nation").alias("nation_a"),
        F.col("id").alias("__ida"),
    )
    rb = s.select(
        "blk", F.col("name").alias("name_b"), F.col("nation").alias("nation_b"),
        F.col("id").alias("__idb"),
    )
    cross = (
        scored_vals.join(ra, ["blk", "name_a", "nation_a"])
        .join(rb, ["blk", "name_b", "nation_b"])
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
            "edit_distance",
            "fs_centibits",
            "is_link",
        )
    )
    within_fs = FS_WEIGHTS["name"][0] + FS_WEIGHTS["nation"][0]
    m1 = s.select("blk", "name", "nation", F.col("id").alias("id_a"))
    m2 = s.select("blk", "name", "nation", F.col("id").alias("id_b"))
    within = (
        m1.join(m2, ["blk", "name", "nation"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.lit(0).cast("long").alias("edit_distance"),
            F.lit(within_fs).cast("long").alias("fs_centibits"),
            F.lit(within_fs >= FS_THRESHOLD).alias("is_link"),
        )
    )
    return within.unionByName(cross).orderBy("id_a", "id_b")


SUPPLIER_ER_SCORES_SQL = f"""
WITH s0 AS (
  SELECT s_suppkey AS id, s_name AS name, s_nationkey AS nation,
         SUBSTR(s_name, 10, 7) AS blk
  FROM supplier
),
s AS (
  SELECT * FROM (
    SELECT s0.*, COUNT(*) OVER (PARTITION BY blk) AS bn FROM s0
  ) WHERE bn <= {MAX_BLOCK_SIZE}
),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(LEVENSHTEIN(a.name, b.name) AS BIGINT) AS edit_distance,
         a.nation = b.nation AS nation_agree
  FROM s a JOIN s b ON a.blk = b.blk AND a.id < b.id
  WHERE LEVENSHTEIN(a.name, b.name) <= 2
)
SELECT id_a, id_b, edit_distance,
       CAST((CASE WHEN edit_distance <= 1 THEN {FS_WEIGHTS['name'][0]} ELSE {FS_WEIGHTS['name'][1]} END)
          + (CASE WHEN nation_agree THEN {FS_WEIGHTS['nation'][0]} ELSE {FS_WEIGHTS['nation'][1]} END) AS BIGINT) AS fs_centibits,
       ((CASE WHEN edit_distance <= 1 THEN {FS_WEIGHTS['name'][0]} ELSE {FS_WEIGHTS['name'][1]} END)
          + (CASE WHEN nation_agree THEN {FS_WEIGHTS['nation'][0]} ELSE {FS_WEIGHTS['nation'][1]} END)) >= {FS_THRESHOLD} AS is_link
FROM cand
ORDER BY id_a, id_b
"""
