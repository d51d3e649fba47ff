"""Shared-boilerplate skew harness (round-8 verdict item #2).

The key-shifted-copy scaling corpora can NEVER produce the hot-value
hazard in the fingerprint/bucket caps: exact copies are removed by the
distinct-text collapse before the kernels run. This harness
synthesizes the case that survives the collapse — N DISTINCT texts
that all share one boilerplate block — so one fingerprint (winnowing)
and a large family of band buckets (MinHash LSH) hold corpus-sized
posting lists, and the CAP itself becomes the scaling term:

- cap_plan="window": count window over the hot key → the whole posting
  list is buffered in ONE task before the drop (straggler AQE cannot
  split; window partitions are exempt from skew mitigation).
- cap_plan="anti": groupBy-count (map-side partial agg — no list is
  ever gathered) → broadcast the over-cap keys → left-anti join.

Corpus: text = 30 shared boilerplate words + 10 doc-unique words
(every doc distinct; boilerplate ≈ 70% of each doc's shingles, so
band hashes collide across distinct docs and winnowing emits ~40
shared fingerprints present in EVERY doc).

Usage: python scripts/scaling_boilerplate.py [--sizes 4000,40000,400000]
Prints one JSON line per (query, plan): wall at each size + step
ratios (each step is 10× the docs; linear plans ⇒ ratio ≈ 10).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.session import get_spark, materialize, release_all_caches

ROOT = Path(__file__).resolve().parents[1]
BOILER_WORDS = [f"boiler{i:02d}" for i in range(30)]
BOILER = " ".join(BOILER_WORDS)


def build_corpus(spark, n_docs: int) -> str:
    out = ROOT / ".tmp" / "boiler" / str(n_docs)
    marker = out / "_DONE"
    if not marker.exists():
        uniq = F.concat_ws(
            " ", *[F.concat(F.lit(f"u{j}x"), F.col("id").cast("string")) for j in range(10)]
        )
        docs = (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit(BOILER + " "), uniq).alias("text"),
                F.lit("en").alias("lang"),
                F.lit("boiler").alias("source"),
            )
            .withColumn("n_chars", F.length("text").cast("long"))
        )
        docs.repartition(32).write.mode("overwrite").parquet(str(out / "documents.parquet"))
        marker.touch()
    return str(out)


#: Hostile vocabulary: 10 words → 1000 possible word-trigrams. Docs
#: are DISTINCT pseudorandom 40-word sequences over this vocabulary,
#: so EVERY shingle of every doc is corpus-hot (df ≈ 0.038·n) and no
#: doc-unique shingle exists for the rare-first prefix to hide in —
#: the all-boilerplate worst case the shared-block corpus above
#: cannot express (there the 10 unique words kept the prefix cold).
HOSTILE_VOCAB = [f"hw{i}" for i in range(10)]


def build_hostile_corpus(spark, n_docs: int) -> str:
    out = ROOT / ".tmp" / "hostile" / str(n_docs)
    marker = out / "_DONE"
    if not marker.exists():
        # word_j(i) = V[ murmur3(i, j) mod 10 ] — deterministic,
        # pseudorandom spread; distinct texts w.h.p. (space 10^40),
        # and the distinct-text collapse removes any collision anyway.
        words = [
            F.element_at(
                F.array(*[F.lit(w) for w in HOSTILE_VOCAB]),
                (F.pmod(F.hash(F.col("id"), F.lit(j)), F.lit(10)) + 1).cast("int"),
            )
            for j in range(40)
        ]
        docs = (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", *words).alias("text"),
                F.lit("en").alias("lang"),
                F.lit("hostile").alias("source"),
            )
            .withColumn("n_chars", F.length("text").cast("long"))
        )
        docs.repartition(32).write.mode("overwrite").parquet(str(out / "documents.parquet"))
        marker.touch()
    return str(out)


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4000,40000,400000")
    ap.add_argument("--plans", default="window,anti")
    ap.add_argument("--queries", default="", help="comma filter on query names")
    ap.add_argument(
        "--corpus",
        default="shared",
        choices=["shared", "hostile"],
        help="shared = 30 boilerplate + 10 unique words; hostile = 100%% hot vocabulary",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_spark(app_name="scaling_boilerplate")
    spark.sparkContext.setLogLevel("ERROR")
    builder = build_hostile_corpus if args.corpus == "hostile" else build_corpus
    dirs = {n: builder(spark, n) for n in sizes}

    from data_frame_demo_etl_spark.dedup.minhash import minhash_near_dup_pairs
    from data_frame_demo_etl_spark.dedup.winnowing import docs_winnowing_matches
    from data_frame_demo_etl_spark.sources.catalog import load_table

    def winnow(plan):
        def run(sf_dir):
            materialize(docs_winnowing_matches(spark, sf_dir, cap_plan=plan))

        return run

    def minhash(plan):
        # gate-shaped call (md5-portable, 8×4 bands, cap 200) on the
        # raw corpus — all docs distinct, so no upstream collapse
        # shields the buckets.
        def run(sf_dir):
            docs = load_table(spark, "documents", sf_dir)
            materialize(minhash_near_dup_pairs(
                docs, "doc_id", "text", hash_fn="md5", cap_plan=("agg" if plan == "window" else "anti")
            ))

        return run

    def substring(_plan):
        # D17: one kernel row per character position — the densest
        # shape in the dedup family; the boilerplate hashes are hot
        # keys in the shared-h semi-join (one row per DOC per
        # boilerplate position), which AQE skew-splits.
        def run(sf_dir):
            from data_frame_demo_etl_spark.dedup.substring import (
                docs_exact_substring_mass,
            )

            materialize(docs_exact_substring_mass(spark, sf_dir))

        return run

    def remover(_plan):
        # D18: chars-level coverage join + string rebuild — every doc
        # carries the same ~250 hot intervals, the densest per-doc
        # work in the family.
        def run(sf_dir):
            from data_frame_demo_etl_spark.dedup.substring import (
                docs_remove_duplicate_spans,
            )

            materialize(docs_remove_duplicate_spans(spark, sf_dir))

        return run

    def containment(_plan):
        # D20: one-sided prefix join — the rare-first defense is what
        # this corpus stresses: every doc's 30 boilerplate words make
        # ~70% of its shingles corpus-hot, and the prefix (10% of
        # shingles at t=0.9) must stay on the 10 doc-unique words for
        # the candidate join to stay linear.
        def run(sf_dir):
            from data_frame_demo_etl_spark.dedup.jaccard import containment_pairs

            docs = load_table(spark, "documents", sf_dir)
            materialize(containment_pairs(docs, threshold=0.9))

        return run

    def containment_capped(_plan):
        # D20 with the K8 hot-block cap: reps whose prefix holds an
        # over-cap shingle are diverted to quarantine rows instead of
        # exploding the candidate join — the 100 TB posture on an
        # all-boilerplate corpus (exact results for every other doc).
        def run(sf_dir):
            from data_frame_demo_etl_spark.dedup.jaccard import containment_pairs

            docs = load_table(spark, "documents", sf_dir)
            materialize(containment_pairs(docs, threshold=0.9, prefix_df_cap=1000))

        return run

    jobs = [
        ("dedup_containment", containment, ["anti"]),
        ("dedup_containment_capped", containment_capped, ["anti"]),
        ("docs_winnowing_matches", winnow, args.plans.split(",")),
        ("minhash_lsh_pairs", minhash, args.plans.split(",")),
        ("docs_exact_substring_mass", substring, ["anti"]),
        ("docs_remove_duplicate_spans", remover, ["anti"]),
    ]
    if args.queries:
        keep = set(args.queries.split(","))
        jobs = [j for j in jobs if j[0] in keep]
    results = []
    for qname, mk, plans in jobs:
        for plan in plans:
            walls = {}
            for n in sizes:
                run = mk(plan)
                run(dirs[n])  # warm: codegen + page cache, like scaling.py
                release_all_caches(spark)
                walls[n] = timed(lambda: run(dirs[n]))
                release_all_caches(spark)
            ratios = [
                round(walls[sizes[i + 1]] / max(walls[sizes[i]], 1e-9), 1)
                for i in range(len(sizes) - 1)
            ]
            row = {"query": qname, "plan": plan, "walls": walls, "step_ratios": ratios}
            print(json.dumps(row), flush=True)
            results.append(row)
    spark.stop()


if __name__ == "__main__":
    main()
