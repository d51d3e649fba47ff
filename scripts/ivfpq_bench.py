"""IVF-PQ composition sweep: recall@k and latency across nprobe ×
(m, nbits) at sf0.1, against brute-force cosine ground truth.

Usage: python scripts/ivfpq_bench.py [sf_dir]
Prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from data_frame_demo_etl_spark.session import get_spark  # noqa: E402
from data_frame_demo_etl_spark.sources.catalog import load_table  # noqa: E402
from data_frame_demo_etl_spark.similarity.ann import brute_force_topk  # noqa: E402
from data_frame_demo_etl_spark.similarity.ivfpq import fit_ivfpq, ivfpq_topk  # noqa: E402

K = 10
N_QUERIES = 20
K_COARSE = 16


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ivfpq_bench", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load_table(spark, "embeddings", sf)
    queries = corpus.orderBy("vec_id").limit(N_QUERIES).selectExpr(
        "vec_id AS query_id", "embedding"
    )
    queries_pd = queries.toPandas()

    exact = brute_force_topk(corpus, queries, k=K).toPandas()
    truth = {
        q: set(g["neighbor_id"]) for q, g in exact.groupby("query_id")
    }

    print(f"| m | nbits | nprobe | recall@{K} | query wall (s, best of 2) |")
    print("|---|---|---|---|---|")
    for m, nbits in ((8, 6), (8, 8), (16, 6)):
        encoded, centroids, codebooks = fit_ivfpq(
            corpus, k_coarse=K_COARSE, m=m, nbits=nbits
        )
        encoded = encoded.persist()
        encoded.count()
        for nprobe in (1, 2, 4, 8, K_COARSE):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                got = ivfpq_topk(
                    encoded, centroids, codebooks, queries_pd, k=K, nprobe=nprobe
                ).toPandas()
                best = min(best, time.perf_counter() - t0)
            hits = sum(
                len(set(g["neighbor_id"]) & truth[q]) for q, g in got.groupby("query_id")
            )
            recall = hits / (len(truth) * K)
            print(f"| {m} | {nbits} | {nprobe} | {recall:.3f} | {best:.3f} |")
        encoded.unpersist()
    # Posting-list pruning factor: rows scored per query at nprobe=1
    # vs full probe is ~1/K_COARSE of the corpus (balanced clusters).
    sizes = encoded.groupBy("cluster").count().toPandas()["count"]
    print(
        f"\ncluster sizes: min={sizes.min()} p50={int(np.median(sizes))} "
        f"max={sizes.max()} (corpus {sizes.sum()}, k_coarse={K_COARSE})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
