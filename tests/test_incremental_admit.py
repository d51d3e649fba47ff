"""Planted X20 incremental-admit: hand-checked assignment, probe,
admission decisions, and the frozen-anchor batch-vs-rebuild pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.similarity.ivf import incremental_admit

CENTS = [[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]]


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_admit_reject_and_empty_list(spark):
    """id1 ≈ corpus id0 (same posting list, cosine ≈ 1) → rejected;
    id3 lands in id2's list at cosine ≈ 0.64, below the 0.7 line →
    admitted; id5 assigns to the EMPTY third list → admitted with
    NULL nn."""
    corpus = _vecs(spark, [(0, [1.0, 0.05]), (2, [0.6, 0.75])])
    batch = _vecs(spark, [(1, [0.99, 0.049]), (3, [-0.2, 1.0]), (5, [-1.0, -1.0])])
    out = {
        r.vec_id: r
        for r in incremental_admit(corpus, batch, CENTS, dup_threshold=0.7).collect()
    }
    assert len(out) == 3
    r1 = out[1]
    assert (r1.cluster, r1.nn_id, r1.admitted) == (0, 0, False)
    assert r1.nn_cosine > 0.99
    r3 = out[3]
    assert (r3.cluster, r3.nn_id, r3.admitted) == (1, 2, True)
    assert 0.6 < r3.nn_cosine < 0.7
    r5 = out[5]
    assert (r5.cluster, r5.nn_id, r5.nn_cosine, r5.admitted) == (2, None, None, True)


def test_top1_tie_breaks_to_lowest_id(spark):
    """Two corpus vectors at identical cosine to the probe: the nn is
    the LOWER id (the X1 total order)."""
    corpus = _vecs(spark, [(10, [1.0, 0.0]), (4, [2.0, 0.0])])  # same direction
    batch = _vecs(spark, [(1, [3.0, 0.0])])
    r = incremental_admit(corpus, batch, CENTS).collect()[0]
    assert (r.nn_id, r.nn_cosine, r.admitted) == (4, 1.0, False)


def test_batch_vs_rebuild_identical(spark):
    """Frozen anchors make incremental admission EQUAL a full rebuild:
    probing batch2 against (corpus + admitted batch1) is bit-identical
    to probing it against an index built from scratch on the union —
    the invariant that makes no-refit maintenance sound."""
    corpus = _vecs(spark, [(0, [1.0, 0.05]), (2, [0.05, 1.0])])
    batch1 = _vecs(spark, [(3, [-1.0, 0.2])])  # admitted (near-orthogonal)
    out1 = incremental_admit(corpus, batch1, CENTS)
    admitted_ids = [r.vec_id for r in out1.filter(F.col("admitted")).collect()]
    assert admitted_ids == [3]

    grown = corpus.unionByName(batch1)  # incremental index after admit
    batch2 = _vecs(spark, [(7, [-0.9, 0.3]), (9, [0.9, 0.1])])
    inc = sorted(tuple(r) for r in incremental_admit(grown, batch2, CENTS).collect())
    rebuilt = sorted(
        tuple(r)
        for r in incremental_admit(
            _vecs(
                spark,
                [(0, [1.0, 0.05]), (2, [0.05, 1.0]), (3, [-1.0, 0.2])],
            ),
            batch2,
            CENTS,
        ).collect()
    )
    assert inc == rebuilt


def test_gate_shape(spark, sf_oracle_dir):
    from data_frame_demo_etl_spark.similarity.ivf import ann_incremental_admit

    out = ann_incremental_admit(spark, sf_oracle_dir).toPandas()
    assert list(out.columns) == ["vec_id", "cluster", "nn_id", "nn_cosine", "admitted"]
    assert len(out) == 20
    assert (out.vec_id % 2 == 1).all()


def test_delete_compact_counts_and_flag(spark):
    """Cluster 0 holds {0, 10} and loses 10 (50% live → flagged);
    cluster 1 holds {2} and loses nothing."""
    from data_frame_demo_etl_spark.similarity.ivf import index_delete_compact

    corpus = _vecs(spark, [(0, [1.0, 0.0]), (10, [0.9, 0.1]), (2, [0.0, 1.0])])
    tomb = _vecs(spark, [(10, [0.9, 0.1])]).select("vec_id")
    got = {r.cluster: r for r in index_delete_compact(corpus, tomb, CENTS).collect()}
    c0, c1 = got[0], got[1]
    assert (c0.n_before, c0.n_deleted, c0.n_after, c0.live_ppm, c0.needs_compaction) == (
        2, 1, 1, 500_000, False,
    )
    assert (c1.n_before, c1.n_deleted, c1.n_after, c1.live_ppm, c1.needs_compaction) == (
        1, 0, 1, 1_000_000, False,
    )
    # flag fires strictly below the line
    flagged = {
        r.cluster: r.needs_compaction
        for r in index_delete_compact(corpus, tomb, CENTS, compact_below_ppm=600_000).collect()
    }
    assert flagged[0] is True and flagged[1] is False


def test_compacted_probe_never_returns_tombstoned(spark):
    """Frozen anchors: probing the compacted index equals probing an
    index built WITHOUT the tombstoned rows, and no deleted id can be
    a nearest neighbor."""
    from pyspark.sql import functions as F

    corpus = _vecs(spark, [(0, [1.0, 0.05]), (10, [0.99, 0.06]), (2, [0.05, 1.0])])
    tomb_ids = [10]
    compacted = corpus.filter(~F.col("vec_id").isin(tomb_ids))
    batch = _vecs(spark, [(1, [0.98, 0.05])])
    inc = sorted(tuple(r) for r in incremental_admit(compacted, batch, CENTS).collect())
    rebuilt = sorted(
        tuple(r)
        for r in incremental_admit(
            _vecs(spark, [(0, [1.0, 0.05]), (2, [0.05, 1.0])]), batch, CENTS
        ).collect()
    )
    assert inc == rebuilt
    assert all(r[2] not in tomb_ids for r in inc)  # nn_id never tombstoned
