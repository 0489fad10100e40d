from __future__ import annotations

import numpy as np
import pytest

from cdr_analysis_tools_hadoop_spark.operators import clustering
from cdr_analysis_tools_hadoop_spark.sources import synthetic


@pytest.fixture(scope="module")
def emb(spark):
    return synthetic.embeddings_df(spark, 1000, dup_every=10, partitions=8)


def test_refine_assign_covers_corpus_and_all_seeds(emb):
    rows = clustering.kmeans_refine_assign(emb, k=4).collect()
    assert len(rows) == 1000
    assert {r.cluster for r in rows} <= set(range(4))
    # every vector gets exactly one assignment with a sane cosine
    assert len({r.vec_id for r in rows}) == 1000
    assert all(-1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9 for r in rows)


def test_kmeans_fit_deterministic_across_partitioning(spark):
    a = synthetic.embeddings_df(spark, 800, dup_every=10, partitions=3)
    b = synthetic.embeddings_df(spark, 800, dup_every=10, partitions=13)
    ca = clustering.kmeans_fit(a, k=4, n_iters=4)
    cb = clustering.kmeans_fit(b, k=4, n_iters=4)
    # centroid rounding quantizes away FP accumulation-order noise,
    # so two partitionings must produce the bit-identical model
    assert np.array_equal(ca, cb)


def test_kmeans_fit_requires_seed_rows(spark):
    from pyspark.sql import functions as F

    few = synthetic.embeddings_df(spark, 100, partitions=2).filter(
        F.col("vec_id") >= 5
    )
    with pytest.raises(ValueError, match="seeds"):
        clustering.kmeans_fit(few, k=8)


def test_kmeans_improves_objective_over_refine_seeds(emb):
    """The converged model's mean cosine must be >= the one-step
    refine's — Lloyd iterations never decrease the objective (up to
    the 1e-6 centroid quantization)."""
    one = clustering.kmeans_refine_assign(emb, k=4).agg({"cosine": "avg"}).collect()[0][0]
    full = (
        clustering.embedding_kmeans(emb, k=4, n_iters=8)
        .agg({"cosine": "avg"})
        .collect()[0][0]
    )
    assert full >= one - 1e-4


def test_kmeans_assign_is_map_only(emb):
    cents = np.zeros((4, 64))
    cents[:, 0] = [1, 2, 3, 4]
    plan = clustering.kmeans_assign(emb, cents)._jdf.queryExecution().executedPlan().toString()
    # literal-centroid assignment must not shuffle or join
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_semantic_dedup_seeded_recall_and_no_false_positives(spark):
    emb = synthetic.embeddings_df(spark, 1000, dup_every=10, partitions=8)
    out = clustering.semantic_dedup(emb, k=4, threshold=0.90).collect()
    assert len(out) == 1000
    cl = {r.vec_id: r.cluster for r in out}
    dropped = {r.vec_id for r in out if not r.keep}
    seeded = {i for i in range(1000) if i % 10 == 0 and i > 0}
    same_cluster = {i for i in seeded if cl[i] == cl[i - 1]}
    # every seeded dup that landed with its source is caught
    assert same_cluster <= dropped
    # cross-cluster misses are the documented SemDeDup approximation;
    # they must be few (tight pairs almost always co-cluster)
    assert len(same_cluster) >= 0.9 * len(seeded)
    # random non-dup vectors at threshold 0.90 never collide
    assert dropped <= seeded


def test_gemm_and_sql_assignment_equivalent(emb):
    cents = clustering.kmeans_fit(emb, k=4, n_iters=3, mode="sql")
    a = {
        r.vec_id: (r.cluster, round(r.cosine, 6))
        for r in clustering.kmeans_assign(emb, cents, mode="sql").collect()
    }
    b = {
        r.vec_id: (r.cluster, round(r.cosine, 6))
        for r in clustering.kmeans_assign(emb, cents, mode="gemm").collect()
    }
    assert a == b


def test_zero_norm_vector_scores_zero_in_both_modes(spark):
    """A zero-norm embedding is a valid row; under ANSI mode the
    unguarded sql path would raise DIVIDE_BY_ZERO (not NULL) and the
    sql/gemm equivalence with it. Both modes must assign cosine 0.0
    and the lowest cluster id."""
    from cdr_analysis_tools_hadoop_spark.functions import vec

    rows = [(0, [0.0] * vec.DIM, "a")]
    rows += [
        (i, [float((i * 7 + j) % 5 - 2) for j in range(vec.DIM)], "b")
        for i in range(1, 9)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    cents = clustering.kmeans_fit(df, k=3, n_iters=2, mode="gemm")
    a = {
        r.vec_id: (r.cluster, round(r.cosine, 6))
        for r in clustering.kmeans_assign(df, cents, mode="sql").collect()
    }
    b = {
        r.vec_id: (r.cluster, round(r.cosine, 6))
        for r in clustering.kmeans_assign(df, cents, mode="gemm").collect()
    }
    assert a == b
    assert a[0] == (0, 0.0)


def test_gemm_and_sql_fit_identical_model(spark):
    e = synthetic.embeddings_df(spark, 600, dup_every=10, partitions=5)
    ms = clustering.kmeans_fit(e, k=4, n_iters=4, mode="sql")
    mg = clustering.kmeans_fit(e, k=4, n_iters=4, mode="gemm")
    # the 6-decimal centroid quantization absorbs the GEMM-vs-fold
    # accumulation-order difference, so the models are bit-identical
    assert np.array_equal(ms, mg)


def test_ivf_trained_full_probe_equals_bruteforce(emb):
    from cdr_analysis_tools_hadoop_spark.operators import similarity

    exact = {
        (r.query_id, r.rank): (r.vec_id, round(r.cosine, 6))
        for r in similarity.cosine_topk(emb, k=5, n_queries=8).collect()
    }
    ivf = {
        (r.query_id, r.rank): (r.vec_id, round(r.cosine, 6))
        for r in clustering.cosine_topk_ivf_trained(
            emb, k=5, n_queries=8, nlist=4, nprobe=4, n_iters=3
        ).collect()
    }
    # probing every list scores every candidate: EXACT equality
    assert ivf == exact


def test_ivf_trained_partial_probe_recall(emb):
    from cdr_analysis_tools_hadoop_spark.operators import similarity

    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(emb, k=5, n_queries=8).collect()
    }
    ivf = {
        (r.query_id, r.vec_id)
        for r in clustering.cosine_topk_ivf_trained(
            emb, k=5, n_queries=8, nlist=8, nprobe=3, n_iters=3
        ).collect()
    }
    # lossy by design; the probe set must still recover most of the
    # true top-k (random 64-dim vectors, 3/8 lists probed)
    assert len(ivf & exact) >= 0.5 * len(exact)
