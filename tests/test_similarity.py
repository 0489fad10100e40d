from __future__ import annotations

import numpy as np
import pytest

from cdr_analysis_tools_hadoop_spark.functions import vec
from cdr_analysis_tools_hadoop_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def np_vectors(emb):
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    return ids, V


def test_topk_matches_numpy_bruteforce(emb, np_vectors):
    ids, V = np_vectors
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn @ Vn.T
    got = similarity.cosine_topk(emb, k=5, n_queries=5).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
    for q, neigh in by_query.items():
        qi = int(np.where(ids == q)[0][0])
        order = np.argsort(-C[qi])
        expected = [int(ids[j]) for j in order if ids[j] != q][:5]
        assert [v for _, v, _ in sorted(neigh)] == expected
        for _, v, cos in neigh:
            vi = int(np.where(ids == v)[0][0])
            assert abs(cos - C[qi, vi]) < 1e-5


def test_lsh_topk_subset_of_bruteforce_candidates(emb):
    """LSH only PRUNES: every (query, neighbour) it returns must have a
    cosine equal to the brute-force cosine for that pair."""
    brute = {
        (r.query_id, r.vec_id): r.cosine
        for r in similarity.cosine_topk(emb, k=500, n_queries=5).collect()
    }
    for r in similarity.cosine_topk_lsh(emb, k=5, n_queries=5).collect():
        assert brute[(r.query_id, r.vec_id)] == r.cosine


def test_same_bucket_for_identical_vectors(spark):
    sig = vec.lsh_sig_sql("embedding", "spark", dim=4)
    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5, 3.0]), (2, [1.0, -2.0, 0.5, 3.0])],
        "vec_id long, embedding array<double>",
    )
    out = df.selectExpr(f"{sig} AS bucket").collect()
    assert out[0].bucket == out[1].bucket


def test_knn_label_vote_one_row_per_query(emb):
    rows = similarity.knn_label_vote(emb, k=5, n_queries=8).collect()
    assert len(rows) == 8
    assert all(1 <= r.votes <= 5 for r in rows)


def test_near_dup_banded_recall_vs_exact(emb):
    """near_dup_pairs is banded LSH + exact verify: every returned
    pair must appear in the all-pairs exact baseline with the same
    cosine (no false positives), and recall at the loose 0.4 contract
    threshold must be >= 95% — the banding is derived from the
    threshold (vec.banding_for_threshold, 99% design target), not a
    fixed (bands, rows) tuned for tight thresholds only."""
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in similarity.near_dup_pairs_exact(emb).collect()
    }
    banded = {
        (r.vec_a, r.vec_b): r.cosine
        for r in similarity.near_dup_pairs(emb).collect()
    }
    assert set(banded) <= set(exact)
    for pair, cos in banded.items():
        assert cos == exact[pair]
    assert len(banded) / len(exact) >= 0.95


def test_near_dup_recall_at_tight_threshold(spark):
    """Recall >= 95% at a TIGHT 0.9 threshold too. The parquet corpus
    has no >=0.9 pairs, so build one: 40 base vectors plus a small
    deterministic perturbation of each (cosine ~0.95-0.99)."""
    rng = np.random.default_rng(777)
    base = rng.normal(size=(40, vec.DIM))
    noise = rng.normal(size=(40, vec.DIM))
    pert = base + 0.18 * noise
    rows = [
        (int(i), [float(x) for x in v], "x")
        for i, v in enumerate(np.concatenate([base, pert]))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    exact = {
        (r.vec_a, r.vec_b)
        for r in similarity.near_dup_pairs_exact(df, threshold=0.9).collect()
    }
    banded = {
        (r.vec_a, r.vec_b)
        for r in similarity.near_dup_pairs(df, threshold=0.9).collect()
    }
    assert len(exact) >= 20  # fixture really produced tight pairs
    assert banded <= exact
    assert len(banded) / len(exact) >= 0.95


def test_banding_for_threshold_curve():
    """Derived (bands, rows) meet the design recall on the iid curve
    and respect the band budget at representative thresholds."""
    import math

    for t in (0.2, 0.4, 0.7, 0.9, 0.99):
        b, r = vec.banding_for_threshold(t)
        p = 1.0 - math.acos(t) / math.pi
        assert 1 - (1 - p**r) ** b >= 0.99
        assert 1 <= b <= 32 and 1 <= r <= 8


def test_near_dup_fused_and_split_plans_agree(emb):
    """near_dup_pairs picks its physical plan from the banding's
    random-collision multiplicity m = bands/2^rows (fused single-pass
    when m >= 0.5, split candidate/verify below). The two plans must
    emit the identical (vec_a, vec_b, cosine) set: at the 0.4
    contract threshold the production query takes the fused branch —
    compare it against a forced-split twin with the same banding."""
    bands_n, rows_n = vec.banding_for_threshold(0.4)
    assert bands_n / (1 << rows_n) >= 0.5  # contract threshold is fused

    def result(df):
        return {(r.vec_a, r.vec_b): r.cosine for r in df.collect()}

    fused = result(similarity.near_dup_pairs(emb))
    split = result(_near_dup_forced_split(emb, 0.4, bands_n, rows_n))
    assert fused == split


def _near_dup_forced_split(emb, threshold, bands_n, rows_n):
    """Split-plan twin of near_dup_pairs for the equivalence test:
    identical banding/verify, candidate ids only + embedding joins."""
    from pyspark.sql import functions as F

    v = similarity._with_norm(similarity._spread(emb)).drop("label")
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.expr(
                    vec.band_key_sql("embedding", j, "spark", rows_n)
                ).alias("bkey"),
            )
            for j in range(bands_n)
        ]
    )
    bands = v.select("vec_id", F.explode(band_structs).alias("bk")).select(
        "vec_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bkey"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    a = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("a_emb"),
        F.col("norm2").alias("a_n2"),
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("b_emb"),
        F.col("norm2").alias("b_n2"),
    )
    return (
        similarity._verify_cosine_arrow(cand.join(a, "vec_a").join(b, "vec_b"))
        .select("vec_a", "vec_b", F.round(F.col("cosine_raw"), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def test_near_dup_plan_has_no_cross_join(emb):
    plan = (
        similarity.near_dup_pairs(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
