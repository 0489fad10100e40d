from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# dataset_split


def test_split_is_total_and_deterministic(docs):
    out = sampling.dataset_split(docs)
    n = docs.count()
    assert out.count() == n  # every doc assigned, none duplicated
    assert out.select("doc_id").distinct().count() == n
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, sampling.dataset_split(docs).collect()))
    assert a == b


def test_split_fractions_near_weights(docs):
    n = docs.count()
    counts = dict(
        sampling.dataset_split(docs)
        .groupBy("split")
        .count()
        .collect()
    )
    assert set(counts) <= {"train", "val", "test"}
    # MINSTD over sequential ids is very uniform; 3-sigma binomial slack
    for name, w in sampling.DEFAULT_SPLITS:
        sigma = (n * w * (1 - w)) ** 0.5
        assert abs(counts.get(name, 0) - n * w) <= 3 * sigma + 1


def test_split_independent_of_partitioning(docs):
    a = sorted(map(tuple, sampling.dataset_split(docs).collect()))
    b = sorted(
        map(tuple, sampling.dataset_split(docs.repartition(13)).collect())
    )
    assert a == b


def test_split_seed_changes_assignment(docs):
    a = dict(sampling.dataset_split(docs, seed=7).collect())
    b = dict(sampling.dataset_split(docs, seed=99).collect())
    assert any(a[k] != b[k] for k in a)


def test_split_weights_must_sum_to_one():
    with pytest.raises(ValueError):
        sampling.split_case_sql("doc_id", (("train", 0.5), ("val", 0.4)))


def test_split_is_map_only_plan(docs):
    plan = sampling.dataset_split(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # stateless projection: zero shuffles


# ---------------------------------------------------------------------------
# quota_sample


def test_quota_cap_and_rank_order(docs):
    out = sampling.quota_sample(docs, per_group=5).collect()
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    for rows in by_group.values():
        assert len(rows) <= 5
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r["quality_millis"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)


def test_quota_two_phase_equals_naive(docs):
    """The sharded local-top-k pass must not change the result: the
    ranking order is total, so union-of-local-top-k contains the
    global top-k for every shard count."""
    naive = sorted(map(tuple, sampling.quota_sample(docs, shards=1).collect()))
    for shards in (2, 8, 32):
        sharded = sorted(
            map(tuple, sampling.quota_sample(docs, shards=shards).collect())
        )
        assert sharded == naive


def test_quota_keeps_highest_quality(docs):
    from cdr_analysis_tools_hadoop_spark.operators.textops import quality_scores

    k = 3
    out = sampling.quota_sample(docs, per_group=k)
    scored = (
        docs.join(quality_scores(docs).select("doc_id", "quality_millis"), "doc_id")
        .select("doc_id", "source", "quality_millis")
        .collect()
    )
    by_group: dict[str, list] = {}
    for r in scored:
        by_group.setdefault(r["source"], []).append(r)
    expect = set()
    for g, rows in by_group.items():
        rows.sort(key=lambda r: (-r["quality_millis"], r["doc_id"]))
        expect |= {(g, r["doc_id"]) for r in rows[:k]}
    got = {(r["source"], r["doc_id"]) for r in out.collect()}
    assert got == expect


def test_quota_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        sampling.quota_sample(docs, per_group=0)
    with pytest.raises(ValueError):
        sampling.quota_sample(docs, shards=0)


# ---------------------------------------------------------------------------
# split_contamination


def test_contamination_flags_seeded_near_dups(docs, spark):
    """The synthetic corpus seeds every 10th doc as a one-word edit of
    its predecessor; when a seeded dup and its source land in
    different splits, the eval copy must be flagged (its shingle set
    is ~identical to a train doc's)."""
    out = sampling.split_contamination(docs, threshold_ppm=500000)
    rows = out.collect()
    assert len(rows) > 0  # seeded dups guarantee cross-split overlap
    splits = dict(sampling.dataset_split(docs).collect())
    for r in rows:
        assert splits[r["doc_id"]] in ("val", "test")
        assert r["split"] != "train"
        assert 0 <= r["n_hit"] <= r["n_shingles"]
        assert r["contamination_ppm"] == r["n_hit"] * 1000000 // r["n_shingles"]
        assert r["contamination_ppm"] >= 500000


def test_contamination_zero_threshold_covers_all_eval(docs):
    """At threshold 0 every non-train doc appears exactly once."""
    out = sampling.split_contamination(docs, threshold_ppm=0)
    splits = sampling.dataset_split(docs).filter("split <> 'train'")
    assert out.count() == splits.count()
    assert out.select("doc_id").distinct().count() == splits.count()


def test_split_handles_negative_ids(spark):
    """Negative ids must hash across splits, not all land in 'train'
    (both engines' % keeps the dividend sign; the canonical double-mod
    folds them into [0, M) first)."""
    df = spark.range(-2000, 0).withColumnRenamed("id", "doc_id")
    counts = dict(
        sampling.dataset_split(df).groupBy("split").count().collect()
    )
    assert len(counts) >= 2  # not all in one split
    assert sum(counts.values()) == 2000
