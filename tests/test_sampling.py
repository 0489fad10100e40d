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


# ---------------------------------------------------------------------------
# mixture_resample


def test_mixture_resample_matches_python_recompute(spark):
    """n_copies == a from-scratch python recompute of the integer
    quota + MINSTD-threshold rule; totals rebalance the token mass."""
    rows = [
        (i, "big", "w " * 50) for i in range(40)
    ] + [(100 + i, "small", "w " * 10) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    M, A, seed = sampling.MINSTD_MOD, sampling.MINSTD_MULT, sampling.RESAMPLE_SEED
    # token counts: split('w ' * k, ' ') has k + 1 elements (trailing '')
    src_tokens = {"big": 40 * 51, "small": 10 * 11}
    total = sum(src_tokens.values())
    n_sources = 2
    # per-source token target first, then exact ppm (the overflow-free
    # base-split form both engines evaluate)
    quota = {
        s: (total // n_sources) * 1_000_000 // t
        for s, t in src_tokens.items()
    }

    def h(doc_id):
        v = ((doc_id % M) + M + seed) % M
        for _ in range(3):
            v = v * A % M
        return v

    def copies(doc_id, source):
        q = quota[source]
        return q // 1_000_000 + (1 if h(doc_id) * 1_000_000 // M < q % 1_000_000 else 0)

    got = {
        r.doc_id: (r.source, r.n_tokens, r.n_copies)
        for r in sampling.mixture_resample(df).collect()
    }
    assert len(got) == 50
    for did, (src, ntok, nc) in got.items():
        assert ntok == src_tokens[src] // (40 if src == "big" else 10)
        assert nc == copies(did, src), (did, src)
    # the small source upsamples (quota > 1e6), the big one downsamples
    assert quota["small"] > 1_000_000 > quota["big"]
    small_copies = sum(v[2] for v in got.values() if v[0] == "small")
    assert small_copies > 10  # strictly more than one epoch


def test_ppm_div_split_is_exact_and_overflow_free(spark):
    """_ppm_div_sql == python's exact num * 1e6 // den, including
    inputs where the naive literal product exceeds int64 (the
    ~9.2e12-token corpus that crashed the old formula)."""
    import duckdb

    cases = [
        (61, 30),
        (9_300_000_000_000, 1_860_000_000_000),   # naive product overflows
        (9_223_372_036_854_775, 9_200_000_000_000_000),
        (1, 9_000_000_000_000_000),
        # 100 TB corpus target vs a 5e9-token source: quota ~ 5e9 ppm
        # (the result itself is only bounded by quota_ppm <= ~9.2e12,
        # i.e. a 9-million-fold upsample — beyond that m1 * 1e6 is the
        # remaining, documented, int64 ceiling)
        (25_000_000_000_000, 5_000_000_000),
    ]
    con = duckdb.connect()
    for num, den in cases:
        want = num * 1_000_000 // den
        s_expr = sampling._ppm_div_sql(str(num), str(den), "spark")
        d_expr = sampling._ppm_div_sql(str(num), str(den), "duckdb")
        got_s = spark.sql(f"SELECT {s_expr} AS v").collect()[0].v
        got_d = con.execute(f"SELECT {d_expr} AS v").fetchone()[0]
        assert got_s == got_d == want, (num, den, got_s, got_d, want)


def test_mixture_resample_rebalances_token_mass(docs):
    """Across the real fixture, each source's resampled token mass
    lands within 12% of the uniform target."""
    out = sampling.mixture_resample(docs)
    per = (
        out.groupBy("source")
        .agg(F.sum(F.col("n_tokens") * F.col("n_copies")).alias("mass"))
        .collect()
    )
    masses = [r.mass for r in per]
    target = sum(masses) / len(masses)
    for m in masses:
        assert abs(m - target) / target < 0.12


# ---------------------------------------------------------------------------
# seeded weighted sampling without replacement


def _minstd_py(i, seed):
    h = ((i % sampling.MINSTD_MOD) + sampling.MINSTD_MOD + seed) % sampling.MINSTD_MOD
    for _ in range(3):
        h = h * sampling.MINSTD_MULT % sampling.MINSTD_MOD
    return h


def _es_winners_py(weights, k, seed):
    """Pure-Python twin of the exponential race."""
    import math

    keyed = []
    for i, w in weights.items():
        if w <= 0:
            continue
        u = (_minstd_py(i, seed) + 1) / (sampling.MINSTD_MOD + 1)
        keyed.append((round(-math.log(u) / w, 9), i))
    return [i for _, i in sorted(keyed)[:k]]


def test_weighted_sample_matches_python_race(spark):
    weights = {i: (i % 7) + 1 for i in range(300)}
    df = spark.createDataFrame(
        [(i, "s", w) for i, w in weights.items()],
        "doc_id long, source string, w long",
    )
    got = sampling.weighted_sample(df, k=25, weight_sql="w", seed=11).collect()
    assert [r.doc_id for r in got] == _es_winners_py(weights, 25, 11)
    assert len({r.doc_id for r in got}) == 25  # without replacement


def test_weighted_sample_zero_weight_never_wins(spark):
    df = spark.createDataFrame(
        [(i, "s", 0 if i < 90 else 1) for i in range(100)],
        "doc_id long, source string, w long",
    )
    got = sampling.weighted_sample(df, k=10, weight_sql="w", seed=3).collect()
    assert all(r.doc_id >= 90 for r in got) and len(got) == 10


def test_weighted_sample_is_weight_proportional(spark):
    # 9x-weighted docs should dominate winners across seeds
    df = spark.createDataFrame(
        [(i, "s", 9 if i % 2 == 0 else 1) for i in range(400)],
        "doc_id long, source string, w long",
    )
    heavy = 0
    for seed in range(5):
        rows = sampling.weighted_sample(df, k=40, weight_sql="w", seed=seed).collect()
        heavy += sum(1 for r in rows if r.doc_id % 2 == 0)
    assert heavy / 200 > 0.7  # exact expectation ~0.88 at these k/N


def test_weighted_sample_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, "s", (i % 5) + 1) for i in range(500)],
        "doc_id long, source string, w long",
    )
    a = sampling.weighted_sample(df.repartition(1), k=30, weight_sql="w").collect()
    b = sampling.weighted_sample(df.repartition(17), k=30, weight_sql="w").collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]


def test_weighted_sample_k_bounded_plan(spark):
    df = spark.createDataFrame(
        [(i, "s", 1) for i in range(50)], "doc_id long, source string, w long"
    )
    plan = (
        sampling.weighted_sample(df, k=5, weight_sql="w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # local top-k, driver merges k/task


# ---------------------------------------------------------------------------
# group-level split (r5)


def test_group_split_no_user_straddles_splits(spark):
    """The invariant the operator exists for: a user's events all
    carry one split label (checked on the raw per-event labels)."""
    from cdr_analysis_tools_hadoop_spark.operators.sampling import (
        GROUP_SPLIT_SEED,
        split_case_sql,
    )

    events = spark.createDataFrame(
        [(e, e % 37) for e in range(500)], "event_id long, user_id long"
    )
    labeled = events.select(
        "user_id",
        F.expr(split_case_sql("user_id", seed=GROUP_SPLIT_SEED)).alias("split"),
    )
    per_user = (
        labeled.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert all(r.k == 1 for r in per_user)


def test_group_split_stats_partition_totals(spark):
    from cdr_analysis_tools_hadoop_spark.operators import sampling as _s

    events = spark.createDataFrame(
        [(e, e % 211) for e in range(2000)], "event_id long, user_id long"
    )
    rows = _s.group_split_stats(events).collect()
    assert sum(r.n_events for r in rows) == 2000
    assert sum(r.n_users for r in rows) == 211  # disjoint by construction
    # roughly weight-proportional over 211 users (default 80/10/10)
    by = {r.split: r.n_users for r in rows}
    assert by.get("train", 0) > by.get("val", 0)
    assert by.get("train", 0) > by.get("test", 0)
    assert by.get("train", 0) / 211 > 0.6
