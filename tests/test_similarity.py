from __future__ import annotations

import numpy as np
import pytest

from cdr_analysis_tools_hadoop_spark.functions import vec
from cdr_analysis_tools_hadoop_spark.operators import similarity
from cdr_analysis_tools_hadoop_spark.sources import synthetic


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


def test_banding_for_corpus_scaling_rule():
    """Scale-mode banding: rows tracks log2(N) so expected random
    candidates stay ~ O(bands * N) — the quantity bands * N^2 /
    2^(rows+1) divided by N must stay bounded as N grows 1000x."""
    import math

    prev_rows = 0
    for n in (1_000, 100_000, 1_000_000):
        b, r = vec.banding_for_corpus(0.9, n)
        assert r >= prev_rows
        prev_rows = r
        cand_per_vec = b * n / 2 ** (r + 1)
        assert cand_per_vec <= 64  # candidates linear in N, small constant
        p = 1.0 - math.acos(0.9) / math.pi
        if b < 192:  # cap not binding -> design recall met
            assert 1 - (1 - p**r) ** b >= 0.99
    # loose thresholds at huge N would need more bands than the cap
    # allows; the achieved recall collapses (<1%) so the derivation
    # must REFUSE rather than silently return near-zero pairs
    with pytest.raises(ValueError, match="recall"):
        vec.banding_for_corpus(0.4, 1_000_000)


def test_band_keys_gemm_matches_sql_on_integer_fixture(spark):
    """The GEMM banding kernel must produce byte-identical band keys
    to the band_key_sql expression path. Integer-valued embeddings
    make every summation order exact, isolating the packing/sign
    logic from FP association."""
    import numpy as np

    rng = np.random.default_rng(42)
    mat = rng.integers(-50, 51, size=(120, vec.DIM)).astype(np.float64)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(mat)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bands_n, rows_n = 7, 11
    arrow = {
        (r.vec_id, r.band, r.bkey)
        for r in similarity._band_keys_arrow(df, bands_n, rows_n).collect()
    }
    from pyspark.sql import functions as F

    structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.expr(vec.band_key_sql("embedding", j, "spark", rows_n)).alias(
                    "bkey"
                ),
            )
            for j in range(bands_n)
        ]
    )
    sql = {
        (r.vec_id, r.bk.band, r.bk.bkey)
        for r in df.select("vec_id", F.explode(structs).alias("bk")).collect()
    }
    assert arrow == sql
    assert len(arrow) == 120 * bands_n


def test_near_dup_scaled_recall_and_exact_values(spark):
    """near_dup_pairs_scaled on the seeded tight-pair corpus: every
    returned pair appears in the exact baseline with the SAME cosine
    (the verify stage is exact), recall >= 95%."""
    df = synthetic.embeddings_df(spark, 400, dup_every=10, partitions=4)
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in similarity.near_dup_pairs_exact(df, threshold=0.9).collect()
    }
    scaled = {
        (r.vec_a, r.vec_b): r.cosine
        for r in similarity.near_dup_pairs_scaled(
            df, threshold=0.9, n_hint=400
        ).collect()
    }
    assert len(exact) >= 30  # the generator really seeds tight pairs
    assert set(scaled) <= set(exact)
    for pair, cos in scaled.items():
        assert cos == exact[pair]
    assert len(scaled) / len(exact) >= 0.95


def test_near_dup_plan_has_no_cross_join(emb):
    plan = (
        similarity.near_dup_pairs(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_hamming_near_dup_exact_vs_bruteforce(spark):
    """Pigeonhole banding is EXACT: result == brute-force popcount
    pairs at the radius, including distance-boundary pairs."""
    import itertools

    hashes = [
        0,
        1,                      # d(0,1)=1
        (1 << 6) - 1,           # 6 bits -> exactly at the radius
        (1 << 7) - 1,           # 7 bits from 0 -> outside
        -1,                     # all 64 bits set
        -2,                     # d(-1,-2)=1
        0x5555555555555555 - 2**63,  # sign-bit patterns
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "id long, h long"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in similarity.hamming_near_dup(df, "id", "h", 6).collect()
    }
    want = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(hashes), 2):
        d = bin((a ^ b) & (2**64 - 1)).count("1")
        if d <= 6:
            want.add((i, j, d))
    assert got == want and (0, 2, 6) in got and (0, 1, 1) in got


@pytest.mark.parametrize("n_hint", [None, 50_000, 5_000_000])
def test_hamming_near_dup_combo_banding_exact(spark, n_hint):
    """Combination banding (n_hint set -> k > d+1 bands, C(k, k-d)
    composite keys) returns the identical exact pair set: d dirtied
    bands leave k-d clean ones, which always form one enumerated
    combo."""
    import itertools

    rng = np.random.RandomState(7)
    base = rng.randint(-2**63, 2**63, size=60, dtype=np.int64)
    # seed tight pairs: flip <=6 random bits of the predecessor
    hashes = list(base)
    for i in range(5, 60, 5):
        v = int(base[i - 1])
        for b in rng.choice(64, size=rng.randint(0, 7), replace=False):
            v ^= 1 << int(b)
        hashes[i] = np.int64(np.uint64(v % 2**64) - 2**63 if v >= 2**63 else v)
    df = spark.createDataFrame(
        [(i, int(h)) for i, h in enumerate(hashes)], "id long, h long"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in similarity.hamming_near_dup(df, "id", "h", 6, n_hint=n_hint).collect()
    }
    want = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(hashes), 2):
        d = bin(int(a ^ b) & (2**64 - 1)).count("1")
        if d <= 6:
            want.add((i, j, d))
    assert got == want and len(want) >= 5


def test_hamming_near_dup_max_bucket_guard(spark):
    """A degenerate cluster (many rows with the IDENTICAL hash) is
    dropped by the hot-bucket guard while normal pairs survive."""
    rows = [(i, 42) for i in range(50)]          # quadratic cluster
    rows += [(100, 1 << 40), (101, (1 << 40) | 3)]  # a normal pair (d=2)
    df = spark.createDataFrame(rows, "id long, h long")
    guarded = {
        (r.id_a, r.id_b)
        for r in similarity.hamming_near_dup(
            df, "id", "h", 6, max_bucket=10
        ).collect()
    }
    assert guarded == {(100, 101)}
    # without the guard the cluster contributes all C(50,2) pairs,
    # plus 100 cross pairs: hamming(42, 1<<40) = 4 and
    # hamming(42, (1<<40)|3) = 4, both within the radius
    full = similarity.hamming_near_dup(df, "id", "h", 6).count()
    assert full == 50 * 49 // 2 + 1 + 100


@pytest.mark.parametrize("mode,n_hint", [
    ("broadcast", 50_000), ("broadcast", None),
    ("grouped", 50_000), ("grouped", None),
])
def test_hamming_near_dup_bucket_verify_modes_exact(spark, mode, n_hint):
    """The grouped (shuffled) and broadcast bucket-verify strategies
    return the IDENTICAL exact pair set as brute force at any
    banding — the in-run vectorized popcount kernel is a physical
    strategy, not an approximation. String ids exercise the
    non-integer id path of the Arrow kernel."""
    import itertools

    rng = np.random.RandomState(11)
    base = rng.randint(-2**63, 2**63, size=200, dtype=np.int64)
    hashes = list(base)
    for i in range(4, 200, 4):
        v = int(base[i - 1]) & (2**64 - 1)
        for b in rng.choice(64, size=rng.randint(0, 7), replace=False):
            v ^= 1 << int(b)
        hashes[i] = np.int64(v - 2**64 if v >= 2**63 else v)
    want = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(hashes), 2):
        d = bin(int(a ^ b) & (2**64 - 1)).count("1")
        if d <= 6:
            want.add((i, j, d))
    df = spark.createDataFrame(
        [(i, int(h)) for i, h in enumerate(hashes)], "id long, h long"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in similarity.hamming_near_dup(
            df, "id", "h", 6, n_hint=n_hint, mode=mode
        ).collect()
    }
    assert got == want and len(want) >= 5
    sdf = spark.createDataFrame(
        [(f"s{i:03d}", int(h)) for i, h in enumerate(hashes)],
        "id string, h long",
    )
    sgot = {
        (r.id_a, r.id_b, r.hamming)
        for r in similarity.hamming_near_dup(
            sdf, "id", "h", 6, n_hint=n_hint, mode=mode
        ).collect()
    }
    assert sgot == {(f"s{i:03d}", f"s{j:03d}", d) for i, j, d in want}


def test_hamming_mode_resolution_and_guards(spark):
    """'auto' routes join -> broadcast -> grouped by corpus size
    (the broadcast-vs-shuffle-join selection shape); the max_bucket
    degenerate-cluster guard holds on every strategy; the join-mode
    banding warns instead of silently going quadratic when its caps
    bind (r3 advice)."""
    assert similarity.resolve_hamming_mode(6, None) == "join"
    assert similarity.resolve_hamming_mode(6, 1_000) == "join"
    assert similarity.resolve_hamming_mode(6, 2_000_000) == "broadcast"
    assert (
        similarity.resolve_hamming_mode(
            6, similarity.BROADCAST_VERIFY_MAX_ROWS + 1
        )
        == "grouped"
    )
    # broadcast banding trades sorts for fewer verify pairs
    assert similarity.broadcast_hamming_banding(6, 2_000_000) == (9, 3)
    assert similarity.broadcast_hamming_banding(6, None) == (7, 1)
    rows = [(i, 42) for i in range(50)] + [(100, 1 << 40), (101, (1 << 40) | 3)]
    df = spark.createDataFrame(rows, "id long, h long")
    for mode in ("broadcast", "grouped"):
        got = {
            (r.id_a, r.id_b)
            for r in similarity.hamming_near_dup(
                df, "id", "h", 6, n_hint=50_000, max_bucket=10, mode=mode
            ).collect()
        }
        assert got == {(100, 101)}, mode
    with pytest.warns(UserWarning, match="caps bind"):
        similarity.hamming_banding(16, 10**9)


def test_spatial_hamming_near_dup_exact_vs_bruteforce(spark):
    """The composite (shifted-grid cell x pigeonhole band) candidate
    key is EXACT on both predicates: output == brute force over all
    pairs (popcount AND planar distance), including pairs straddling
    grid-cell boundaries at distances just under the radius."""
    import itertools

    from cdr_analysis_tools_hadoop_spark.functions import geo

    rng = np.random.RandomState(7)
    n = 240
    radius_m = 10_000.0
    rad_deg = radius_m / 111_320.0
    # hash clusters: groups of 4 sharing a base hash with <=3 flipped
    # bits (in-radius Hamming), plus random singletons
    hashes = np.zeros(n, dtype=np.uint64)
    for g in range(n // 4):
        base = np.uint64(rng.randint(0, 2**63, dtype=np.int64))
        for m in range(4):
            v = int(base)
            for b in rng.choice(64, size=rng.randint(0, 4), replace=False):
                v ^= 1 << int(b)
            hashes[g * 4 + m] = np.uint64(v)
    # positions: cluster centers with offsets spanning 0..2*radius so
    # both predicates bind, incl. boundary-straddling near-radius pairs
    lat = geo.LAT0 + rng.uniform(0.05, 0.95, n)
    lon = geo.LON0 + rng.uniform(0.05, 0.95, n)
    for g in range(n // 4):
        c = g * 4
        for m in range(1, 4):
            lat[c + m] = lat[c] + rng.uniform(-1.6, 1.6) * rad_deg
            lon[c + m] = lon[c] + rng.uniform(-1.6, 1.6) * rad_deg / geo.LON_SCALE
    want = set()
    for i, j in itertools.combinations(range(n), 2):
        d = bin(int(hashes[i] ^ hashes[j])).count("1")
        dy = lat[i] - lat[j]
        dx = (lon[i] - lon[j]) * geo.LON_SCALE
        if d <= 6 and dy * dy + dx * dx <= rad_deg * rad_deg:
            a, b = sorted((i, j))
            want.add((a, b, d))
    df = spark.createDataFrame(
        [
            (i, int(np.int64(hashes[i])), float(lat[i]), float(lon[i]))
            for i in range(n)
        ],
        "id long, h long, lat double, lon double",
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in similarity.spatial_hamming_near_dup(
            df, "id", "h", "lat", "lon", max_hamming=6, radius_m=radius_m
        ).collect()
    }
    assert got == want and len(want) >= 30
    # dist_m matches the knn_nearest_tower formula bit-for-bit
    rows = similarity.spatial_hamming_near_dup(
        df, "id", "h", "lat", "lon", max_hamming=6, radius_m=radius_m
    ).collect()
    for r in rows[:20]:
        dy = lat[r.id_a] - lat[r.id_b]
        dx = (lon[r.id_a] - lon[r.id_b]) * geo.LON_SCALE
        expect = round(np.sqrt(dy * dy + dx * dx) * 111_320.0, 6)
        assert r.dist_m == expect


def test_spatial_hamming_near_dup_degenerate_cluster_guard(spark):
    """A flat-hash cluster (all zeros) that is NOT co-located produces
    no candidates without any guard — the spatial key rescues the
    degenerate-hash case — while a co-located flat cluster still honors
    max_bucket as the last resort."""
    from cdr_analysis_tools_hadoop_spark.functions import geo

    # 60 identical hashes spread > radius apart, 2 co-located
    rows = [
        (i, 42, geo.LAT0 + 0.015 * i, geo.LON0 + 0.4)
        for i in range(60)
    ] + [(100, 42, geo.LAT0 + 0.93, geo.LON0 + 0.9),
         (101, 42, geo.LAT0 + 0.93, geo.LON0 + 0.9)]
    df = spark.createDataFrame(rows, "id long, h long, lat double, lon double")
    got = {
        (r.id_a, r.id_b)
        for r in similarity.spatial_hamming_near_dup(
            df, "id", "h", "lat", "lon", max_hamming=6, radius_m=1_000.0
        ).collect()
    }
    assert got == {(100, 101)}
    # co-located flat cluster: max_bucket anti-joins it away
    colo = [(i, 42, geo.LAT0 + 0.5, geo.LON0 + 0.5) for i in range(40)] + [
        (200, 1 << 40, geo.LAT0 + 0.2, geo.LON0 + 0.2),
        (201, (1 << 40) | 3, geo.LAT0 + 0.2, geo.LON0 + 0.2),
    ]
    cdf = spark.createDataFrame(colo, "id long, h long, lat double, lon double")
    guarded = {
        (r.id_a, r.id_b)
        for r in similarity.spatial_hamming_near_dup(
            cdf, "id", "h", "lat", "lon",
            max_hamming=6, radius_m=1_000.0, max_bucket=10,
        ).collect()
    }
    assert guarded == {(200, 201)}


def test_spatial_hamming_large_radius_equals_pure_hamming(spark):
    """With the radius covering the whole fixture extent the spatial
    predicate never binds: output pairs == hamming_near_dup (the grid
    degenerates to a handful of cells, correctly, not wrongly)."""
    from cdr_analysis_tools_hadoop_spark.functions import geo

    rng = np.random.RandomState(3)
    rows = []
    for i in range(80):
        h = int(rng.randint(0, 2**62, dtype=np.int64))
        if i % 4 == 1:
            h = rows[i - 1][1] ^ 3
        rows.append(
            (i, h, float(geo.LAT0 + rng.uniform(0, 1)),
             float(geo.LON0 + rng.uniform(0, 1)))
        )
    df = spark.createDataFrame(rows, "id long, h long, lat double, lon double")
    big = 400_000.0  # > the whole ~111 km extent
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in similarity.spatial_hamming_near_dup(
            df, "id", "h", "lat", "lon", max_hamming=6, radius_m=big
        ).collect()
    }
    want = {
        (r.id_a, r.id_b, r.hamming)
        for r in similarity.hamming_near_dup(
            df.select("id", "h"), "id", "h", 6
        ).collect()
    }
    assert got == want and len(want) >= 20
    with pytest.raises(ValueError, match="radius_m"):
        similarity.spatial_hamming_near_dup(
            df, "id", "h", "lat", "lon", radius_m=0.0
        )


# ---------------------------------------------------------------------------
# 128-bit wide-fingerprint Hamming path (r4 verdict item 2)


def _wide_fixture(n=160, seed=13, planted_radius=10):
    """(id, h1, h2) rows with planted near pairs across BOTH words."""
    import itertools

    rng = np.random.RandomState(seed)
    w0 = rng.randint(-2**63, 2**63, size=n, dtype=np.int64)
    w1 = rng.randint(-2**63, 2**63, size=n, dtype=np.int64)
    h1, h2 = list(w0), list(w1)
    for i in range(4, n, 4):
        a, b = int(h1[i - 1]) & (2**64 - 1), int(h2[i - 1]) & (2**64 - 1)
        nflip = rng.randint(0, planted_radius + 2)
        for bit in rng.choice(128, size=nflip, replace=False):
            if bit < 64:
                a ^= 1 << int(bit)
            else:
                b ^= 1 << int(bit - 64)
        h1[i] = np.int64(a - 2**64 if a >= 2**63 else a)
        h2[i] = np.int64(b - 2**64 if b >= 2**63 else b)
    rows = [(i, int(h1[i]), int(h2[i])) for i in range(n)]
    def want(d_max):
        out = set()
        for (i, a1, a2), (j, b1, b2) in itertools.combinations(rows, 2):
            d = bin((a1 ^ b1) & (2**64 - 1)).count("1") + bin(
                (a2 ^ b2) & (2**64 - 1)
            ).count("1")
            if d <= d_max:
                out.add((i, j, d))
        return out
    return rows, want


@pytest.mark.parametrize("mode,n_hint", [
    ("join", None), ("join", 50_000), ("join", 5_000_000),
    ("broadcast", 50_000), ("broadcast", None),
    ("grouped", 50_000), ("grouped", 8_000_000),
])
@pytest.mark.parametrize("d_max", [0, 2, 6, 12])
def test_hamming_near_dup_wide_exact_every_radius(spark, mode, n_hint, d_max):
    """The 128-bit path (hash_col2) is EXACT at every radius on every
    physical strategy: result == brute-force two-word popcount."""
    rows, want = _wide_fixture(planted_radius=max(d_max, 1))
    df = spark.createDataFrame(rows, "id long, h1 long, h2 long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in similarity.hamming_near_dup(
            df, "id", "h1", d_max, n_hint=n_hint, mode=mode,
            hash_col2="h2",
        ).collect()
    }
    assert got == want(d_max)


def test_hamming_near_dup_wide_finds_cross_word_pairs(spark):
    """Pairs whose differing bits straddle the word boundary (3 in
    word0 + 3 in word1 = d 6) are found — the banding never treats
    the words as independent 64-bit problems."""
    rows = [
        (0, 0, 0),
        (1, 0b111, 0b111 << 40),            # d = 3 + 3 = 6
        (2, 0b1111, 0b111),                 # d = 4 + 3 = 7 -> out
    ]
    df = spark.createDataFrame(rows, "id long, h1 long, h2 long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in similarity.hamming_near_dup(
            df, "id", "h1", 6, n_hint=100_000, hash_col2="h2"
        ).collect()
    }
    assert (0, 1, 6) in got and all(p[:2] != (0, 2) for p in got)


def test_wide_banding_beats_caps(spark):
    """The r4-verdict beyond-cap fix, asserted on the banding model
    itself: at d<=6 the 64-bit cost model is pinned at narrow
    composite keys (21-28 bits at <=1024 combos), so expected verify
    pairs per row grow ~N/2^21; 128 bits reaches >= log2(N)-2 key
    bits with FEWER combination keys, holding expected verify pairs
    per row orders of magnitude lower at every scale point."""
    import math

    for n in (500_000, 8_000_000, 100_000_000, 1_000_000_000):
        picks = {}
        for nb in (64, 128):
            k, c = similarity.broadcast_hamming_banding(6, n, nbits=nb)
            w = sorted(
                hi - lo for _, lo, hi in similarity._band_bounds(k, nb)
            )
            bits = sum(w[:c])
            m = math.comb(k, c)
            picks[nb] = (m, bits, m * n / (1 << bits))
        m64, bits64, vp64 = picks[64]
        m128, bits128, vp128 = picks[128]
        need = np.log2(n) - 2
        assert bits128 >= need, (n, bits128, need)
        assert m128 < m64  # fewer keys per row AND
        assert vp128 * 100 <= vp64  # far fewer verify pairs per row
        # wide occupancy stays O(1) (the verify can never dominate);
        # the 64-bit model's verify pairs per row keep growing with N
        assert vp128 <= 8, (n, vp128)
        if n >= 8_000_000:
            assert vp64 > 100, (n, vp64)
    # max_hamming validation widens with the fingerprint
    with pytest.raises(ValueError):
        similarity.hamming_banding(100, 1000)
    assert similarity.hamming_banding(100, 1000, nbits=128)[0] == 101


def test_hamming_near_dup_wide_max_bucket_guard(spark):
    """The degenerate-cluster guard works on the wide path too."""
    rows = [(i, 42, 7) for i in range(50)]
    rows += [(100, 1 << 40, 1 << 20), (101, (1 << 40) | 3, 1 << 20)]
    df = spark.createDataFrame(rows, "id long, h1 long, h2 long")
    got = {
        (r.id_a, r.id_b)
        for r in similarity.hamming_near_dup(
            df, "id", "h1", 6, max_bucket=10, hash_col2="h2"
        ).collect()
    }
    assert got == {(100, 101)}
