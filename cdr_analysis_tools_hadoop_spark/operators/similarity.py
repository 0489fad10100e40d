"""Similarity search over the ``embeddings`` table.

Operators (each with a DuckDB oracle twin; functions/vec.py guarantees
bit-identical cosine values across engines):

- brute-force cosine top-k (the correctness baseline),
- LSH-bucketed top-k (sign-hyperplane buckets — the scale path: the
  crossJoin is replaced by an equi-join on the 8-bit bucket id),
- cosine near-duplicate pair join,
- kNN label vote (majority label of the top-k — similarity search as
  a classifier, the typical training-data-curation use).

Scale notes (100 TB): brute-force is O(Q·N) with the query side
broadcast — right for small Q, any N (one scan, no shuffle of the
corpus). The LSH variant buckets BOTH sides, turning search into a
shuffle-on-bucket equi-join: linear scan + local joins, the shape
that survives 1000 executors; recall is tunable via NUM_PLANES.
Arithmetic is JVM-side codegen except the near-dup verify, which is
an Arrow-batched numpy kernel in the exact FP order of the SQL fold
(Catalyst interprets higher-order lambdas per element; the kernel is
measured faster and hashes identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.functions import vec

TOP_K = 5
N_QUERIES = 10
NEAR_DUP_THRESHOLD = 0.4


def _spread(df: DataFrame) -> DataFrame:
    """Ensure the corpus side of a cartesian/broadcast join has at
    least one partition per core — a small parquet file reads as a
    single partition, which would serialize the whole scoring loop.
    Unconditional repartition: checking df.rdd.getNumPartitions()
    would convert the whole plan to an RDD just to read a number."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _with_norm(emb: DataFrame, prefix: str = "") -> DataFrame:
    cols = [
        F.col("vec_id").alias(f"{prefix}vec_id"),
        F.col("embedding").alias(f"{prefix}embedding"),
        F.expr(vec.norm2_sql("embedding", "spark")).alias(f"{prefix}norm2"),
    ]
    if prefix == "":
        cols.append(F.col("label"))
    return emb.select(*cols)


def _cosine_col(qcol: str, ccol: str, qn: str, cn: str) -> F.Column:
    return F.round(
        F.expr(vec.cosine_sql(qcol, ccol, qn, cn, "spark")), 6
    ).alias("cosine")


def _topk_pairs(emb: DataFrame, k: int, n_queries: int, bucketed: bool) -> DataFrame:
    """Shared top-k skeleton; candidate generation is either a
    broadcast crossJoin (exact) or a bucket equi-join (LSH)."""
    cand = _with_norm(_spread(emb))
    queries = _with_norm(emb.filter(F.col("vec_id") < n_queries), "q_")
    if bucketed:
        sig = vec.lsh_sig_sql("embedding", "spark")
        qsig = vec.lsh_sig_sql("q_embedding", "spark")
        joined = queries.withColumn("bucket", F.expr(qsig)).join(
            cand.withColumn("bucket", F.expr(sig)), "bucket"
        )
    else:
        joined = F.broadcast(queries).crossJoin(cand)
    scored = joined.filter(F.col("vec_id") != F.col("q_vec_id")).select(
        F.col("q_vec_id").alias("query_id"),
        "vec_id",
        "label",
        _cosine_col("q_embedding", "embedding", "q_norm2", "norm2"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_topk(emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES) -> DataFrame:
    """Brute-force cosine top-k for the first ``n_queries`` vectors."""
    return _topk_pairs(emb, k, n_queries, bucketed=False)


def cosine_topk_lsh(emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES) -> DataFrame:
    """LSH-bucketed top-k: candidates share the 8-bit sign-hyperplane
    bucket. Lossy by design; both engines apply the identical filter."""
    return _topk_pairs(emb, k, n_queries, bucketed=True)


def _verify_cosine_arrow(joined: DataFrame) -> DataFrame:
    """Exact-cosine verification of candidate pairs, Arrow-vectorized.

    Input columns: vec_a, vec_b, a_emb, b_emb, a_n2, b_n2. The kernel
    accumulates the dot product as DIM vectorized left-assoc adds —
    bit-for-bit the FP order of vec.cosine_sql's left fold (and the
    DuckDB oracle's unrolled chain), so values hash identically.
    Rounding stays JVM-side: Spark round() is HALF_UP, numpy's is
    HALF_EVEN. ~1.5x faster than the Catalyst higher-order fold,
    which is interpreted per element (measured 1.5 s vs 2.2 s on
    1.6M pairs x 64 dims)."""
    import numpy as np
    import pyarrow as pa

    def kernel(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ae = np.asarray(rb.column("a_emb").flatten(), dtype=np.float64)
            be = np.asarray(rb.column("b_emb").flatten(), dtype=np.float64)
            ae = ae.reshape(n, -1)
            be = be.reshape(n, -1)
            an2 = np.asarray(rb.column("a_n2"), dtype=np.float64)
            bn2 = np.asarray(rb.column("b_n2"), dtype=np.float64)
            acc = np.zeros(n, dtype=np.float64)
            for i in range(ae.shape[1]):
                acc += ae[:, i] * be[:, i]
            cos = acc / np.sqrt(an2 * bn2)
            yield pa.RecordBatch.from_arrays(
                [rb.column("vec_a"), rb.column("vec_b"), pa.array(cos)],
                ["vec_a", "vec_b", "cosine_raw"],
            )

    return joined.select(
        "vec_a", "vec_b", "a_emb", "b_emb", "a_n2", "b_n2"
    ).mapInArrow(kernel, schema="vec_a long, vec_b long, cosine_raw double")


def near_dup_pairs(emb: DataFrame, threshold: float = NEAR_DUP_THRESHOLD) -> DataFrame:
    """Embedding near-duplicate pairs: banded sign-LSH candidate
    generation + exact-cosine verification.

    (bands, rows) are DERIVED from the threshold
    (vec.banding_for_threshold, 99% recall target at the threshold) —
    a fixed banding tuned for tight thresholds under-recalls loose
    ones. The oracle derives the identical pair from the same
    threshold, so both engines stay in lockstep at any setting.
    Lossy by design (like cosine_topk_lsh); recall vs the exact
    baseline (near_dup_pairs_exact) is measured in tests.

    Physical strategy is picked from the banding itself. The expected
    random-pair candidate multiplicity is m = bands / 2^rows — the
    sum over bands of the 2^-rows chance two unrelated sign keys
    collide.

    - m small (tight threshold, e.g. 0.9 -> 14/256 = 0.05): SPLIT
      plan. Band table carries ids only (light shuffle, linear in N);
      the sparse distinct candidates then equi-join the embeddings
      twice for verification. This is the 100 TB path: shuffle bytes
      ~ N * bands * 16 B, embeddings shuffled once per side.
    - m >= 0.5 (loose threshold, e.g. 0.4 -> 27/16 = 1.7): candidates
      are a constant fraction of ALL pairs, so the output itself
      bounds N to moderate sizes, and stage count dominates shuffle
      width. FUSED plan: embeddings ride through the band self-join,
      cosine is verified pre-distinct, dedupe happens after the
      threshold filter (tiny). One shuffle fewer, no verify joins —
      measured 2.3x faster at sf0.1 (4.3 s -> 1.8 s).

    Both plans emit the identical (vec_a, vec_b, cosine) set (same
    candidates, same FP order), asserted by tests."""
    bands_n, rows_n = vec.banding_for_threshold(threshold)
    v = _with_norm(_spread(emb)).drop("label")
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
    fused = bands_n / (1 << rows_n) >= 0.5
    carry = ["vec_id", "embedding", "norm2"] if fused else ["vec_id"]
    bands = v.select(*carry, F.explode(band_structs).alias("bk")).select(
        *carry, F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )
    # materialize once: the self-join's two sides would otherwise each
    # recompute all bands*rows hyperplane folds (no common-subplan reuse)
    bands = bands.localCheckpoint(eager=False)
    if fused:
        pairs = (
            bands.alias("x")
            .join(bands.alias("y"), ["band", "bkey"])
            .filter(F.col("x.vec_id") < F.col("y.vec_id"))
            .select(
                F.col("x.vec_id").alias("vec_a"),
                F.col("y.vec_id").alias("vec_b"),
                F.col("x.embedding").alias("a_emb"),
                F.col("y.embedding").alias("b_emb"),
                F.col("x.norm2").alias("a_n2"),
                F.col("y.norm2").alias("b_n2"),
            )
        )
        return (
            _verify_cosine_arrow(pairs)
            .select(
                "vec_a", "vec_b", F.round(F.col("cosine_raw"), 6).alias("cosine")
            )
            .filter(F.col("cosine") >= threshold)
            .distinct()
        )
    return _split_verify(bands, v, threshold)


def _split_verify(bands: DataFrame, v: DataFrame, threshold: float) -> DataFrame:
    """Split-plan tail shared by near_dup_pairs and the scale mode:
    distinct sparse candidates from the id-only band table, embeddings
    joined back only for the survivors, Arrow-exact verify."""
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
        _verify_cosine_arrow(cand.join(a, "vec_a").join(b, "vec_b"))
        .select("vec_a", "vec_b", F.round(F.col("cosine_raw"), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _band_keys_arrow(v: DataFrame, bands_n: int, rows_n: int) -> DataFrame:
    """(vec_id, band, bkey) via one numpy GEMM per Arrow batch against
    the nd_plane_coeff matrix — the hashing path for bandings too wide
    for a Catalyst expression tree (bands*rows in the thousands makes
    janino compilation and per-element lambda interpretation the
    bottleneck; a (k, dim) x (dim, planes) GEMM is one BLAS call).

    float32 + chunking is deliberate: the float64 GEMM materialized a
    (batch x planes) 102 MB intermediate per worker, and 32 concurrent
    workers saturated this box's shared memory bandwidth — the stage
    ran at 3% CPU, each 0.3 s batch taking 20 s (measured). Halving
    the element width and keeping each chunk's output cache-resident
    cut the 32-way concurrent kernel 14x (10.1 s -> 0.7 s). The
    weight-dot stays EXACT in float32: its terms are distinct powers
    of two summing below 2^20 << 2^24. BLAS accumulation order (and
    float32) differs from the SQL fold, so a dot within FP noise of 0
    may flip a sign bit vs band_key_sql — that perturbs candidate
    RECALL by a vanishing amount and never the verified values (the
    verify stage recomputes exact cosines). With small-integer
    embeddings every sum is exact in float32 too, which is how the
    SQL-vs-GEMM parity test pins the packing."""
    import numpy as np
    import pyarrow as pa

    planes_t = np.ascontiguousarray(
        vec.nd_plane_matrix(bands_n * rows_n).T, dtype=np.float32
    )
    weights32 = (1 << np.arange(rows_n)).astype(np.float32)
    chunk = 1024

    def kernel(batches):
        for rb in batches:
            k = rb.num_rows
            if k == 0:
                continue
            x = np.asarray(rb.column("embedding").flatten(), dtype=np.float32)
            x = x.reshape(k, -1)
            keys = np.empty((k, bands_n), dtype=np.int64)
            for s in range(0, k, chunk):
                e = min(s + chunk, k)
                bits = (x[s:e] @ planes_t) > 0
                keys[s:e] = (
                    bits.reshape(e - s, bands_n, rows_n).astype(np.float32)
                    @ weights32
                ).astype(np.int64)
            ids = np.asarray(rb.column("vec_id"))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids, bands_n)),
                    pa.array(np.tile(np.arange(bands_n, dtype=np.int32), k)),
                    pa.array(keys.reshape(-1)),
                ],
                ["vec_id", "band", "bkey"],
            )

    return v.select("vec_id", "embedding").mapInArrow(
        kernel, schema="vec_id long, band int, bkey long"
    )


def near_dup_pairs_scaled(
    emb: DataFrame, threshold: float = 0.9, n_hint: int | None = None
) -> DataFrame:
    """Near-duplicate pairs for LARGE corpora at tight thresholds.

    Same candidates-then-exact-verify semantics as near_dup_pairs,
    but the banding is corpus-size-aware (vec.banding_for_corpus:
    rows ~ log2(N) + 2 keeps bucket occupancy O(1), so candidates
    stay ~ O(bands * N) instead of bands * N^2 / 2^(rows+1)), and the
    band keys are hashed by the GEMM kernel instead of a Catalyst
    expression per plane. Loose thresholds don't belong here: below
    ~0.7 the required band count explodes (sign-LSH separates 0.63
    from 0.5 per bit) — use near_dup_pairs, whose output is only
    bounded for moderate N anyway.

    No oracle twin: the band table would need thousands of plane-dot
    expressions in SQL. Correctness is pinned by pytest (recall vs
    the exact baseline on a seeded tight-pair fixture; SQL-vs-GEMM
    key parity on an integer fixture) — the verify stage reuses the
    same Arrow kernel that IS oracle-certified via embedding_near_dup.
    """
    if n_hint is None:
        n_hint = emb.count()
    bands_n, rows_n = vec.banding_for_corpus(threshold, n_hint)
    v = _with_norm(_spread(emb)).drop("label")
    bands = _band_keys_arrow(v, bands_n, rows_n).localCheckpoint(eager=False)
    return _split_verify(bands, v, threshold)


def near_dup_pairs_exact(
    emb: DataFrame, threshold: float = NEAR_DUP_THRESHOLD
) -> DataFrame:
    """All-pairs exact baseline (O(N^2) crossJoin) — kept ONLY as the
    recall yardstick for near_dup_pairs in tests; never the scale
    path."""
    a = _with_norm(_spread(emb), "q_")
    b = _with_norm(emb).drop("label")
    return (
        a.crossJoin(b)
        .filter(F.col("q_vec_id") < F.col("vec_id"))
        .select(
            F.col("q_vec_id").alias("vec_a"),
            F.col("vec_id").alias("vec_b"),
            _cosine_col("q_embedding", "embedding", "q_norm2", "norm2"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def knn_label_vote(emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES) -> DataFrame:
    """Majority label among the top-k neighbours of each query
    (ties broken by smaller label)."""
    topk = _topk_pairs(emb, k, n_queries, bucketed=False)
    labels = emb.select("vec_id", "label")
    votes = (
        topk.join(labels, "vec_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )


# ---------------------------------------------------------------------------
# DuckDB oracles


def _oracle_ctes(view: str, n_queries: int, bucketed: bool) -> str:
    n2 = vec.norm2_sql("embedding", "duckdb")
    sig = f", {vec.lsh_sig_sql('embedding', 'duckdb')} AS bucket" if bucketed else ""
    base = (
        f"v AS (SELECT vec_id, embedding, label, {n2} AS norm2{sig} FROM {view}), "
        f"q AS (SELECT vec_id AS query_id, embedding AS q_embedding, "
        f"norm2 AS q_norm2{', bucket' if bucketed else ''} "
        f"FROM v WHERE vec_id < {n_queries})"
    )
    join = "q JOIN v ON q.bucket = v.bucket" if bucketed else "q CROSS JOIN v"
    cos = vec.cosine_sql("q_embedding", "embedding", "q_norm2", "norm2", "duckdb")
    scored = (
        f"scored AS (SELECT query_id, vec_id, label, round({cos}, 6) AS cosine "
        f"FROM {join} WHERE vec_id != query_id)"
    )
    return f"WITH {base}, {scored}"


def _topk_oracle(view: str, k: int, n_queries: int, bucketed: bool) -> str:
    return (
        _oracle_ctes(view, n_queries, bucketed)
        + ", ranked AS (SELECT query_id, vec_id, cosine, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank FROM scored) "
        f"SELECT * FROM ranked WHERE rank <= {k}"
    )


def cosine_topk_oracle(view: str = "embeddings", k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    return _topk_oracle(view, k, n_queries, bucketed=False)


def cosine_topk_lsh_oracle(view: str = "embeddings", k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    return _topk_oracle(view, k, n_queries, bucketed=True)


def near_dup_oracle(view: str = "embeddings", threshold: float = NEAR_DUP_THRESHOLD) -> str:
    """DuckDB twin of the BANDED near_dup_pairs (identical band keys,
    so the value hash matches the lossy-by-design Spark plan)."""
    n2 = vec.norm2_sql("embedding", "duckdb")
    cos = vec.cosine_sql("a.embedding", "b.embedding", "a.norm2", "b.norm2", "duckdb")
    bands_n, rows_n = vec.banding_for_threshold(threshold)
    band_blocks = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS band, "
        f"{vec.band_key_sql('embedding', j, 'duckdb', rows_n)} AS bkey FROM v"
        for j in range(bands_n)
    )
    return (
        f"WITH v AS (SELECT vec_id, embedding, {n2} AS norm2 FROM {view}), "
        f"bands AS ({band_blocks}), "
        "cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b "
        "FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey "
        "AND x.vec_id < y.vec_id) "
        f"SELECT vec_a, vec_b, round({cos}, 6) AS cosine "
        "FROM cand c JOIN v a ON a.vec_id = c.vec_a "
        "JOIN v b ON b.vec_id = c.vec_b "
        f"WHERE round({cos}, 6) >= {threshold}"
    )


def knn_label_vote_oracle(view: str = "embeddings", k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    return (
        _oracle_ctes(view, n_queries, bucketed=False)
        + ", ranked AS (SELECT query_id, vec_id, label, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank FROM scored), "
        f"votes AS (SELECT query_id, label, count(*) AS votes FROM ranked "
        f"WHERE rank <= {k} GROUP BY 1, 2) "
        "SELECT query_id, label AS predicted_label, votes FROM ("
        "SELECT votes.*, row_number() OVER (PARTITION BY query_id "
        "ORDER BY votes DESC, label) AS rn FROM votes) WHERE rn = 1"
    )


def cosine_topk_ivf(emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES) -> DataFrame:
    """IVF-style ANN: corpus vectors land in inverted lists keyed by
    their nearest codebook centroid (vec.ivf_assign_sql); each query
    probes its NPROBE nearest lists, turning search into an equi-join
    on cluster id. Same shuffle-on-small-key shape as the LSH variant
    but with a distance-ordered probe set (the FAISS IVF mechanic).
    Lossy by design; Spark and DuckDB inline identical codebook
    literals, so results are bit-comparable."""
    cand = _with_norm(_spread(emb)).withColumn(
        "cluster", F.expr(vec.ivf_assign_sql("embedding", "spark"))
    )
    queries = _with_norm(emb.filter(F.col("vec_id") < n_queries), "q_").withColumn(
        "cluster",
        F.explode(F.expr(vec.ivf_probe_sql("q_embedding", "spark"))),
    )
    joined = queries.join(cand, "cluster")
    scored = joined.filter(F.col("vec_id") != F.col("q_vec_id")).select(
        F.col("q_vec_id").alias("query_id"),
        "vec_id",
        _cosine_col("q_embedding", "embedding", "q_norm2", "norm2"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_topk_ivf_oracle(
    view: str = "embeddings", k: int = TOP_K, n_queries: int = N_QUERIES
) -> str:
    n2 = norm2 = vec.norm2_sql("embedding", "duckdb")
    assign = vec.ivf_assign_sql("embedding", "duckdb")
    probe = vec.ivf_probe_sql("q_embedding", "duckdb")
    cos = vec.cosine_sql("q_embedding", "embedding", "q_norm2", "norm2", "duckdb")
    return (
        f"WITH v AS (SELECT vec_id, embedding, {n2} AS norm2, "
        f"{assign} AS cluster FROM {view}), "
        f"q0 AS (SELECT vec_id AS query_id, embedding AS q_embedding, "
        f"norm2 AS q_norm2 FROM v WHERE vec_id < {n_queries}), "
        f"q AS (SELECT q0.*, unnest({probe}) AS cluster FROM q0), "
        f"scored AS (SELECT query_id, vec_id, round({cos}, 6) AS cosine "
        "FROM q JOIN v USING (cluster) WHERE vec_id != query_id), "
        "ranked AS (SELECT query_id, vec_id, cosine, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank FROM scored) "
        f"SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# Hamming-radius near-dup over 64-bit perceptual hashes


def hamming_banding(max_hamming: int, n_hint: int | None) -> tuple[int, int]:
    """Pick (k bands, combo size c = k - max_hamming) for an exact
    Hamming-radius join at corpus size ``n_hint``.

    Pigeonhole: d bit-differences dirty at most d of k bands, so any
    in-radius pair matches verbatim on SOME (k-d)-subset of bands —
    joining on ALL C(k, k-d) subsets as composite keys keeps recall
    exact at any k > d (the multi-block simhash scheme of Manku,
    Jain & Das Sarma, WWW'07). The tradeoff: larger k widens the
    composite key (occupancy per bucket ~ N / 2^bits, so candidate
    count stays LINEAR in N) but explodes each row into C(k, c)
    keys. This picks the smallest k whose worst-case composite key
    still bounds expected bucket occupancy at ~4 rows, capped at
    1024 combos per row (past that a permuted multi-table layout is
    the right tool)."""
    d = max_hamming
    if not 0 <= d <= 62:
        raise ValueError("max_hamming must be in [0, 62]")
    if not n_hint:
        return d + 1, 1
    import math

    need = max(0.0, math.log2(max(n_hint, 2)) - 2)
    k = d + 1
    while True:
        c = k - d
        widths = sorted(
            ((i + 1) * 64) // k - (i * 64) // k for i in range(k)
        )
        bits = sum(widths[:c])  # worst-case (narrowest) combo
        if bits >= need or math.comb(k + 1, c + 1) > 1024 or k >= 32:
            return k, c
        k += 1


def hamming_near_dup(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 6,
    n_hint: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """All pairs of rows whose 64-bit ``hash_col`` values differ in at
    most ``max_hamming`` bits — EXACT, never all-pairs.

    Pigeonhole banding: the hash is cut into k contiguous bit bands
    and rows are joined on every (k - max_hamming)-band combination
    key — every in-radius pair shares one such key verbatim (100%
    recall, unlike probabilistic LSH), and ``bit_count(a ^ b)`` on
    the candidates gives 100% precision. Candidates are an equi-join
    on (combo, key): linear scan + shuffle-on-key, the same shape as
    the MinHash band join (dedup.py). All JVM built-ins — nothing
    leaves codegen.

    Pass ``n_hint`` (approximate corpus size) to let hamming_banding
    widen the composite keys: without it k = max_hamming + 1 single
    bands (9-bit keys at the default radius — fine to ~10^4 rows),
    with it bucket occupancy stays O(1) so candidates stay linear in
    N — the same corpus-size-aware scale mode as
    near_dup_pairs_scaled.

    ``max_bucket`` is the guard for DEGENERATE hash distributions
    (real corpora have them: flat/black images all land on a handful
    of average-hash values, so their bucket alone is quadratic). Keys
    with more than ``max_bucket`` members are dropped from candidate
    generation — the same guard-first anti-join shape as the OD
    500-event cap (trajectory.py) and the max_df stop-shingle cap
    (dedup.py). Recall caveat: pairs ONLY reachable through a dropped
    bucket are missed; with combination banding a pair has several
    independent keys, so only hash-cluster members lose recall — and
    those are exactly the pairs a dedup sweep treats as a cluster,
    not pairwise.

    The multimodal near-dup ops (image/video) compose decode kernels
    with this; it works over any integer fingerprint column.
    """
    band_arr = _hamming_key_structs(hash_col, max_hamming, n_hint)
    if max_bucket:
        # the bucket census adds a second consumer of the band
        # lineage; materialize the NARROW (id, hash) frame once so an
        # expensive upstream (image decode) never runs twice
        df = df.select(id_col, hash_col).localCheckpoint()
    bands = df.select(
        F.col(id_col), F.col(hash_col), F.explode(band_arr).alias("bk")
    ).select(id_col, hash_col, "bk.band", "bk.key")
    if max_bucket:
        hot = (
            bands.groupBy("band", "key")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band", "key")
        )
        # two-phase count is map-side partial (skew-immune); the hot
        # set is tiny by construction -> broadcast anti-join
        bands = bands.join(F.broadcast(hot), ["band", "key"], "left_anti")
    # merge hint: the band table behind a mapInArrow/range source
    # carries the SOURCE's size estimate (bytes, not rows), so the
    # static planner would broadcast a multi-GiB exploded table and
    # die at scale; shuffled-hash is no better (the per-task build
    # map is unspillable and OOMs at ~10^8 band rows). Sort-merge
    # spills gracefully at any size and AQE still splits skewed keys
    a, b = bands.alias("a"), bands.hint("merge").alias("b")
    cand = a.join(b, ["band", "key"]).filter(
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    # verify BEFORE the distinct: popcount is one codegen op, and
    # dropping misses early shrinks the dedup shuffle
    return (
        cand.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.expr(
                f"cast(bit_count(a.{hash_col} ^ b.{hash_col}) as int)"
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _hamming_key_structs(
    hash_col: str, max_hamming: int, n_hint: int | None
) -> F.Column:
    """array<struct<band, key>> of the C(k, c) combination keys for
    one 64-bit hash column (see hamming_banding). Shared by the
    image (flat) and video (per-slot) near-dup joins."""
    import itertools

    k, c = hamming_banding(max_hamming, n_hint)
    bounds = [(i * 64) // k for i in range(k + 1)]

    def band(i: int) -> str:
        width = bounds[i + 1] - bounds[i]
        if width == 64:  # max_hamming=0: exact join on the full hash
            return f"({hash_col})"
        return (
            f"(shiftrightunsigned({hash_col}, {bounds[i]}) & "
            f"{(1 << width) - 1})"
        )

    structs = []
    for ci, combo in enumerate(itertools.combinations(range(k), c)):
        assert len(combo) == 1 or (
            sum(bounds[i + 1] - bounds[i] for i in combo) <= 63
        )
        expr = band(combo[0])
        for i in combo[1:]:
            expr = f"(({expr}) << {bounds[i + 1] - bounds[i]} | {band(i)})"
        structs.append(
            F.struct(F.lit(ci).alias("band"), F.expr(expr).alias("key"))
        )
    return F.array(*structs)
