"""Embedding clustering + semantic dedup over ``array<float>`` columns.

Three layers, smallest-trust-base first:

- ``kmeans_refine_assign``: ONE Lloyd refinement step of spherical
  k-means (seed centroids = the k lowest ``vec_id`` rows), fully
  SQL-expressible — the DuckDB oracle twin hash-matches, certifying
  the assign / recompute / reassign core the full loop iterates.
- ``kmeans_fit`` / ``kmeans_assign``: the full Lloyd loop. The model
  (k × dim doubles) lives on the driver — that is the one legitimate
  driver-side state, it IS the output artifact — and is rounded to
  ``CENTROID_DECIMALS`` each iteration so the fit is invariant to
  partitioning and FP accumulation order (asserted in tests at two
  parallelism levels).
- ``semantic_dedup``: SemDeDup (Abbas et al. 2023, arXiv:2303.09540)
  — cluster the corpus, then search near-duplicates only WITHIN each
  cluster, keeping the lowest ``vec_id`` of every duplicate group.

Scale shape: every assignment pass is a broadcast of k centroids
scored map-side over the corpus (one projection, no shuffle); the
centroid recompute is a k-keyed aggregate emitting k rows; the
semantic-dedup self-join is per-cluster quadratic by design, bounded
by growing k with the corpus (k ≈ N / target_cluster_size — the
SemDeDup configuration; the within-cluster join stays an equi-join
on the cluster key, never corpus-wide all-pairs).

Reference parity: the reference engine has no clustering operators —
its payload columns are opaque strings (SURVEY.md §1.2); this module
is part of the axes-B training-data curation layer the graft adds.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.functions import vec

KMEANS_K = 8
KMEANS_ITERS = 8
# centroids are rounded to this many decimals after every recompute:
# FP accumulation order (partial aggregates) perturbs the elementwise
# means at ~1e-13; rounding makes the fit bit-reproducible across
# partitionings and engines
CENTROID_DECIMALS = 6
SEMANTIC_DUP_THRESHOLD = 0.95


def _avg_centroid_cols(dim: int = vec.DIM) -> list:
    """Elementwise rounded mean of the embedding column (Spark)."""
    return [
        F.round(F.avg(F.expr(f"cast(embedding[{i}] as double)")), CENTROID_DECIMALS)
        for i in range(dim)
    ]


def kmeans_refine_assign(emb: DataFrame, k: int = KMEANS_K) -> DataFrame:
    """One spherical-k-means Lloyd step, end to end: assign every
    vector to its max-cosine seed centroid (seeds = ``vec_id < k``),
    recompute centroids as the rounded elementwise mean of each
    cluster, reassign against the refined centroids.

    Output: (vec_id, cluster, cosine) after the refinement step.
    Deterministic: cosines are rounded to 6 decimals before ranking
    and ties break on the smaller cluster id, so the DuckDB oracle
    twin (identical unrolled expressions — see functions/vec.py's
    bit-exactness note) hash-matches.

    Plan shape: two broadcast joins of a k-row centroid frame against
    the corpus (scored map-side, argmin collapsed to one row per
    vec_id by map-side partial combine before each exchange) and one
    k-keyed aggregate between them — the per-iteration cost profile
    of the full loop, expressed as a single plan for the oracle.
    """
    n2 = vec.norm2_sql("embedding", "spark")
    pts = emb.select("vec_id", "embedding", F.expr(n2).alias("norm2"))
    seeds = pts.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"),
        F.col("embedding").alias("c"),
        F.col("norm2").alias("c_norm2"),
    )

    def assign(centroids: DataFrame) -> DataFrame:
        # argmin as min(struct(-cosine, cluster)): lexicographic
        # struct order == ORDER BY cosine DESC, cluster ASC, and the
        # aggregate gets map-side partial combine — the k-fanout from
        # the broadcast join collapses back to one row per vec_id
        # BEFORE the exchange (a row_number window would carry all k
        # scored rows through a vec_id hash partitioning instead)
        cos = vec.cosine_sql("embedding", "c", "norm2", "c_norm2", "spark")
        return (
            pts.join(F.broadcast(centroids))
            .select(
                "vec_id",
                "embedding",
                F.struct(
                    (-F.round(F.expr(cos), 6)).alias("negcos"),
                    F.col("cluster").alias("cl"),
                ).alias("s"),
            )
            .groupBy("vec_id")
            .agg(F.min("s").alias("s"), F.first("embedding").alias("embedding"))
            .select(
                "vec_id",
                "embedding",
                F.col("s.cl").alias("cluster"),
                (-F.col("s.negcos")).alias("cosine"),
            )
        )

    a0 = assign(seeds)
    c1 = (
        a0.groupBy("cluster")
        .agg(F.array(*_avg_centroid_cols()).alias("c"))
        .select(
            "cluster", "c", F.expr(vec.norm2_sql("c", "spark")).alias("c_norm2")
        )
    )
    return assign(c1).select("vec_id", "cluster", "cosine")


def kmeans_refine_oracle(view: str = "embeddings", k: int = KMEANS_K) -> str:
    n2 = vec.norm2_sql("embedding", "duckdb")
    cos = vec.cosine_sql("embedding", "c", "norm2", "c_norm2", "duckdb")
    cn2 = vec.norm2_sql("c", "duckdb")
    mean_list = ", ".join(
        f"round(avg(embedding[{i + 1}]::DOUBLE), {CENTROID_DECIMALS})"
        for i in range(vec.DIM)
    )
    return (
        f"WITH pts AS (SELECT vec_id, embedding, {n2} AS norm2 FROM {view}), "
        f"seeds AS (SELECT vec_id AS cluster, embedding AS c, norm2 AS c_norm2 "
        f"FROM pts WHERE vec_id < {k}), "
        f"s0 AS (SELECT vec_id, embedding, norm2, cluster, round({cos}, 6) AS cosine, "
        "row_number() OVER (PARTITION BY vec_id ORDER BY round("
        f"{cos}, 6) DESC, cluster) AS rn FROM pts CROSS JOIN seeds), "
        "a0 AS (SELECT vec_id, embedding, cluster FROM s0 WHERE rn = 1), "
        f"c1 AS (SELECT cluster, [{mean_list}] AS c FROM a0 GROUP BY cluster), "
        f"c1n AS (SELECT cluster, c, {cn2} AS c_norm2 FROM c1), "
        f"s1 AS (SELECT vec_id, cluster, round({cos}, 6) AS cosine, "
        "row_number() OVER (PARTITION BY vec_id ORDER BY round("
        f"{cos}, 6) DESC, cluster) AS rn FROM pts CROSS JOIN c1n) "
        "SELECT vec_id, cluster, cosine FROM s1 WHERE rn = 1"
    )


def _centroid_lit(c: np.ndarray) -> str:
    """A centroid row as a literal double array expression."""
    return "array(" + ", ".join(f"cast({v!r} as double)" for v in c) + ")"


def _score_structs(
    centroids: np.ndarray, norm2_col: str = "norm2", col: str = "embedding"
) -> str:
    """Literal array of (rounded -cosine, cluster id) structs — the
    shared scoring block of the argmax and top-n probe expressions.
    The caller precomputes the point norm in ``norm2_col`` so it is
    evaluated once per row, not once per centroid.

    Zero-norm guard (matching _assign_gemm's xnorm==0 -> cosine 0.0):
    under ANSI mode a zero-norm point or centroid would not return
    NULL but raise DIVIDE_BY_ZERO, killing the job on one degenerate
    vector — and the sql/gemm mode equivalence with it."""
    structs = []
    for j, c in enumerate(centroids):
        dot = vec.dot_sql(col, _centroid_lit(c), "spark")
        cn2 = float(np.dot(c, c))
        if cn2 == 0.0:
            cos = "cast(0 as double)"
        else:
            cos = (
                f"(case when {norm2_col} = 0 then cast(0 as double) else "
                f"(({dot}) / (sqrt(cast({norm2_col} as double))"
                f" * sqrt(cast({cn2!r} as double)))) end)"
            )
        structs.append(
            f"struct(cast(round(-({cos}), 6) as double) as negcos, {j} as cl)"
        )
    return f"array({', '.join(structs)})"


def _argmax_expr(centroids: np.ndarray, norm2_col: str = "norm2") -> str:
    """SQL picking (cluster, cosine) of the max-cosine centroid.

    ``array_min`` over the score structs: struct comparison is
    lexicographic, so the minimum is the highest cosine with ties
    broken on the smaller cluster id, identical to the refine step's
    ORDER BY. All literals; the whole assignment is a map-side
    projection, no join at all.
    """
    return f"array_min({_score_structs(centroids, norm2_col)})"


def _topn_probe_expr(
    centroids: np.ndarray,
    nprobe: int,
    norm2_col: str = "norm2",
    col: str = "embedding",
) -> str:
    """SQL array of the ``nprobe`` nearest cluster ids (cosine order,
    ties to the smaller id) — the IVF probe set. Sorting k literal
    structs per row is O(k log k) on constants; still map-only."""
    return (
        f"transform(slice(array_sort("
        f"{_score_structs(centroids, norm2_col, col)}), "
        f"1, {nprobe}), s -> s.cl)"
    )


def _with_norm2(emb: DataFrame) -> DataFrame:
    return emb.withColumn(
        "norm2", F.expr(vec.norm2_sql("embedding", "spark"))
    )


def _assign_gemm(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """GEMM assignment: one X @ Cᵀ per Arrow batch (the
    near_dup_pairs_scaled band-hashing trick) — the scale path when
    k × dim makes the Catalyst fold (interpreted per element) the
    bottleneck. Same argmax semantics as _argmax_expr: cosines
    rounded to 6 decimals, ties to the smallest cluster id
    (np.argmax returns the first maximum). Map-only; the model rides
    in the task closure."""
    C = np.asarray(centroids, dtype=np.float64)
    cnorm = np.sqrt((C * C).sum(axis=1))
    cnorm[cnorm == 0.0] = np.inf  # empty centroid never wins

    def kernel(batches):
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            X = np.asarray(
                rb.column("embedding").flatten(), dtype=np.float64
            ).reshape(n, -1)
            xnorm = np.sqrt((X * X).sum(axis=1))
            xnorm[xnorm == 0.0] = np.inf
            S = np.round((X @ C.T) / (xnorm[:, None] * cnorm[None, :]), 6)
            cl = np.argmax(S, axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("vec_id"),
                    rb.column("embedding"),
                    pa.array(cl.astype(np.int64)),
                    pa.array(S[np.arange(n), cl]),
                ],
                ["vec_id", "embedding", "cluster", "cosine"],
            )

    return emb.select("vec_id", "embedding").mapInArrow(
        kernel,
        schema="vec_id long, embedding array<float>, cluster long, cosine double",
    )


def kmeans_assign(
    emb: DataFrame, centroids: np.ndarray, mode: str = "auto"
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (driver-held
    model — a closure/literal broadcast with zero runtime join).
    Output: (vec_id, embedding, cluster, cosine).

    mode: 'sql' scores via codegen literal expressions (no Python in
    the plan — right for small k), 'gemm' via the Arrow batched
    matrix product (right once k × dim dominates: the Catalyst fold
    is interpreted per element), 'auto' picks gemm at k >= 16. Both
    round to 6 decimals and break ties to the smaller cluster id;
    equivalence is pytest-pinned.
    """
    if mode == "auto":
        mode = "gemm" if len(centroids) >= 16 else "sql"
    if mode == "gemm":
        return _assign_gemm(emb, centroids)
    pick = _argmax_expr(centroids)
    picked = _with_norm2(emb).select(
        "vec_id", "embedding", F.expr(pick).alias("pk")
    )
    return picked.select(
        "vec_id",
        "embedding",
        F.col("pk.cl").cast("long").alias("cluster"),
        (-F.col("pk.negcos")).cast("double").alias("cosine"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = KMEANS_K,
    n_iters: int = KMEANS_ITERS,
    dim: int = vec.DIM,
    mode: str = "auto",
) -> np.ndarray:
    """Full Lloyd loop for spherical k-means. Returns the (k × dim)
    centroid model, rounded to CENTROID_DECIMALS per iteration.

    Seeds are the k lowest-``vec_id`` vectors (deterministic; the
    synthetic corpus is hash-shuffled so low ids are unbiased
    samples). Each iteration is one map-side assignment projection
    (centroid literals, no join) plus one k-keyed aggregate whose
    k × dim result — the model itself — is the only thing collected.
    Empty clusters keep their previous centroid. Stops early at a
    centroid fixpoint (exact, because rounding quantizes the state).
    """
    seed_rows = (
        emb.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(
            f"kmeans_fit needs vec_id 0..{k - 1} present as seeds; "
            f"found {len(seed_rows)}"
        )
    cents = np.array(
        [r.embedding for r in sorted(seed_rows, key=lambda r: r.vec_id)],
        dtype=np.float64,
    ).round(CENTROID_DECIMALS)
    for _ in range(n_iters):
        stats = (
            kmeans_assign(emb, cents, mode)
            .select("cluster", "embedding")
            .groupBy("cluster")
            .agg(*[c.alias(f"m{i}") for i, c in enumerate(_avg_centroid_cols(dim))])
            .collect()
        )
        new = cents.copy()
        for r in stats:
            new[r.cluster] = [r[f"m{i}"] for i in range(dim)]
        new = new.round(CENTROID_DECIMALS)
        if np.array_equal(new, cents):
            break
        cents = new
    return cents


def embedding_kmeans(
    emb: DataFrame,
    k: int = KMEANS_K,
    n_iters: int = KMEANS_ITERS,
    mode: str = "auto",
) -> DataFrame:
    """Fit + assign: (vec_id, cluster, cosine) under the converged
    model. Rows-only in the driver contract (the Lloyd loop is
    iterative, not SQL-expressible); determinism and clustering
    quality are pytest-certified, and the per-iteration kernel is
    oracle-certified via ``kmeans_refine_assign``."""
    cents = kmeans_fit(emb, k, n_iters, mode=mode)
    return kmeans_assign(emb, cents, mode).select(
        "vec_id", "cluster", "cosine"
    )


def semantic_dedup(
    emb: DataFrame,
    k: int = KMEANS_K,
    threshold: float = SEMANTIC_DUP_THRESHOLD,
    n_iters: int = KMEANS_ITERS,
    mode: str = "auto",
) -> DataFrame:
    """SemDeDup: k-means the corpus, then flag near-duplicates only
    WITHIN clusters (pairwise cosine ≥ threshold), keeping the lowest
    ``vec_id`` of each duplicate group.

    Output: (vec_id, cluster, keep) — keep=false iff some
    lower-``vec_id`` vector in the same cluster is within threshold.

    Scale: the pair search is an equi-join on the cluster key; its
    per-cluster quadratic cost is the SemDeDup contract, bounded by
    scaling k ≈ N / target_cluster_size so cluster populations stay
    O(target). The keep verdict needs only the per-vector EXISTS of a
    lower-id neighbour — computed as a semi-join, never materializing
    the full pair list.
    """
    from . import similarity

    cents = kmeans_fit(emb, k, n_iters, mode=mode)
    a = kmeans_assign(emb, cents, mode).select("vec_id", "embedding", "cluster")
    n2 = vec.norm2_sql("embedding", "spark")
    v = a.select("vec_id", "cluster", "embedding", F.expr(n2).alias("norm2"))
    lo = v.select(
        F.col("vec_id").alias("vec_a"),
        "cluster",
        F.col("embedding").alias("a_emb"),
        F.col("norm2").alias("a_n2"),
    )
    hi = v.select(
        F.col("vec_id").alias("vec_b"),
        "cluster",
        F.col("embedding").alias("b_emb"),
        F.col("norm2").alias("b_n2"),
    )
    # within-cluster candidate pairs, exact cosine via the shared
    # Arrow kernel (the Catalyst fold is interpreted per element —
    # at cluster populations in the thousands the vectorized verify
    # is the difference between seconds and minutes)
    pairs = hi.join(lo, "cluster").filter(F.col("vec_a") < F.col("vec_b"))
    dup_ids = (
        similarity._verify_cosine_arrow(pairs)
        .filter(F.round(F.col("cosine_raw"), 6) >= threshold)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return (
        a.join(dup_ids.withColumn("__dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep"),
        )
    )


def cosine_topk_ivf_trained(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    nlist: int = KMEANS_K,
    nprobe: int = 2,
    n_iters: int = KMEANS_ITERS,
    mode: str = "auto",
) -> DataFrame:
    """IVF ANN over a TRAINED codebook: the k-means centroids replace
    similarity.cosine_topk_ivf's frozen hash-derived anchors — the
    full FAISS IVF mechanic (train, assign inverted lists, probe the
    nprobe nearest lists per query).

    Search is an equi-join on the cluster id: corpus vectors carry
    their trained-list assignment, each query explodes into its
    probe set, and only probed lists are scored. With nprobe ==
    nlist the probe set is every list and the result must equal the
    brute-force cosine_topk EXACTLY (same rounding and tie rules —
    pytest-pinned); smaller nprobe trades recall for scoring volume,
    quantified in tests. Rows-only in the driver contract (the
    trained codebook comes from the iterative fit; the frozen-anchor
    IVF twin ann_cosine_topk_ivf is the oracle-certified form).

    Output: (query_id, vec_id, cosine, rank) — cosine_topk's schema.
    """
    cents = kmeans_fit(emb, nlist, n_iters, mode=mode)
    n2 = vec.norm2_sql("embedding", "spark")
    cand = kmeans_assign(emb, cents, mode).select(
        "vec_id", "embedding", "cluster", F.expr(n2).alias("norm2")
    )
    probe = _topn_probe_expr(cents, nprobe, "q_norm2", "q_embedding")
    queries = (
        _with_norm2(emb.filter(F.col("vec_id") < n_queries))
        .select(
            F.col("vec_id").alias("q_vec_id"),
            F.col("embedding").alias("q_embedding"),
            F.col("norm2").alias("q_norm2"),
        )
        .select(
            "q_vec_id",
            "q_embedding",
            "q_norm2",
            F.explode(F.expr(probe)).alias("cluster"),
        )
    )
    cos = vec.cosine_sql("q_embedding", "embedding", "q_norm2", "norm2", "spark")
    scored = (
        queries.join(cand, "cluster")
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            F.col("q_vec_id").alias("query_id"),
            "vec_id",
            F.round(F.expr(cos), 6).alias("cosine"),
        )
    )
    s = scored.select(
        "query_id",
        F.struct(
            (-F.col("cosine")).alias("negcos"), F.col("vec_id").alias("vid")
        ).alias("s"),
    )
    # exact per-query top-k without a rank window: collect the probed
    # candidates per query (bounded by nprobe * list size), sort the
    # struct array, slice k — one aggregation with map-side partials
    topk = s.groupBy("query_id").agg(
        F.expr(f"slice(array_sort(collect_list(s)), 1, {k})").alias("tk")
    )
    return topk.select(
        "query_id", F.posexplode("tk").alias("pos", "s")
    ).select(
        "query_id",
        F.col("s.vid").alias("vec_id"),
        (-F.col("s.negcos")).alias("cosine"),
        (F.col("pos") + 1).alias("rank"),
    )
