"""Deterministic dataset splitting + quota sampling over ``documents``.

The two curation steps every training-data pipeline runs after dedup
and quality scoring:

- ``dataset_split``: assign every document to train/val/test by a
  seeded deterministic hash of its id — stable across reruns, cluster
  sizes, and partitionings (the property ``df.sample()`` does NOT
  give you: its split moves when partitioning changes).
- ``quota_sample``: keep at most ``per_group`` documents per group
  (source/domain), ranked by quality — the per-source cap used to
  stop one crawl dominating the mixture.

Reference parity: the reference has no sampling operators (its
payloads are opaque — SURVEY.md §1.2); these are axes-B additions,
like operators/textops.py.

Scale notes (100 TB):

- The split is a stateless map-only projection — zero shuffles, zero
  state, no skew surface; it survives any scale by construction.
- The quota sampler's naive form (one window over
  ``partitionBy(group)``) sorts whole groups on single reducers — a
  700-source corpus where one source owns 40% of rows puts 40 TB
  through one task. This implementation is two-phase instead: a
  per-(group, shard) local top-k first (shard = doc_id mod S, so the
  hot group fans out over S tasks), then the exact top-k over the
  ≤ S·k survivors per group. Because the ranking order is TOTAL
  (quality desc, doc_id asc — no tie ambiguity), the union of local
  top-ks provably contains the global top-k, so the result is
  bit-identical to the naive form (pinned by a pytest equivalence
  test) while the heavy pass never sorts more than one shard.

The hash is MINSTD (Lehmer 1988, Park-Miller): h' = 48271·h mod
(2³¹−1) — chosen over splitmix/xxhash not for statistical strength
but because both engines can evaluate it EXACTLY in 64-bit integer
SQL (no overflow: (2³¹−2)·48271 < 2⁶³), so the DuckDB oracle twin is
bit-identical. For split assignment (a few coarse buckets) its
uniformity is ample; it is NOT a content fingerprint (texthash.py's
md5 family covers that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.functions import sqlmath
from cdr_analysis_tools_hadoop_spark.functions import texthash as th

MINSTD_MOD = 2147483647  # 2^31 - 1 (prime)
MINSTD_MULT = 48271
DEFAULT_SEED = 7
DEFAULT_SPLITS = (("train", 0.9), ("val", 0.05), ("test", 0.05))
DEFAULT_PER_GROUP = 10


def split_u_sql(id_col: str, seed: int) -> str:
    """u in [0, 1): seeded 3-step MINSTD hash of an integer id —
    identical SQL text evaluates identically in Spark and DuckDB
    (int64 arithmetic, max intermediate (M−1)·48271 < 2⁶³, then one
    exact int→double division).

    THREE Lehmer steps, not one: a single step maps SEQUENTIAL ids
    (the common case) to u ≈ 48271·i/2³¹ — every id below ~44k lands
    in the first split. Step two's stride is 48271² mod M ≈ 0.085·M
    and step three's wraps many times per increment, so consecutive
    ids equidistribute across [0, 1) (pinned by the fraction test).

    The leading double-mod canonicalizes negative ids: both engines'
    ``%`` keeps the dividend's sign (identically, so parity would
    hold either way), but a plain mod would send EVERY negative id to
    the first split instead of hashing it."""
    return f"(({minstd_h_sql(id_col, seed)}) / {MINSTD_MOD}.0)"


def minstd_h_sql(id_col: str, seed: int) -> str:
    """The integer 3-step MINSTD hash in [0, M) split_u_sql divides —
    exposed for consumers that need a PURE-INTEGER uniform (ppm
    thresholds with no doubles anywhere, e.g. mixture_resample)."""
    h = f"((({id_col} % {MINSTD_MOD}) + {MINSTD_MOD} + {seed}) % {MINSTD_MOD})"
    for _ in range(3):
        h = f"(({h}) * {MINSTD_MULT} % {MINSTD_MOD})"
    return h


def split_case_sql(
    id_col: str,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    seed: int = DEFAULT_SEED,
) -> str:
    """CASE expression assigning the split label by cumulative weight."""
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = split_u_sql(id_col, seed)
    cases, cum = [], 0.0
    for name, w in splits[:-1]:
        cum += w
        cases.append(f"WHEN {u} < {cum!r} THEN '{name}'")
    return f"CASE {' '.join(cases)} ELSE '{splits[-1][0]}' END"


def dataset_split(
    docs: DataFrame,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """(doc_id, split): deterministic seeded train/val/test assignment.

    Map-only (no shuffle, no state): the assignment depends only on
    (doc_id, seed), so reruns, resumes from checkpoint, and different
    cluster sizes all produce the same membership — the reproducibility
    contract a training pipeline needs from its split."""
    return docs.select(
        "doc_id",
        F.expr(split_case_sql("doc_id", splits, seed)).alias("split"),
    )


def dataset_split_oracle(
    view: str = "documents",
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    seed: int = DEFAULT_SEED,
) -> str:
    return (
        f"SELECT doc_id, {split_case_sql('doc_id', splits, seed)} AS split "
        f"FROM {view}"
    )


GROUP_SPLIT_SEED = 987127


def group_split_stats(
    events: DataFrame,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    seed: int = GROUP_SPLIT_SEED,
    group_col: str = "user_id",
) -> DataFrame:
    """(split, n_users, n_events): GROUP-level train/val/test split —
    the split is a pure function of the grouping id, so every event
    of a user lands in the same split by construction.

    This is the leakage-safe variant of dataset_split: splitting
    fact rows independently puts one user's history on both sides of
    a train/eval boundary, which inflates eval on any model that
    memorizes user behavior (same failure mode split_contamination
    detects post-hoc for documents — this prevents it structurally).

    Scale shape: the label is inlined into the fact scan (map-only
    codegen CASE, no distinct-users table, no join), then one
    partial-aggregated groupBy on the 3-value split key. countDistinct
    over users shuffles (user, split) pairs once — |users| rows, not
    |events|.
    """
    return (
        events.select(
            F.expr(split_case_sql(group_col, splits, seed)).alias("split"),
            group_col,
        )
        .groupBy("split")
        .agg(
            F.countDistinct(group_col).alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def group_split_stats_oracle(
    view: str = "events",
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    seed: int = GROUP_SPLIT_SEED,
    group_col: str = "user_id",
) -> str:
    return (
        f"SELECT {split_case_sql(group_col, splits, seed)} AS split, "
        f"count(DISTINCT {group_col}) AS n_users, count(*) AS n_events "
        f"FROM {view} GROUP BY 1"
    )


def quota_sample(
    docs: DataFrame,
    per_group: int = DEFAULT_PER_GROUP,
    group_col: str = "source",
    shards: int = 32,
) -> DataFrame:
    """Top-``per_group`` documents per group by quality milli-score.

    Two-phase exact top-k (see module docstring): phase 1 ranks
    within (group, doc_id mod ``shards``) and keeps the local top-k —
    a hot group spreads over ``shards`` tasks instead of one reducer —
    then phase 2 ranks the ≤ shards·k survivors per group exactly.
    Output is independent of ``shards`` (total order: quality desc,
    doc_id asc). ``shards=1`` degenerates to the naive single window.
    """
    from cdr_analysis_tools_hadoop_spark.operators.textops import (
        quality_score_sql,
    )

    if per_group < 1 or shards < 1:
        raise ValueError("per_group and shards must be >= 1")
    # quality_millis is a pure projection of the row's own text, so
    # inline it — joining quality_scores(docs) back on doc_id would
    # shuffle the corpus against itself for zero information gain
    scored = docs.select(
        "doc_id",
        group_col,
        F.expr(quality_score_sql("spark")).alias("quality_millis"),
    )
    order = [F.desc("quality_millis"), F.asc("doc_id")]
    if shards > 1:
        local = Window.partitionBy(
            group_col, F.col("doc_id") % shards
        ).orderBy(*order)
        scored = scored.withColumn(
            "_lrk", F.row_number().over(local)
        ).filter(F.col("_lrk") <= per_group).drop("_lrk")
    final = Window.partitionBy(group_col).orderBy(*order)
    return (
        scored.withColumn("rk", F.row_number().over(final))
        .filter(F.col("rk") <= per_group)
        .select("doc_id", group_col, "quality_millis", "rk")
    )


CONTAMINATION_PPM = 500000  # flag eval docs with >= 50% shingles in train


def split_contamination(
    docs: DataFrame,
    threshold_ppm: int = CONTAMINATION_PPM,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Eval-set contamination report: val/test documents whose distinct
    shingles overlap the train split's shingle union by at least
    ``threshold_ppm`` parts-per-million (the GPT-3-style n-gram
    decontamination check, run BEFORE training instead of after).

    Composition of the split with dedup's materialized shingle table:
    the train side collapses to DISTINCT shingle hashes, the eval side
    equi-joins on the hash — linear scans plus one hash-keyed join,
    never doc-by-doc comparison, so a 100 TB corpus with a 0.1% eval
    slice costs one pass over train shingles and a join keyed on the
    (uniform, md5-derived) 60-bit hash: no skew surface. All output
    columns are INTEGERS — the overlap ratio is reported as
    floor-ppm via exact integer division — so the DuckDB twin is
    FP-free (no rounding-mode edge at threshold boundaries).
    """
    from cdr_analysis_tools_hadoop_spark.operators.dedup import _hashed_shingles

    sh = _hashed_shingles(docs)
    # the split label is a pure CASE expression of doc_id
    # (dataset_split is a map-only projection), so stamp it onto the
    # shingle table directly — joining dataset_split's frame would
    # shuffle the corpus-scale (doc_id, h) table just to attach a
    # value computable from its own key
    shs = sh.withColumn(
        "split", F.expr(split_case_sql("doc_id", splits, seed))
    )
    train_h = (
        shs.filter(F.col("split") == "train").select("h").distinct()
    )
    ev = shs.filter(F.col("split") != "train")
    # ONE pass over the eval side: left-join the (distinct, so never
    # multiplying) train hash set, then count total and matched
    # shingles in the same aggregation — no second groupBy, no
    # re-join of two aggregates.
    marked = ev.join(
        train_h.withColumn("_m", F.lit(1)), "h", "left"
    )
    return (
        marked.groupBy("doc_id", "split")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_m").alias("n_hit"),
        )
        .withColumn(
            "contamination_ppm",
            F.expr("n_hit * 1000000 div n_shingles"),
        )
        .filter(F.col("contamination_ppm") >= threshold_ppm)
        .select("doc_id", "split", "n_shingles", "n_hit", "contamination_ppm")
    )


def split_contamination_oracle(
    view: str = "documents",
    threshold_ppm: int = CONTAMINATION_PPM,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    seed: int = DEFAULT_SEED,
) -> str:
    from cdr_analysis_tools_hadoop_spark.operators.dedup import _hashed_shingle_cte

    case = split_case_sql("doc_id", splits, seed)
    return (
        f"WITH {_hashed_shingle_cte(view)}, "
        f"sp AS (SELECT doc_id, {case} AS split FROM {view}), "
        "shs AS (SELECT dh.doc_id, sp.split, dh.h FROM dh "
        "JOIN sp ON dh.doc_id = sp.doc_id), "
        "tr AS (SELECT DISTINCT h FROM shs WHERE split = 'train'), "
        "ev AS (SELECT * FROM shs WHERE split <> 'train'), "
        "tot AS (SELECT doc_id, split, count(*) AS n_shingles FROM ev "
        "GROUP BY 1, 2), "
        "hit AS (SELECT ev.doc_id, ev.split, count(*) AS n_hit FROM ev "
        "JOIN tr ON ev.h = tr.h GROUP BY 1, 2) "
        "SELECT tot.doc_id, tot.split, tot.n_shingles, "
        "coalesce(hit.n_hit, 0) AS n_hit, "
        "coalesce(hit.n_hit, 0) * 1000000 // tot.n_shingles "
        "AS contamination_ppm "
        "FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id "
        "AND tot.split = hit.split "
        f"WHERE coalesce(hit.n_hit, 0) * 1000000 // tot.n_shingles "
        f">= {threshold_ppm}"
    )


def quota_sample_oracle(
    view: str = "documents",
    per_group: int = DEFAULT_PER_GROUP,
    group_col: str = "source",
) -> str:
    from cdr_analysis_tools_hadoop_spark.operators.textops import (
        _QUALITY_SCORE,
        _quality_exprs,
    )

    e = _quality_exprs("duckdb")
    return (
        f"WITH scored AS (SELECT doc_id, {group_col}, "
        f"{e['n_tokens']} AS n_tokens, {e['stopword_ratio']} AS stopword_ratio, "
        f"{e['type_token_ratio']} AS type_token_ratio FROM {view}), "
        f"q AS (SELECT doc_id, {group_col}, {_QUALITY_SCORE} AS quality_millis "
        "FROM scored), "
        "r AS (SELECT doc_id, "
        f"{group_col}, quality_millis, CAST(row_number() OVER "
        f"(PARTITION BY {group_col} ORDER BY quality_millis DESC, doc_id ASC) "
        "AS INT) AS rk FROM q) "
        f"SELECT doc_id, {group_col}, quality_millis, rk FROM r "
        f"WHERE rk <= {per_group}"
    )


# ---------------------------------------------------------------------------
# 4. mixture resampling (applying the rebalance weights)

RESAMPLE_SEED = 271828


# the overflow-free exact ppm division shared with domain_mixture's
# engine/oracle pair (functions/sqlmath.py)
_ppm_div_sql = sqlmath.ppm_div_sql


def mixture_resample(docs: DataFrame, seed: int = RESAMPLE_SEED) -> DataFrame:
    """Apply the uniform-token mixture target as deterministic per-doc
    copy counts — the step AFTER textops.domain_mixture's report: an
    under-represented source's documents repeat (n_copies >= 1, an
    epoch-style upsample), an over-represented source's get dropped
    probabilistically (n_copies in {0, 1}), so every source
    contributes ~the same token mass to the training mix.

    quota_ppm(source) = tgt * 1e6 div source_tokens with
    tgt = total_tokens div n_sources (the per-source token target),
    UNCAPPED (domain_mixture's keep_ppm is the capped, downsample-only
    twin). Per document:
        n_copies = quota_ppm div 1e6
                 + (h(doc_id) * 1e6 div M < quota_ppm % 1e6)
    with h the seeded integer MINSTD hash — every quantity is exact
    int64 arithmetic, so the DuckDB twin is bit-identical, and the
    assignment depends only on (doc_id, seed): reruns, resumes, and
    cluster-size changes reproduce the same resampled corpus (the
    property a Bernoulli via rand() does NOT give).

    The ppm product is evaluated as a three-stage base-1000 split
    (``_ppm_div_sql``) so no intermediate exceeds int64: a naive
    ``total_tokens * 1000000`` overflows (ANSI-mode crash in BOTH
    engines) once the corpus passes ~9.2e12 tokens — i.e. well below
    the 100 TB design point. The split form is exact for
    src_tokens up to ~9.2e15 (≈ 37 PB of text in ONE source).

    Scale: one bounded-cardinality groupBy builds the quota table;
    the corpus side is a stateless projection after a broadcast join
    — no shuffle of the fact, no skew surface. Output
    (doc_id, source, n_tokens, n_copies); downstream materializes
    copies lazily (explode(sequence(1, n_copies)) where needed).
    """
    tok = th.tokens_sql("text", "spark")
    toked = docs.select(
        "doc_id", "source", F.expr(f"size({tok})").cast("long").alias("n_tokens")
    )
    per = toked.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    tot = per.agg(
        F.sum("src_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    quota = per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(
            _ppm_div_sql(
                "(total_tokens div n_sources)", "src_tokens", "spark"
            )
        ).alias("quota_ppm"),
    )
    u_ppm = f"(({minstd_h_sql('doc_id', seed)}) * 1000000 div {MINSTD_MOD})"
    return (
        toked.join(F.broadcast(quota), "source")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.expr(
                f"cast(quota_ppm div 1000000 + "
                f"(case when {u_ppm} < quota_ppm % 1000000 then 1 else 0 end) "
                f"as int)"
            ).alias("n_copies"),
        )
    )


def mixture_resample_oracle(
    view: str = "documents", seed: int = RESAMPLE_SEED
) -> str:
    tok = th.tokens_sql("text", "duckdb")
    u_ppm = f"(({minstd_h_sql('doc_id', seed)}) * 1000000 // {MINSTD_MOD})"
    return (
        f"WITH toked AS (SELECT doc_id, source, "
        f"CAST(len({tok}) AS BIGINT) AS n_tokens FROM {view}), "
        "per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) "
        "AS src_tokens FROM toked GROUP BY 1), "
        "tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens, "
        "count(*) AS n_sources FROM per), "
        "q AS (SELECT source, "
        + _ppm_div_sql("(total_tokens // n_sources)", "src_tokens", "duckdb")
        + " AS quota_ppm FROM per CROSS JOIN tot) "
        "SELECT doc_id, toked.source AS source, n_tokens, "
        f"CAST(quota_ppm // 1000000 + (CASE WHEN {u_ppm} < quota_ppm % 1000000 "
        "THEN 1 ELSE 0 END) AS INT) AS n_copies "
        "FROM toked JOIN q ON toked.source = q.source"
    )


# ---------------------------------------------------------------------------
# seeded weighted sampling without replacement

SAMPLE_SEED = 29


def _es_key_sql(id_col: str, weight_sql: str, seed: int) -> str:
    """Efraimidis-Spirakis exponential-race key, seeded + portable:
    key = -ln(u) / w with u = (h + 1) / (M + 1) in (0, 1] from the
    integer MINSTD hash — the k SMALLEST keys are a weight-
    proportional sample without replacement (WRS-ES, Efraimidis &
    Spirakis 2006, via the exponential-clocks equivalence). u never
    hits 0 (no -ln(0) infinity), and the key is rounded to 9 dp so
    the ~1-ulp ln() disagreement between Java Math.log and libm
    cannot flip the cross-engine order (ties broken by doc_id)."""
    h = minstd_h_sql(id_col, seed)
    u = f"((({h}) + 1) / {MINSTD_MOD + 1}.0)"
    return f"round(-ln({u}) / ({weight_sql}), 9)"


def weighted_sample(
    docs: DataFrame,
    k: int = 64,
    weight_sql: str | None = None,
    seed: int = SAMPLE_SEED,
) -> DataFrame:
    """Sample ``k`` documents WITHOUT replacement with probability
    proportional to a weight — the corpus-subsampling step ("take
    10B tokens, quality-weighted") run as one deterministic pass.

    The weight defaults to quality_millis + 1 (the Gopher-rules
    milli-score), so higher-quality documents win the exponential
    race more often, but any positive SQL expression works
    (n_tokens for token-budget sampling, 1 for uniform). Rows with
    weight <= 0 are excluded (zero-probability by definition).

    Determinism: the race key depends only on (doc_id, seed, weight),
    so reruns, resumes, and cluster sizes reproduce the same sample —
    the property rand()-based sampling lacks. Scale: ORDER BY + LIMIT
    plans as TakeOrderedAndProject — each task keeps its local top-k
    and the driver merges |tasks| * k rows, so cost is k-bounded, not
    corpus-bounded; for k beyond driver comfort (~10^6), shard the
    race through quota_sample's two-phase exact top-k instead.

    Output: (doc_id, source, weight, key), the k winners.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from . import textops

    if weight_sql is None:
        weight_sql = f"({textops.quality_score_sql('spark')}) + 1"
    key = _es_key_sql("doc_id", weight_sql, seed)
    return (
        docs.select(
            "doc_id",
            "source",
            F.expr(f"cast({weight_sql} as bigint)").alias("weight"),
            F.expr(key).alias("key"),
        )
        # filter on the RAW weight expression: a custom fractional
        # weight in (0, 1) is a valid positive weight, but its bigint
        # cast floors to 0 and the truncated filter would silently
        # zero its sampling probability
        .where(F.expr(f"({weight_sql}) > 0"))
        .orderBy("key", "doc_id")
        .limit(k)
    )


def weighted_sample_oracle(
    view: str = "documents",
    k: int = 64,
    weight_sql: str | None = None,
    seed: int = SAMPLE_SEED,
) -> str:
    from . import textops

    if weight_sql is None:
        weight_sql = f"({textops.quality_score_sql('duckdb')}) + 1"
    key = _es_key_sql("doc_id", weight_sql, seed)
    return (
        f"SELECT doc_id, source, CAST({weight_sql} AS BIGINT) AS weight, "
        f"{key} AS key FROM {view} "
        f"WHERE ({weight_sql}) > 0 "
        f"ORDER BY key, doc_id LIMIT {k}"
    )
