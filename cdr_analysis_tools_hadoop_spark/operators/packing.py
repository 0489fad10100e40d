"""Sequence packing over ``documents``: the pack-and-chop layout step
that turns a curated corpus into fixed-length training sequences.

GPT-style packing: concatenate documents (each followed by one EOS
separator token) in a deterministic order and chop the token stream
into packs of exactly ``budget`` tokens; documents may span pack
boundaries (that is the point — zero padding waste). The operator
emits, per document, the pack coordinates of its tokens:

  (doc_id, bucket, n_tokens, start_pack, start_offset, end_pack)

where ``start_pack = floor(cum_before / budget)``, ``start_offset =
cum_before % budget`` and ``cum_before`` is the total token count of
all earlier documents in the same bucket. A writer task can lay out
pack ``p`` of bucket ``b`` from exactly the rows with ``start_pack <=
p <= end_pack`` — no global state, no driver loop.

Determinism: the layout depends only on (doc_id, bucket count,
budget). Reruns, resumes and different cluster sizes produce the
same packing — the reproducibility contract a training run needs
(same property as sampling.dataset_split).

Scale notes (100 TB): the concatenation order is (bucket, doc_id)
with ``bucket = doc_id mod B``, so the corpus splits into B
independent token streams. The only shuffle is the window's hash
partition on bucket; within a bucket the running sum is one sorted
pass. B is the parallelism knob — at 100 TB set B ≈ 4× cores so each
bucket's sort fits an executor (buckets are uniform by construction:
doc_id mod B has no skew surface). A single global stream (B=1)
would serialize the corpus through one task; per-bucket streams are
what real packers do (each worker packs its own shard).

All output columns are integers — the DuckDB oracle twin
(``sequence_packing_oracle``) is FP-free, so the driver's value-hash
gate compares exactly.

Reference parity: the reference has no packing step (its payloads
are opaque strings, SURVEY.md §1.2); this is an axes-B addition like
operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.functions import texthash as th

DEFAULT_BUDGET = 512
DEFAULT_BUCKETS = 16


def sequence_packing(
    docs: DataFrame,
    budget: int = DEFAULT_BUDGET,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-document pack coordinates under pack-and-chop packing.

    ``n_tokens`` counts non-empty whitespace tokens plus one EOS
    separator, so every document occupies at least one slot and
    consecutive documents never visually merge in the packed stream.
    Empty tokens from consecutive separators are excluded — the same
    word semantics as bpe.word_frequencies/bpe_encode, so packing
    offsets reconcile with BPE token counts (a bare
    ``size(split(...))`` would count 'a  b' as three words).
    """
    if budget < 1 or buckets < 1:
        raise ValueError("budget and buckets must be >= 1")
    from ..plans.partitioning import spread

    tok = th.tokens_sql("text", "spark")
    base = spread(docs).select(
        "doc_id",
        # double-mod canonicalizes negative ids (same idiom as
        # sampling.split_u_sql)
        F.expr(f"((doc_id % {buckets}) + {buckets}) % {buckets}").alias(
            "bucket"
        ),
        F.expr(f"size(filter({tok}, t -> t != '')) + 1")
        .cast("long")
        .alias("n_tokens"),
    )
    win = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = base.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    )
    return c.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.expr(f"cum_before div {budget}").alias("start_pack"),
        F.expr(f"cum_before % {budget}").alias("start_offset"),
        F.expr(f"(cum_before + n_tokens - 1) div {budget}").alias("end_pack"),
    )


def sequence_packing_oracle(
    view: str = "documents",
    budget: int = DEFAULT_BUDGET,
    buckets: int = DEFAULT_BUCKETS,
) -> str:
    tok = th.tokens_sql("text", "duckdb")
    return (
        f"WITH base AS (SELECT doc_id, "
        f"((doc_id % {buckets}) + {buckets}) % {buckets} AS bucket, "
        f"len(list_filter({tok}, t -> t != '')) + 1 AS n_tokens "
        f"FROM {view}), "
        # CAST: DuckDB's sum(BIGINT) is HUGEINT; Spark's is long
        "c AS (SELECT doc_id, bucket, n_tokens, "
        "coalesce(CAST(sum(n_tokens) OVER (PARTITION BY bucket "
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
        "AS BIGINT), 0) AS cum_before FROM base) "
        "SELECT doc_id, bucket, n_tokens, "
        f"cum_before // {budget} AS start_pack, "
        f"cum_before % {budget} AS start_offset, "
        f"(cum_before + n_tokens - 1) // {budget} AS end_pack FROM c"
    )
