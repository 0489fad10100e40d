"""Partitioning helpers shared by the corpus-scan operators.

The similarity / dedup / text operators all start a compute-heavy
per-document stage (tokenize + shingle + hash, cosine scoring, pixel
decode) whose input is often a SMALL parquet table read as one or two
partitions — left alone, the whole stage serializes on one core
(measured 8x slower at sf0.1). Round 1-3 fixed that with an
UNCONDITIONAL repartition(defaultParallelism), which the round-3
review flagged: on a well-partitioned 100 TB input that is a
gratuitous full-corpus exchange bolted onto otherwise minimal plans.

``spread`` makes it conditional: the input's partition count is read
from the physical plan (``df.rdd.getNumPartitions()`` — planning
only, no job) and the exchange is inserted ONLY when the input has
fewer partitions than the session's parallelism. The inspection cost
is one extra physical-planning pass of the upstream plan, which for
these operators is a bare table scan; callers with expensive
lineage should pass ``n_parts`` from their own metadata instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, n_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to one partition per core IF it has fewer —
    a no-op (no exchange in the plan) for any input already at or
    above the session's default parallelism."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if n_parts is None:
        try:
            n_parts = df.rdd.getNumPartitions()
        except Exception:  # exotic plans: keep the old safe behavior
            n_parts = 0
    if n_parts >= par:
        return df
    return df.repartition(par)


def estimate_rows(df: DataFrame) -> int | None:
    """Approximate row count from Catalyst plan statistics — NO job.

    Prefers the optimizer's exact rowCount (present when CBO stats
    were collected); otherwise divides the plan's sizeInBytes
    estimate (file bytes for a parquet scan) by the schema's default
    row width. Order-of-magnitude accuracy, which is all the
    log2(N)-shaped banding planners need; returns None when the plan
    carries no usable statistics so callers can fall back."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        size = int(str(stats.sizeInBytes()))
        width = int(df._jdf.schema().defaultSize())
        if size > 0 and width > 0:
            return max(1, size // width)
    except Exception:
        pass
    return None
