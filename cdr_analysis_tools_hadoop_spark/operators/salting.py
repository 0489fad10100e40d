"""Skew salting: two-phase aggregation over hot keys.

SURVEY.md §4: AQE's skew-join split handles JOIN skew, but skewed
``groupBy``/``collect_list`` keys (a viral uid, a tower-hotspot H3
cell at 10^12 rows) still funnel one reducer. The reference only
*bounds* the damage with size guards
(insert_la_cdr_all_with_ant_zone_by_uid_od.sql:6 ``size(arr)<=500``,
insert_cdr_by_uid.sql:4 ``HAVING count(*)<=N``); these helpers remove
the funnel:

phase 1  groupBy(key, salt)  — fans a hot key over ``buckets``
         reducers (salt = deterministic hash of a spread column, so
         re-runs are stable);
phase 2  groupBy(key)        — merges the per-salt partials; input is
         |keys| x buckets rows, negligible.

Counts/sums are algebraically exact under salting. collect_list is
merged with flatten + array_sort, preserving the engine's sorted-
trajectory contract (operators/trajectory.py A11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 16


def salt_col(spread_col: str | Column, buckets: int = DEFAULT_BUCKETS) -> Column:
    """Deterministic salt in [0, buckets): hash of a high-cardinality
    spread column (e.g. event_id) — stable across retries, unlike
    rand()-based salting."""
    c = F.col(spread_col) if isinstance(spread_col, str) else spread_col
    return F.pmod(F.xxhash64(c), F.lit(buckets))


def salted_count(
    df: DataFrame,
    keys: list[str],
    spread_col: str,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Exact per-key count via two-phase salted aggregation."""
    phase1 = (
        df.withColumn("__salt", salt_col(spread_col, buckets))
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("__partial").alias("count"))


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Exact per-key count(distinct x): phase 1 dedups (key, x) with
    the salt derived from x itself (same x -> same bucket, so the
    dedup is global), phase 2 counts."""
    phase1 = (
        df.withColumn("__salt", salt_col(distinct_col, buckets))
        .select(*keys, "__salt", distinct_col)
        .distinct()
    )
    return phase1.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(f"distinct_{distinct_col}")
    )


def salted_collect_sorted(
    df: DataFrame,
    keys: list[str],
    struct_cols: list[str],
    spread_col: str,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """A11 trajectory collect under skew: collect per (key, salt),
    then flatten + array_sort on merge. The struct's FIRST column is
    the sort key (array_sort is lexicographic on struct fields), same
    contract as operators/trajectory.collect_trajectories."""
    point = F.struct(*[F.col(c) for c in struct_cols])
    phase1 = (
        df.withColumn("__salt", salt_col(spread_col, buckets))
        .groupBy(*keys, "__salt")
        .agg(F.collect_list(point).alias("__part"))
    )
    return phase1.groupBy(*keys).agg(
        F.array_sort(F.flatten(F.collect_list("__part"))).alias("arr")
    )
