"""Statistics suite: the reference's 14 report/graph computations.

Reference parity map (SURVEY.md §2.4, file refs are the reference's
queries/statistics/*.sql):
- A1  total_records            total_records.sql:1
- A2  total_unique_uids        total_unique_uids.sql:1-2
- A3  data_statistics          data_statistics.sql:1-3
- A4  daily_unique_locations   daily_unique_locations.sql:1-2
- A5  daily_statistics         daily_statistics.sql:1-19 (4-grain UNION)
- A6  monthly_statistics       monthly_statistics.sql:1-22
- A7  daily counts/ratios      total_daily_cdrs.sql, total_daily_uids.sql,
                               daily_average_cdrs.sql
- A8  summary min/max/avg      built by SQL string-wrapping in the
                               reference (Common/cdr_statistics.py:565-572);
                               here a plain .agg over the daily frame
- A9  per-day-then-average     average_unique_cell_ids.sql:1-3
- A10 user-activity histogram  histogram.sql:1-6 (histogram_numeric in
                               Hive; fixed-width buckets here so the
                               DuckDB oracle can mirror exactly — the
                               adaptive Ben-Haim/Tom-Tov bins are not
                               portable across engines)

All inputs: the canonical cdr frame (uid, call_time, call_type,
duration, lat, lon). Every aggregate aliases its output so oracle and
Spark column names line up. Floats are rounded to 6dp at the output
edge (cross-engine hash stability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def total_records(cdr: DataFrame) -> DataFrame:
    return cdr.agg(F.count(F.lit(1)).alias("total_records"))


def total_unique_uids(cdr: DataFrame) -> DataFrame:
    return cdr.agg(F.countDistinct("uid").alias("total_unique_uids"))


def data_statistics(cdr: DataFrame, faithful: bool = False) -> DataFrame:
    """One-pass multi-aggregate (reference data_statistics.sql via
    Common/cdr_statistics.py:35-38).

    The reference injects ``count(distinct IMEI/IMSI)`` fragments when
    those columns are mapped — mirrored here by injecting them when
    the frame carries them (the driver's events adapter does not, so
    the contract output is unchanged). ``faithful=True`` uses the
    reference's exact output column names (unique_id,
    unique_location_name) for golden-file comparison."""
    uid_name = "unique_id" if faithful else "total_uids"
    cols = [
        F.count(F.lit(1)).alias("total_records"),
        F.countDistinct(F.to_date("call_time")).alias("total_days"),
        F.countDistinct("uid").alias(uid_name),
    ]
    if "imei" in cdr.columns:
        cols.append(F.countDistinct("imei").alias("unique_imei"))
    if "imsi" in cdr.columns:
        cols.append(F.countDistinct("imsi").alias("unique_imsi"))
    if faithful and "cell_id" in cdr.columns:
        cols.append(F.countDistinct("cell_id").alias("unique_location_name"))
    cols += [
        F.min(F.to_date("call_time")).alias("start_date"),
        F.max(F.to_date("call_time")).alias("end_date"),
    ]
    return cdr.agg(*cols)


def daily_cdrs(cdr: DataFrame) -> DataFrame:
    return (
        cdr.groupBy(F.to_date("call_time").alias("day"))
        .agg(F.count(F.lit(1)).alias("total_records"))
        .orderBy("day")
    )


def daily_unique_uids(cdr: DataFrame) -> DataFrame:
    return (
        cdr.groupBy(F.to_date("call_time").alias("day"))
        .agg(F.countDistinct("uid").alias("total_uids"))
        .orderBy("day")
    )


def daily_unique_locations(cdr: DataFrame) -> DataFrame:
    """Multi-column distinct (reference daily_unique_locations.sql —
    count(distinct latitude, longitude))."""
    return (
        cdr.groupBy(F.to_date("call_time").alias("day"))
        .agg(F.countDistinct("lat", "lon").alias("unique_locations"))
        .orderBy("day")
    )


def daily_average_cdrs(cdr: DataFrame) -> DataFrame:
    """Records per active user per day (reference
    daily_average_cdrs.sql:1-5)."""
    return (
        cdr.groupBy(F.to_date("call_time").alias("day"))
        .agg(
            F.round(F.count(F.lit(1)) / F.countDistinct("uid"), 6).alias(
                "avg_cdrs_per_uid"
            )
        )
        .orderBy("day")
    )


def daily_statistics(cdr: DataFrame, type_col: str = "call_type") -> DataFrame:
    """4-grain UNION with literal 'ALL' fills.

    The reference glues four GROUP BYs with Hive UNION (= UNION
    DISTINCT, quirk Q2: reference daily_statistics.sql:5,10,15) — the
    grains are disjoint thanks to the 'ALL' fills, but we keep the
    .distinct() for letter-exactness. Here the second grain axis is
    a duration-derived bucket standing in for network_type
    (operators/prepare.py adapter).

    Spark side: GROUPING SETS — ONE scan and one shuffle instead of
    four scans (Spark has no DataFrame-level common-subplan reuse, so
    the literal 4-way union re-scans the fact table four times). The
    'ALL' fills come from grouping() flags; rows are identical to the
    union shape, and the trailing .distinct() keeps Q2's UNION
    DISTINCT letter-exactness (a no-op on disjoint grains).
    """
    base = cdr.select(
        F.to_date("call_time").alias("day"),
        F.col(type_col).alias("call_type"),
        F.col("network_type"),
        "uid",
    )
    d, ct, nt = F.col("day"), F.col("call_type"), F.col("network_type")
    out = (
        base.groupingSets([[d], [d, ct], [d, nt], [d, ct, nt]], d, ct, nt)
        .agg(
            F.count(F.lit(1)).alias("total_records"),
            F.countDistinct("uid").alias("total_uids"),
            F.grouping(ct).alias("__gct"),
            F.grouping(nt).alias("__gnt"),
        )
        .select(
            "day",
            F.when(F.col("__gct") == 1, "ALL").otherwise(ct).alias("call_type"),
            F.when(F.col("__gnt") == 1, "ALL").otherwise(nt).alias("network_type"),
            "total_records",
            "total_uids",
        )
    )
    return out.distinct().orderBy("day", "call_type", "network_type")


def monthly_statistics(cdr: DataFrame) -> DataFrame:
    """Monthly 4-grain variant (reference monthly_statistics.sql);
    same single-scan GROUPING SETS shape as daily_statistics."""
    base = cdr.select(
        F.year("call_time").alias("year"),
        F.month("call_time").alias("month"),
        "call_type",
        "network_type",
        "uid",
    )
    y, m = F.col("year"), F.col("month")
    ct, nt = F.col("call_type"), F.col("network_type")
    out = (
        base.groupingSets([[y, m], [y, m, ct], [y, m, nt], [y, m, ct, nt]], y, m, ct, nt)
        .agg(
            F.count(F.lit(1)).alias("total_records"),
            F.countDistinct("uid").alias("total_uids"),
            F.grouping(ct).alias("__gct"),
            F.grouping(nt).alias("__gnt"),
        )
        .select(
            "year",
            "month",
            F.when(F.col("__gct") == 1, "ALL").otherwise(ct).alias("call_type"),
            F.when(F.col("__gnt") == 1, "ALL").otherwise(nt).alias("network_type"),
            "total_records",
            "total_uids",
        )
    )
    return out.distinct().orderBy("year", "month", "call_type", "network_type")


def summary_stats(cdr: DataFrame) -> DataFrame:
    """min/max/avg of the daily totals — aggregate-of-aggregate reusing
    the daily frame (the reference re-queries by wrapping SQL text,
    Common/cdr_statistics.py:565-572)."""
    daily = daily_cdrs(cdr)
    return daily.agg(
        F.min("total_records").alias("min_daily"),
        F.max("total_records").alias("max_daily"),
        F.round(F.avg("total_records"), 6).alias("avg_daily"),
    )


def average_daily_by_type(cdr: DataFrame) -> DataFrame:
    """Per-type average of per-day counts (reference
    average_daily_voice.sql / average_daily_sms.sql pattern)."""
    per_day = cdr.groupBy(
        F.col("call_type"), F.to_date("call_time").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_day.groupBy("call_type")
        .agg(F.round(F.avg("cnt"), 6).alias("avg_daily_records"))
        .orderBy("call_type")
    )


def _active_days(cdr: DataFrame) -> DataFrame:
    """days-active per uid (reference histogram.sql inner query —
    its group by (uid, year, month, day) then count(*) per uid is
    exactly count(distinct date) per uid)."""
    return cdr.groupBy("uid").agg(
        F.countDistinct(F.to_date("call_time")).alias("active_days")
    )


def user_activity_histogram_adaptive(
    cdr: DataFrame, num_buckets: int = 10
) -> DataFrame:
    """A10 parity form: Spark's built-in ``histogram_numeric`` — the
    same Ben-Haim/Tom-Tov adaptive-bin sketch Hive runs in the
    reference (queries/statistics/graphs/date_histogram/histogram.sql),
    exploded to (bin_center, num_users) rows like the reference's
    ``explode(histogram_numeric(active_days, 10))``.

    Bin CENTERS are FP-merge-order dependent (the sketch is an
    unordered aggregate), so this form has no cross-engine value-hash
    oracle; tests/test_operators.py pins it exactly on fixtures where
    distinct values <= num_buckets (no merging -> deterministic) and
    checks the order-independent invariants (bin count, total mass,
    weighted mean) beyond that. user_activity_histogram below is the
    fixed-width, bit-reproducible companion the driver hash-checks."""
    active = _active_days(cdr)
    return (
        active.select(
            # cast: histogram_numeric propagates the INPUT type to the
            # bin centers (a long input truncates every centroid)
            F.explode(
                F.expr(
                    f"histogram_numeric(cast(active_days as double), {num_buckets})"
                )
            ).alias("bin")
        )
        .select(
            F.col("bin.x").cast("double").alias("bin_center"),
            F.col("bin.y").cast("double").alias("num_users"),
        )
        .orderBy("bin_center")
    )


def user_activity_histogram(cdr: DataFrame, num_buckets: int = 10) -> DataFrame:
    """Histogram of days-active per user — fixed-width buckets over a
    pinned range: the bit-reproducible form both engines can mirror
    (the adaptive twin above is the reference's exact algorithm)."""
    active = _active_days(cdr)
    lo, hi = 1, 32  # days-active bounded by a month window; fixed bounds keep bucketing portable
    width = (hi - lo) / num_buckets
    bucket = F.least(
        F.lit(num_buckets - 1),
        F.floor((F.col("active_days") - F.lit(lo)) / F.lit(width)).cast("int"),
    ).alias("bucket")
    return (
        active.groupBy(bucket)
        .agg(F.count(F.lit(1)).alias("num_users"))
        .orderBy("bucket")
    )


def daily_cdrs_by_call_type(cdr: DataFrame) -> DataFrame:
    """2-grain daily stat: (day) and (day, call_type), each with
    multi-distinct aggregates, glued by Hive UNION in the reference
    (queries/statistics/daily_cdrs_by_call_type.sql — note its
    count(DISTINCT to_date(call_time)) is always 1 per day group;
    reproduced faithfully). Single-scan GROUPING SETS shape; the
    engine's cell analogue of `cell_id` is the res-10 grid cell."""
    from ..functions import geo

    base = cdr.select(
        F.to_date("call_time").alias("date"),
        "call_type",
        "uid",
        F.expr(geo.cell_id_sql("lat", "lon", 10)).alias("cell"),
    )
    d, ct = F.col("date"), F.col("call_type")
    return (
        base.groupingSets([[d], [d, ct]], d, ct)
        .agg(
            F.count(F.lit(1)).alias("total_records"),
            F.countDistinct("date").alias("total_days"),
            F.countDistinct("uid").alias("unique_id"),
            F.countDistinct("cell").alias("unique_location_name"),
            F.grouping(ct).alias("__gct"),
        )
        .select(
            "date",
            F.when(F.col("__gct") == 1, "ALL").otherwise(ct).alias("call_type"),
            F.lit("ALL").alias("network_type"),
            "total_records",
            "total_days",
            "unique_id",
            "unique_location_name",
        )
        .distinct()
        .orderBy(F.asc("call_type"), F.desc("network_type"), "date")
    )


def total_unique_locations(cdr: DataFrame) -> DataFrame:
    """Reference graphs/daily_unique_locations/total_unique_locations.sql."""
    return cdr.agg(
        F.countDistinct("lat", "lon").alias("count_unique_locations")
    )


def total_days(cdr: DataFrame) -> DataFrame:
    """Reference reports/summary/total_days.sql."""
    days = cdr.select(F.to_date("call_time").alias("dates")).distinct()
    return days.agg(
        F.count(F.lit(1)).alias("total_days"),
        F.min("dates").alias("start_date"),
        F.max("dates").alias("end_date"),
    )


def daily_average_unique_locations(cdr: DataFrame) -> DataFrame:
    """Reference graphs/daily_average_unique_locations.sql: per-day
    unique locations / unique cells per active user (cell analogue:
    res-10 grid cell)."""
    from ..functions import geo

    per = cdr.groupBy(F.to_date("call_time").alias("date")).agg(
        F.countDistinct("lat", "lon").alias("ul"),
        F.countDistinct("uid").alias("uu"),
        F.countDistinct(F.expr(geo.cell_id_sql("lat", "lon", 10))).alias("uc"),
    )
    return per.select(
        "date",
        F.round(F.col("ul") / F.col("uu"), 6).alias("daily_avg_locations"),
        F.round(F.col("uc") / F.col("uu"), 6).alias("daily_avg_cell_ids"),
    ).orderBy("date")


def average_daily_admin_level(zoned: DataFrame, towers: DataFrame, level: str = "admin1") -> DataFrame:
    """Reference reports/summary/average_daily_admin1.sql:
    sum over days of count(distinct admin) divided by {total_days}.

    The denominator is the day count of the WHOLE event table (the
    reference passes {total_days} in from total_days.sql), not the
    count of days that survive the admin join — if every event of some
    day failed to map to a zone, avg() over joined days would silently
    use the smaller denominator. Both aggregates are single-row, so
    the crossJoin is a trivial broadcast."""
    j = zoned.join(F.broadcast(towers.select("zone_id", level)), "zone_id")
    per_sum = (
        j.groupBy(F.to_date("call_time").alias("day"))
        .agg(F.countDistinct(level).alias("c"))
        .agg(F.sum("c").alias("s"))
    )
    days = zoned.agg(
        F.countDistinct(F.to_date("call_time")).alias("nd")
    )
    return per_sum.crossJoin(days).select(
        F.round(F.col("s") / F.col("nd"), 6).alias(f"average_{level}_per_day")
    )
