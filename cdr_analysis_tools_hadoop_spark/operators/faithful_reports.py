"""Reference-faithful report frames + CSV writers — the outputs of
``run_statistics.py`` with the reference's exact filenames, column
names, row formats and quirks, driven from the engine operators.

Reference parity (Common/cdr_statistics.py):
- css_file_data_stat.csv            :19-56  (data_statistics + imei/imsi)
- css_provider_data_stat_daily.csv  :58-141 (4-grain daily, Hive UNION)
- css_provider_data_stat_monthly.csv:166-216 (+ quirk Q8 month window)
- zone_based_aggregations_level_{A}.csv :218-287
- summary_stats.csv                 :333-533 (two blocks, date-range
  string with month names, round-3 statistics)
- frequent_locations ranking + rank1 home (:>700, W1-W5 chain)

Every frame reuses the oracle-checked operator formulations
(GROUPING SETS single scan instead of the reference's 4-way UNION —
same rows, quirk Q2 honored by distinct()); the CSV writers reproduce
csv.QUOTE_NONNUMERIC formatting byte-for-byte
(tests/test_reference_goldens.py + tests/test_cli.py).
"""

from __future__ import annotations

import csv

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MONTHS = {1: "January", 2: "February", 3: "March", 4: "April", 5: "May",
          6: "June", 7: "July", 8: "August", 9: "September", 10: "October",
          11: "November", 12: "December"}

_GRAIN_AGGS = [
    ("total_records", lambda: F.count(F.lit(1))),
    ("total_days", lambda: F.countDistinct(F.to_date("call_time"))),
    ("unique_id", lambda: F.countDistinct("uid")),
    ("unique_imei", lambda: F.countDistinct("imei")),
    ("unique_imsi", lambda: F.countDistinct("imsi")),
    ("unique_location_name", lambda: F.countDistinct("cell_id")),
]


def _four_grains(cdr: DataFrame, time_cols: list) -> DataFrame:
    """4-grain GROUPING SETS (time..., call_type, network_type) with
    'ALL' fills — ONE scan for the reference's 4 UNIONed group-bys."""
    ct, nt = F.col("call_type"), F.col("network_type")
    base_cols = time_cols + [ct, nt]
    out = (
        cdr.groupingSets(
            [time_cols, time_cols + [ct], time_cols + [nt], time_cols + [ct, nt]],
            *base_cols,
        )
        .agg(
            *[agg().alias(name) for name, agg in _GRAIN_AGGS],
            F.grouping(ct).alias("__gct"),
            F.grouping(nt).alias("__gnt"),
        )
        .select(
            *[c for c in time_cols],
            F.when(F.col("__gct") == 1, "ALL").otherwise(ct).alias("call_type"),
            F.when(F.col("__gnt") == 1, "ALL").otherwise(nt).alias("network_type"),
            *[name for name, _ in _GRAIN_AGGS],
        )
    )
    return out.distinct()  # quirk Q2: Hive UNION dedups


def daily_statistics_faithful(cdr: DataFrame) -> DataFrame:
    """css_provider_data_stat_daily.csv rows (reference
    daily_statistics.sql 4-grain with imei/imsi fragments)."""
    day = F.to_date("call_time").cast("string").alias("date")
    base = cdr.withColumn("date", day)
    return _four_grains(base, [F.col("date")]).orderBy(
        "date", "call_type", "network_type"
    )


def monthly_statistics_faithful(cdr: DataFrame) -> DataFrame:
    """css_provider_data_stat_monthly.csv rows, including quirk Q8:
    the month window is month(pdt) BETWEEN start_month AND end_month
    with endpoints from the data's min/max DATES — a range
    2016-05-01..2020-05-04 keeps ONLY May of every year."""
    rng = cdr.agg(
        F.min(F.to_date("call_time")).alias("lo"),
        F.max(F.to_date("call_time")).alias("hi"),
    ).collect()[0]
    if rng.lo is None:
        # empty frame or an input_file_time_format that NULLs every
        # call_time: raise the explanation summary_rows gives for the
        # same state instead of AttributeError on None.year
        raise ValueError(
            "monthly_statistics_faithful: no parseable call_time values "
            "— check input_file_time_format / the consolidated table"
        )
    windowed = cdr.filter(
        F.year("call_time").between(rng.lo.year, rng.hi.year)
        & F.month("call_time").between(rng.lo.month, rng.hi.month)
    )
    base = windowed.withColumn("year", F.year("call_time")).withColumn(
        "month", F.month("call_time")
    )
    return _four_grains(base, [F.col("year"), F.col("month")]).orderBy(
        "year", "month", "call_type", "network_type"
    )


def zone_population_admin(
    cdr: DataFrame, towers: DataFrame, level: str = "admin1"
) -> DataFrame:
    """zone_based_aggregations_level_{LEVEL}.csv (reference
    zone_population.sql J3 join-aggregate)."""
    dim = towers.select("cell_id", level).distinct()
    return (
        cdr.join(F.broadcast(dim), "cell_id")
        .groupBy(level)
        .agg(
            F.count(F.lit(1)).alias("count_activities"),
            F.countDistinct("uid").alias("count_unique_ids"),
        )
        .orderBy(level)
    )


def _date_range_label(total_days: int, start: str, end: str) -> str:
    """The reference's month-name date-range suffix
    (cdr_statistics.py:372-419), e.g. '7 (1 May 2016-4 May 2020)'."""
    sy, sm, sd = (int(x) for x in start.split("-"))
    ey, em, ed = (int(x) for x in end.split("-"))
    if total_days == 0:
        return str(total_days)
    if total_days == 1:
        return f"{total_days} ({sd} {MONTHS[sm]} {sy})"
    if sy == ey:
        if sm == em:
            return f"{total_days} ({sd}-{ed} {MONTHS[sm]} {sy})"
        return f"{total_days} ({sd} {MONTHS[sm]}-{ed} {MONTHS[em]} {sy})"
    return f"{total_days} ({sd} {MONTHS[sm]} {sy}-{ed} {MONTHS[em]} {ey})"


def summary_rows(
    cdr: DataFrame,
    towers: DataFrame | None = None,
    has_call_type: bool = True,
    has_cell_id: bool = True,
    admin1: str = "admin1",
) -> tuple[list, list]:
    """The two summary_stats.csv blocks (('All Data','Value') rows and
    ('Statistics',) rows) with the reference's round-3 values and
    P11-style gating flags."""
    agg = cdr.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.countDistinct("uid").alias("total_uids"),
        F.countDistinct(F.to_date("call_time")).alias("total_days"),
        F.min(F.to_date("call_time")).cast("string").alias("start_date"),
        F.max(F.to_date("call_time")).cast("string").alias("end_date"),
    ).collect()[0]
    total_days = agg.total_days
    if not total_days:
        # empty frame or no parseable call_time (e.g. a wrong
        # input_file_time_format): fail with a clear message instead
        # of a ZeroDivisionError in the per-day ratios below
        raise ValueError(
            "summary_rows: CDR frame has no parseable call_time days "
            "(empty input or wrong input_file_time_format?)"
        )
    block1 = [
        ("total_records", agg.total_records),
        ("total_uids", agg.total_uids),
        ("total_days",
         _date_range_label(total_days, agg.start_date, agg.end_date)),
    ]
    block2 = [
        ("average_usage_per_day", round(float(agg.total_records / total_days), 3)),
    ]
    if has_call_type:
        vs = cdr.agg(
            F.sum((F.col("call_type") == "VOICE").cast("long")).alias("v"),
            F.sum((F.col("call_type") == "SMS").cast("long")).alias("s"),
        ).collect()[0]
        block2.append(("average_daily_voice", round(vs.v / total_days, 3)))
        block2.append(("average_daily_sms", round(vs.s / total_days, 3)))
    if has_cell_id:
        cells = (
            cdr.groupBy(F.to_date("call_time"))
            .agg(F.countDistinct("cell_id").alias("c"))
            .agg(F.sum("c").alias("s"))
            .collect()[0]
        )
        block2.append(
            ("average_daily_unique_cell_id", round(cells.s / total_days, 3))
        )
        if towers is not None and admin1 in towers.columns:
            adm = (
                cdr.join(
                    F.broadcast(towers.select("cell_id", admin1).distinct()),
                    "cell_id",
                )
                .groupBy(F.to_date("call_time"))
                .agg(F.countDistinct(admin1).alias("c"))
                .agg(F.sum("c").alias("s"))
                .collect()[0]
            )
            block2.append(
                (f"average_{admin1}_per_day", round(adm.s / total_days, 3))
            )
    return block1, block2


def write_summary_csv(path: str, block1: list, block2: list) -> None:
    """summary_stats.csv's exact two-block layout incl. the quirky
    writerow('\\n') separator (cdr_statistics.py:523-530)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_NONNUMERIC)
        w.writerow(("All Data", "Value"))
        for row in block1:
            w.writerow(row)
        w.writerow("\n")
        w.writerow(("Statistics",))
        for row in block2:
            w.writerow(row)


def write_frame_csv(df: DataFrame, path: str, max_rows: int = 1_000_000) -> int:
    """QUOTE_NONNUMERIC CSV of a small report frame (the reference's
    cursor-fetch + csv.writer); returns row count. Numeric columns
    stay numeric (unquoted), everything else is quoted.

    Guarded like csv_io.report_csv: a frame above ``max_rows`` (e.g.
    per-(uid, zone) frequent locations over a full-scale corpus) is
    refused instead of OOMing the driver — use csv_io.export_tsv for
    distributed export and merge files downstream."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_frame_csv is for small report frames (> {max_rows} "
            "rows collected); use csv_io.export_tsv for distributed export"
        )
    with open(path, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_NONNUMERIC)
        w.writerow(df.columns)
        for r in rows:
            w.writerow([v if isinstance(v, (int, float)) else str(v) for v in r])
    return len(rows)
