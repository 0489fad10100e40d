"""Prepare pipeline: config-driven projection, preprocess, consolidate.

Reference parity (SURVEY.md §2.2, §3.1):
- P1  config-driven projection compiler (reference Common/helper.py:144-208):
      JSON column mapping -> SELECT list with `custom` expressions and
      `-1` fills for unmapped mandatory columns.
- P2  time normalization (helper.py:163-178). The reference emits
      'yyyy-MM-dd hh:mm:ss' — LOWERCASE hh, a 12-hour-clock bug (quirk
      Q1). `faithful=True` reproduces it; default strict mode uses HH.
- P3  optional dedup (queries/cdr_and_mapping/insert_preprocess_cdr.sql:1).
- P4  invalid-coordinate filter (Common/hive_create_tables.py:157-160).
- J1  CDR x tower enrich join on cell_id with the reference's
      data-dependent plan switch: join only when the raw feed lacks
      coordinates (hive_create_tables.py:271-289).
- S5  day-partitioned consolidate sink
      (queries/cdr_and_mapping/insert_consolidate_cdr.sql:1-3).

The adapter `events_as_cdr` maps the driver's `events` star-schema
table onto the canonical CDR shape with deterministic anchor
coordinates (SURVEY.md §7.0 graft table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo

# Canonical mandatory columns (reference Common/helper.py:9-12).
CDR_COLUMNS = (
    "uid", "imei", "imsi", "call_time", "duration", "call_type",
    "network_type", "cell_id", "latitude", "longitude",
)
TOWER_COLUMNS = ("cell_id", "latitude", "longitude", "admin0", "admin1",
                 "admin2", "admin3", "admin4", "admin5")


def compile_projection(
    mapping: list[dict],
    mandatory: tuple[str, ...],
    faithful: bool = False,
    time_format: str | None = None,
) -> list:
    """Compile a reference-style JSON column mapping into Columns.

    Each mapping item: {"name": canonical, "expr": source SQL expr or
    column name, optional "custom": raw SQL}. Unmapped mandatory
    columns are filled with NULL (strict) or literal '-1' (faithful —
    the reference's sentinel, Common/helper.py:188-200).
    """
    mapped = {}
    for item in mapping:
        name = item["name"].lower()
        expr = item.get("custom") or item.get("expr") or name
        col = F.expr(expr)
        if name == "call_time" and time_format:
            fmt_out = "yyyy-MM-dd hh:mm:ss" if faithful else "yyyy-MM-dd HH:mm:ss"
            col = F.date_format(F.to_timestamp(col, time_format), fmt_out)
        mapped[name] = col.alias(name)
    out = []
    for name in mandatory:
        if name in mapped:
            out.append(mapped[name])
        elif faithful:
            out.append(F.lit("-1").alias(name))
        else:
            out.append(F.lit(None).cast("string").alias(name))
    return out


def stat_enabled(mapping: list[dict], required: tuple[str, ...]) -> bool:
    """P11 mapping-completeness gate (reference
    Common/cdr_statistics.py:21-30,70-75): a statistic is DISABLED
    when any required canonical column is unmapped.

    ``output_no`` is the reference's authority: -1 disables, any
    other value enables — even with no input column (the projection
    then fills the literal '-1' sentinel, which the reference happily
    counts, e.g. unique_imei=1 in css_file_data_stat.csv). Items
    without an ``output_no`` (engine-style mappings) count as mapped
    when they carry an ``expr`` or ``custom``. A required column
    absent from the mapping entirely is unmapped."""
    by_name = {item["name"].lower(): item for item in mapping}
    for name in required:
        item = by_name.get(name.lower())
        if item is None:
            return False
        if "output_no" in item:
            if item["output_no"] == -1:
                return False
        elif not (item.get("custom") or item.get("expr")):
            return False
    return True


def valid_coords_filter(
    df: DataFrame, lat_col: str = "latitude", lon_col: str = "longitude"
) -> DataFrame:
    """P4: drop rows whose coordinates are unparseable or (0, 0).

    try_cast: the canonical layer is all-string (reference SURVEY.md
    §1.2); Hive compares via implicit double cast, ANSI Spark needs
    it explicit (unparseable -> NULL -> dropped). ONE definition of
    the validity rule, shared by preprocess and mapping_admin."""
    lat = F.expr(f"try_cast({lat_col} AS double)")
    lon = F.expr(f"try_cast({lon_col} AS double)")
    return df.filter(
        ((lat != 0) | (lon != 0)) & lat.isNotNull() & lon.isNotNull()
    )


def mapping_admin(
    towers: DataFrame, admin: str, filter_invalid_coords: bool = False
) -> DataFrame:
    """Per-admin-level zone table (reference insert_mapping_admin.sql):
    distinct (admin, latitude, longitude) with dense 0-based zone ids.

    - P5 blank-admin filter: ``translate({admin},'  ',' ') != ''``
      (insert_mapping_admin.sql:3) — Spark's translate has identical
      positional-mapping semantics, so the predicate is verbatim.
    - P4 optional coordinate filter (the {check_lat_lng} slot).
    - W4/Q3: the reference's ``row_number() OVER ()`` is
      engine-nondeterministic; ids here are pinned to
      ORDER BY (admin, latitude, longitude) — documented deviation.
      The single-partition window is fine: the zone dimension is
      broadcast-sized by definition (it feeds broadcast joins).
    """
    from pyspark.sql import Window

    filtered = towers.filter(F.expr(f"translate({admin}, '  ', ' ') != ''"))
    if filter_invalid_coords:
        filtered = valid_coords_filter(filtered)
    distinct = filtered.select(admin, "latitude", "longitude").distinct()
    w = Window.orderBy(admin, "latitude", "longitude")
    return distinct.select(
        (F.row_number().over(w) - 1).alias("rowidx"),
        admin,
        "latitude",
        "longitude",
    )


def preprocess(
    df: DataFrame,
    projection: list,
    check_duplicate: bool = False,
    filter_invalid_coords: bool = False,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """P1 + P3 + P4 over a raw scan."""
    out = df.select(projection)
    if check_duplicate:
        out = out.distinct()
    if filter_invalid_coords:
        out = valid_coords_filter(out, lat_col, lon_col)
    return out


def consolidate(cdr: DataFrame, towers: DataFrame | None = None) -> DataFrame:
    """J1 + S5 logical plan: enrich with tower coords when the feed has
    none, add the day partition column `pdt`.

    The reference decides join-vs-no-join by running
    `select max(latitude)` and comparing to the -1 sentinel
    (hive_create_tables.py:271-289); here the same adaptive choice is
    one cheap aggregate on the (pruned) latitude column.
    """
    needs_join = False
    if towers is not None:
        mx = cdr.agg(F.max(F.col("latitude").cast("double"))).first()[0]
        needs_join = mx is None or mx == -1
    if needs_join:
        cdr = cdr.drop("latitude", "longitude").join(
            F.broadcast(towers.select("cell_id", "latitude", "longitude")),
            "cell_id",
            "inner",
        )
    return cdr.withColumn("pdt", F.to_date("call_time"))


def write_consolidated(df: DataFrame, path: str) -> None:
    """Day-partitioned parquet sink (dynamic overwrite = reference's
    INSERT OVERWRITE day-partition incrementality)."""
    df.write.partitionBy("pdt").mode("overwrite").parquet(path)


# ---------------------------------------------------------------------------
# Graft adapter: events -> canonical CDR (SURVEY.md §7.0)

# network_type stand-in: a deterministic duration bucket (the events
# table has no network column; the bucket rule is shared verbatim with
# the oracle).
NETWORK_TYPE_SQL = (
    "(CASE WHEN value < 5 THEN '2G' WHEN value < 10 THEN '3G' "
    "WHEN value < 15 THEN '4G' ELSE '5G' END)"
)


# Shared DuckDB CTE — the oracle's view of the same adapter. Column
# expressions are literally identical to the Spark ones below.
def cdr_oracle_cte() -> str:
    return (
        "cdr AS (SELECT event_id, user_id AS uid, ts AS call_time, "
        "event_type AS call_type, value AS duration, "
        f"{NETWORK_TYPE_SQL} AS network_type, "
        f"{geo.anchor_lat_sql('event_id')} AS lat, "
        f"{geo.anchor_lon_sql('event_id')} AS lon "
        "FROM events)"
    )


# Faithful-dwell anchor: location derives from (user, 6-hour block)
# instead of event_id, so a user sits at ONE point for each quarter of
# the day. Consecutive events inside a block are genuine 0 m dwells at
# the reference's faithful 300 m stay radius (TripSegmentationCDR
# DIST_MAX_M — the event-id-anchored fixture always jumps > 300 m and
# yields zero stays at the default).
_DWELL_LOC_SQL = "(user_id * 4 + CAST(floor(hour(ts) / 6) AS BIGINT))"


def dwell_cdr_oracle_cte() -> str:
    """DuckDB twin of :func:`events_as_dwell_cdr` (same snippet)."""
    return (
        "cdr AS (SELECT event_id, user_id AS uid, ts AS call_time, "
        f"{geo.anchor_lat_sql(_DWELL_LOC_SQL)} AS lat, "
        f"{geo.anchor_lon_sql(_DWELL_LOC_SQL)} AS lon "
        "FROM events)"
    )


def events_as_dwell_cdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `events` table with faithful-dwell anchors (see
    ``_DWELL_LOC_SQL``): exercises the interpolation chain's stay
    detection at the reference's default 300 m radius."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return events.select(
        "event_id",
        F.col("user_id").alias("uid"),
        F.col("ts").alias("call_time"),
        F.expr(geo.anchor_lat_sql(_DWELL_LOC_SQL)).alias("lat"),
        F.expr(geo.anchor_lon_sql(_DWELL_LOC_SQL)).alias("lon"),
    )


def events_as_cdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `events` table as a canonical CDR fact with deterministic
    anchor coordinates derived from event_id (phash-role column)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return events.select(
        "event_id",
        F.col("user_id").alias("uid"),
        F.col("ts").alias("call_time"),
        F.col("event_type").alias("call_type"),
        F.col("value").alias("duration"),
        F.expr(NETWORK_TYPE_SQL).alias("network_type"),
        F.expr(geo.anchor_lat_sql("event_id")).alias("lat"),
        F.expr(geo.anchor_lon_sql("event_id")).alias("lon"),
    )
