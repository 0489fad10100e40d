"""Config-JSON CLI drivers — the engine's equivalents of the
reference's four entry points:

    python -m cdr_analysis_tools_hadoop_spark.cli prepare    config.json
    python -m cdr_analysis_tools_hadoop_spark.cli statistics config.json
    python -m cdr_analysis_tools_hadoop_spark.cli od         config.json
    python -m cdr_analysis_tools_hadoop_spark.cli interpolation config.json

The config is the REFERENCE's own schema (sample_configs/config.json:
input_files / input_delimiter / input_file_have_header /
input_file_time_format / check_duplicate / check_invalid_lat_lng /
cdr_data_layer / cdr_cell_tower / frequent_locations_percentage /
od_date / output_report_location / output_graph_location ...) plus
two engine keys: ``data_path`` (directory of the input CSVs) and
``output_data_location`` (warehouse dir for the parquet tables that
replace the reference's Hive tables). Unknown reference keys (Hive
host/port/user, jar paths) are ignored.

Stage outputs land under ``{output_data_location}``:
  consolidate/   day-partitioned canonical fact (pdt partitions)
  towers/        preprocessed tower dimension
  mapping_{adm}/ per-admin zone tables (P5 filter, dense ids)
  home/          rank-1 frequent location per uid (OD prerequisite)

run ``statistics`` after ``prepare``; it writes the reference's CSV
reports + the 7 graphs; ``od`` writes origin_destination.tsv.
"""

from __future__ import annotations

import glob
import shutil
import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import reports
from .operators import faithful_reports as fr
from .operators import frequent_locations as fl
from .operators import interpolation, prepare, trajectory
from .sources import csv_io


def _load_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _session(cfg: dict) -> SparkSession:
    return (
        SparkSession.builder.master(cfg.get("master", "local[*]"))
        .appName(f"cdr-{cfg.get('provider_prefix', 'engine')}")
        .config("spark.sql.shuffle.partitions",
                str(cfg.get("shuffle_partitions", 32)))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .getOrCreate()
    )


def _mapping_to_items(layer: list[dict]) -> list[dict]:
    """Reference cdr_data_layer/cdr_cell_tower items -> projection
    items ({name, expr/custom}); output_no == -1 rows are unmapped."""
    items = []
    for it in layer:
        if it.get("output_no", 0) == -1:
            continue
        if it.get("input_no", 0) == -1 and not it.get("custom"):
            # output-mapped but sourceless (reference IMEI/IMSI shape):
            # leave unmapped so compile_projection fills the faithful
            # '-1' sentinel instead of referencing a missing column
            continue
        items.append(
            {
                "name": it["name"].lower(),
                "expr": it.get("input_name"),
                "custom": it.get("custom") or None,
            }
        )
    return items


def _raw_columns(layer: list[dict]) -> list[str]:
    """Raw CSV column names in input_no order (the reference's
    positional schema, helper.py:154-158)."""
    cols = [it for it in layer if it.get("input_no", -1) != -1]
    return [it["input_name"] for it in sorted(cols, key=lambda x: x["input_no"])]


def _paths(cfg: dict, key: str) -> list[str]:
    base = cfg.get("data_path", ".")
    return [os.path.join(base, f) for f in cfg[key]]


def _out(cfg: dict, *parts: str, create: bool = True) -> str:
    root = cfg.get("output_data_location", "spark_warehouse")
    path = os.path.join(root, *parts)
    if create:
        os.makedirs(
            os.path.dirname(path) if "." in parts[-1] else path, exist_ok=True
        )
    return path


def run_prepare(spark: SparkSession, cfg: dict) -> dict[str, DataFrame]:
    """run_prepare_cdr_and_mapping.py: raw CSVs -> preprocess ->
    admin zone tables -> day-partitioned consolidated fact."""
    tower_layer = cfg["cdr_cell_tower"]
    towers_raw = csv_io.read_csv_all_string(
        spark,
        _paths(cfg, "input_cell_tower_files"),
        _raw_columns(tower_layer),
        header=bool(cfg.get("input_cell_tower_have_header", 1)),
        delimiter=cfg.get("input_cell_tower_delimiter", ","),
    )
    tower_proj = prepare.compile_projection(
        _mapping_to_items(tower_layer), prepare.TOWER_COLUMNS, faithful=True
    )
    towers = prepare.preprocess(
        towers_raw,
        tower_proj,
        check_duplicate=bool(cfg.get("check_duplicate", False)),
        filter_invalid_coords=False,
    )
    towers.write.mode("overwrite").parquet(_out(cfg, "towers"))

    admin_levels = [
        it["name"].lower()
        for it in tower_layer
        if it["name"].lower().startswith("admin") and it.get("output_no") != -1
    ]
    for adm in admin_levels:
        prepare.mapping_admin(
            towers, adm,
            filter_invalid_coords=bool(cfg.get("check_invalid_lat_lng", False)),
        ).write.mode("overwrite").parquet(_out(cfg, f"mapping_{adm}"))

    cdr_layer = cfg["cdr_data_layer"]
    raw = csv_io.read_csv_all_string(
        spark,
        _paths(cfg, "input_files"),
        _raw_columns(cdr_layer),
        header=bool(cfg.get("input_file_have_header", 1)),
        delimiter=cfg.get("input_delimiter", ","),
    )
    proj = prepare.compile_projection(
        _mapping_to_items(cdr_layer),
        prepare.CDR_COLUMNS,
        faithful=True,
        time_format=cfg.get("input_file_time_format") or None,
    )
    pre = prepare.preprocess(
        raw,
        proj,
        check_duplicate=bool(cfg.get("check_duplicate", False)),
        filter_invalid_coords=bool(cfg.get("check_invalid_lat_lng", False)),
    )
    pre = pre.withColumn("call_time", F.to_timestamp("call_time"))
    consolidated = prepare.consolidate(pre, towers)
    prepare.write_consolidated(consolidated, _out(cfg, "consolidate"))
    print(f"prepare: wrote consolidate + towers + {admin_levels}")
    return {"consolidate": consolidated, "towers": towers}


def _read_prepared(spark: SparkSession, cfg: dict):
    # create=False: manufacturing an empty dir on the READ path turns
    # a missing-prepare mistake into an opaque "Unable to infer
    # schema" error instead of this explicit one
    paths = {
        name: _out(cfg, name, create=False)
        for name in ("consolidate", "towers")
    }
    missing = [p for p in paths.values() if not os.path.isdir(p)]
    if missing:
        raise FileNotFoundError(
            f"prepared tables not found ({missing}); run the "
            "'prepare' command first"
        )
    return (
        spark.read.parquet(paths["consolidate"]),
        spark.read.parquet(paths["towers"]),
    )


def run_statistics(spark: SparkSession, cfg: dict) -> list[str]:
    """run_statistics.py: reports + graphs + frequent locations +
    rank-1 home table, with P11 gating from the config mapping."""
    cdr, towers = _read_prepared(spark, cfg)
    rep = cfg.get("output_report_location", "output_reports")
    gra = cfg.get("output_graph_location", "output_graphs")
    os.makedirs(rep, exist_ok=True)
    os.makedirs(gra, exist_ok=True)
    layer = cfg["cdr_data_layer"]
    written: list[str] = []

    def gate(*cols: str) -> bool:
        return prepare.stat_enabled(
            [
                {"name": it["name"], "expr": it.get("input_name"),
                 "custom": it.get("custom") or None,
                 "output_no": it.get("output_no", 0)}
                for it in layer
            ],
            cols,
        )

    from .operators import statistics as st

    if gate("call_time", "uid", "imei", "imsi", "cell_id"):
        p = f"{rep}/css_file_data_stat.csv"
        fr.write_frame_csv(st.data_statistics(cdr, faithful=True), p)
        written.append(p)
    if gate("network_type", "call_type"):
        p = f"{rep}/css_provider_data_stat_daily.csv"
        fr.write_frame_csv(fr.daily_statistics_faithful(cdr), p)
        written.append(p)
        p = f"{rep}/css_provider_data_stat_monthly.csv"
        fr.write_frame_csv(fr.monthly_statistics_faithful(cdr), p)
        written.append(p)
    admin_levels = [
        it["name"].lower()
        for it in cfg["cdr_cell_tower"]
        if it["name"].lower().startswith("admin") and it.get("output_no") != -1
    ]
    for adm in admin_levels:
        p = f"{rep}/zone_based_aggregations_level_{adm.upper()}.csv"
        fr.write_frame_csv(fr.zone_population_admin(cdr, towers, adm), p)
        written.append(p)
    b1, b2 = fr.summary_rows(
        cdr,
        towers,
        has_call_type=gate("network_type", "call_type"),
        has_cell_id=gate("cell_id"),
        admin1=admin_levels[0] if admin_levels else "admin1",
    )
    p = f"{rep}/summary_stats.csv"
    fr.write_summary_csv(p, b1, b2)
    written.append(p)

    written.extend(reports.write_report_graphs(cdr, gra))

    # frequent locations over the tower zone table: the reference's
    # J2 join is STRING equality on the coordinate pair
    # (frequent_locations.sql: a1.latitude = a2.latitude AND
    # a1.longitude = a2.longitude) — joining on cell_id instead (the
    # pre-review code) blows up when a config leaves cell_id at the
    # '-1' sentinel on both sides (every CDR row x every tower row)
    # and deviates from the reference key; the tower side is distinct
    # on exactly the join key, so it cannot multiply rows
    zoned = cdr.join(
        F.broadcast(towers.select("latitude", "longitude").distinct()),
        ["latitude", "longitude"],
    ).withColumn("zone_id", F.concat_ws("_", "latitude", "longitude"))
    freq = fl.frequent_locations(zoned)
    p = f"{rep}/frequent_locations.csv"
    fr.write_frame_csv(freq.orderBy("uid", "trank"), p)
    written.append(p)
    home = fl.user_home(freq)
    home.write.mode("overwrite").parquet(_out(cfg, "home"))
    print(f"statistics: wrote {len(written)} report/graph files")
    return written


def run_od(spark: SparkSession, cfg: dict) -> str:
    """run_origin_destination.py: trajectories -> TripOD edges ->
    OD rollup -> origin_destination.tsv."""
    cdr, towers = _read_prepared(spark, cfg)
    zoned = cdr.join(
        F.broadcast(
            towers.select(
                "cell_id",
                F.col("latitude").alias("__tlat"),
                F.col("longitude").alias("__tlon"),
            ).distinct()
        ),
        "cell_id",
    ).select(
        "*",
        F.concat_ws("_", "__tlat", "__tlon").alias("zone_str"),
        # deterministic window tie-break for same-timestamp events:
        # monotonically_increasing_id would vary with partitioning
        F.xxhash64("uid", "call_time", "cell_id").alias("event_id"),
    )
    # dense ids for sites/zones (the reference's admin zone table ids)
    from pyspark.sql import Window

    zone_ids = (
        zoned.select("zone_str").distinct()
        .withColumn(
            "zone_id", F.row_number().over(Window.orderBy("zone_str")) - 1
        )
    )
    sited = (
        zoned.join(F.broadcast(zone_ids), "zone_str")
        .withColumn("site", F.col("zone_id"))
    )
    # home = rank-1 site over the FULL history (reference
    # insert_la_cdr_uid_home.sql builds home from the unfiltered
    # frequent-locations table); only the trajectory/edge stage is
    # restricted to od_date. Zone ids are likewise global, so a
    # single-day run and a full run agree on the same dense ids.
    home = trajectory.user_home_site(sited)
    od_date = cfg.get("od_date")
    day = sited.filter(F.col("pdt") == od_date) if od_date else sited
    edges = trajectory.od_edges(day, home)
    od = trajectory.od_sum(edges)
    rep = cfg.get("output_report_location", "output_reports")
    os.makedirs(rep, exist_ok=True)
    path = f"{rep}/origin_destination.tsv"
    # cluster-side export (od_to_csv.sql:1-7 INSERT OVERWRITE LOCAL
    # DIRECTORY): a total sort range-partitions the matrix, each task
    # writes its sorted range, and part files concatenate in filename
    # order into the single report file — a streaming file merge, not
    # a driver-side row collect (the OD matrix is zones^2 x days).
    parts_dir = path + ".d"
    csv_io.export_tsv(
        od.orderBy("pdt", "origin_zone", "dest_zone"), parts_dir
    )
    n = 0
    with open(path, "w") as out:
        for part in sorted(glob.glob(os.path.join(parts_dir, "part-*"))):
            with open(part) as src:
                for line in src:
                    out.write(line)
                    n += 1
    # the part files duplicate the (zones^2 x days) matrix — drop them
    shutil.rmtree(parts_dir, ignore_errors=True)
    print(f"od: wrote {n} rows to {path}")
    return path


def run_interpolation(spark: SparkSession, cfg: dict) -> str:
    """run_interpolation.py: segmentation -> 24h padding -> GPS
    export (straight-line routing; POI snap when a POI table exists)."""
    cdr, _ = _read_prepared(spark, cfg)
    sited = cdr.select(
        F.col("uid"),
        "call_time",
        F.xxhash64("uid", "call_time", "cell_id").alias("event_id"),
        F.expr("try_cast(latitude AS double)").alias("lat"),
        F.expr("try_cast(longitude AS double)").alias("lon"),
    ).filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    trips = interpolation.trip_24h_padding(
        interpolation.trip_segments_format(sited)
    )
    gps = interpolation.export_gps_format(trips)
    rep = cfg.get("output_report_location", "output_reports")
    os.makedirs(rep, exist_ok=True)
    path = f"{rep}/interpolation_gps.tsv"
    csv_io.export_tsv(gps, path + ".d")
    # count the written lines instead of gps.count(): a second action
    # on the uncached frame would re-execute the whole
    # segmentation/padding DAG just for this log line
    import glob as _glob

    rows = 0
    for part in _glob.glob(os.path.join(path + ".d", "part-*")):
        with open(part, "rb") as f:
            rows += sum(1 for _ in f)
    print(f"interpolation: wrote {rows} rows under {path}.d")
    return path + ".d"


COMMANDS = {
    "prepare": run_prepare,
    "statistics": run_statistics,
    "od": run_od,
    "interpolation": run_interpolation,
}


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2 or argv[0] not in COMMANDS:
        print(
            "usage: python -m cdr_analysis_tools_hadoop_spark.cli "
            f"{{{'|'.join(COMMANDS)}}} config.json",
            file=sys.stderr,
        )
        return 2
    cfg = _load_config(argv[1])
    spark = _session(cfg)
    COMMANDS[argv[0]](spark, cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
