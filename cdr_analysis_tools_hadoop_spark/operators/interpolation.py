"""Interpolation chain: stay-points, POI reallocation, route
interpolation, faithful trip formatting, 24-hour padding.

Reference parity (SURVEY.md §2.9, run_interpolation.py chain):

- ``TripSegmentationCDR`` (lib/cdrmobilitylibge.jar, invoked
  insert_trip_format.sql:2): stay/move segmentation with bytecode
  constants TIME_MIN = 15.0 minutes and DISTANCE_MAX = 300.0 m —
  kept here as STAY_MIN_S / DIST_MAX_M.
- ``f_reallocation`` (TurkcellReallocationUDF, invoked
  insert_poi_relocation.sql:1-3): relocate STAY points to the nearest
  POI within REALLOCATE_RADIUS = 300.0 m.
- ``f_routing`` (TurkcellRoutingUDF, invoked
  insert_route_interpolation.sql:2): interpolate MOVE legs every
  900 s; transport mode drawn with p_walk = 1 - 1/(1+exp(5 - km)).
  The reference draws with an UNSEEDED java.util.Random (SURVEY.md
  Q4 — its output is irreproducible); this engine replaces the draw
  with a hash-seeded uniform so results are deterministic, and
  replaces OSM shortest-path routing with straight-line interpolation
  (documented deviation; the road network sideload is absent).
- ``f_organizearray`` (TurkcellOrganizeTripUDF, invoked
  insert_trip_24_hr_padding.sql:2): pad each day to
  00:00:00-23:59:59 with filler STAYs.
- P8 array-size guards: max 50 interpolation steps per leg
  (sample_configs/config.json:38 ``max_size_interpolation``).

Segmentation / reallocation / routing are pure window + explode
algebra (SQL-expressible, DuckDB-oracle-checked bit-for-bit); the
reference's string-encoded trip format ("i|time|lat|lon;...",
TripSegmentationCDR bytecode) is reproduced by a vectorized
applyInPandas formatter (rows-only check — the nested string codec
is not reasonably SQL-expressible).

Scale notes: every operator partitions by (uid, pdt) — the natural
shard key; windows and applyInPandas both shuffle once on that key.
The MAX_TRAJECTORY guard (reference P8) bounds per-key state, so no
skew salting is needed beyond it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions import geo, texthash as th

STAY_MIN_S = 900           # TIME_MIN = 15 min (TripSegmentationCDR)
DIST_MAX_M = 300.0         # DISTANCE_MAX = 300 m (TripSegmentationCDR)
REALLOC_RADIUS_M = 300.0   # TurkcellReallocationUDF bytecode
STEP_S = 900               # routing time-step (TurkcellRoutingUDF)
MAX_STEPS = 50             # max_size_interpolation (config.json:38)

# squared planar threshold in degrees² for DIST_MAX_M / REALLOC radius
_DEG_PER_M = 1.0 / 111_320.0
D2_300M = (DIST_MAX_M * _DEG_PER_M) ** 2


def _d2_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return geo.planar_d2_sql(lat1, lon1, lat2, lon2)


# ---------------------------------------------------------------------------
# 1. stay-point detection (TripSegmentationCDR stay rule)


def stay_points(sited: DataFrame) -> DataFrame:
    """Segment each (uid, day) trajectory at >300 m jumps; a segment
    is a STAY when it spans >= 15 minutes.

    Output: uid, pdt, seg_id, start/end epoch seconds, n_points,
    first-point lat/lon (deterministic representative — avg() would
    be FP-order-dependent), is_stay flag.
    """
    w = Window.partitionBy("uid", "pdt").orderBy("call_time", "event_id")
    d2 = _d2_sql("prev_lat", "prev_lon", "lat", "lon")
    df = (
        sited.select(
            "uid",
            F.to_date("call_time").alias("pdt"),
            "call_time",
            "event_id",
            "lat",
            "lon",
        )
        .withColumn("prev_lat", F.lag("lat").over(w))
        .withColumn("prev_lon", F.lag("lon").over(w))
    )
    w2 = Window.partitionBy("uid", "pdt").orderBy("call_time", "event_id")
    df = df.withColumn(
        "brk",
        F.when(
            F.col("prev_lat").isNull()
            | (F.expr(d2) > F.lit(D2_300M)),
            1,
        ).otherwise(0),
    ).withColumn("seg_id", F.sum("brk").over(w2))
    return (
        df.groupBy("uid", "pdt", "seg_id")
        .agg(
            F.min(F.unix_timestamp("call_time")).alias("start_s"),
            F.max(F.unix_timestamp("call_time")).alias("end_s"),
            F.count(F.lit(1)).alias("n_points"),
            F.min(F.struct("call_time", "event_id", "lat", "lon")).alias("__first"),
        )
        .select(
            "uid",
            "pdt",
            "seg_id",
            "start_s",
            "end_s",
            "n_points",
            F.col("__first.lat").alias("lat"),
            F.col("__first.lon").alias("lon"),
            (F.col("end_s") - F.col("start_s") >= STAY_MIN_S).alias("is_stay"),
        )
    )


def stay_points_oracle(sited_cte: str) -> str:
    """DuckDB twin; ``sited_cte`` must define view ``sited`` with
    uid, call_time, event_id, lat, lon."""
    d2 = _d2_sql("prev_lat", "prev_lon", "lat", "lon")
    return (
        f"{sited_cte}, pts AS (SELECT uid, CAST(call_time AS DATE) AS pdt, "
        "call_time, event_id, lat, lon, "
        "lag(lat) OVER w AS prev_lat, lag(lon) OVER w AS prev_lon FROM sited "
        "WINDOW w AS (PARTITION BY uid, CAST(call_time AS DATE) "
        "ORDER BY call_time, event_id)), "
        "segd AS (SELECT pts.*, sum(case when prev_lat IS NULL OR "
        f"{d2} > {geo.dlit(D2_300M)} then 1 else 0 end) OVER ("
        "PARTITION BY uid, pdt ORDER BY call_time, event_id) AS seg_id FROM pts), "
        "agg AS (SELECT uid, pdt, seg_id, "
        "min(CAST(floor(epoch(call_time)) AS BIGINT)) AS start_s, "
        "max(CAST(floor(epoch(call_time)) AS BIGINT)) AS end_s, "
        "count(*) AS n_points, "
        "min({'ct': call_time, 'eid': event_id, 'lat': lat, 'lon': lon}) AS f "
        "FROM segd GROUP BY uid, pdt, seg_id) "
        "SELECT uid, pdt, seg_id, start_s, end_s, n_points, "
        "f.lat AS lat, f.lon AS lon, "
        f"(end_s - start_s >= {STAY_MIN_S}) AS is_stay FROM agg"
    )


# ---------------------------------------------------------------------------
# 2. POI reallocation (f_reallocation)


def poi_reallocation(stays: DataFrame, pois: DataFrame) -> DataFrame:
    """Snap STAY segments to the nearest POI within 300 m (ties:
    smaller poi_id); MOVE segments and out-of-radius stays keep their
    coordinates.

    ``pois``: (poi_id, plat, plon) — broadcast (small dimension, like
    the reference's ``add file`` sideloaded TSV).
    """
    d2 = _d2_sql("lat", "lon", "plat", "plon")
    radius2 = REALLOC_RADIUS_M * _DEG_PER_M
    radius2 = radius2 * radius2
    w = Window.partitionBy("uid", "pdt", "seg_id").orderBy(
        F.asc("__d2"), F.asc("poi_id")
    )
    snapped = (
        stays.filter(F.col("is_stay"))
        .join(F.broadcast(pois))
        .withColumn("__d2", F.expr(d2))
        .filter(F.col("__d2") <= F.lit(radius2))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "uid", "pdt", "seg_id",
            F.col("poi_id").alias("snap_poi"),
            F.col("plat").alias("snap_lat"),
            F.col("plon").alias("snap_lon"),
        )
    )
    return (
        stays.join(snapped, ["uid", "pdt", "seg_id"], "left")
        .select(
            "uid", "pdt", "seg_id", "start_s", "end_s", "n_points", "is_stay",
            F.coalesce("snap_poi", F.lit(-1)).alias("poi_id"),
            F.coalesce("snap_lat", "lat").alias("lat"),
            F.coalesce("snap_lon", "lon").alias("lon"),
        )
    )


def poi_reallocation_oracle(stays_sql: str, pois_cte: str) -> str:
    """``stays_sql``: full stay_points oracle; ``pois_cte`` defines
    ``pois(poi_id, plat, plon)``."""
    d2 = _d2_sql("s.lat", "s.lon", "plat", "plon")
    radius2 = (REALLOC_RADIUS_M * _DEG_PER_M) ** 2
    return (
        f"WITH stays AS ({stays_sql}), {pois_cte}, "
        "snapped AS (SELECT uid, pdt, seg_id, poi_id AS snap_poi, "
        "plat AS snap_lat, plon AS snap_lon FROM ("
        f"SELECT s.uid, s.pdt, s.seg_id, p.poi_id, p.plat, p.plon, "
        f"row_number() OVER (PARTITION BY s.uid, s.pdt, s.seg_id "
        f"ORDER BY {d2}, p.poi_id) AS rn "
        f"FROM stays s CROSS JOIN pois p "
        f"WHERE s.is_stay AND {d2} <= {geo.dlit(radius2)}) WHERE rn = 1) "
        "SELECT s.uid, s.pdt, s.seg_id, s.start_s, s.end_s, s.n_points, "
        "s.is_stay, coalesce(snap_poi, -1) AS poi_id, "
        "coalesce(snap_lat, s.lat) AS lat, coalesce(snap_lon, s.lon) AS lon "
        "FROM stays s LEFT JOIN snapped USING (uid, pdt, seg_id)"
    )


# ---------------------------------------------------------------------------
# 3. route interpolation (f_routing)


def _mode_exprs(dialect: str) -> dict[str, str]:
    """Deterministic transport-mode draw per leg.

    p_walk = 1 - 1/(1+exp(5 - km)) (TurkcellRoutingUDF bytecode,
    VelocityModel.estimateVelocity); the uniform draw is the leg hash
    (Q4 determinism fix). Remaining mass splits evenly BIKE/VEHICLE —
    the reference's exact split lives in the missing
    cdrmobilitylib.jar, so the even split is the documented choice.
    """
    key = "concat(uid, '|', cast(pdt as string), '|', cast(leg_id as string))"
    u = f"(({th.md5_int_sql(key, dialect)}) % 1000000) / {geo.dlit(1e6)}"
    km = f"(sqrt({_d2_sql('lat0', 'lon0', 'lat1', 'lon1')}) * {geo.dlit(111.320)})"
    p_walk = f"({geo.dlit(1.0)} - {geo.dlit(1.0)} / ({geo.dlit(1.0)} + exp({geo.dlit(5.0)} - {km})))"
    return {
        "u": u,
        "mode": (
            f"(case when {u} < {p_walk} then 'WALK' "
            f"when {u} < {p_walk} + ({geo.dlit(1.0)} - {p_walk}) / {geo.dlit(2.0)} "
            "then 'BIKE' else 'VEHICLE' end)"
        ),
    }


def route_interpolation(sited: DataFrame) -> DataFrame:
    """Interpolate every consecutive pair of points (a MOVE leg) with
    one point per 900 s, capped at 50 steps (P8 guard), straight-line
    in the planar frame. Output: uid, pdt, leg_id, step, ts_s, lat,
    lon, mode."""
    w = Window.partitionBy("uid", "pdt").orderBy("call_time", "event_id")
    legs = (
        sited.select(
            "uid",
            F.to_date("call_time").alias("pdt"),
            "call_time",
            "event_id",
            F.col("lat").alias("lat1"),
            F.col("lon").alias("lon1"),
        )
        .withColumn("lat0", F.lag("lat1").over(w))
        .withColumn("lon0", F.lag("lon1").over(w))
        .withColumn("t0", F.lag(F.unix_timestamp("call_time")).over(w))
        .withColumn("t1", F.unix_timestamp("call_time"))
        .withColumn("leg_id", F.row_number().over(w) - 1)
        .filter(F.col("lat0").isNotNull() & (F.col("t1") > F.col("t0")))
    )
    n_steps = (
        f"least({MAX_STEPS}, cast(floor((t1 - t0) / {STEP_S}) as bigint))"
    )
    steps = legs.withColumn(
        "step",
        F.explode(
            F.expr(
                f"(case when {n_steps} < 1 then array() "
                f"else sequence(1, {n_steps}) end)"
            )
        ),
    )
    frac = f"(step * {STEP_S} / cast(t1 - t0 as double))"
    mode = _mode_exprs("spark")["mode"]
    return steps.select(
        "uid",
        "pdt",
        "leg_id",
        "step",
        F.expr(f"t0 + step * {STEP_S}").alias("ts_s"),
        F.expr(f"lat0 + (lat1 - lat0) * {frac}").alias("lat"),
        F.expr(f"lon0 + (lon1 - lon0) * {frac}").alias("lon"),
        F.expr(mode).alias("mode"),
    )


def route_interpolation_oracle(sited_cte: str) -> str:
    n_steps = (
        f"least({MAX_STEPS}, CAST(floor((t1 - t0) / {STEP_S}) AS BIGINT))"
    )
    frac = f"(step * {STEP_S} / CAST(t1 - t0 AS DOUBLE))"
    mode = _mode_exprs("duckdb")["mode"]
    return (
        f"{sited_cte}, legs AS (SELECT uid, CAST(call_time AS DATE) AS pdt, "
        "lag(lat) OVER w AS lat0, lag(lon) OVER w AS lon0, "
        "lat AS lat1, lon AS lon1, "
        "lag(CAST(floor(epoch(call_time)) AS BIGINT)) OVER w AS t0, "
        "CAST(floor(epoch(call_time)) AS BIGINT) AS t1, "
        "row_number() OVER w - 1 AS leg_id FROM sited "
        "WINDOW w AS (PARTITION BY uid, CAST(call_time AS DATE) "
        "ORDER BY call_time, event_id)), "
        "steps AS (SELECT legs.*, unnest("
        f"case when {n_steps} < 1 then CAST([] AS BIGINT[]) "
        f"else generate_series(1, {n_steps}) end) AS step "
        "FROM legs WHERE lat0 IS NOT NULL AND t1 > t0) "
        f"SELECT uid, pdt, leg_id, step, t0 + step * {STEP_S} AS ts_s, "
        f"lat0 + (lat1 - lat0) * {frac} AS lat, "
        f"lon0 + (lon1 - lon0) * {frac} AS lon, "
        f"{mode} AS mode FROM steps"
    )


# ---------------------------------------------------------------------------
# 4. faithful trip formatting (TripSegmentationCDR output shape)


_TRIP_SCHEMA = StructType(
    [
        StructField("uid", LongType()),
        StructField("pdt", StringType()),
        StructField("trip_seq", IntegerType()),
        StructField("kind", StringType()),
        StructField("mode", StringType()),
        StructField("distance_m", StringType()),
        StructField("total_time_s", LongType()),
        StructField("start_hms", StringType()),
        StructField("end_hms", StringType()),
        StructField("n_points", IntegerType()),
        StructField("points", StringType()),
    ]
)


def trip_segments_format(sited: DataFrame) -> DataFrame:
    """Reference-shaped trip rows per (uid, day): STAY/MOVE alternation
    with the "i|HH:mm:ss|lat|lon;..." point-list string encoding
    (TripSegmentationCDR output constants "1|", "|", ";" — SURVEY.md
    §2.9). Distance is formatted "###0.0###"-style (1-4 decimals).

    applyInPandas per (uid, pdt): the per-group loop is numpy over the
    whole group's arrays; group size is bounded by MAX_TRAJECTORY.
    Checked rows-only (string codec not SQL-expressible).
    """

    def fmt_dist(d: float) -> str:
        s = f"{d:.4f}".rstrip("0")
        if s.endswith("."):
            s += "0"
        return s

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["call_time", "event_id"])
        lat = pdf["lat"].to_numpy(dtype=np.float64)
        lon = pdf["lon"].to_numpy(dtype=np.float64)
        ts = pdf["call_time"].to_numpy()
        epoch = (ts.astype("datetime64[s]").astype(np.int64))
        d2 = np.zeros(len(pdf))
        if len(pdf) > 1:
            d2[1:] = (lat[1:] - lat[:-1]) ** 2 + (
                (lon[1:] - lon[:-1]) * geo.LON_SCALE
            ) ** 2
        brk = np.ones(len(pdf), dtype=bool)
        brk[1:] = d2[1:] > D2_300M
        seg = np.cumsum(brk) - 1
        uid = pdf["uid"].iloc[0]
        pdt = str(pdf["pdt"].iloc[0])
        out = []
        for s_id in range(seg.max() + 1):
            m = seg == s_id
            idx = np.flatnonzero(m)
            span = int(epoch[idx[-1]] - epoch[idx[0]])
            kind = "STAY" if span >= STAY_MIN_S else "MOVE"
            dist = float(
                np.sum(
                    geo.haversine_np(
                        lat[idx[:-1]], lon[idx[:-1]], lat[idx[1:]], lon[idx[1:]]
                    )
                )
                if len(idx) > 1
                else 0.0
            )
            hms = lambda e: pd.Timestamp(e, unit="s").strftime("%H:%M:%S")
            pts = ";".join(
                f"{i + 1}|{hms(int(epoch[j]))}|{lat[j]:.6f}|{lon[j]:.6f}"
                for i, j in enumerate(idx)
            )
            out.append(
                (
                    int(uid), pdt, s_id, kind,
                    "STAY" if kind == "STAY" else "UNKNOWN",
                    fmt_dist(dist), span,
                    hms(int(epoch[idx[0]])), hms(int(epoch[idx[-1]])),
                    int(m.sum()), pts,
                )
            )
        return pd.DataFrame(out, columns=[f.name for f in _TRIP_SCHEMA.fields])

    base = sited.select(
        "uid",
        F.to_date("call_time").cast("string").alias("pdt"),
        "call_time",
        "event_id",
        "lat",
        "lon",
    )
    return base.groupBy("uid", "pdt").applyInPandas(kernel, schema=_TRIP_SCHEMA)


# ---------------------------------------------------------------------------
# 5. 24-hour padding (f_organizearray)


def trip_24h_padding(trips: DataFrame) -> DataFrame:
    """Pad each (uid, day) to 00:00:00-23:59:59: clamp the first
    segment's start and last segment's end to the day bounds and
    insert filler STAY rows for interior gaps (f_organizearray's
    fillTime/DateUtils.setHours behaviour). Rows-only check."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("trip_seq").reset_index(drop=True)
        rows = []
        prev_end = "00:00:00"
        for _, r in pdf.iterrows():
            if r["start_hms"] > prev_end:
                filler = r.copy()
                filler["trip_seq"] = -1
                filler["kind"] = "STAY"
                filler["mode"] = "PAD"
                filler["distance_m"] = "0.0"
                filler["start_hms"] = prev_end
                filler["end_hms"] = r["start_hms"]
                filler["total_time_s"] = 0
                filler["n_points"] = 0
                filler["points"] = ""
                rows.append(filler)
            rows.append(r)
            prev_end = r["end_hms"]
        if rows and rows[-1]["end_hms"] < "23:59:59":
            filler = rows[-1].copy()
            filler["trip_seq"] = -1
            filler["kind"] = "STAY"
            filler["mode"] = "PAD"
            filler["distance_m"] = "0.0"
            filler["start_hms"] = rows[-1]["end_hms"]
            filler["end_hms"] = "23:59:59"
            filler["total_time_s"] = 0
            filler["n_points"] = 0
            filler["points"] = ""
            rows.append(filler)
        out = pd.DataFrame(rows)
        out["trip_seq"] = range(len(out))
        return out

    return trips.groupBy("uid", "pdt").applyInPandas(kernel, schema=trips.schema)
