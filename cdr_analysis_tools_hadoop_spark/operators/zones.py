"""Zone assignment (Voronoi / nearest-site) + zone population.

Reference parity:
- J2: the reference assigns events to zones by a string-equality join
  on tower (lat, lon) (reference queries/statistics/
  frequent_locations.sql:6) — possible only because events inherit
  coordinates FROM towers. This engine assigns zones geometrically:
  nearest tower site under the planar local-projection metric, which
  is exactly membership in the tower's Voronoi cell.
- J3: zone population (reference queries/statistics/
  zone_population.sql:1-4) — join + two-level aggregate.
- J7: FindPolygon (registered, jar missing in the reference) — the
  broadcast PIP path lives in operators/spatial_join.py and must agree
  with the nearest-site result (tested both ways).

Scale strategy: the tower layer is a DIMENSION (10^2..10^5 rows vs
10^12 fact rows). For <= ~1e3 sites the argmin is compiled into a
whole-stage-codegen JVM expression (array_min over an array of
(d2, zone) structs) — zero shuffle, zero Python, embarrassingly
parallel over fact partitions. For larger site sets use
operators/knn.py (cell-ring expansion over a broadcast cell index).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import geo


def nearest_site_struct(
    lat_col: str, lon_col: str, sites: list[tuple[int, float, float]]
) -> Column:
    """Codegen argmin: struct(d2, zone_id) of the nearest site.

    Ties on d2 break by zone_id ascending (struct comparison is
    lexicographic) — the oracle mirrors with ORDER BY d2, zone_id.
    """
    if not sites:
        # array_min(array()) of NullType fails ANALYSIS with an
        # opaque error (the poi_reallocation guard documents the same
        # trap); raise the situation instead
        raise ValueError(
            "nearest_site_struct needs a non-empty site layer"
        )
    entries = [
        F.struct(
            F.expr(
                geo.planar_d2_sql(lat_col, lon_col, geo.dlit(tlat), geo.dlit(tlon))
            ).alias("d2"),
            F.lit(int(zid)).cast("bigint").alias("zone_id"),
        )
        for zid, tlat, tlon in sites
    ]
    return F.array_min(F.array(*entries))


def assign_zone(
    df: DataFrame,
    towers: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    out_col: str = "zone_id",
) -> DataFrame:
    """Attach the Voronoi zone id of the nearest tower to every row.

    Collects the tower dimension to the driver (it is broadcast-sized
    by definition here) and compiles the argmin into the plan.
    """
    sites = [
        (r["zone_id"], r["tlat"], r["tlon"])
        for r in towers.select("zone_id", "tlat", "tlon").collect()
    ]
    if len(sites) > 2000:
        raise ValueError(
            "expression-based nearest-site is for small dimension layers; "
            "use operators.knn.cell_ring_knn for large site sets"
        )
    nearest = nearest_site_struct(lat_col, lon_col, sites)
    return df.withColumn(out_col, nearest.getField("zone_id"))


def zone_population(zoned: DataFrame, towers: DataFrame, uid_col: str = "uid") -> DataFrame:
    """Per-zone population: total events + unique users + admin name.

    Reference: queries/statistics/zone_population.sql:1-4 computes
    sum(total)/count(uid) over a per-(zone, uid) subaggregate; a single
    count/countDistinct pass is algebraically identical and lets Spark
    do partial aggregation map-side (the reference explicitly DISABLED
    map-side agg, hive_init_commands/initial_hive_commands_stats.json:10
    — we keep it on).
    """
    agg = zoned.groupBy("zone_id").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct(uid_col).alias("unique_uids"),
    )
    return (
        agg.join(F.broadcast(towers.select("zone_id", "admin1")), "zone_id", "left")
        .select("zone_id", "admin1", "total_events", "unique_uids")
    )
