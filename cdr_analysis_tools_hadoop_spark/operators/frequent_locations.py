"""Frequent-locations chain: rank, percent, cumulative, threshold, home.

Reference parity (SURVEY.md §2.5; files under reference
queries/statistics/):
- W1 frequency rank        frequent_locations.sql:2
      ROW_NUMBER() OVER (PARTITION BY uid ORDER BY count DESC)
- W2 ratio-to-report       frequent_locations.sql:3
- W3 running sum           frequent_locations_wsum.sql:3-4
- J6 threshold cut         frequent_locations_thresholded.sql:9-13 —
      the reference self-joins an aggregated subquery; re-expressed as
      a window min (no join, one shuffle saved)
- W5 home = top-1          insert_la_cdr_uid_home.sql:2-3
- P7 night-hours variant   frequent_locations_night.sql:6

Quirk Q3: the reference's rank ties are engine-order-dependent; ties
are pinned here by (count DESC, zone_id ASC) and the oracle mirrors.
Locations are zone ids (the reference keys on tower lat/lon strings;
zones are the geometric generalization, operators/zones.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


NIGHT_HOURS = [0, 1, 2, 3, 4, 5, 6, 7, 20, 21, 22, 23]
DAY_HOURS = [h for h in range(24) if h not in NIGHT_HOURS]


def frequent_locations(
    zoned: DataFrame,
    night_only: bool = False,
    hours: list[int] | None = None,
) -> DataFrame:
    """Per (uid, zone): count, rank, percent-of-user.

    ``hours`` restricts to an explicit hour-of-day set (e.g.
    DAY_HOURS for the work-location variant); ``night_only`` is the
    reference's P7 predicate (frequent_locations_night.sql:6).

    Output: uid, zone_id, tcount, trank, ppercent (rounded 6dp).
    """
    df = zoned
    if hours is not None:
        df = df.filter(F.hour("call_time").isin(hours))
    elif night_only:
        df = df.filter(F.hour("call_time").isin(NIGHT_HOURS))
    counts = df.groupBy("uid", "zone_id").agg(F.count(F.lit(1)).alias("tcount"))
    w_rank = Window.partitionBy("uid").orderBy(
        F.desc("tcount"), F.asc("zone_id")
    )
    w_all = Window.partitionBy("uid")
    return counts.select(
        "uid",
        "zone_id",
        "tcount",
        F.row_number().over(w_rank).alias("trank"),
        F.round(F.col("tcount") / F.sum("tcount").over(w_all) * 100.0, 6).alias(
            "ppercent"
        ),
    )


def frequent_locations_wsum(freq: DataFrame) -> DataFrame:
    """Cumulative percent by rank (W3). ROW_NUMBER ranks are unique per
    uid so the default RANGE frame == ROWS frame here (SURVEY.md W3
    note)."""
    w = Window.partitionBy("uid").orderBy("trank")
    return freq.withColumn(
        "acc_wsum", F.round(F.sum("ppercent").over(w), 6)
    )


def frequent_locations_thresholded(freq: DataFrame, threshold: float = 80.0) -> DataFrame:
    """Keep each user's smallest rank-prefix whose cumulative percent
    reaches `threshold`.

    The reference computes min(acc_wsum where acc_wsum >= T) per uid in
    a subquery and self-joins (frequent_locations_thresholded.sql:9-13);
    the window-min form is semantically identical and avoids the join.
    """
    wsum = frequent_locations_wsum(freq)
    w = Window.partitionBy("uid")
    cut = F.min(
        F.when(F.col("acc_wsum") >= threshold, F.col("acc_wsum"))
    ).over(w)
    return (
        wsum.withColumn("cut", cut)
        .filter(F.col("cut").isNull() | (F.col("acc_wsum") <= F.col("cut")))
        .drop("cut")
    )


def user_home(freq: DataFrame) -> DataFrame:
    """Home zone = rank-1 location (W5). Catalyst turns the filter on
    row_number into per-key top-1 (no full sort)."""
    return freq.filter(F.col("trank") == 1).select(
        "uid", F.col("zone_id").alias("home_zone")
    )


def user_work(freq_day: DataFrame) -> DataFrame:
    """Work zone = rank-1 location over DAY_HOURS activity — the
    daytime twin of user_home (W5)."""
    return freq_day.filter(F.col("trank") == 1).select(
        "uid", F.col("zone_id").alias("work_zone")
    )


def commute_matrix(zoned: DataFrame) -> DataFrame:
    """Home->work commute matrix: users per (night-hours top zone,
    day-hours top zone) — the standard CDR mobility product derived
    from the reference's frequent-locations chain (home = W5 over the
    P7 night predicate; work = the same top-1 over the complement
    hours). Users active only at night or only by day drop out (inner
    join), mirroring the practitioner definition.

    Scale: both top-1 sides are the W1 window over a (uid, zone)
    pre-aggregate — the heavy count collapses map-side, the window
    sorts each user's zone list (bounded), and the uid-keyed join
    reuses the window's hash partitioning. The final rollup is
    |zones|^2-bounded. One logical shuffle chain, no skew surface
    beyond the per-user zone lists the chain already handles.

    Output: (home_zone, work_zone, n_users).
    """
    home = user_home(frequent_locations(zoned, night_only=True))
    work = user_work(frequent_locations(zoned, hours=DAY_HOURS))
    return (
        home.join(work, "uid")
        .groupBy("home_zone", "work_zone")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def frequent_locations_old_consolidate(
    cdr: DataFrame,
    towers: DataFrame,
    admin_zones: DataFrame,
    admin: str = "admin1",
) -> DataFrame:
    """J4 LITERAL legacy variant (reference
    frequent_locations_old_consolidate.sql:1-7): the 3-way join
    consolidate JOIN cell_tower_data_preprocess ON cell_id JOIN
    cell_tower_data_{admin} ON (latitude, longitude) string equality,
    grouped by (uid, lat, lon, cell_id, admin).

    Faithful quirk: the reference's windows partition by
    (uid, cell_id) — BOTH of which are group keys — so every
    partition is a single row: trank is always 1 and ppercent always
    100.0. Reproduced literally (this is the legacy query's actual
    output, which is why the non-legacy frequent_locations.sql
    partitioning by uid alone superseded it).

    Plan shape: broadcast both dimension joins (tower + admin zone
    are broadcast-sized), ONE shuffle on the group keys. ``towers``
    is the preprocess table (cell_id, latitude, longitude);
    ``admin_zones`` is mapping_admin's output (rowidx, admin, lat,
    lon).
    """
    a2 = F.broadcast(
        towers.select(
            "cell_id",
            F.col("latitude").alias("__tlat"),
            F.col("longitude").alias("__tlon"),
        ).distinct()
    )
    a3 = F.broadcast(
        admin_zones.select(
            F.col(admin),
            F.col("latitude").alias("__tlat"),
            F.col("longitude").alias("__tlon"),
        ).distinct()
    )
    joined = cdr.join(a2, "cell_id").join(a3, ["__tlat", "__tlon"])
    counts = joined.groupBy(
        "uid", "__tlat", "__tlon", "cell_id", admin
    ).agg(F.count("uid").alias("tcount"))
    # partition by (uid, cell_id): cell_id is a group key, so each
    # window holds one row — rank 1, percent 100 (faithful quirk)
    w = Window.partitionBy("uid", "cell_id")
    return counts.select(
        "uid",
        "cell_id",
        "tcount",
        F.row_number()
        .over(w.orderBy(F.desc("tcount")))
        .alias("trank"),
        (F.col("tcount") / F.sum("tcount").over(w) * 100).alias("ppercent"),
        F.col("__tlon").alias("longitude"),
        F.col("__tlat").alias("latitude"),
        admin,
    ).orderBy("uid", "trank")
