"""Operator semantics on tiny hand-built frames (reference TripOD edge
rules, frequent-locations algebra, daily-stat grains)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.operators import (
    frequent_locations as fl,
)
from cdr_analysis_tools_hadoop_spark.operators import statistics, trajectory


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def tiny_sited(spark):
    # uid 1: home site 100 (3 visits), day trip 100 -> 200 -> 100
    # uid 2: single point at non-home site (after home at 300 on day 2)
    rows = [
        (1, _ts(8), 1, 100, 10),
        (1, _ts(9), 2, 200, 20),
        (1, _ts(10), 3, 100, 10),
        (1, _ts(23), 4, 100, 10),
        (2, _ts(8), 5, 300, 30),
        (2, _ts(9), 6, 300, 30),
    ]
    rows.append((2, dt.datetime(2024, 1, 2, 8), 7, 400, 40))
    return spark.createDataFrame(
        rows, "uid long, call_time timestamp, event_id long, site long, zone_id long"
    ).withColumn("duration", F.lit(1.0)).withColumn("lat", F.lit(35.5)).withColumn(
        "lon", F.lit(139.5)
    )


def test_user_home_site(tiny_sited):
    home = {r["uid"]: (r["home_site"], r["home_zone"]) for r in
            trajectory.user_home_site(tiny_sited).collect()}
    assert home[1] == (100, 10)
    assert home[2] == (300, 30)


def test_od_edges_rules(tiny_sited):
    home = trajectory.user_home_site(tiny_sited)
    edges = trajectory.od_edges(tiny_sited, home).collect()
    by_uid = {}
    for e in edges:
        by_uid.setdefault(e["uid"], []).append(
            (str(e["pdt"]), e["origin_site"], e["dest_site"])
        )
    # uid 1 day 1: starts at home (no rule-i), 100->200, 200->100,
    # ends at home (no rule-iii)
    assert sorted(by_uid[1]) == [
        ("2024-01-01", 100, 200),
        ("2024-01-01", 200, 100),
    ]
    # uid 2 day 1: two points at home site -> no edges at all;
    # day 2: SINGLE point at site 400 != home 300 -> only rule (i)
    assert by_uid[2] == [("2024-01-02", 300, 400)]


def test_od_sum_rollup(tiny_sited):
    home = trajectory.user_home_site(tiny_sited)
    od = trajectory.od_sum(trajectory.od_edges(tiny_sited, home)).collect()
    m = {(str(r["pdt"]), r["origin_zone"], r["dest_zone"]): (r["tcount"], r["tusercount"]) for r in od}
    assert m[("2024-01-01", 10, 20)] == (1, 1)
    assert m[("2024-01-01", 20, 10)] == (1, 1)
    assert m[("2024-01-02", 30, 40)] == (1, 1)


def test_trajectory_collect_sorted(spark, tiny_sited):
    arr = {
        (r["uid"], str(r["pdt"])): [p["site"] for p in r["arr"]]
        for r in trajectory.collect_trajectories(tiny_sited).collect()
    }
    assert arr[(1, "2024-01-01")] == [100, 200, 100, 100]


def test_frequent_locations_chain(spark):
    rows = [(1, _ts(8 + i % 4), 5 if i < 6 else 7) for i in range(8)]
    zoned = spark.createDataFrame(
        rows, "uid long, call_time timestamp, zone_id long"
    )
    freq = fl.frequent_locations(zoned).collect()
    top = {r["trank"]: r for r in freq}
    assert top[1]["zone_id"] == 5 and top[1]["tcount"] == 6
    assert abs(top[1]["ppercent"] - 75.0) < 1e-9
    wsum = fl.frequent_locations_wsum(fl.frequent_locations(zoned)).collect()
    acc = {r["trank"]: r["acc_wsum"] for r in wsum}
    assert abs(acc[2] - 100.0) < 1e-9
    cut = fl.frequent_locations_thresholded(fl.frequent_locations(zoned), 70.0).collect()
    assert len(cut) == 1 and cut[0]["trank"] == 1
    home = fl.user_home(fl.frequent_locations(zoned)).collect()
    assert home[0]["home_zone"] == 5


def test_daily_statistics_grains(spark):
    rows = [
        (1, _ts(8), "Voice", "2G"),
        (1, _ts(9), "Data", "3G"),
        (2, _ts(10), "Voice", "3G"),
    ]
    cdr = spark.createDataFrame(
        rows, "uid long, call_time timestamp, call_type string, network_type string"
    )
    out = statistics.daily_statistics(cdr).collect()
    m = {(r["call_type"], r["network_type"]): (r["total_records"], r["total_uids"]) for r in out}
    assert m[("ALL", "ALL")] == (3, 2)
    assert m[("Voice", "ALL")] == (2, 2)
    assert m[("ALL", "3G")] == (2, 2)
    assert m[("Voice", "2G")] == (1, 1)
    assert len(out) == 1 + 2 + 2 + 3


def test_mapping_admin_blank_filter_and_dense_ids(spark):
    """P5: blank/empty admin names are dropped
    (translate(admin,'  ',' ') != ''); zone ids are dense, 0-based,
    pinned to (admin, lat, lon) order — W4/Q3."""
    from cdr_analysis_tools_hadoop_spark.operators import prepare

    rows = [
        ("c1", "1.0", "2.0", "Alpha"),
        ("c2", "1.0", "2.0", "Alpha"),     # duplicate (admin,lat,lon)
        ("c3", "3.0", "4.0", "Beta"),
        ("c4", "5.0", "6.0", ""),          # blank admin -> dropped
        ("c5", "0", "0", "Gamma"),         # invalid coords
    ]
    towers = spark.createDataFrame(
        rows, "cell_id string, latitude string, longitude string, admin1 string"
    )
    out = prepare.mapping_admin(towers, "admin1").collect()
    assert [(r.rowidx, r.admin1) for r in sorted(out, key=lambda r: r.rowidx)] == [
        (0, "Alpha"), (1, "Beta"), (2, "Gamma")
    ]
    out2 = prepare.mapping_admin(towers, "admin1", filter_invalid_coords=True)
    assert {r.admin1 for r in out2.collect()} == {"Alpha", "Beta"}


def test_stat_enabled_gate():
    """P11: a stat is disabled when any required column is unmapped
    (output_no == -1 / missing expr / absent), enabled otherwise."""
    from cdr_analysis_tools_hadoop_spark.operators import prepare

    mapping = [
        {"name": "UID", "expr": "col_a"},
        {"name": "call_time", "custom": "to_timestamp(col_b)"},
        {"name": "imei", "output_no": -1},
        {"name": "imsi", "expr": None},
        # reference shape: output-mapped, no input -> '-1' fill, ENABLED
        {"name": "cell_id", "output_no": 6, "input_no": -1},
    ]
    assert prepare.stat_enabled(mapping, ("uid", "call_time"))
    assert prepare.stat_enabled(mapping, ("uid", "cell_id"))
    assert not prepare.stat_enabled(mapping, ("uid", "imei"))
    assert not prepare.stat_enabled(mapping, ("uid", "imsi"))
    assert not prepare.stat_enabled(mapping, ("uid", "network_type"))


def test_data_statistics_injects_imei_imsi(spark):
    from cdr_analysis_tools_hadoop_spark.operators import statistics

    base = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "uid long, call_time string"
    ).withColumn("call_time", F.to_timestamp("call_time"))
    assert "unique_imei" not in statistics.data_statistics(base).columns
    with_ids = base.withColumn("imei", F.lit("a")).withColumn("imsi", F.lit("b"))
    cols = statistics.data_statistics(with_ids).columns
    assert "unique_imei" in cols and "unique_imsi" in cols


def test_histogram_numeric_adaptive_exact_when_no_merge(spark):
    """With distinct active-day values <= num_buckets the BHTT sketch
    never merges, so bins are exactly (value, count) — deterministic
    across partitionings and bit-equal to the reference algorithm."""
    from cdr_analysis_tools_hadoop_spark.operators import statistics

    rows = []
    # uid blocks with 1, 3, 3, 7 active days respectively
    for uid, ndays in [(1, 1), (2, 3), (3, 3), (4, 7)]:
        for d in range(ndays):
            rows.append((uid, f"2024-01-{d+1:02d} 08:00:00"))
    cdr = spark.createDataFrame(rows, "uid long, call_time string").withColumn(
        "call_time", F.to_timestamp("call_time")
    )
    got = [
        (r.bin_center, r.num_users)
        for r in statistics.user_activity_histogram_adaptive(cdr, 5).collect()
    ]
    assert got == [(1.0, 1.0), (3.0, 2.0), (7.0, 1.0)]


def test_histogram_numeric_adaptive_merged_golden(spark):
    """Pinned golden for the MERGING case: with a deterministic
    fixture and pinned partitioning (repartition(4, uid)) the BHTT
    sketch's merge order is fixed, so the exact (center, count) bins
    are reproducible across JVMs — the adaptive form is value-checked
    here even though it has no cross-engine oracle."""
    from cdr_analysis_tools_hadoop_spark.operators import statistics

    rows = []
    for uid in range(40):
        for d in range(uid % 13 + 1):
            rows.append((uid, f"2024-01-{d+1:02d} 08:00:00"))
    cdr = (
        spark.createDataFrame(rows, "uid long, call_time string")
        .withColumn("call_time", F.to_timestamp("call_time"))
        .repartition(4, "uid")
    )
    got = [
        (round(r.bin_center, 9), r.num_users)
        for r in statistics.user_activity_histogram_adaptive(cdr, 5).collect()
    ]
    assert got == [
        (1.428571429, 7.0),
        (3.5, 6.0),
        (6.0, 9.0),
        (8.714285714, 7.0),
        (11.636363636, 11.0),
    ]


def test_histogram_numeric_adaptive_invariants(spark):
    """When merging happens, the sketch still preserves bin count,
    total mass and the weighted mean (order-independent invariants)."""
    from cdr_analysis_tools_hadoop_spark.operators import statistics

    rows = []
    for uid in range(40):
        for d in range(uid % 13 + 1):
            rows.append((uid, f"2024-01-{d+1:02d} 08:00:00"))
    cdr = spark.createDataFrame(rows, "uid long, call_time string").withColumn(
        "call_time", F.to_timestamp("call_time")
    )
    bins = statistics.user_activity_histogram_adaptive(cdr, 5).collect()
    assert len(bins) == 5
    assert sum(r.num_users for r in bins) == 40
    exact_mean = sum(u % 13 + 1 for u in range(40)) / 40
    got_mean = sum(r.bin_center * r.num_users for r in bins) / 40
    assert abs(got_mean - exact_mean) < 1e-9
    centers = [r.bin_center for r in bins]
    assert centers == sorted(centers)


def test_commute_matrix_python_recompute(spark):
    """commute_matrix == a from-scratch recompute: night top-1 ->
    home, day top-1 -> work, inner join, rollup; night-only users
    drop out."""
    import collections
    import datetime as dt

    from cdr_analysis_tools_hadoop_spark.operators import (
        frequent_locations as fl,
    )

    rows = []
    # uid 1: nights in zone A(0), days in zone B(1)
    for i in range(6):
        rows.append((100 + i, 1, dt.datetime(2024, 1, 1 + i, 2, 0, 0), 0))
        rows.append((200 + i, 1, dt.datetime(2024, 1, 1 + i, 12, 0, 0), 1))
    # uid 2: both in zone A; tie-break day top between A and B -> A (zone asc)
    for i in range(3):
        rows.append((300 + i, 2, dt.datetime(2024, 1, 1 + i, 23, 0, 0), 0))
        rows.append((400 + i, 2, dt.datetime(2024, 1, 1 + i, 9, 0, 0), 0))
        rows.append((500 + i, 2, dt.datetime(2024, 1, 1 + i, 10, 0, 0), 1))
    # uid 3: night-only -> excluded
    rows.append((600, 3, dt.datetime(2024, 1, 1, 3, 0, 0), 1))
    df = spark.createDataFrame(
        rows, "event_id long, uid long, call_time timestamp, zone_id long"
    )
    got = {
        (r.home_zone, r.work_zone): r.n_users
        for r in fl.commute_matrix(df).collect()
    }
    # uid2 day counts: A=3, B=3 -> tie -> zone 0 (asc). home A.
    assert got == {(0, 1): 1, (0, 0): 1}


def test_od_kanon_suppresses_small_cells(spark, sf_dir):
    """Every released cell has >= k distinct users; suppressed cells
    are exactly od_sum minus the release; k<1 raises."""
    from cdr_analysis_tools_hadoop_spark.operators import prepare, trajectory, zones
    from cdr_analysis_tools_hadoop_spark.sources import synthetic as syn

    zoned = zones.assign_zone(
        prepare.events_as_cdr(spark, sf_dir), syn.towers_df(spark, sf_dir)
    )
    sited = trajectory.with_site(zoned)
    home = trajectory.user_home_site(sited)
    edges = trajectory.od_edges(sited, home).localCheckpoint()
    full = {(r.pdt, r.origin_zone, r.dest_zone): r.tusercount
            for r in trajectory.od_sum(edges).collect()}
    rel = {(r.pdt, r.origin_zone, r.dest_zone): r.tusercount
           for r in trajectory.od_sum_kanon(edges, k=3).collect()}
    assert rel and all(v >= 3 for v in rel.values())
    assert rel == {c: v for c, v in full.items() if v >= 3}
    assert any(v < 3 for v in full.values())  # the gate actually bites
    import pytest as _pytest
    with _pytest.raises(ValueError):
        trajectory.od_sum_kanon(edges, k=0)


def test_od_gravity_masses_distance_and_index(spark):
    """Hand-built directed flows -> masses, planar distance, and the
    per-pair log-residual recomputed in numpy."""
    import math

    import numpy as np

    from cdr_analysis_tools_hadoop_spark.functions import geo

    # edges: zone 0 -> 1 x3, 1 -> 0 x2, 0 -> 2 x1, plus a self-flow
    # (1 -> 1) and a null-zone edge, both of which must be excluded
    rows = [(0, 1)] * 3 + [(1, 0)] * 2 + [(0, 2), (1, 1), (None, 2)]
    edges = spark.createDataFrame(
        [(i, str(o) if o is not None else None, str(d)) for i, (o, d) in enumerate(rows)],
        "uid long, origin_zone string, dest_zone string",
    ).selectExpr(
        "uid",
        "cast(origin_zone as bigint) as origin_zone",
        "cast(dest_zone as bigint) as dest_zone",
    )
    towers = spark.createDataFrame(
        [(0, 35.0, 139.0), (1, 35.2, 139.1), (2, 35.1, 139.4)],
        "zone_id long, tlat double, tlon double",
    )
    got = {
        (r.origin_zone, r.dest_zone): r
        for r in trajectory.od_gravity(edges, towers).collect()
    }
    assert set(got) == {(0, 1), (1, 0), (0, 2)}
    assert got[(0, 1)].tcount == 3 and got[(1, 0)].tcount == 2
    # masses: outflow of 0 = 4, inflow of 1 = 3, etc.
    assert (got[(0, 1)].m_o, got[(0, 1)].m_d) == (4, 3)
    assert (got[(1, 0)].m_o, got[(1, 0)].m_d) == (2, 2)
    coords = {0: (35.0, 139.0), 1: (35.2, 139.1), 2: (35.1, 139.4)}
    for (o, d), r in got.items():
        d2 = float(
            geo.planar_d2_np(
                np.array([coords[o][0]]), np.array([coords[o][1]]),
                np.array([coords[d][0]]), np.array([coords[d][1]]),
            )[0]
        )
        assert abs(r.dist_m - round(math.sqrt(d2) * 111320.0, 3)) < 1e-9
        want_idx = round(math.log(r.tcount * d2 / (r.m_o * r.m_d)), 6)
        assert abs(r.gravity_index - want_idx) < 1e-9


def test_od_gravity_broadcasts_all_dims(spark):
    edges = spark.createDataFrame(
        [(1, 0, 1)], "uid long, origin_zone long, dest_zone long"
    )
    towers = spark.createDataFrame(
        [(0, 35.0, 139.0), (1, 35.2, 139.1)],
        "zone_id long, tlat double, tlon double",
    )
    plan = (
        trajectory.od_gravity(edges, towers)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # masses + tower dims all broadcast: no sort-merge join anywhere
    assert "SortMergeJoin" not in plan


def test_od_dp_noise_matches_python_recompute(spark, sf_dir):
    """od_sum_dp (r5): deterministic Laplace per OD cell — recompute
    the md5-int -> MINSTD-free inverse-CDF draw in Python and match
    after round-6; released schema drops the user-count column."""
    import hashlib
    import math

    from cdr_analysis_tools_hadoop_spark.operators import (
        prepare,
        trajectory,
        zones,
    )
    from cdr_analysis_tools_hadoop_spark.operators.sampling import (
        MINSTD_MOD,
        MINSTD_MULT,
    )
    from cdr_analysis_tools_hadoop_spark.sources import synthetic as syn

    zoned = zones.assign_zone(
        prepare.events_as_cdr(spark, sf_dir), syn.towers_df(spark, sf_dir)
    )
    sited = trajectory.with_site(zoned)
    home = trajectory.user_home_site(sited)
    edges = trajectory.od_edges(sited, home).localCheckpoint()
    eps = 1.0
    full = {
        (str(r.pdt), r.origin_zone, r.dest_zone): r.tcount
        for r in trajectory.od_sum(edges).collect()
    }
    rel = {
        (str(r.pdt), r.origin_zone, r.dest_zone): r.noisy_trips
        for r in trajectory.od_sum_dp(edges, epsilon=eps).collect()
    }
    assert set(rel) == set(full)

    def _noise(key: str) -> float:
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        h = ((h % MINSTD_MOD) + MINSTD_MOD + trajectory.OD_DP_SEED) % MINSTD_MOD
        for _ in range(3):
            h = h * MINSTD_MULT % MINSTD_MOD
        u = (h + 0.5) / MINSTD_MOD
        return (
            (1.0 / eps) * math.log(2.0 * u)
            if u < 0.5
            else -(1.0 / eps) * math.log(2.0 - 2.0 * u)
        )

    for (pdt, o, d), noisy in rel.items():
        want = round(full[(pdt, o, d)] + _noise(f"{pdt}|{o}|{d}"), 6)
        assert noisy == pytest.approx(want, abs=1e-9), (pdt, o, d)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        trajectory.od_sum_dp(edges, epsilon=-1.0)
