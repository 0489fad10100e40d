from __future__ import annotations

import re
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.operators import interpolation, prepare


@pytest.fixture(scope="module")
def cdr(spark, sf_dir):
    return prepare.events_as_cdr(spark, sf_dir).filter(F.col("uid") < 20)


def _mini(spark, rows):
    return spark.createDataFrame(
        rows, "uid long, call_time timestamp, event_id long, lat double, lon double"
    )


def test_stay_points_splits_on_300m_jump(spark):
    t = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t, 1, 35.5, 139.5),
        (1, datetime(2024, 1, 1, 10, 20), 2, 35.5001, 139.5001),  # ~15 m: same seg
        (1, datetime(2024, 1, 1, 10, 30), 3, 35.6, 139.6),        # ~12 km: break
    ]
    segs = interpolation.stay_points(_mini(spark, rows)).collect()
    assert len(segs) == 2
    first = next(s for s in segs if s.seg_id == 1)
    assert first.n_points == 2 and bool(first.is_stay)  # 20 min span
    second = next(s for s in segs if s.seg_id == 2)
    assert second.n_points == 1 and not second.is_stay


def test_route_interpolation_steps_and_bounds(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), 1, 35.0, 139.0),
        (1, datetime(2024, 1, 1, 11, 0, 0), 2, 35.4, 139.4),  # 3600 s -> 4 steps
    ]
    pts = interpolation.route_interpolation(_mini(spark, rows)).collect()
    assert len(pts) == 4
    assert [p.step for p in sorted(pts, key=lambda p: p.step)] == [1, 2, 3, 4]
    for p in pts:
        assert 35.0 < p.lat <= 35.4 and 139.0 < p.lon <= 139.4
        assert p.mode in ("WALK", "BIKE", "VEHICLE")
    # deterministic across runs
    again = interpolation.route_interpolation(_mini(spark, rows)).collect()
    assert sorted(map(tuple, pts)) == sorted(map(tuple, again))


def test_route_interpolation_caps_steps(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, 35.0, 139.0),
        (1, datetime(2024, 1, 1, 23, 0, 0), 2, 35.4, 139.4),  # 92 raw steps
    ]
    pts = interpolation.route_interpolation(_mini(spark, rows)).collect()
    assert len(pts) == interpolation.MAX_STEPS


def test_trip_segments_point_encoding(cdr):
    rows = interpolation.trip_segments_format(cdr).limit(50).collect()
    assert rows
    pat = re.compile(r"^\d+\|\d{2}:\d{2}:\d{2}\|\d+\.\d{6}\|\d+\.\d{6}$")
    for r in rows:
        assert r.kind in ("STAY", "MOVE")
        for part in r.points.split(";"):
            assert pat.match(part), part


def test_padding_covers_full_day(cdr):
    trips = interpolation.trip_segments_format(cdr)
    padded = interpolation.trip_24h_padding(trips)
    one = (
        padded.filter((F.col("uid") == padded.select("uid").first().uid))
        .orderBy("pdt", "trip_seq")
        .collect()
    )
    by_day = {}
    for r in one:
        by_day.setdefault(r.pdt, []).append(r)
    for day, rows in by_day.items():
        assert rows[0].start_hms == "00:00:00"
        assert rows[-1].end_hms == "23:59:59"
        for a, b in zip(rows, rows[1:]):
            assert a.end_hms <= b.start_hms
