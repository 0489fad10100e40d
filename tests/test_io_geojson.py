from __future__ import annotations

import csv
import glob
import json

import numpy as np
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.operators import geojson
from cdr_analysis_tools_hadoop_spark.sources import csv_io, synthetic


def test_csv_roundtrip_all_string(spark, tmp_path):
    src = tmp_path / "raw.csv"
    src.write_text("uid;call_time;lat\nu1;2024-01-01 10:00:00;35.5\nu2;x;0\n")
    df = csv_io.read_csv_all_string(
        spark, str(src), ["uid", "call_time", "lat"], delimiter=";"
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 3
    rows = sorted(map(tuple, df.collect()))
    assert rows == [("u1", "2024-01-01 10:00:00", "35.5"), ("u2", "x", "0")]


def test_export_tsv_and_report_csv(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "zone_id long, name string"
    )
    out_dir = tmp_path / "tsv"
    csv_io.export_tsv(df.coalesce(1), str(out_dir))
    part = glob.glob(str(out_dir / "part-*.csv"))[0]
    lines = sorted(open(part).read().strip().split("\n"))
    assert lines == ["1\ta", "2\tb"]

    rep = tmp_path / "report.csv"
    n = csv_io.report_csv(df, str(rep))
    assert n == 2
    got = list(csv.reader(open(rep)))
    assert got[0] == ["zone_id", "name"]


def test_geojson_merge_stats(spark):
    towers = synthetic.towers_np(9)
    polys = list(
        zip(towers[:, 0].astype(np.int64), synthetic.voronoi_polygons(towers))
    )
    fc = geojson.zones_to_geojson(polys)
    assert len(fc["features"]) == 9
    for f in fc["features"]:
        ring = f["geometry"]["coordinates"][0]
        assert ring[0] == ring[-1]  # closed

    stats = spark.createDataFrame(
        [(0, 10, 3), (1, 20, 5)], "zone_id long, total_events long, unique_uids long"
    )
    merged = geojson.merge_stats(fc, stats)
    props = {f["properties"]["zone_id"]: f["properties"] for f in merged["features"]}
    assert props[0]["total_events"] == 10 and props[1]["unique_uids"] == 5
    assert "total_events" not in props[2]
    json.dumps(merged)  # serializable
