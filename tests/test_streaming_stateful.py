"""Stateful streaming stay-point detection == batch operator.

The stream is split into 3 in-order micro-batches (maxFilesPerTrigger
= 1); per-(uid, day) segment state must survive across batches. The
emitted CLOSED segments must equal batch interpolation.stay_points
minus each group's final (still-open) segment.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.operators import interpolation, prepare
from cdr_analysis_tools_hadoop_spark.streaming import zone_stream


@pytest.fixture(scope="module")
def sited_static(spark, sf_dir):
    return (
        prepare.events_as_cdr(spark, sf_dir)
        .select("uid", "call_time", "event_id", "lat", "lon")
    )


def test_streaming_stay_points_matches_batch(spark, sited_static, tmp_path):
    pdf = sited_static.orderBy("call_time", "event_id").toPandas()
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    import glob
    import shutil

    for i in range(3):
        part = pdf.iloc[cuts[i]:cuts[i + 1]]
        slice_dir = tmp_path / f"slice_{i}"
        spark.createDataFrame(part).coalesce(1).write.parquet(str(slice_dir))
        src = glob.glob(str(slice_dir / "part-*.parquet"))[0]
        path = in_dir / f"{i:03d}.parquet"
        shutil.copy(src, path)
        mtime = time.time() - 30 + i * 10
        os.utime(path, (mtime, mtime))

    schema = spark.createDataFrame(pdf.iloc[:1]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    result = zone_stream.streaming_stay_points(stream)
    q = (
        result.writeStream.format("memory")
        .queryName("sps")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.uid, r.pdt, r.seg_id, r.start_s, r.end_s, r.n_points, r.lat, r.lon, r.is_stay)
        for r in spark.table("sps").collect()
    }

    batch = interpolation.stay_points(sited_static)
    last = batch.groupBy("uid", "pdt").agg(F.max("seg_id").alias("last_seg"))
    closed = batch.join(last, ["uid", "pdt"]).filter(
        F.col("seg_id") < F.col("last_seg")
    )
    want = {
        (
            r.uid, str(r.pdt), r.seg_id, r.start_s, r.end_s, r.n_points,
            r.lat, r.lon, r.is_stay,
        )
        for r in closed.collect()
    }
    assert len(want) > 0
    assert got == want
