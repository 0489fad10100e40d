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


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """Stream == batch: the streaming dedup over two micro-batches
    (duplicates within AND across batches) keeps exactly one row per
    content key — the same keys the batch exact_dedup keeps."""
    import pyspark.sql.functions as F
    from cdr_analysis_tools_hadoop_spark.operators import dedup
    from cdr_analysis_tools_hadoop_spark.streaming import zone_stream

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows1 = [(1, "alpha beta", "2024-01-01 10:00:00"),
             (2, "alpha beta", "2024-01-01 10:00:05"),
             (3, "gamma", "2024-01-01 10:00:10")]
    rows2 = [(4, "ALPHA  beta", "2024-01-01 10:01:00"),   # dup across batches
             (5, "delta", "2024-01-01 10:01:30")]

    def write(rows, name):
        spark.createDataFrame(
            rows, "doc_id long, text string, ingest_ts string"
        ).withColumn("ingest_ts", F.to_timestamp("ingest_ts")).write.mode(
            "overwrite"
        ).parquet(str(in_dir / name))

    write(rows1, "b1")
    write(rows2, "b2")
    schema = spark.read.parquet(str(in_dir / "b1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    out_dir, chk = tmp_path / "out", tmp_path / "chk"
    q = (
        zone_stream.streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out_dir))
    batch_all = spark.createDataFrame(
        rows1 + rows2, "doc_id long, text string, ingest_ts string"
    ).withColumn("ingest_ts", F.to_timestamp("ingest_ts"))
    want_keys = {
        r.text_hash for r in dedup.exact_dedup(batch_all.select("doc_id", "text")).collect()
    }
    got_rows = got.collect()
    assert {r.text_hash for r in got_rows} == want_keys
    assert len(got_rows) == len(want_keys)  # exactly one survivor per key


def test_streaming_cluster_counts_match_batch(spark, tmp_path):
    """Stream == batch: the trained-cluster drift monitor over two
    micro-batches produces exactly the batch (window, cluster)
    counts."""
    import numpy as np

    from cdr_analysis_tools_hadoop_spark.operators import clustering
    from cdr_analysis_tools_hadoop_spark.sources import synthetic

    emb = synthetic.embeddings_df(spark, 400, dup_every=10, partitions=4)
    cents = clustering.kmeans_fit(emb, k=4, n_iters=3)

    stamped = emb.withColumn(
        "ingest_ts",
        F.to_timestamp(
            F.expr(
                "timestampadd(MINUTE, cast(vec_id % 25 as int), "
                "timestamp'2024-01-01 10:00:00')"
            )
        ),
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    stamped.filter("vec_id < 200").write.parquet(str(in_dir / "b1"))
    stamped.filter("vec_id >= 200").write.parquet(str(in_dir / "b2"))
    schema = spark.read.parquet(str(in_dir / "b1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    # complete mode to a memory sink: append would hold back windows
    # the watermark has not passed, and availableNow ends the stream
    # before the last windows close
    zone_stream.run_available_now(
        zone_stream.streaming_cluster_counts(stream, cents),
        "cluster_counts_stream",
        str(tmp_path / "chk"),
    )
    got = {
        (str(r.win_start), r.cluster): r.n
        for r in spark.sql("SELECT * FROM cluster_counts_stream").collect()
    }
    want = {
        (str(r.win_start), r.cluster): r.n
        for r in zone_stream.streaming_cluster_counts(
            spark.read.parquet(str(in_dir / "*")), cents
        ).collect()
    }
    assert got == want
    assert sum(want.values()) == 400


def test_streaming_co_presence_matches_batch(spark, tmp_path):
    """Stream-stream self-join parity: the watermarked range-join
    emits exactly the batch operator's contact pairs across 3
    micro-batches (both sides of every pair may land in DIFFERENT
    batches — the buffered-state path)."""
    import datetime as dt
    import glob
    import shutil

    from cdr_analysis_tools_hadoop_spark.operators import mobility

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    rng_zone = [3, 3, 7, 3, 7, 9, 3, 7, 9, 3]
    for i in range(60):
        rows.append(
            (
                i % 11 + 1,
                t0 + dt.timedelta(seconds=(i * 613) % 7200),
                rng_zone[i % len(rng_zone)],
            )
        )
    zoned = spark.createDataFrame(
        rows, "uid long, call_time timestamp, zone_id long"
    )
    w_us = 900 * 1_000_000

    pdf = zoned.orderBy("call_time", "uid").toPandas()
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    in_dir = tmp_path / "cp_in"
    in_dir.mkdir()
    for i in range(3):
        part = pdf.iloc[cuts[i]:cuts[i + 1]]
        slice_dir = tmp_path / f"cp_slice_{i}"
        spark.createDataFrame(part).coalesce(1).write.parquet(str(slice_dir))
        src = glob.glob(str(slice_dir / "part-*.parquet"))[0]
        path = in_dir / f"{i:03d}.parquet"
        shutil.copy(src, path)
        mtime = time.time() - 30 + i * 10
        os.utime(path, (mtime, mtime))

    schema = zoned.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    result = zone_stream.streaming_co_presence(stream, w_us)
    q = (
        result.writeStream.format("memory")
        .queryName("cop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.uid_a, r.uid_b, r.zone_id, r.tus_a, r.tus_b)
        for r in spark.table("cop").collect()
    }
    want = {
        (r.uid_a, r.uid_b, r.zone_id, r.tus_a, r.tus_b)
        for r in mobility.co_presence_pairs(zoned, w_us).collect()
    }
    assert want  # the fixture must actually produce contacts
    assert got == want


def test_streaming_geohash_counts_matches_batch(spark, sited_static, tmp_path):
    """The r5 geohash rollup is a pure projection + aggregate, so the
    SAME operator body must run on a streaming frame (complete-mode
    global aggregate) and agree with batch after a bounded drain —
    the module's stream == batch contract extended to the new op."""
    import glob
    import shutil

    from cdr_analysis_tools_hadoop_spark.operators import tiling

    pdf = sited_static.orderBy("call_time", "event_id").toPandas()
    n = len(pdf)
    cuts = [0, n // 2, n]
    in_dir = tmp_path / "gh_stream_in"
    in_dir.mkdir()
    for i in range(2):
        part = pdf.iloc[cuts[i]:cuts[i + 1]]
        slice_dir = tmp_path / f"gh_slice_{i}"
        spark.createDataFrame(part).coalesce(1).write.parquet(str(slice_dir))
        src = glob.glob(str(slice_dir / "part-*.parquet"))[0]
        shutil.copy(src, in_dir / f"{i:03d}.parquet")

    schema = spark.createDataFrame(pdf.iloc[:1]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    res = tiling.geohash_counts(stream)
    zone_stream.run_available_now(
        res, "ghc", str(tmp_path / "gh_ckpt"), output_mode="complete"
    )
    got = {r.geohash: r.n_events for r in spark.table("ghc").collect()}
    want = {
        r.geohash: r.n_events
        for r in tiling.geohash_counts(sited_static).collect()
    }
    assert got == want and len(want) > 10
