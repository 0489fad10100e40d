from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.operators import prepare, salting
from cdr_analysis_tools_hadoop_spark.plans import checkpoint
from cdr_analysis_tools_hadoop_spark.sources import synthetic
from cdr_analysis_tools_hadoop_spark.streaming import zone_stream


@pytest.fixture(scope="module")
def cdr(spark, sf_dir):
    return prepare.events_as_cdr(spark, sf_dir)


# ---------------------------------------------------------------------------
# checkpoint manifest


def test_checkpoint_write_then_resume_skips(cdr, tmp_path):
    out = str(tmp_path / "fact")
    df = cdr.withColumn("pdt", F.to_date("call_time").cast("string"))
    s1 = checkpoint.write_partitioned(df, out, "pdt")
    assert s1["written"] > 0 and s1["skipped"] == 0
    total = sum(m["rows"] for m in checkpoint.read_manifest(out))
    assert total == df.count()

    s2 = checkpoint.write_partitioned(df, out, "pdt")
    assert s2["written"] == 0 and s2["skipped"] == s1["written"]


def test_checkpoint_resumes_only_missing(cdr, tmp_path, spark):
    out = str(tmp_path / "fact2")
    df = cdr.withColumn("pdt", F.to_date("call_time").cast("string"))
    checkpoint.write_partitioned(df, out, "pdt")
    # simulate a kill: drop the last manifest line and its partition dir
    mp = os.path.join(out, checkpoint.MANIFEST_NAME)
    lines = open(mp).read().strip().split("\n")
    victim = json.loads(lines[-1])["partition"]
    open(mp, "w").write("\n".join(lines[:-1]) + "\n")
    s = checkpoint.write_partitioned(df, out, "pdt")
    assert s["written"] == 1 and s["partitions"] == [victim]
    # all partitions readable, full row count intact
    assert spark.read.parquet(out).count() == df.count()


def test_checkpoint_lineage_guard(cdr, tmp_path):
    out = str(tmp_path / "fact3")
    df = cdr.withColumn("pdt", F.to_date("call_time").cast("string"))
    checkpoint.write_partitioned(df, out, "pdt")
    mp = os.path.join(out, checkpoint.MANIFEST_NAME)
    lines = open(mp).read().strip().split("\n")
    doctored = [
        json.dumps({**json.loads(ln), "lineage": "deadbeef"}) for ln in lines
    ]
    # drop one partition so a resume would actually write
    victim = json.loads(lines[-1])["partition"]
    open(mp, "w").write("\n".join(doctored[:-1]) + "\n")
    with pytest.raises(ValueError, match="lineage"):
        checkpoint.write_partitioned(df, out, "pdt")
    s = checkpoint.write_partitioned(df, out, "pdt", allow_lineage_change=True)
    assert s["written"] == 1 and s["partitions"] == [victim]


def test_resumable_pipeline_kill_and_resume(spark, tmp_path):
    """North-rule resume clause, input side: a run killed between
    chunk commits resumes without recomputing completed chunks, and
    the re-aggregated partials equal the single-shot pipeline."""
    from cdr_analysis_tools_hadoop_spark import pipeline

    img_path = str(tmp_path / "imgs")
    synthetic.images_df(spark, 400, partitions=8).write.parquet(img_path)
    out = str(tmp_path / "rollup")

    # "kill" after 2 of 4 chunk commits (max_chunks bounds the run)
    s1 = pipeline.run_pipeline_resumable(spark, img_path, out, chunks=4, max_chunks=2)
    assert s1["written"] == 2 and s1["skipped"] == 0
    m1 = {m["partition"]: m for m in checkpoint.read_manifest(out)}
    assert len(m1) == 2

    # resume: only the 2 missing chunks run; committed rows untouched
    s2 = pipeline.run_pipeline_resumable(spark, img_path, out, chunks=4)
    assert s2["written"] == 2 and s2["skipped"] == 2
    m2 = checkpoint.read_manifest(out)
    assert {m["partition"] for m in m2} == {f"chunk={i}" for i in range(4)}
    for m in m2:
        if m["partition"] in m1:
            assert m == m1[m["partition"]]  # not recomputed or rewritten
    assert s1["images"] + s2["images"] == 400

    got = sorted(map(tuple, pipeline.resumable_result(spark, out).collect()))
    want = sorted(
        map(
            tuple,
            pipeline.run_pipeline(spark, spark.read.parquet(img_path)).collect(),
        )
    )
    assert got == want

    # idempotent: nothing left to do
    s3 = pipeline.run_pipeline_resumable(spark, img_path, out, chunks=4)
    assert s3["written"] == 0 and s3["skipped"] == 4

    # layout guard: a different chunk count misassigns files vs the
    # committed chunks — refuse (count check fires before lineage, so
    # the message names the actual cause, not "input files changed")
    with pytest.raises(ValueError, match="different chunk count"):
        pipeline.run_pipeline_resumable(spark, img_path, out, chunks=3)

    # same-count but different FILE LIST is the lineage refusal: drop
    # one committed row and point the same layout at different files
    # by re-chunking within range — simulate with a doctored manifest
    mp = os.path.join(out, checkpoint.MANIFEST_NAME)
    lines = open(mp).read().strip().split("\n")
    doctored = [
        json.dumps({**json.loads(ln), "lineage": "deadbeef"}) for ln in lines
    ]
    open(mp, "w").write("\n".join(doctored) + "\n")
    with pytest.raises(ValueError, match="different input files"):
        pipeline.run_pipeline_resumable(spark, img_path, out, chunks=4)
    open(mp, "w").write("\n".join(lines) + "\n")  # restore

    # foreign manifest: an out_path committed by the OUTPUT-side
    # write_partitioned path refuses cleanly, not with an IndexError
    out2 = str(tmp_path / "rollup2")
    rollup = pipeline.run_pipeline(spark, spark.read.parquet(img_path))
    checkpoint.write_partitioned(
        rollup.withColumn("zid", F.coalesce("zone_id", F.lit("none"))),
        out2,
        "zid",
    )
    with pytest.raises(ValueError, match="not written by the chunked"):
        pipeline.run_pipeline_resumable(spark, img_path, out2, chunks=4)

    # manifest-LESS stale data: plain parquet at out_path would be
    # silently summed in by resumable_result — refuse up front
    out3 = str(tmp_path / "rollup3")
    rollup.write.parquet(out3)
    with pytest.raises(ValueError, match="no committed chunk manifest"):
        pipeline.run_pipeline_resumable(spark, img_path, out3, chunks=4)


# ---------------------------------------------------------------------------
# salting


def test_salted_count_matches_plain(cdr):
    plain = {
        (r.uid,): r.n
        for r in cdr.groupBy("uid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r.uid,): r["count"]
        for r in salting.salted_count(cdr, ["uid"], "event_id").collect()
    }
    assert plain == salted


def test_salted_count_distinct_matches_plain(cdr):
    day = F.to_date("call_time").alias("pdt")
    df = cdr.select("uid", day, "event_id")
    plain = {
        r.pdt: r.n
        for r in df.groupBy("pdt").agg(F.countDistinct("uid").alias("n")).collect()
    }
    salted = {
        r.pdt: r.distinct_uid
        for r in salting.salted_count_distinct(df, ["pdt"], "uid").collect()
    }
    assert plain == salted


def test_salted_collect_sorted_matches_plain(cdr):
    small = cdr.filter(F.col("uid") < 5)
    plain = {
        r.uid: [tuple(p) for p in r.arr]
        for r in small.groupBy("uid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("call_time", "event_id"))
            ).alias("arr")
        )
        .collect()
    }
    salted = {
        r.uid: [tuple(p) for p in r.arr]
        for r in salting.salted_collect_sorted(
            small, ["uid"], ["call_time", "event_id"], "event_id", buckets=4
        ).collect()
    }
    assert plain == salted


# ---------------------------------------------------------------------------
# streaming


def test_stream_zone_counts_match_batch(spark, sf_dir, tmp_path):
    towers = synthetic.towers_df(spark, sf_dir)
    src = f"{sf_dir}/events.parquet"
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    import shutil

    shutil.copy(src, stream_dir / "part-0.parquet")
    events_path = str(stream_dir)
    cdr_like = lambda df: df.select(
        "event_id",
        F.col("ts"),
        F.expr(
            __import__(
                "cdr_analysis_tools_hadoop_spark.functions.geo", fromlist=["geo"]
            ).anchor_lat_sql("event_id")
        ).alias("lat"),
        F.expr(
            __import__(
                "cdr_analysis_tools_hadoop_spark.functions.geo", fromlist=["geo"]
            ).anchor_lon_sql("event_id")
        ).alias("lon"),
    )

    stream = zone_stream.read_events_stream(spark, events_path, events_path)
    result = zone_stream.zone_window_counts(
        cdr_like(stream), towers, ts_col="ts", window="1 day"
    )
    zone_stream.run_available_now(result, "zwc", str(tmp_path / "ckpt"))
    got = {
        (str(r.window_start), r.zone_id): r.n_events
        for r in spark.sql("SELECT * FROM zwc").collect()
    }

    batch = zone_stream.zone_window_counts(
        cdr_like(spark.read.parquet(events_path)), towers, ts_col="ts", window="1 day"
    )
    want = {
        (str(r.window_start), r.zone_id): r.n_events for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_spread_is_conditional(spark):
    """r3 verdict item 3: the corpus-spread helper must NOT bolt a
    full exchange onto a well-partitioned input — it returns the
    frame untouched (plan-identical, zero Exchange) when partitions
    >= the session parallelism, and still widens a single-file read."""
    from cdr_analysis_tools_hadoop_spark.plans.partitioning import spread

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, par * 2)
    assert spread(wide) is wide  # identity: no Exchange possible
    narrow = spark.range(0, 1000, 1, 1)
    widened = spread(narrow)
    assert widened is not narrow
    assert widened.rdd.getNumPartitions() == par
    # operator-level: a pre-partitioned corpus flows into the dedup
    # shingle stage with no RoundRobin repartition in the plan
    from cdr_analysis_tools_hadoop_spark.operators.dedup import _spread

    docs = spark.createDataFrame(
        [(i, f"doc text number {i}") for i in range(50)],
        "doc_id long, text string",
    ).repartition(par * 2)
    assert _spread(docs) is docs  # identity: dedup adds no Exchange


def test_estimate_rows_and_scaled_near_dup_default_hint(spark, sf_dir):
    """r3 verdict item 7: near_dup_pairs_scaled's default n_hint comes
    from plan statistics, not a planning-time count() job. The
    estimate is order-of-magnitude (recall-safe: banding re-derives
    bands from the recall curve), and the no-hint path still finds
    the seeded tight pairs."""
    from cdr_analysis_tools_hadoop_spark.operators import similarity
    from cdr_analysis_tools_hadoop_spark.plans.partitioning import estimate_rows
    from cdr_analysis_tools_hadoop_spark.sources import synthetic

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    est = estimate_rows(emb)
    actual = emb.count()
    assert est is not None and actual / 50 <= est <= actual * 50
    seeded = synthetic.embeddings_df(spark, 2_000, dup_every=10)
    got = {
        (r.vec_a, r.vec_b)
        for r in similarity.near_dup_pairs_scaled(seeded, 0.9).collect()
    }
    want = {(i - 1, i) for i in range(10, 2_000, 10)}
    assert len(want & got) / len(want) >= 0.95


def test_streaming_image_pipeline_matches_batch_and_resumes(spark, tmp_path):
    """The flagship image pipeline run as a Structured Streaming
    query: (1) stream output == batch run_pipeline on identical
    files; (2) new shards landing in the directory are picked up by
    a checkpoint-resumed run and the rollup matches batch over ALL
    files — the live-ingest twin of the resumable batch writer."""
    from cdr_analysis_tools_hadoop_spark import pipeline

    d = tmp_path / "imgs"
    synthetic.images_df(spark, 200, partitions=4).write.parquet(str(d))
    ckpt = str(tmp_path / "ckpt")

    stream = zone_stream.read_images_stream(spark, str(d), str(d))
    res = zone_stream.streaming_image_zone_tile_counts(spark, stream)
    zone_stream.run_available_now(res, "img_zt", ckpt)
    key = lambda r: (r.zone_id, r.x, r.y)
    val = lambda r: (r.n_images, r.n_psnr_ok, r.caption_bytes)
    got = {key(r): val(r) for r in spark.sql("SELECT * FROM img_zt").collect()}
    want = {
        key(r): val(r)
        for r in pipeline.run_pipeline(spark, spark.read.parquet(str(d))).collect()
    }
    assert got == want and len(got) > 20

    # a new shard lands: only ids >= 200 are new rows
    synthetic.images_df(spark, 300, partitions=2).filter(
        F.col("image_id") >= "img0000000200"
    ).write.mode("append").parquet(str(d))
    stream2 = zone_stream.read_images_stream(spark, str(d), str(d))
    res2 = zone_stream.streaming_image_zone_tile_counts(spark, stream2)
    zone_stream.run_available_now(res2, "img_zt2", ckpt)
    got2 = {
        key(r): val(r) for r in spark.sql("SELECT * FROM img_zt2").collect()
    }
    want2 = {
        key(r): val(r)
        for r in pipeline.run_pipeline(spark, spark.read.parquet(str(d))).collect()
    }
    assert got2 == want2
    assert sum(v[0] for v in got2.values()) == 300


def test_streaming_source_mixture_matches_batch(spark, sf_dir, tmp_path):
    """The document-ingest mixture monitor: stream output == batch on
    identical files (deterministic ingest time derived from doc_id)."""
    import shutil

    d = tmp_path / "docs"
    d.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", d / "part-0.parquet")

    def with_ts(df):
        return df.withColumn(
            "ts",
            F.expr(
                "timestamp_seconds(1700000000 + (doc_id % 7200) * 10)"
            ),
        )

    stream = zone_stream.read_images_stream(spark, str(d), str(d))
    res = zone_stream.streaming_source_mixture(with_ts(stream))
    zone_stream.run_available_now(res, "smix", str(tmp_path / "ck"))
    got = {
        (str(r.win_start), r.source): (r.n_docs, r.n_tokens)
        for r in spark.sql("SELECT * FROM smix").collect()
    }
    want = {
        (str(r.win_start), r.source): (r.n_docs, r.n_tokens)
        for r in zone_stream.streaming_source_mixture(
            with_ts(spark.read.parquet(str(d)))
        ).collect()
    }
    assert got == want and len(got) > 10
