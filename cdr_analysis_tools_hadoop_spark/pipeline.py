"""Flagship benchmark pipeline (BASELINE.md protocol):

  images -> decode-validate (Arrow kernel) -> phash->anchor (JVM expr)
         -> H3-style cell encode (JVM expr)
         -> broadcast PIP join vs tower-Voronoi polygons
            (cell cover + ray-cast refine, operators/spatial_join.py)
         -> tile-pyramid assignment (JVM expr)
         -> zone/tile aggregates

Measured metric: images/sec end-to-end. The decode stage validates the
input_hint invariants inline (PSNR >= 40 dB on a lossy re-encode,
pixel-phash computed from decoded bytes).

Scale design: the only shuffle in the whole job is the final
aggregation (partial map-side combine + AQE-coalesced exchange);
decode, anchor, cell, PIP, and tiling are all map-only over the
input partitioning, so throughput scales linearly with executors
until the aggregate's tiny output dominates — the property the
N vs 4N efficiency criterion checks.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, DoubleType, LongType, StringType, StructField, StructType,
)

from .functions import codec, geo
from .operators import spatial_join
from .sources import synthetic

# PSNR >= 40 dB  <=>  MSE <= 255^2 * 1e-4  <=>  SSE <= gate*N
_MSE_GATE = 255.0**2 * 1e-4
# qnt4 round-trip residual: quantizing the low 2 bits to 2 leaves
# (v & 3) - 2, so SSE is a 4-entry LUT sum
_SQERR_LUT = np.array([4, 1, 0, 1], dtype=np.uint8)


def _decode_and_gate(rb, want_luma: bool):
    """The ONE decode + PSNR-gate block both Arrow kernels share
    (decode_validate and the fused run_pipeline kernel previously
    carried drifting copies): zero-copy offsets-buffer slicing of the
    ``bytes`` column, codec decode, shape-grouped SSE gate, optional
    mean luma. Returns (pix_list, ok_bool, mean_luma_or_None)."""
    barr = rb.column(rb.schema.get_field_index("bytes"))
    _validity, offbuf, databuf = barr.buffers()
    # binary arrays carry int32 offsets; honor the slice offset
    offs = np.frombuffer(offbuf, dtype=np.int32)[
        barr.offset : barr.offset + len(barr) + 1
    ]
    data = memoryview(databuf)
    pix_list = [
        codec.decode(data[offs[i] : offs[i + 1]]) for i in range(len(barr))
    ]
    n = len(pix_list)
    ok = np.empty(n, dtype=bool)
    ml = np.empty(n) if want_luma else None
    # vectorize across same-shaped images: one stacked numpy op per
    # distinct (h, w, c) instead of per image (the channel count is
    # part of the key — same-sized gray and RGB must not co-stack)
    shapes = np.array(
        [p.shape[0] << 24 | p.shape[1] << 8 | p.shape[2] for p in pix_list]
    )
    for s in np.unique(shapes):
        idxs = np.nonzero(shapes == s)[0]
        stack = np.stack([pix_list[i] for i in idxs])
        k, h, w, c = stack.shape
        if want_luma:
            csum = stack.sum(axis=(1, 2), dtype=np.int64)
            lw = (
                np.array([0.299, 0.587, 0.114])
                if c == 3
                else np.full(c, 1.0 / c)
            )
            ml[idxs] = (csum @ lw) / (h * w)
        sse = _SQERR_LUT[stack & 3].sum(axis=(1, 2, 3), dtype=np.int64)
        ok[idxs] = sse <= _MSE_GATE * (h * w * c)
    return pix_list, ok, ml


def decode_validate(images: DataFrame) -> DataFrame:
    """Decode every blob, check the PSNR gate, keep (image_id, phash,
    caption_len, mean_luma, psnr_ok).

    Performance-critical design (this is the 100 TB hot path):

    - ``mapInArrow``, not ``mapInPandas``: the binary column is read
      by zero-copy slicing of the Arrow data buffer (offsets + one
      memoryview) — no per-row Python ``bytes`` objects, no pandas
      block consolidation. On this sandbox that removed most of the
      30-60%% *kernel* (sy) time the pandas path spent allocating and
      copying per-row objects across 32 workers.
    - caption never crosses into Python: ``length(caption)`` is
      computed JVM-side before the UDF, so Arrow ships only
      (image_id, phash, caption_len, bytes) in and 3 small arrays
      out; image_id/phash/caption_len pass through as the SAME Arrow
      buffers (zero copy in and out).
    - integer-only reductions: mean luma from per-channel uint8 sums;
      PSNR gate via sum of (r-2)^2 on the low 2 bits (the qnt4
      round-trip residual), so no float expansion of pixel data. The
      old f32 tensordot path moved ~150 KB of memory traffic per
      12 KB image and flatlined beyond 8 cores on this box's
      ~40 GB/s memory bandwidth.
    """
    out_schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("phash", LongType()),
            StructField("caption_len", LongType()),
            StructField("mean_luma", DoubleType()),
            StructField("psnr_ok", BooleanType()),
        ]
    )
    narrow = images.select(
        "image_id", "phash", F.length("caption").cast("long").alias("caption_len"), "bytes"
    )

    def kernel(batches):
        import pyarrow as pa

        for rb in batches:
            pix_list, ok, ml = _decode_and_gate(rb, want_luma=True)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),  # image_id: same Arrow buffer, zero copy
                    rb.column(1),  # phash
                    rb.column(2),  # caption_len
                    pa.array(ml, type=pa.float64()),
                    pa.array(ok, type=pa.bool_()),
                ],
                names=["image_id", "phash", "caption_len", "mean_luma", "psnr_ok"],
            )

    return narrow.mapInArrow(kernel, schema=out_schema)


def with_anchor(decoded: DataFrame) -> DataFrame:
    """phash -> anchor point, JVM-side expressions."""
    return decoded.select(
        "*",
        F.expr(geo.anchor_lat_sql("phash")).alias("lat"),
        F.expr(geo.anchor_lon_sql("phash")).alias("lon"),
    )


def broadcast_polygon_index(spark: SparkSession, pip_res: int = 8):
    """Build the tower-Voronoi PolygonIndex once and broadcast it;
    returns (broadcast, zone id strings). Shared by run_pipeline and
    its chunked resumable loop so the loop holds ONE broadcast."""
    towers = synthetic.towers_np(25)
    polys = list(
        zip(towers[:, 0].astype(np.int64), synthetic.voronoi_polygons(towers))
    )
    index = spatial_join.PolygonIndex(polys, pip_res)
    bc = spark.sparkContext.broadcast(index)
    return bc, [str(p) for p in index.ids]


def run_pipeline(
    spark: SparkSession,
    images: DataFrame,
    base_zoom: int = 14,
    pip_res: int = 8,
    index_bc=None,
) -> DataFrame:
    """Full pipeline; returns the per-(zone, tile) aggregate frame.

    FUSED hot path: decode-validate, phash->anchor, cell encode, PIP
    zone assignment and tile assignment all run inside ONE mapInArrow
    kernel, emitting only 5 small int columns per row; Spark finishes
    with a codegen'd two-phase hash aggregate (map-side partial +
    one tiny shuffle). Rationale, measured on this sandbox at 480k
    images: the staged plan (mapInArrow decode -> JVM anchor ->
    ArrowEvalPython PIP) spins up TWO python worker pools and pays
    two Arrow round trips; worker-side framework cost was ~2x the
    actual numpy kernel cost. One python stage halves that and makes
    the job scan -> map -> 17 MB shuffle -> 3k rows, which is also
    exactly the shape that scales to 10^12 rows on a real cluster
    (map-only until a trivially small aggregate).

    The composable operators (decode_validate, pip_join) remain the
    building blocks for ad-hoc queries; this fusion is the benchmark/
    production path for the full-table rollup. Both paths share the
    same kernels (codec.decode, PolygonIndex, assign_zone_np, *_np
    geo math), and tests assert fused == staged.

    ``index_bc``: a prebuilt ``broadcast_polygon_index(...)`` result.
    Loop callers (run_pipeline_resumable: one run_pipeline per chunk)
    MUST pass it — rebuilding the tessellation and broadcasting a
    fresh never-destroyed PolygonIndex per chunk accumulates one
    broadcast copy per chunk in driver and executor memory for the
    session lifetime.
    """
    bc, id_strs = index_bc or broadcast_polygon_index(spark, pip_res)

    out_schema = StructType(
        [
            StructField("pidx", LongType()),
            StructField("x", LongType()),
            StructField("y", LongType()),
            StructField("psnr_ok", LongType()),
            StructField("caption_len", LongType()),
        ]
    )
    narrow = images.select(
        "phash", F.length("caption").cast("long").alias("caption_len"), "bytes"
    )

    def kernel(batches):
        import pyarrow as pa

        idx = bc.value
        for rb in batches:
            # only the PSNR gate feeds the rollup — mean_luma is
            # column-pruned (want_luma=False) exactly as Catalyst
            # would prune it in the staged plan (decode_validate
            # still computes it for consumers that select it)
            _, ok_b, _ml = _decode_and_gate(rb, want_luma=False)
            ok = ok_b.astype(np.int64)
            phash = rb.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            lat = geo.anchor_lat_np(phash)
            lon = geo.anchor_lon_np(phash)
            cells = geo.cell_id_np(lat, lon, idx.res)
            pidx = spatial_join.assign_zone_np(idx, cells, lat, lon)
            x, y = geo.tile_xyz_np(lat, lon, base_zoom)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(pidx, type=pa.int64()),
                    pa.array(x, type=pa.int64()),
                    pa.array(y, type=pa.int64()),
                    pa.array(ok, type=pa.int64()),
                    rb.column(1),  # caption_len passthrough (zero copy)
                ],
                names=["pidx", "x", "y", "psnr_ok", "caption_len"],
            )

    ids_arr = F.array(*[F.lit(s) for s in id_strs])
    compact = narrow.mapInArrow(kernel, schema=out_schema)
    return (
        compact.withColumn(
            "zone_id",
            F.when(
                F.col("pidx") >= 0,
                F.element_at(ids_arr, (F.col("pidx") + F.lit(1)).cast("int")),
            ),
        )
        .groupBy("zone_id", "x", "y")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("psnr_ok").alias("n_psnr_ok"),
            F.sum("caption_len").alias("caption_bytes"),
        )
    )


def run_pipeline_resumable(
    spark: SparkSession,
    images_path: str,
    out_path: str,
    chunks: int = 8,
    max_chunks: int | None = None,
    base_zoom: int = 14,
    pip_res: int = 8,
) -> dict:
    """Input-side resumable form of run_pipeline: the image table's
    files are deterministically grouped into ``chunks`` chunks (file
    ``i`` of the sorted listing -> chunk ``i % chunks`` — the
    stand-in for "one chunk per Iceberg input partition"); each chunk
    runs the fused pipeline as its OWN action and commits its partial
    rollup under ``chunk=<i>/`` plus a manifest row (images, seconds,
    images/sec, per-chunk file-list lineage, app id). A killed job
    rerun skips every committed chunk — work lost is bounded by one
    chunk, and completed cells are never recomputed (the north rule's
    resume clause, input side; plans/checkpoint.write_partitioned is
    the output-side complement used by tools/submit_pipeline.py).

    Valid because the rollup's aggregates (count, two sums) are
    decomposable: re-aggregating per-chunk partials with
    ``resumable_result`` is exactly the single-shot rollup
    (pytest-pinned against run_pipeline). Reference parity: the
    operator rerunning per-day INSERT OVERWRITE jobs by hand
    (queries/cdr_and_mapping/insert_consolidate_cdr.sql:1-3), made
    engine-owned.

    ``max_chunks`` bounds how many chunks this invocation commits
    (tests use it to simulate a kill between chunk commits).
    Returns a summary dict; read the final aggregate with
    ``resumable_result``.
    """
    from .plans import checkpoint

    if chunks < 1:
        raise ValueError("chunks must be >= 1")
    files = sorted(spark.read.parquet(images_path).inputFiles())
    assign = {i: files[i::chunks] for i in range(chunks)}
    fps = {i: checkpoint.files_fingerprint(assign[i]) for i in assign}

    manifest = checkpoint.read_manifest(out_path)
    done: dict[str, dict] = {
        m["partition"]: m for m in manifest if m.get("status") == "committed"
    }
    if not done and os.path.isdir(out_path):
        # entries this pipeline's own interrupted first-chunk write
        # leaves behind (chunk dirs, Spark markers) are safe: the
        # rerun dynamic-overwrites them. Anything ELSE is foreign
        # data that resumable_result would silently sum in — refuse.
        own = (
            lambda e: e == checkpoint.MANIFEST_NAME
            or e.startswith("chunk=")
            or e.startswith("_")
            or e.startswith(".")
        )
        stray = [e for e in os.listdir(out_path) if not own(e)]
        if stray:
            raise ValueError(
                f"{out_path} holds data but no committed chunk manifest "
                f"(e.g. {stray[0]!r}) — resumable_result would sum stale "
                "files in with the chunk partials; use a fresh out_path "
                "or clear this one"
            )
    # Strict lineage: unlike write_partitioned (disjoint OUTPUT
    # partitions, where mixing vintages is a caller's judgment call),
    # chunks are INPUT slices that resumable_result SUMS across — any
    # misalignment (changed file list, different chunk count, a
    # manifest written by the non-chunked path) double-counts or
    # drops input, so there is no allow_lineage_change escape hatch
    # here: clear the output and rerun.
    committed_ids: dict[str, int] = {}
    for part in done:
        pref, _, idx = part.partition("=")
        # isdecimal, not isdigit: exactly the characters int() accepts
        if pref != "chunk" or not idx.isdecimal():
            raise ValueError(
                f"{out_path} holds a manifest partition {part!r} not "
                "written by the chunked pipeline (write_partitioned "
                "output?) — use a fresh out_path"
            )
        committed_ids[part] = int(idx)
    # layout check FIRST (most informative): a committed chunk id past
    # the requested count means the chunk COUNT changed, whatever the
    # per-chunk lineage says
    for part, i in committed_ids.items():
        if i >= chunks:
            raise ValueError(
                f"{part} was committed with a different chunk count "
                f"(>= the requested {chunks}); rerun with the original "
                "chunk count, or clear the output to re-chunk"
            )
    for part, i in committed_ids.items():
        if done[part].get("lineage") != fps[i]:
            raise ValueError(
                f"{part} was committed from different input files "
                f"({done[part].get('lineage')} != {fps[i]}); the "
                "chunking is no longer aligned — clear the output and "
                "rerun (a partial mix would double-count or drop input)"
            )

    todo = [i for i in range(chunks) if f"chunk={i}" not in done]
    summary = {
        "chunks": chunks,
        "written": 0,
        "skipped": chunks - len(todo),
        "images": 0,
        "seconds": 0.0,
        "partitions": [],
    }
    app_id = spark.sparkContext.applicationId
    import time

    # dynamic overwrite: rewriting chunk=<i> must not clobber other
    # committed chunk directories under a vanilla session — set for
    # the duration of the writes only, then restore (a blanket
    # session mutation would silently change unrelated overwrites)
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prior = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    # ONE polygon-index broadcast for all chunks (see run_pipeline)
    shared_index = broadcast_polygon_index(spark, pip_res)
    try:
        for i in todo:
            if max_chunks is not None and summary["written"] >= max_chunks:
                break
            t0 = time.time()
            n_images = 0
            if assign[i]:
                part = run_pipeline(
                    spark,
                    spark.read.parquet(*assign[i]),
                    base_zoom,
                    pip_res,
                    index_bc=shared_index,
                ).withColumn("chunk", F.lit(i))
                part.write.mode("overwrite").partitionBy("chunk").parquet(
                    out_path
                )
                # per-chunk metric from the tiny committed rollup, not
                # a second pass over the input
                n_images = (
                    spark.read.parquet(f"{out_path}/chunk={i}")
                    .agg(F.sum("n_images"))
                    .collect()[0][0]
                    or 0
                )
            elapsed = time.time() - t0
            checkpoint.append_manifest(
                out_path,
                [
                    checkpoint.make_commit_record(
                        f"chunk={i}",
                        int(n_images),
                        elapsed,
                        fps[i],
                        app_id,
                        n_files=len(assign[i]),
                    )
                ],
            )
            summary["written"] += 1
            summary["images"] += int(n_images)
            summary["seconds"] = round(summary["seconds"] + elapsed, 3)
            summary["partitions"].append(f"chunk={i}")
    finally:
        spark.conf.set(conf_key, prior)
        # the loop's broadcast is dead once the chunks are written
        shared_index[0].unpersist()
    return summary


def resumable_result(spark: SparkSession, out_path: str) -> DataFrame:
    """Re-aggregate the per-chunk partial rollups into the exact
    single-shot run_pipeline result (count/sum are decomposable)."""
    return (
        spark.read.parquet(out_path)
        .groupBy("zone_id", "x", "y")
        .agg(
            F.sum("n_images").alias("n_images"),
            F.sum("n_psnr_ok").alias("n_psnr_ok"),
            F.sum("caption_bytes").alias("caption_bytes"),
        )
    )


def run_pipeline_staged(
    spark: SparkSession,
    images: DataFrame,
    base_zoom: int = 14,
    pip_res: int = 8,
) -> DataFrame:
    """Composed-operator variant of run_pipeline (same result); used
    by tests to assert the fused kernel matches the operator chain."""
    towers = synthetic.towers_np(25)
    polys = list(zip(towers[:, 0].astype(np.int64), synthetic.voronoi_polygons(towers)))
    anchored = with_anchor(decode_validate(images))
    zoned = spatial_join.pip_join(
        anchored, polys, lat_col="lat", lon_col="lon", out_col="zone_id", res=pip_res
    )
    tiled = zoned.select(
        "zone_id",
        "psnr_ok",
        "caption_len",
        F.expr(geo.tile_x_sql("lon", base_zoom)).alias("x"),
        F.expr(geo.tile_y_sql("lat", base_zoom)).alias("y"),
    )
    return tiled.groupBy("zone_id", "x", "y").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.col("psnr_ok").cast("long")).alias("n_psnr_ok"),
        F.sum("caption_len").alias("caption_bytes"),
    )
