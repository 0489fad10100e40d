"""spark-submit entry point for the flagship pipeline (north-rule
deployment shape: ``spark-submit --py-files dist/engine.zip``).

Runs images -> decode-validate -> anchor -> PIP zone -> tile ->
zone/tile rollup and lands the result as a zone-partitioned parquet
table through the resumable checkpoint manifest
(plans/checkpoint.write_partitioned): a killed run resumes and writes
only the missing zone partitions, with per-partition rows/sec and
lineage recorded in ``<out>/_manifest.jsonl``.

Usage:
  tools/make_pyfiles.sh
  spark-submit --master <cluster-or-local[N]> \
      --py-files dist/engine.zip tools/submit_pipeline.py \
      <images_parquet> <out_path> [chunks]

With the optional ``chunks`` argument the run is ALSO resumable on
the input side (pipeline.run_pipeline_resumable): the image files
are grouped into that many chunks, each chunk commits its partial
rollup + manifest row as its own action, and a killed job rerun
skips committed chunks — work lost is bounded by one chunk.

No master / cores are set here — they come from spark-submit, exactly
as they would on a multi-executor cluster.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from cdr_analysis_tools_hadoop_spark import pipeline
from cdr_analysis_tools_hadoop_spark.plans import checkpoint
from cdr_analysis_tools_hadoop_spark.session import engine_conf


def main(images_path: str, out_path: str, chunks: int | None = None) -> None:
    builder = SparkSession.builder.appName("spatial-image-rollup")
    spark = builder.getOrCreate()
    # master + memory come from spark-submit; the engine's SQL conf
    # (AQE, Arrow, dynamic overwrite, scan sizing) follows the granted
    # parallelism exactly as build_session does for in-process runs
    cores = int(spark.sparkContext.defaultParallelism)
    for k, v in engine_conf(max(2 * cores, 8)).items():
        spark.conf.set(k, v)
    if chunks is not None:
        summary = pipeline.run_pipeline_resumable(
            spark, images_path, out_path, chunks=chunks
        )
    else:
        images = spark.read.parquet(images_path)
        rollup = pipeline.run_pipeline(spark, images)
        summary = checkpoint.write_partitioned(rollup, out_path, "zone_id")
    print("SUBMIT_SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) not in (3, 4):
        raise SystemExit(__doc__)
    main(
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]) if len(sys.argv) == 4 else None,
    )
