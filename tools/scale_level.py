"""One scaling-bench level, launched via spark-submit --py-files.

This is the north rule's deployment shape verbatim:

  taskset -c 0-{N-1} spark-submit --master local[N] \
      --driver-memory 24g --py-files dist/engine.zip \
      tools/scale_level.py <images_parquet> <repeats> <max_attempts> \
      <steal_max_pct> <backoff_s>

The engine package is imported FROM THE ZIP, not the repo checkout:
this file lives in tools/ (which contains no package), so a successful
import proves dist/engine.zip is complete and self-contained — the
import origin is asserted and printed so the bench report can record
it. Timing protocol (owned by tools/scaling_bench.py, which launches
this): 2 warm-ups, then timed runs with per-run /proc/stat steal
telemetry until `repeats` clean runs or `max_attempts`.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def _cpu() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def main(
    img_path: str,
    repeats: int,
    max_attempts: int,
    steal_max_pct: float,
    backoff_s: float,
) -> None:
    import cdr_analysis_tools_hadoop_spark as engine
    from cdr_analysis_tools_hadoop_spark import pipeline
    from cdr_analysis_tools_hadoop_spark.session import engine_conf

    # prove the engine came from --py-files, not a checkout on the path
    origin = engine.__file__ or ""
    if ".zip" not in origin:
        raise AssertionError(
            f"engine imported from {origin!r}, not the --py-files zip — "
            "the packaged artifact was not what ran"
        )
    print(f"ENGINE_ORIGIN {origin}")

    # master + driver memory come from the spark-submit command line;
    # shuffle width follows the granted cores, as build_session does
    spark = SparkSession.builder.getOrCreate()
    cores = int(spark.sparkContext.defaultParallelism)
    for k, v in engine_conf(max(2 * cores, 8)).items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")

    images = spark.read.parquet(img_path)
    for _ in range(2):
        pipeline.run_pipeline(spark, images).count()

    attempts: list[dict] = []
    n_clean = 0
    while n_clean < repeats and len(attempts) < max_attempts:
        a = _cpu()
        t0 = time.time()
        pipeline.run_pipeline(spark, images).count()
        dt = time.time() - t0
        b = _cpu()
        d = [y - x for x, y in zip(a, b)]
        busy = d[0] + d[1] + d[2] + d[5] + d[6]  # user nice sys irq softirq
        steal = d[7]
        steal_pct = 100.0 * steal / max(steal + busy, 1)
        clean = steal_pct <= steal_max_pct
        attempts.append(
            {
                "sec": round(dt, 2),
                "steal_pct": round(steal_pct, 1),
                "clean": clean,
            }
        )
        if clean:
            n_clean += 1
        else:
            time.sleep(backoff_s)
    print("RESULT " + json.dumps(attempts))


if __name__ == "__main__":
    if len(sys.argv) != 6:
        raise SystemExit(__doc__)
    main(
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        float(sys.argv[4]),
        float(sys.argv[5]),
    )
