"""Benchmark runner (driver contract + BASELINE.md protocol).

Runs (a) the flagship image pipeline — decode-validate -> phash anchor
-> cell encode -> broadcast PIP join vs tower-Voronoi -> tile pyramid
-> zone/tile aggregate — over a deterministic parquet images table,
and (b) the headline analytics queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "e2e_sec", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "images_per_sec": <pipeline throughput>, "cpus": N, ...}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_IMAGES (default
60000), SPARK_GRAFT_BENCH_REPEATS (default 2).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdr_analysis_tools_hadoop_spark import pipeline
from cdr_analysis_tools_hadoop_spark.session import build_session
from cdr_analysis_tools_hadoop_spark.sources import synthetic

HEADLINE = [
    "zone_population",
    "daily_statistics",
    "frequent_locations_thresholded",
    "od_matrix",
    "tile_counts_z12",
    "knn_nearest_tower",
    "trip_segments",
    "dedup_minhash_lsh",
    "ann_cosine_topk_lsh",
    "embedding_near_dup",
]


def ensure_images(spark, n: int, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    # 256 files regardless of level: both levels read identical input,
    # and 8 task-waves at 32 cores keeps stragglers from dominating
    # the N vs 4N efficiency comparison. Uncompressed parquet: the
    # blobs are already zlib streams, so a parquet codec would burn
    # scan CPU for ~0 ratio.
    synthetic.images_df(spark, n, partitions=256).write.mode("overwrite").option(
        "compression", "none"
    ).parquet(path)


IMAGES_LAYOUT = "v2"  # bump when file count / codec / content changes


def _cpu_jiffies() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_images = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "480000"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = build_session("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    img_path = f"/tmp/spark_graft_bench/images_{IMAGES_LAYOUT}_{n_images}"
    ensure_images(spark, n_images, img_path)

    # --- flagship image pipeline (BASELINE metric: images/sec) ---
    images = spark.read.parquet(img_path)
    # TWO full warm-up runs: worker spawn + JIT + first-touch pages
    # take ~2 runs to reach steady state on this sandbox; a cold or
    # half-warm level wrecks the N vs 4N efficiency comparison.
    for _ in range(2):
        pipeline.run_pipeline(spark, images).count()
    runs = []
    for _ in range(repeats):
        t0 = time.time()
        pipeline.run_pipeline(spark, images).count()
        runs.append(time.time() - t0)
    pipe_sec = statistics.median(runs)

    # --- headline analytics queries ---
    import __spark_entry__ as entrymod

    cpu0 = _cpu_jiffies()
    qs = entrymod.queries()
    q_times: dict[str, float] = {}
    q_times["image_pipeline"] = round(pipe_sec, 3)
    for name in HEADLINE:
        if name not in qs:
            continue
        # one warm-up execution, then the timed one: the first action
        # of a query shape pays JIT/codegen-compile/worker-spawn that
        # a resident engine would not (each run builds a FRESH plan —
        # re-collecting the same DataFrame would reuse AQE stages and
        # measure nothing)
        qs[name](spark, sf_dir).count()
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        q_times[name] = round(time.time() - t0, 3)

    total = round(sum(q_times.values()), 3)
    # hypervisor-steal share of busy time over the analytics section:
    # this shared host gets multi-minute co-tenant bursts that slow
    # identical runs 2-4x (see BENCH/BASELINE.md); the number lets a
    # reader normalize a steal-contaminated bench record
    d = [y - x for x, y in zip(cpu0, _cpu_jiffies())]
    busy = d[0] + d[1] + d[2] + d[5] + d[6]
    steal_pct = round(100.0 * d[7] / max(d[7] + busy, 1), 1)
    print(
        json.dumps(
            {
                "metric": "e2e_sec",
                "value": total,
                "unit": "sec",
                "queries": q_times,
                "sf": sf,
                "images_per_sec": round(n_images / pipe_sec, 1),
                "n_images": n_images,
                "cpus": cpus,
                "host_steal_pct": steal_pct,
            }
        )
    )


if __name__ == "__main__":
    main()
