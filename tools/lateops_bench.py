"""10x timings for the remaining late-r4 operators: the commute
matrix and k-anonymity OD gate over the 20M-event hot-uid fixture,
the zone raster at a 4096x-denser grid (z19 vs the contract's z13),
the augmentation fan-out at 200k images, and mixture resampling at
50k docs — same per-attempt hypervisor-steal gating as
tools/newops_bench.py (clean = steal <= 2% of busy time, >= 2 clean
attempts required, median of clean attempts, all attempts disclosed).

Prints one JSON line; paste the table into BENCH/SF1.md.

Usage: python tools/lateops_bench.py [n_events] [n_images] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpu_counters() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(v) for v in parts[1:9]]
    idle = vals[3] + vals[4]
    steal = vals[7]
    busy = sum(vals) - idle - steal
    return busy, steal


def _timed_clean(fn, repeats: int, max_attempts: int = 8,
                 steal_max_pct: float = 2.0):
    attempts: list[dict] = []
    while len([a for a in attempts if a["clean"]]) < repeats and len(
        attempts
    ) < max_attempts:
        b0, s0 = _cpu_counters()
        t0 = time.time()
        fn()
        dt = time.time() - t0
        b1, s1 = _cpu_counters()
        steal_pct = 100.0 * (s1 - s0) / max((s1 - s0) + (b1 - b0), 1)
        attempts.append(
            {"sec": round(dt, 2), "steal_pct": round(steal_pct, 1),
             "clean": steal_pct <= steal_max_pct}
        )
    clean = sorted(a["sec"] for a in attempts if a["clean"])
    dirty = len(clean) < 2
    vals = clean or sorted(a["sec"] for a in attempts)
    return {
        "median_sec": vals[len(vals) // 2],
        "dirty": dirty,
        "attempts": attempts,
    }


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from cdr_analysis_tools_hadoop_spark.operators import (
        frequent_locations as fl,
    )
    from cdr_analysis_tools_hadoop_spark.operators import (
        multimodal, sampling, tiling, trajectory,
    )
    from cdr_analysis_tools_hadoop_spark.session import build_session
    from cdr_analysis_tools_hadoop_spark.sources import synthetic

    spark = build_session("lateops-bench")
    # same adversarial shape as the sf1 OD entry: one viral uid owns
    # 25% of all events
    sited = synthetic.sited_events_df(
        spark, n_events, hot_uid_frac=0.25, partitions=128
    ).localCheckpoint()
    home = trajectory.user_home_site(sited)
    towers = synthetic.towers_df(spark, SF_DIR)
    imgs = synthetic.images_df(
        spark, n_images, partitions=64, dup_every=5
    ).localCheckpoint()
    docs = synthetic.documents_df(
        spark, 50_000, partitions=64
    ).localCheckpoint()

    box: dict[str, int] = {}
    ops = {
        "commute_matrix_20m": lambda: box.__setitem__(
            "commute_matrix_20m", fl.commute_matrix(sited).count()
        ),
        "od_matrix_kanon_20m": lambda: box.__setitem__(
            "od_matrix_kanon_20m",
            trajectory.od_sum_kanon(
                trajectory.od_edges(sited, home)
            ).count(),
        ),
        # z19 = 4096x the contract query's z13 tile count over the
        # same extent: the scale axis of the generated-grid raster
        "zone_raster_z19": lambda: box.__setitem__(
            "zone_raster_z19",
            tiling.zone_raster(spark, towers, zoom=19).count(),
        ),
        "image_augment_200k": lambda: box.__setitem__(
            "image_augment_200k", multimodal.augment(imgs).count()
        ),
        "mixture_resample_50k": lambda: box.__setitem__(
            "mixture_resample_50k", sampling.mixture_resample(docs).count()
        ),
    }
    results = {}
    for name, fn in ops.items():
        fn()  # warm-up (plan compile, page cache)
        results[name] = _timed_clean(fn, repeats)
        results[name]["rows"] = box[name]
    print(json.dumps(
        {"n_events": n_events, "n_images": n_images, "ops": results}
    ))


if __name__ == "__main__":
    main()
