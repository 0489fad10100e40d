"""10x timings for the late-r4 perplexity + spatially-constrained
near-dup operators (50k docs / 20k images on local[32]), with the
same per-attempt hypervisor-steal gating as tools/docops_bench.py.

Prints one JSON line; paste the table into BENCH/SF1.md. A run where
an op never gets 2 clean attempts is flagged dirty — report it as an
UPPER BOUND, never as a clean median.

Usage: python tools/newops_bench.py [n_docs] [n_images] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from cdr_analysis_tools_hadoop_spark.operators import (
        dedup, multimodal, textops,
    )
    from cdr_analysis_tools_hadoop_spark.session import build_session
    from cdr_analysis_tools_hadoop_spark.sources import synthetic

    spark = build_session("newops-bench")
    docs = synthetic.documents_df(
        spark, n_docs, partitions=64
    ).localCheckpoint()
    imgs = synthetic.images_df(
        spark, n_images, partitions=64, dup_every=5
    ).localCheckpoint()

    box: dict[str, int] = {}
    ops = {
        "ngram_perplexity": lambda: box.__setitem__(
            "ngram_perplexity", textops.ngram_perplexity(docs).count()
        ),
        "simhash_geo_near_dup": lambda: box.__setitem__(
            "simhash_geo_near_dup", dedup.simhash_geo_near_dup(docs).count()
        ),
        # tight radius for the same pattern-space-saturation reason as
        # image_dup_clusters (BENCH/SF1.md): the synthetic generator's
        # self-similar pixels go quadratic at d<=6 beyond ~20k images
        "image_geo_near_dup_d2": lambda: box.__setitem__(
            "image_geo_near_dup_d2",
            multimodal.image_geo_near_dup(imgs, max_hamming=2).count(),
        ),
    }
    results = {}
    for name, fn in ops.items():
        fn()  # warm-up (plan compile, page cache)
        results[name] = _timed_clean(fn, repeats)
        results[name]["rows"] = box[name]
    print(json.dumps({"n_docs": n_docs, "n_images": n_images, "ops": results}))


if __name__ == "__main__":
    main()
