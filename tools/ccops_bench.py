"""Re-measure the connected-components-backed operators after the
alternating-star rewrite of dedup_clusters (Kiveris et al. SoCC'14;
replaced the min-label + label-jump loop whose jump target — a local
minimum pointing at itself — made convergence O(diameter)), plus the
10x stay-point DBSCAN entries, with the same per-attempt
hypervisor-steal gating as tools/docops_bench.py.

Entries:
  - dedup_clusters over the 50k-doc MinHash-LSH pair graph
  - image_dup_clusters at 20k images, d<=2 (dense graph)
  - stay_point_clusters at sf0.1 (18118 stays) at eps=3000 m
    (percolated: ONE component spanning every stay — the
    diameter-heavy shape the old loop paid 35 rounds for) and at
    the density-scaled eps=949 m (3000/sqrt(10): holds mean
    neighbor count at the sf0.01-certified level as density grows
    10x; 455 clusters — the old loop did NOT converge here in 20
    rounds at all)

Usage: python tools/ccops_bench.py [n_docs] [repeats]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from docops_bench import _timed_clean  # noqa: E402  (same steal gate)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cdr_analysis_tools_hadoop_spark.operators import (
        dedup, interpolation, multimodal, prepare, spatialstats,
    )
    from cdr_analysis_tools_hadoop_spark.session import build_session
    from cdr_analysis_tools_hadoop_spark.sources import synthetic

    spark = build_session("ccops-bench")
    docs = synthetic.documents_df(spark, n, partitions=64).localCheckpoint()
    pairs = dedup.minhash_lsh_pairs(docs).localCheckpoint()
    n_img = min(n, 20_000)
    imgs = synthetic.images_df(spark, n_img, partitions=64, dup_every=5)
    stays = interpolation.stay_points(
        prepare.events_as_dwell_cdr(spark, sf_dir)
    ).localCheckpoint()

    box: dict[str, int] = {}
    ops = {
        "dedup_clusters_50k": lambda: box.__setitem__(
            "dedup_clusters_50k",
            dedup.dedup_clusters(docs, pairs=pairs)
            .filter("cluster_id != doc_id")
            .count(),
        ),
        "image_dup_clusters_20k_d2": lambda: box.__setitem__(
            "image_dup_clusters_20k_d2",
            multimodal.image_dup_clusters(imgs, 2, n_hint=n_img)
            .filter("NOT is_representative")
            .count(),
        ),
        "stay_point_clusters_sf01_eps3000": lambda: box.__setitem__(
            "stay_point_clusters_sf01_eps3000",
            spatialstats.stay_point_clusters(stays)
            .filter("cluster_id IS NOT NULL")
            .count(),
        ),
        "stay_point_clusters_sf01_eps949": lambda: box.__setitem__(
            "stay_point_clusters_sf01_eps949",
            spatialstats.stay_point_clusters(stays, eps_m=949.0)
            .filter("cluster_id IS NOT NULL")
            .count(),
        ),
    }
    results = {}
    for name, fn in ops.items():
        fn()  # warm-up (plan compile, page cache)
        results[name] = _timed_clean(fn, repeats)
        results[name]["rows"] = box[name]
        print(f"# {name}: {results[name]['median_sec']}s "
              f"rows={box[name]} dirty={results[name]['dirty']}",
              file=sys.stderr)
    print(json.dumps({"n_docs": n, "sf_dir": sf_dir, "ops": results}))


if __name__ == "__main__":
    main()
