"""sf0.1 timings for the round-5 operators: prefix-filtered Jaccard
(vs the plain sparse join on the same corpus), the DP zone / OD
releases, the leakage-safe group split, the geohash rollup, and
Douglas-Peucker trace simplification — same per-attempt
hypervisor-steal gating as tools/lateops_bench.py (clean = steal <=
2% of busy time, >= 2 clean attempts, median of clean, all attempts
disclosed).

Also scales the prefix-vs-sparse comparison onto a corpus with a
PLANTED boilerplate shingle (every doc shares one bigram) at 50k
docs, where the sparse join's hot-key term is C(50k, 2) ~ 1.25e9
candidate pairs and the prefix join's is ~0 — the measured form of
the operator's scale claim.

Prints one JSON line; paste the table into BENCH/PLANS.md notes.

Usage: python tools/r5ops_bench.py [n_boiler_docs] [repeats]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from lateops_bench import _timed_clean  # noqa: E402  (shared protocol)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_boiler = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from cdr_analysis_tools_hadoop_spark.operators import (
        dedup,
        interpolation,
        prepare,
        sampling,
        tiling,
        trajectory,
        zones,
    )
    from cdr_analysis_tools_hadoop_spark.session import build_session
    from cdr_analysis_tools_hadoop_spark.sources import synthetic

    spark = build_session("r5ops-bench", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").localCheckpoint()
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").localCheckpoint()
    cdr = prepare.events_as_cdr(spark, SF_DIR).localCheckpoint()
    towers = synthetic.towers_df(spark, SF_DIR)
    zoned = zones.assign_zone(cdr, towers).localCheckpoint()
    sited = trajectory.with_site(zoned)
    home = trajectory.user_home_site(sited)
    edges = trajectory.od_edges(sited, home).localCheckpoint()

    results: dict[str, object] = {"sf_dir": SF_DIR}

    def point(name, fn):
        fn()  # warm-up
        r = _timed_clean(fn, repeats)
        results[name] = r
        print(name, r["median_sec"], "s", "(DIRTY)" if r["dirty"] else "")

    point("prefix_jaccard", lambda: dedup.prefix_jaccard_pairs(docs).count())
    point(
        "ngram_jaccard_same_threshold",
        lambda: dedup.ngram_jaccard_pairs(
            docs, threshold=dedup.PREFIX_JACCARD_THRESHOLD
        ).count(),
    )
    point("dp_zone_counts", lambda: zones.dp_zone_counts(zoned).count())
    point("od_matrix_dp", lambda: trajectory.od_sum_dp(edges).count())
    point(
        "group_split_stats",
        lambda: sampling.group_split_stats(events).count(),
    )
    point("geohash_counts", lambda: tiling.geohash_counts(cdr).count())
    point(
        "trajectory_simplify",
        lambda: interpolation.trajectory_simplify(cdr).count(),
    )

    # --- boilerplate-skew axis: every doc shares one bigram ---
    boiler = (
        spark.range(0, n_boiler, 1, 32)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                "concat_ws(' ', transform(sequence(0, 11), "
                "j -> concat('w', id, 'x', j)), 'wiki footer')"
            ).alias("text"),
        )
        .localCheckpoint()
    )
    point(
        "prefix_jaccard_boiler_50k",
        lambda: dedup.prefix_jaccard_pairs(boiler).count(),
    )
    # the sparse join at the same threshold pays the C(n,2) hot-key
    # term from 'wiki footer' — measured with max_df=None would be
    # ~1.25e9 candidate rows; cap attempts via the operator's own
    # stop-shingle knob to show the knob's cost instead of stalling
    # the bench (the uncapped form is the point of the comparison and
    # is reported as the projected candidate count, not run)
    results["sparse_join_boiler_candidates_projected"] = (
        n_boiler * (n_boiler - 1) // 2
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
