"""Skew layer: guard-first OD/collect, salting helpers, PIP hotspot.

The reference's only skew guard is the 500-event trajectory cap
(insert_la_cdr_all_with_ant_zone_by_uid_od.sql:6 ``size(arr)<=500``).
The engine applies the SAME cap but BEFORE the (uid, pdt) window /
collect (broadcast anti-join of the rare over-cap groups), so a viral
uid is dropped in the scan stage instead of being sorted or
materialized in one reducer first. These tests pin (a) that the
guard-first plan is what runs, (b) that its output is identical to
the naive filter-after-window form, and (c) that the salting helpers
are exact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.operators import salting, trajectory
from cdr_analysis_tools_hadoop_spark.sources import synthetic


@pytest.fixture(scope="module")
def skewed(spark):
    # 60k events, 30% owned by uid 0 -> its (uid, pdt) groups hold
    # ~600 events each, over the 500 cap; normal uids hold ~1-2/day
    return synthetic.sited_events_df(
        spark, 60_000, hot_uid_frac=0.3, n_uids=1_000, partitions=16
    ).localCheckpoint()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_od_edges_guard_first_plan(skewed):
    home = trajectory.user_home_site(skewed)
    plan = _plan(trajectory.od_edges(skewed, home))
    # the cap guard must be a broadcast ANTI join (rare hot groups),
    # not a count-window + post-filter
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


def test_od_edges_matches_explicit_prefilter(skewed):
    """Guard-first output == od_edges over an input with the hot
    groups already removed (on this fixture ONLY uid 0's groups are
    over the cap, so the guard must behave exactly like that
    pre-filter — whole groups drop, survivors keep identical lag/lead
    neighbourhoods)."""
    home = trajectory.user_home_site(skewed)
    got = trajectory.od_edges(skewed, home)
    ref = trajectory.od_edges(skewed.filter(F.col("uid") != 0), home)
    # hot uid 0 fully dropped (its groups are all over the cap)
    assert got.filter(F.col("uid") == 0).count() == 0
    assert got.count() == ref.count() > 0
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_collect_trajectories_drops_hot_group_without_building_it(skewed):
    out = trajectory.collect_trajectories(skewed)
    assert out.filter(F.col("uid") == 0).count() == 0
    sizes = out.select(F.max(F.size("arr")).alias("m")).collect()[0].m
    assert sizes <= trajectory.MAX_TRAJECTORY
    assert "LeftAnti" in _plan(out)


def test_salted_count_exact(skewed):
    plain = {
        (r.uid,): r.cnt
        for r in skewed.groupBy("uid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {
        (r.uid,): r["count"]
        for r in salting.salted_count(skewed, ["uid"], "event_id").collect()
    }
    assert plain == salted


def test_salted_count_distinct_exact(skewed):
    plain = {
        r.uid: r.d
        for r in skewed.groupBy("uid")
        .agg(F.countDistinct("site").alias("d"))
        .collect()
    }
    salted = {
        r.uid: r.distinct_site
        for r in salting.salted_count_distinct(skewed, ["uid"], "site").collect()
    }
    assert plain == salted


def test_salted_collect_sorted_exact(skewed):
    small = skewed.filter(F.col("uid") % 100 == 1)
    plain = {
        r.uid: [tuple(p) for p in r.arr]
        for r in small.groupBy("uid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("call_time", "event_id", "site"))
            ).alias("arr")
        )
        .collect()
    }
    salted = {
        r.uid: [tuple(p) for p in r.arr]
        for r in salting.salted_collect_sorted(
            small, ["uid"], ["call_time", "event_id", "site"], "event_id"
        ).collect()
    }
    assert plain == salted


def test_pip_hotspot_assigns_correctly(spark):
    """A tower-hotspot point pile must still get correct zone
    assignments (the vectorized kernel groups by cell — one huge
    group is fine) and the plan stays map-only (no shuffle)."""
    import numpy as np

    from cdr_analysis_tools_hadoop_spark.operators import spatial_join

    towers = synthetic.towers_np()
    polys = list(
        zip(towers[:, 0].astype(np.int64), synthetic.voronoi_polygons(towers))
    )
    pts = synthetic.points_df(spark, 20_000, hotspot_frac=0.5, partitions=8)
    out = spatial_join.pip_join(pts, polys, out_col="zone")
    assigned = out.filter(F.col("zone").isNotNull()).count()
    assert assigned == 20_000  # Voronoi covers the whole bbox
    plan = _plan(out)
    assert "Exchange" not in plan  # map-only: no shuffle for PIP


def test_zone_raster_plan_is_pure_projection(spark, sf_dir):
    """The raster op must stay a generated projection: Range source,
    no scan, no Exchange, no Join, no Python — the shape that makes
    rasterization embarrassingly parallel at any zoom."""
    from cdr_analysis_tools_hadoop_spark.operators import tiling
    from cdr_analysis_tools_hadoop_spark.sources import synthetic as syn

    towers = syn.towers_df(spark, sf_dir)
    df = tiling.zone_raster(spark, towers, zoom=13)
    df.collect()
    plan = _plan(df)
    assert "Range" in plan
    for node in ("Exchange", "Join", "Scan parquet", "Python", "InArrow"):
        assert node not in plan, node


def test_mixture_resample_no_fact_shuffle(spark, sf_dir):
    """The corpus side of mixture_resample must reach the output
    through broadcast joins only — every hash Exchange in the plan
    belongs to the bounded quota/total aggregates, never to the
    per-doc projection (the fact table never shuffles)."""
    from cdr_analysis_tools_hadoop_spark.operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = sampling.mixture_resample(docs)
    df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # hash exchanges exist only under aggregates (the quota table):
    # the top-level output node chain must be projection over the
    # broadcast join, not an exchange
    head = plan.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in head
