"""Edge-case tests for the generic temporal operators
(operators/temporal.py): gap-boundary sessionization, as-of tie
semantics, and bin-boundary exactness of the range self-join.

The sf0.01 driver/oracle parity for the three contract queries lives
in __spark_entry__.py; these tests pin the semantics the oracle SQL
encodes, on hand-built fixtures where every boundary is exercised.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.operators import temporal

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def _events(spark, rows):
    return spark.createDataFrame(
        [(int(i), _ts(s), int(u)) for i, s, u in rows],
        "event_id long, ts timestamp, user_id long",
    )


def test_sessionize_gap_boundary_is_exclusive(spark):
    # gap == gap_us stays in-session; gap_us + 1 us starts a new one.
    gap_us = 10_000_000  # 10 s
    ev = _events(
        spark,
        [
            (1, 0.0, 7),
            (2, 10.0, 7),          # exactly 10 s later -> same session
            (3, 20.000001, 7),     # 10 s + 1 us -> new session
        ],
    )
    out = temporal.sessionize(ev, gap_us=gap_us).orderBy("session_idx").collect()
    assert [(r.session_idx, r.n_events) for r in out] == [(1, 2), (2, 1)]
    assert out[0].duration_us == 10_000_000
    assert out[1].duration_us == 0


def test_sessionize_keys_are_independent(spark):
    ev = _events(spark, [(1, 0, 1), (2, 5, 2), (3, 100000, 1)])
    out = temporal.sessionize(ev, gap_us=1_000_000)
    got = {(r.user_id, r.session_idx): r.n_events for r in out.collect()}
    assert got == {(1, 1): 1, (1, 2): 1, (2, 1): 1}


def test_sessionize_single_exchange_plan(spark):
    ev = _events(spark, [(1, 0, 1), (2, 5, 1)])
    plan = temporal.sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    # lag, running sum, and the rollup all reuse ONE hash exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_inclusive_and_largest_id_tie(spark):
    left = _events(spark, [(100, 50, 1)]).select("event_id", "user_id", "ts")
    # two right rows at EXACTLY the left timestamp: largest id wins;
    # inclusion at equality proves the <= (not <) semantics.
    right = spark.createDataFrame(
        [(10, _ts(50), 1, "a"), (11, _ts(50), 1, "b"), (12, _ts(49), 1, "c")],
        "rid long, ts timestamp, user_id long, tag string",
    )
    out = temporal.asof_join(
        left,
        right,
        key_col="user_id",
        left_ts_col="ts",
        right_ts_col="ts",
        right_id_col="rid",
        payload_cols=("rid", "tag"),
    ).collect()
    assert len(out) == 1
    assert out[0].asof_rid == 11 and out[0].asof_tag == "b"


def test_asof_join_no_predecessor_yields_nulls(spark):
    left = _events(spark, [(100, 10, 1)]).select("event_id", "user_id", "ts")
    right = spark.createDataFrame(
        [(10, _ts(20), 1, "later")],
        "rid long, ts timestamp, user_id long, tag string",
    )
    out = temporal.asof_join(
        left, right, "user_id", "ts", "ts", "rid", ("rid", "tag")
    ).collect()
    assert out[0].asof_rid is None and out[0].asof_tag is None


def test_asof_join_matches_quadratic_reference(spark):
    # randomized parity vs the direct per-left-row max-filter join
    import random

    rnd = random.Random(42)
    lrows = [(i, rnd.uniform(0, 1000), rnd.randrange(5)) for i in range(80)]
    rrows = [(i, rnd.uniform(0, 1000), rnd.randrange(5)) for i in range(120)]
    left = _events(spark, lrows).select("event_id", "user_id", "ts")
    right = _events(spark, rrows).select(
        F.col("event_id").alias("rid"), "user_id", "ts"
    )
    got = {
        r.event_id: r.asof_rid
        for r in temporal.asof_join(
            left, right, "user_id", "ts", "ts", "rid", ("rid",)
        ).collect()
    }
    rmap = {}
    for rid, s, u in rrows:
        rmap.setdefault(u, []).append((s, rid))
    for lid, s, u in lrows:
        cands = [(rs, rid) for rs, rid in rmap.get(u, []) if rs <= s]
        want = max(cands, key=lambda t: (t[0], t[1]))[1] if cands else None
        assert got[lid] == want, lid


def test_range_neighbor_counts_bin_boundary(spark):
    # neighbours straddling a bucket boundary must still be found,
    # and |dt| == window is IN while window + 1 us is OUT.
    win = 10_000_000  # 10 s
    ev = _events(
        spark,
        [
            (1, 9.999999, 1),   # bin 0
            (2, 10.000001, 1),  # bin 1, dt = 2 us -> neighbour
            (3, 19.999999, 1),  # dt to #1 exactly 10 s -> neighbour
            (4, 30.0, 1),       # dt to #3 10.000001 s -> NOT a neighbour
            (5, 0.0, 2),        # other key, isolated -> 0
        ],
    )
    out = {
        r.event_id: r.n_neighbors
        for r in temporal.range_neighbor_counts(ev, window_us=win).collect()
    }
    assert out == {1: 2, 2: 2, 3: 2, 4: 0, 5: 0}


def test_range_neighbor_counts_no_dup_candidates(spark):
    # same-bin pairs must be counted once despite the 3-bin probe
    ev = _events(spark, [(1, 1.0, 1), (2, 2.0, 1)])
    out = {
        r.event_id: r.n_neighbors
        for r in temporal.range_neighbor_counts(
            ev, window_us=10_000_000
        ).collect()
    }
    assert out == {1: 1, 2: 1}


def test_range_neighbor_counts_ids_unique_per_key_only(spark):
    # ids that restart per key (per-user sequence numbers) must not
    # merge counts across keys: the aggregate and spine join key on
    # (key, id), not the id alone
    win = 10_000_000
    ev = _events(
        spark,
        [
            (1, 0.0, 1),  # user 1, event 1: one neighbour
            (2, 1.0, 1),
            (1, 100.0, 2),  # user 2 reuses ids; isolated events
            (2, 300.0, 2),
        ],
    )
    out = temporal.range_neighbor_counts(ev, window_us=win).collect()
    counts = sorted(r.n_neighbors for r in out)
    assert len(out) == 4  # one row per EVENT, not per distinct id
    assert counts == [0, 0, 1, 1]


def _typed_events(spark, rows):
    return spark.createDataFrame(
        [(int(i), _ts(s), int(u), t) for i, s, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_session_funnel_conversion_semantics(spark):
    # four sessions (gap 10 s): entry-then-goal converts; goal BEFORE
    # the first entry does not; entry-only and goal-only do not.
    ev = _typed_events(
        spark,
        [
            (1, 0.0, 1, "view"),
            (2, 1.0, 1, "purchase"),      # converted
            (3, 100.0, 1, "purchase"),
            (4, 101.0, 1, "view"),        # goal precedes entry -> no
            (5, 200.0, 1, "view"),        # entry only -> no
            (6, 300.0, 1, "purchase"),    # goal only -> no
        ],
    )
    out = {
        r.session_idx: r
        for r in temporal.session_funnel(ev, gap_us=10_000_000).collect()
    }
    assert [out[i].converted for i in (1, 2, 3, 4)] == [1, 0, 0, 0]
    assert out[1].n_entries == 1 and out[1].n_goals == 1
    assert out[2].first_entry_us > out[2].last_goal_us
    assert out[3].last_goal_us is None
    assert out[4].first_entry_us is None


def test_session_funnel_goal_at_entry_instant_converts(spark):
    # last_goal_us == first_entry_us is INCLUSIVE (>=, not >)
    ev = _typed_events(spark, [(1, 5.0, 1, "view"), (2, 5.0, 1, "purchase")])
    out = temporal.session_funnel(ev, gap_us=10_000_000).collect()
    assert len(out) == 1 and out[0].converted == 1


def test_session_funnel_single_exchange_plan(spark):
    ev = _typed_events(spark, [(1, 0.0, 1, "view"), (2, 1.0, 1, "purchase")])
    plan = (
        temporal.session_funnel(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # label window, running sum, and the funnel rollup all reuse ONE
    # hash exchange on the key (same plan shape as sessionize)
    assert plan.count("Exchange hashpartitioning") == 1
