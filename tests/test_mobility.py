"""Edge-case tests for the mobility indicators
(operators/mobility.py): closed-form rog vs a numpy reference,
entropy bounds, displacement ordering/tie-breaks, and the
single-exchange plan shapes the module docstring promises.

The sf0.01 oracle parity for the three contract queries lives in
__spark_entry__.py (radius_of_gyration / location_entropy /
user_displacement); these tests pin the semantics on hand-built
fixtures."""

from __future__ import annotations

import datetime as dt
import math

import pytest

import numpy as np

from cdr_analysis_tools_hadoop_spark.functions import geo
from cdr_analysis_tools_hadoop_spark.operators import mobility

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _cdr(spark, rows):
    """rows: (event_id, uid, sec_offset, lat, lon)."""
    return spark.createDataFrame(
        [
            (int(e), int(u), T0 + dt.timedelta(seconds=s), float(la), float(lo))
            for e, u, s, la, lo in rows
        ],
        "event_id long, uid long, call_time timestamp, lat double, lon double",
    )


def test_rog_zero_for_stationary_user(spark):
    cdr = _cdr(spark, [(1, 7, 0, 35.5, 139.5), (2, 7, 60, 35.5, 139.5)])
    row = mobility.radius_of_gyration(cdr).collect()[0]
    assert row.n_events == 2
    assert row.rog_m == 0.0


def test_rog_matches_numpy_moments(spark):
    rng = np.random.default_rng(11)
    lat = 35.0 + rng.random(40)
    lon = 139.0 + rng.random(40)
    cdr = _cdr(
        spark, [(i, 3, i, lat[i], lon[i]) for i in range(40)]
    )
    x = lat - geo.LAT0
    y = (lon - geo.LON0) * geo.LON_SCALE
    want = math.sqrt(x.var() + y.var()) * mobility.M_PER_DEG
    got = mobility.radius_of_gyration(cdr).collect()[0].rog_m
    assert abs(got - want) < 1e-3


def test_rog_single_aggregate_plan(spark):
    cdr = _cdr(spark, [(1, 1, 0, 35.1, 139.1), (2, 2, 0, 35.2, 139.2)])
    plan = (
        mobility.radius_of_gyration(cdr)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # closed-form moments: one hash exchange, no join, no window
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "Window" not in plan


def _zoned(spark, rows):
    return spark.createDataFrame(rows, "uid long, zone_id long")


def test_entropy_uniform_hits_ln_k(spark):
    # 3 zones x 2 visits each: H = ln 3, norm = 1
    z = _zoned(spark, [(1, z) for z in (10, 10, 11, 11, 12, 12)])
    row = mobility.location_entropy(z).collect()[0]
    assert row.n_zones == 3 and row.n_events == 6
    assert abs(row.entropy - math.log(3.0)) < 1e-6
    assert row.norm_entropy == 1.0


def test_entropy_single_zone_is_zero(spark):
    z = _zoned(spark, [(1, 5), (1, 5), (1, 5)])
    row = mobility.location_entropy(z).collect()[0]
    assert row.entropy == 0.0 and row.norm_entropy == 0.0


def test_entropy_skewed_matches_scipy_formula(spark):
    counts = {1: 7, 2: 2, 3: 1}
    rows = [(9, z) for z, c in counts.items() for _ in range(c)]
    row = mobility.location_entropy(_zoned(spark, rows)).collect()[0]
    p = np.array(list(counts.values()), dtype=float)
    p /= p.sum()
    want = float(-(p * np.log(p)).sum())
    assert abs(row.entropy - want) < 1e-6
    assert abs(row.norm_entropy - want / math.log(3.0)) < 1e-6


def test_displacement_single_event_user(spark):
    cdr = _cdr(spark, [(1, 4, 0, 35.5, 139.5)])
    row = mobility.user_displacement(cdr).collect()[0]
    assert (row.n_moves, row.total_travel_m, row.max_step_m) == (0, 0.0, 0.0)


def test_displacement_sums_consecutive_haversine(spark):
    pts = [(35.1, 139.1), (35.2, 139.3), (35.05, 139.25)]
    cdr = _cdr(spark, [(i, 2, i * 60, la, lo) for i, (la, lo) in enumerate(pts)])
    steps = [
        float(
            geo.haversine_np(
                np.array([pts[i][0]]),
                np.array([pts[i][1]]),
                np.array([pts[i + 1][0]]),
                np.array([pts[i + 1][1]]),
            )[0]
        )
        for i in range(2)
    ]
    row = mobility.user_displacement(cdr).collect()[0]
    assert row.n_moves == 2
    assert abs(row.total_travel_m - sum(steps)) < 1e-2
    assert abs(row.max_step_m - max(steps)) < 1e-2


def test_displacement_equal_ts_tie_breaks_on_event_id(spark):
    # same timestamp: order is event_id 1 -> 2, so the step is A->B,
    # not B->A along some other order (distance is symmetric; assert
    # via THREE points where order changes the path total)
    a, b, c = (35.0, 139.0), (35.5, 139.5), (35.0, 139.9)
    cdr = _cdr(
        spark,
        [(1, 6, 0, *a), (2, 6, 0, *b), (3, 6, 60, *c)],
    )
    hav = lambda p, q: float(
        geo.haversine_np(
            np.array([p[0]]), np.array([p[1]]), np.array([q[0]]), np.array([q[1]])
        )[0]
    )
    want = hav(a, b) + hav(b, c)
    row = mobility.user_displacement(cdr).collect()[0]
    assert abs(row.total_travel_m - want) < 1e-2


def test_displacement_single_exchange_plan(spark):
    cdr = _cdr(spark, [(1, 1, 0, 35.1, 139.1), (2, 1, 9, 35.2, 139.2)])
    plan = (
        mobility.user_displacement(cdr)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the rollup reuses the lag window's hash partitioning on uid
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# co-presence contact graph


def _zoned_ts(spark, rows):
    """rows: (uid, sec_offset, zone_id)."""
    return spark.createDataFrame(
        [(int(u), T0 + dt.timedelta(seconds=s), int(z)) for u, s, z in rows],
        "uid long, call_time timestamp, zone_id long",
    )


def _brute_pairs(rows, window_s):
    out = {}
    for i, (ua, sa, za) in enumerate(rows):
        for ub, sb, zb in rows[i + 1:]:
            a, b = sorted((ua, ub))
            if a != b and za == zb and abs(sa - sb) <= window_s:
                k = (a, b, za)
                out[k] = out.get(k, 0) + 1
    return out


def test_co_presence_window_edges(spark):
    w_us = 900 * 1_000_000
    rows = [
        (1, 0, 5), (2, 900, 5),      # exactly at the window -> contact
        (1, 0, 5), (3, 901, 5),      # 1 s past -> no contact with uid1@0
        (4, 0, 6), (5, 10, 7),       # same time, different zones -> none
        (6, 5000, 5), (6, 5001, 5),  # same uid -> never a self-pair
    ]
    got = {
        (r.uid_a, r.uid_b, r.zone_id): r.n_contacts
        for r in mobility.co_presence(_zoned_ts(spark, rows), w_us).collect()
    }
    assert got == _brute_pairs(rows, 900)
    assert (1, 2, 5) in got and not any(a == b for a, b, _ in got)


def test_co_presence_matches_brute_force_randomized(spark):
    rng = np.random.default_rng(42)
    rows = [
        (int(rng.integers(1, 12)), int(rng.integers(0, 20_000)),
         int(rng.integers(0, 4)))
        for _ in range(300)
    ]
    w_us = 1800 * 1_000_000
    got = {
        (r.uid_a, r.uid_b, r.zone_id): r.n_contacts
        for r in mobility.co_presence(_zoned_ts(spark, rows), w_us).collect()
    }
    assert got == _brute_pairs(rows, 1800)


def test_co_presence_bucket_boundary_pairs_counted_once(spark):
    # two events straddling a bucket boundary (bins differ by 1) must
    # appear exactly once despite the 3-bucket probe explode
    w_us = 900 * 1_000_000
    rows = [(1, 899, 3), (2, 901, 3)]
    got = mobility.co_presence(_zoned_ts(spark, rows), w_us).collect()
    assert len(got) == 1 and got[0].n_contacts == 1


def test_co_presence_plans_as_equi_join(spark):
    plan = (
        mobility.co_presence(_zoned_ts(spark, [(1, 0, 0)]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # binned equi-join, never the quadratic fallback
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# daily mobility motifs


def _zoned_ev(spark, rows):
    """rows: (event_id, uid, sec_offset, zone_id)."""
    return spark.createDataFrame(
        [
            (int(e), int(u), T0 + dt.timedelta(seconds=s), int(z))
            for e, u, s, z in rows
        ],
        "event_id long, uid long, call_time timestamp, zone_id long",
    )


def _motif_python(rows, max_stops=500):
    """Pure-Python reference census. rows: (event_id, uid, sec, zone)."""
    days = {}
    for e, u, s, z in rows:
        days.setdefault((u, s // 86400), []).append((s, e, z))
    census = {}
    for (u, _d), evs in days.items():
        zs = [z for _, _, z in sorted(evs)]
        stops = [z for i, z in enumerate(zs) if i == 0 or z != zs[i - 1]]
        if len(stops) > max_stops:
            continue
        order = list(dict.fromkeys(stops))
        motif = "-".join(str(order.index(z) + 1) for z in stops)
        k = (motif, len(stops))
        n_days, users = census.get(k, (0, set()))
        users.add(u)
        census[k] = (n_days + 1, users)
    return {k: (n, len(us)) for k, (n, us) in census.items()}


def test_motif_canonical_relabel_and_collapse(spark):
    # zones 9 4 9 9 7 -> collapse 9 4 9 7 -> relabel 1-2-1-3
    rows = [(i, 1, i * 600, z) for i, z in enumerate([9, 4, 9, 9, 7])]
    got = mobility.motif_census(_zoned_ev(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.motif, r.n_stops, r.n_user_days, r.n_users) == ("1-2-1-3", 4, 1, 1)


def test_motif_census_counts_users_and_days(spark):
    rows = (
        # uid 1, two days, both A->B (same motif "1-2")
        [(1, 1, 0, 5), (2, 1, 600, 6)]
        + [(3, 1, 86400, 7), (4, 1, 87000, 8)]
        # uid 2, one day, A->B
        + [(5, 2, 0, 3), (6, 2, 900, 4)]
        # uid 3, one day, single zone -> "1"
        + [(7, 3, 0, 2), (8, 3, 600, 2)]
    )
    got = {
        (r.motif, r.n_stops): (r.n_user_days, r.n_users)
        for r in mobility.motif_census(_zoned_ev(spark, rows)).collect()
    }
    assert got == _motif_python(rows)
    assert got[("1-2", 2)] == (3, 2) and got[("1", 1)] == (1, 1)


def test_motif_equal_ts_tie_breaks_on_event_id(spark):
    rows = [(1, 4, 0, 10), (2, 4, 0, 11), (3, 4, 60, 10)]
    got = mobility.motif_census(_zoned_ev(spark, rows)).collect()
    assert len(got) == 1 and got[0].motif == "1-2-1"


def test_motif_max_stops_guard_drops_runaway_days(spark):
    # a tower ping-pong day with 7 stops is excluded at max_stops=5
    rows = [(i, 9, i * 60, i % 2) for i in range(7)]
    rows += [(100, 8, 0, 1), (101, 8, 60, 2)]
    got = mobility.motif_census(_zoned_ev(spark, rows), max_stops=5).collect()
    assert len(got) == 1 and got[0].motif == "1-2"


def test_motif_matches_python_randomized(spark):
    rng = np.random.default_rng(7)
    rows = [
        (i, int(rng.integers(1, 9)), int(rng.integers(0, 3 * 86400)),
         int(rng.integers(0, 5)))
        for i in range(400)
    ]
    got = {
        (r.motif, r.n_stops): (r.n_user_days, r.n_users)
        for r in mobility.motif_census(_zoned_ev(spark, rows)).collect()
    }
    assert got == _motif_python(rows)


def test_motif_single_fact_exchange_plan(spark):
    df = mobility.motif_census(_zoned_ev(spark, [(1, 1, 0, 0)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # collect + lambdas in one shuffle lineage; no window, no join
    assert "Window" not in plan and "Join" not in plan


# --- contact-graph PageRank -------------------------------------------------


def _np_pagerank(edges, n_iters, damping_pct=85, scale=10**9):
    """Independent integer-recurrence reference: edges = [(a, b, w)]
    undirected -> {uid: pr_units}."""
    from collections import defaultdict

    w = defaultdict(int)
    for a, b, ww in edges:
        w[(a, b)] += ww
    sym = defaultdict(dict)
    for (a, b), ww in w.items():
        sym[a][b] = sym[a].get(b, 0) + ww
        sym[b][a] = sym[b].get(a, 0) + ww
    wt = {u: sum(nb.values()) for u, nb in sym.items()}
    base = (100 - damping_pct) * scale // 100
    pr = {u: scale for u in wt}
    for _ in range(n_iters):
        q = {u: pr[u] // wt[u] for u in pr}
        sc = {u: 0 for u in pr}
        for u, nb in sym.items():
            for v, ww in nb.items():
                sc[v] += q[u] * ww
        pr = {u: base + (damping_pct * sc[u]) // 100 for u in pr}
    return pr


def _contacts_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b), 0, int(w)) for a, b, w in edges],
        "uid_a long, uid_b long, zone_id long, n_contacts long",
    )


def test_contact_pagerank_matches_integer_reference(spark):
    # star (hub 0) + a weighted chain + a detached pair; duplicate
    # (a, b) rows across zones must collapse into one edge weight
    edges = [(0, 1, 3), (0, 2, 1), (0, 3, 1), (0, 4, 2),
             (10, 11, 5), (11, 12, 1), (20, 21, 1), (0, 1, 2)]
    got = {
        r.uid: r.pr_units
        for r in mobility.contact_pagerank(
            _contacts_df(spark, edges), n_iters=4
        ).collect()
    }
    assert got == _np_pagerank(edges, 4)
    # the hub outranks its weight-1 leaves (its strongest neighbor
    # may legitimately outrank IT: node 1 receives 5/7 of the hub's
    # outflow), and symmetric detached pairs tie exactly
    assert got[0] > got[2] == got[3]
    assert got[20] == got[21]


def test_contact_pagerank_deterministic_and_mass_bounded(spark):
    import random

    rng = random.Random(11)
    edges = [
        (rng.randrange(40), rng.randrange(40), rng.randrange(1, 6))
        for _ in range(120)
    ]
    edges = [(a, b, w) for a, b, w in edges if a != b]
    df = _contacts_df(spark, edges)
    a = sorted(map(tuple, mobility.contact_pagerank(df).collect()))
    b = sorted(
        map(tuple, mobility.contact_pagerank(df.repartition(9)).collect())
    )
    assert a == b  # exact integers: no FP partitioning drift
    n = len(a)
    total = sum(p for _, p in a)
    base = (100 - mobility.PR_DAMP_PCT) * mobility.PR_SCALE // 100
    assert n * base <= total <= n * mobility.PR_SCALE  # shed mass only


def test_contact_pagerank_guards(spark):
    df = _contacts_df(spark, [(0, 1, 1)])
    with pytest.raises(ValueError, match="n_iters"):
        mobility.contact_pagerank(df, n_iters=0)
    with pytest.raises(ValueError, match="damping_pct"):
        mobility.contact_pagerank(df, damping_pct=100)
    with pytest.raises(ValueError, match="scale"):
        mobility.contact_pagerank(df, scale=10)
