"""Zone-level spatial statistics (operators/spatialstats.py):
Gi* / Moran's I / LISA vs independent numpy implementations of the
published formulas, the binned-join == all-pairs bijection, the
zero-count-zone inclusion, and the degenerate-surface NULL guards.

The sf0.01 DuckDB oracle parity for the three contract queries
(zone_hotspot_gi / morans_i / zone_lisa) lives in __spark_entry__.py;
these tests pin the STATISTICS on hand-built fixtures an oracle
sharing the same SQL snippets could not falsify.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from cdr_analysis_tools_hadoop_spark.functions import geo
from cdr_analysis_tools_hadoop_spark.operators import spatialstats as ss


def _towers(spark, sites):
    """sites: (zone_id, tlat, tlon)."""
    return spark.createDataFrame(
        [(int(z), float(la), float(lo)) for z, la, lo in sites],
        "zone_id long, tlat double, tlon double",
    )


def _zoned(spark, counts):
    """counts: {zone_id: n} -> a fake zoned fact with n rows/zone."""
    rows = [(int(z),) for z, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "zone_id long")


def _grid_sites(k=5, step_deg=0.2):
    """k x k tower grid, step_deg apart, inside the fixture box."""
    out = []
    for i in range(k):
        for j in range(k):
            out.append((i * k + j, geo.LAT0 + i * step_deg, geo.LON0 + j * step_deg))
    return out


def _counts(sites, seed=7):
    rng = np.random.default_rng(seed)
    return {z: int(rng.integers(0, 40)) for z, _, _ in sites}


def _dist_m(sites):
    a = np.array([(la, lo) for _, la, lo in sites])
    dlat = a[:, 0][:, None] - a[:, 0][None, :]
    dlon = (a[:, 1][:, None] - a[:, 1][None, :]) * geo.LON_SCALE
    return np.sqrt(dlat**2 + dlon**2) * ss.M_PER_DEG


def _np_gi_star(sites, counts, radius_m):
    """Getis & Ord 1995 Gi* with binary weights, straight from the
    paper (weights include i itself)."""
    x = np.array([counts[z] for z, _, _ in sites], dtype=np.float64)
    n = len(x)
    w = (_dist_m(sites) <= radius_m).astype(np.float64)
    mean, s = x.mean(), math.sqrt((x**2).mean() - x.mean() ** 2)
    out = {}
    for i, (z, _, _) in enumerate(sites):
        wi = w[i].sum()
        num = w[i] @ x - mean * wi
        den = s * math.sqrt((n * wi - wi**2) / (n - 1))
        out[z] = None if den == 0.0 else num / den
    return out


def _np_moran_lisa(sites, counts):
    x = np.array([counts[z] for z, _, _ in sites], dtype=np.float64)
    n = len(x)
    d = _dist_m(sites)
    w = np.zeros_like(d)
    off = ~np.eye(n, dtype=bool)
    w[off] = 1.0 / d[off]
    z = x - x.mean()
    m2 = (z**2).sum()
    moran = (n / w.sum()) * (z @ w @ z) / m2
    lisa = {
        sites[i][0]: z[i] * (w[i] @ z) / (m2 / n) for i in range(n)
    }
    return moran, lisa


def test_gi_star_matches_published_formula(spark):
    sites = _grid_sites()
    counts = _counts(sites)
    got = {
        r.zone_id: r.gi_z
        for r in ss.getis_ord_gi_star(
            _zoned(spark, counts), _towers(spark, sites), radius_m=25000.0
        ).collect()
    }
    want = _np_gi_star(sites, counts, 25000.0)
    assert set(got) == set(want)
    for zid, g in got.items():
        assert g == pytest.approx(want[zid], abs=2e-6), zid


def test_gi_star_binned_join_equals_all_pairs(spark):
    """The 9-offset binned equi-join must be a bijection onto the
    cross join's in-band pairs: same neighbor COUNT and neighbor SUM
    per zone as brute force, at a radius that straddles bin edges."""
    sites = _grid_sites(k=6, step_deg=0.17)
    counts = _counts(sites, seed=13)
    r = 33000.0
    x = np.array([counts[z] for z, _, _ in sites], dtype=np.int64)
    w = _dist_m(sites) <= r
    rows = ss.getis_ord_gi_star(
        _zoned(spark, counts), _towers(spark, sites), radius_m=r
    ).collect()
    assert len(rows) == len(sites)
    for row in rows:
        i = next(k for k, (z, _, _) in enumerate(sites) if z == row.zone_id)
        assert row.n_neighbors == int(w[i].sum()), row.zone_id
        # sx is folded into gi_z; re-derive the exact neighbor sum
        # via the formula inverse is fragile — instead pin n_events
        assert row.n_events == x[i]


def test_morans_i_and_lisa_match_published_formulas(spark):
    sites = _grid_sites()
    counts = _counts(sites, seed=23)
    zoned, towers = _zoned(spark, counts), _towers(spark, sites)
    m = ss.morans_i(zoned, towers).collect()[0]
    want_moran, want_lisa = _np_moran_lisa(sites, counts)
    assert m.n_zones == len(sites)
    assert m.morans_i == pytest.approx(want_moran, abs=2e-6)
    assert m.expected_i == pytest.approx(-1.0 / (len(sites) - 1), abs=1e-6)
    got = {r.zone_id: r.lisa for r in ss.local_morans_i(zoned, towers).collect()}
    for zid, v in got.items():
        assert v == pytest.approx(want_lisa[zid], abs=2e-6), zid


def test_clustered_surface_reads_positive_dispersed_negative(spark):
    """Sanity on sign conventions: a smooth hot-corner surface is
    spatially clustered (I > E[I], hot zones gi_z > 0); a
    checkerboard is dispersed (I < E[I])."""
    sites = _grid_sites(k=4, step_deg=0.25)
    hot = {z: 10 * (8 - int(z) // 4 - int(z) % 4) for z, _, _ in sites}
    cb = {z: 30 if (int(z) // 4 + int(z) % 4) % 2 else 1 for z, _, _ in sites}
    t = _towers(spark, sites)
    i_hot = ss.morans_i(_zoned(spark, hot), t).collect()[0]
    i_cb = ss.morans_i(_zoned(spark, cb), t).collect()[0]
    assert i_hot.morans_i > i_hot.expected_i
    assert i_cb.morans_i < i_cb.expected_i
    gi = {
        r.zone_id: r.gi_z
        for r in ss.getis_ord_gi_star(_zoned(spark, hot), t, 40000.0).collect()
    }
    assert gi[0] > 0.0  # hottest corner
    assert gi[15] < 0.0  # coldest corner


def test_zero_count_zones_are_included(spark):
    sites = [(0, 35.1, 139.1), (1, 35.2, 139.2), (2, 35.3, 139.3)]
    zoned = _zoned(spark, {0: 5, 2: 7})  # zone 1 has NO events
    rows = {
        r.zone_id: r
        for r in ss.getis_ord_gi_star(
            zoned, _towers(spark, sites), radius_m=15000.0
        ).collect()
    }
    assert rows[1].n_events == 0
    assert len(rows) == 3
    lisa = ss.local_morans_i(zoned, _towers(spark, sites)).collect()
    assert {r.zone_id for r in lisa} == {0, 1, 2}


def test_degenerate_surfaces_yield_null_not_nan(spark):
    sites = [(0, 35.1, 139.1), (1, 35.2, 139.2), (2, 35.3, 139.3)]
    t = _towers(spark, sites)
    # flat surface: s2 == 0 -> gi_z NULL everywhere
    flat = ss.getis_ord_gi_star(_zoned(spark, {0: 4, 1: 4, 2: 4}), t)
    assert all(r.gi_z is None for r in flat.collect())
    # radius spanning everything: wi == n -> NULL (0/0 guarded)
    allin = ss.getis_ord_gi_star(_zoned(spark, {0: 1, 1: 2, 2: 9}), t, 1e9)
    assert all(r.gi_z is None for r in allin.collect())
    # single zone: morans_i / expected_i NULL
    one = ss.morans_i(_zoned(spark, {0: 3}), _towers(spark, sites[:1]))
    row = one.collect()[0]
    assert row.morans_i is None and row.expected_i is None


def test_guards(spark):
    sites = _grid_sites(k=2)
    t, z = _towers(spark, sites), _zoned(spark, _counts(sites))
    with pytest.raises(ValueError, match="radius_m"):
        ss.getis_ord_gi_star(z, t, radius_m=0.0)
    # dense guard: a towers frame one past the cap must refuse
    many = spark.range(ss.MAX_DENSE_ZONES + 1).selectExpr(
        "id AS zone_id",
        "35.0 + (id % 97) / 97.0 AS tlat",
        "139.0 + (id % 89) / 89.0 AS tlon",
    )
    with pytest.raises(ValueError, match="distance-band"):
        ss.morans_i(_zoned(spark, {0: 1}), many)


# --- stay-point DBSCAN -----------------------------------------------------


def _np_dbscan(pts, eps_m, min_pts):
    """Independent brute-force DBSCAN with the deterministic
    min-label rule (core: min sid of the density-connected
    component; border: min cluster id among core neighbors).
    pts: [(sid, lat, lon)] -> {sid: (n_in_eps, role, cluster_id)}."""
    sids = [p[0] for p in pts]
    a = np.array([(p[1], p[2]) for p in pts], dtype=np.float64)
    dlat = a[:, 0][:, None] - a[:, 0][None, :]
    dlon = (a[:, 1][:, None] - a[:, 1][None, :]) * geo.LON_SCALE
    nb = dlat**2 + dlon**2 <= (eps_m / ss.M_PER_DEG) ** 2  # includes self
    n_in_eps = nb.sum(axis=1)
    core = n_in_eps >= min_pts
    n = len(pts)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if core[i] and core[j] and nb[i, j]:
                parent[find(i)] = find(j)
    comp_min = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, sids[i]), sids[i])
    out = {}
    for i in range(n):
        if core[i]:
            out[sids[i]] = (int(n_in_eps[i]), "core", comp_min[find(i)])
        else:
            cands = [
                comp_min[find(j)] for j in range(n) if core[j] and nb[i, j] and j != i
            ]
            if cands:
                out[sids[i]] = (int(n_in_eps[i]), "border", min(cands))
            else:
                out[sids[i]] = (int(n_in_eps[i]), "noise", None)
    return out


def _dbscan_pts(spark, pts):
    return spark.createDataFrame(
        [(int(s), float(la), float(lo)) for s, la, lo in pts],
        "sid long, lat double, lon double",
    )


def _blob_fixture(eps_m=3000.0, seed=5):
    """Three blobs (tight core + fringe members reachable only
    through the core -> genuine border points), plus isolated noise,
    spread across several eps-cells so the binned join must cross
    bin edges."""
    rng = np.random.default_rng(seed)
    deg = eps_m / ss.M_PER_DEG
    pts, sid = [], 0
    for cx, cy in [(0.0, 0.0), (5.0, 1.0), (2.0, 6.0)]:
        base = (geo.LAT0 + 0.3 + cx * deg, geo.LON0 + 0.3 + cy * deg)
        for _ in range(8):  # tight core, well inside eps of each other
            pts.append(
                (
                    sid,
                    base[0] + rng.uniform(-0.2, 0.2) * deg,
                    base[1] + rng.uniform(-0.2, 0.2) * deg,
                )
            )
            sid += 1
        for ang in (0.3, 2.1, 4.4):  # fringe at ~0.9 eps from center
            pts.append(
                (
                    sid,
                    base[0] + 0.9 * deg * math.cos(ang),
                    base[1] + 0.9 * deg * math.sin(ang) / geo.LON_SCALE,
                )
            )
            sid += 1
    for k in range(4):  # isolated noise, > eps from everything
        pts.append((sid, geo.LAT0 + 0.8 + 3 * k * deg, geo.LON0 + 0.9))
        sid += 1
    return pts


def test_dbscan_matches_bruteforce(spark):
    pts = _blob_fixture()
    want = _np_dbscan(pts, 3000.0, 6)
    got = {
        r.sid: (r.n_in_eps, r.role, r.cluster_id)
        for r in ss.dbscan_points(_dbscan_pts(spark, pts), 3000.0, 6).collect()
    }
    assert got == want
    roles = {v[1] for v in want.values()}
    assert roles == {"core", "border", "noise"}  # fixture exercises all three
    assert len({v[2] for v in want.values() if v[2] is not None}) == 3


def test_dbscan_bin_straddling_eps(spark):
    """Pairs just under/over eps across cell boundaries: compare the
    full labeling against brute force at an eps that is NOT the
    fixture's natural spacing."""
    pts = _blob_fixture(eps_m=2000.0, seed=11)
    for eps in (1700.0, 2000.0, 2600.0):
        want = _np_dbscan(pts, eps, 3)
        got = {
            r.sid: (r.n_in_eps, r.role, r.cluster_id)
            for r in ss.dbscan_points(_dbscan_pts(spark, pts), eps, 3).collect()
        }
        assert got == want, eps


def test_dbscan_deterministic_across_partitioning(spark):
    pts = _blob_fixture(seed=3)
    df = _dbscan_pts(spark, pts)
    a = sorted(map(tuple, ss.dbscan_points(df, 3000.0, 4).collect()))
    b = sorted(map(tuple, ss.dbscan_points(df.repartition(13), 3000.0, 4).collect()))
    assert a == b


def test_dbscan_guards(spark):
    pts = _dbscan_pts(spark, [(i, geo.LAT0, geo.LON0) for i in range(11)])
    with pytest.raises(ValueError, match="quadratic"):
        ss.dbscan_points(pts, 3000.0, 4, max_cell_points=10)
    with pytest.raises(ValueError, match="eps_m"):
        ss.dbscan_points(pts, 0.0, 4)
    with pytest.raises(ValueError, match="min_pts"):
        ss.dbscan_points(pts, 10.0, 0)


def test_dbscan_min_pts_one_has_no_noise(spark):
    """min_pts=1: every point is core (self counts), singletons are
    their own cluster."""
    pts = [(0, geo.LAT0, geo.LON0), (1, geo.LAT0 + 0.5, geo.LON0)]
    rows = ss.dbscan_points(_dbscan_pts(spark, pts), 100.0, 1).collect()
    assert {r.role for r in rows} == {"core"}
    assert sorted(r.cluster_id for r in rows) == [0, 1]


def test_dbscan_all_noise_and_empty(spark):
    """No core points: every point is noise with NULL cluster_id
    (the CC runs on an empty edge set and must converge round 1);
    empty input yields an empty frame with the right schema."""
    pts = [(i, geo.LAT0 + 0.1 * i, geo.LON0) for i in range(5)]
    rows = ss.dbscan_points(_dbscan_pts(spark, pts), 100.0, 3).collect()
    assert len(rows) == 5
    assert all(r.role == "noise" and r.cluster_id is None for r in rows)
    assert all(r.n_in_eps == 1 for r in rows)
    empty = ss.dbscan_points(_dbscan_pts(spark, []), 100.0, 3)
    assert empty.count() == 0
    assert [f.name for f in empty.schema] == [
        "sid", "n_in_eps", "role", "cluster_id"
    ]
