"""Property tests (hypothesis) for the pure-numpy kernels.

SURVEY.md §7.4: hand-rolled geometry/codec kernels are property-tested
against brute-force scalar implementations. No SparkSession here —
these run in milliseconds.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cdr_analysis_tools_hadoop_spark.functions import codec, geo
from cdr_analysis_tools_hadoop_spark.operators.spatial_join import (
    PolygonIndex,
    assign_zone_np,
)
from cdr_analysis_tools_hadoop_spark.sources import synthetic

lat_st = st.floats(min_value=geo.LAT0, max_value=geo.LAT0 + geo.DLAT,
                   allow_nan=False, allow_infinity=False)
lon_st = st.floats(min_value=geo.LON0, max_value=geo.LON0 + geo.DLON,
                   allow_nan=False, allow_infinity=False)


def _pip_scalar(lat: float, lon: float, ring: np.ndarray) -> bool:
    """Textbook even-odd ray cast, one point at a time."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            xin = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            if lon < xin:
                inside = not inside
    return inside


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(lat_st, lon_st), min_size=1, max_size=20),
       st.integers(min_value=3, max_value=9), st.randoms())
def test_pip_np_matches_scalar(points, nverts, rnd):
    ang = np.sort(np.array([rnd.uniform(0, 2 * np.pi) for _ in range(nverts)]))
    r = np.array([rnd.uniform(0.05, 0.4) for _ in range(nverts)])
    cx, cy = geo.LON0 + 0.5, geo.LAT0 + 0.5
    ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    lat = np.array([p[0] for p in points])
    lon = np.array([p[1] for p in points])
    got = geo.point_in_polygon_np(lat, lon, ring)
    want = np.array([_pip_scalar(a, o, ring) for a, o in points])
    assert (got == want).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=3, max_value=40), st.integers(min_value=4, max_value=10),
       st.lists(st.tuples(lat_st, lon_st), min_size=1, max_size=50))
def test_polygon_index_matches_bruteforce(n_towers, res, points):
    towers = synthetic.towers_np(n_towers)
    polys = list(zip(towers[:, 0].astype(np.int64), synthetic.voronoi_polygons(towers)))
    idx = PolygonIndex(polys, res)
    lat = np.array([p[0] for p in points])
    lon = np.array([p[1] for p in points])
    cells = geo.cell_id_np(lat, lon, res)
    got = assign_zone_np(idx, cells, lat, lon)
    # brute force: first polygon (layer order) containing the point
    want = np.full(len(points), -1, dtype=np.int64)
    for pi, (_, ring) in enumerate(polys):
        hit = geo.point_in_polygon_np(lat, lon, np.asarray(ring))
        want[(want == -1) & hit] = pi
    assert (got == want).all()


@settings(max_examples=50, deadline=None)
@given(lat_st, lon_st, st.integers(min_value=0, max_value=geo.MAX_RES))
def test_cell_roundtrip_and_parent(lat, lon, res):
    cell = int(geo.cell_id_np(np.array([lat]), np.array([lon]), res)[0])
    r, ix, iy = geo.cell_to_xy(cell)
    assert r == res
    assert geo.xy_to_cell(r, ix, iy) == cell
    if res > 0:
        parent = int(geo.cell_id_np(np.array([lat]), np.array([lon]), res - 1)[0])
        pr, pix, piy = geo.cell_to_xy(parent)
        assert (pix, piy) == (ix >> 1, iy >> 1)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=6), st.integers(min_value=1, max_value=6),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_codec_roundtrip(h8, w8, seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h8 * 8, w8 * 8, 3), dtype=np.uint8)
    assert (codec.decode(codec.encode_rawz(pix)) == pix).all()
    assert (codec.decode(codec.encode_pngl(pix)) == pix).all()
    out = codec.decode(codec.encode_qnt4(pix))
    assert codec.psnr(pix, out) >= 40.0


@settings(max_examples=50, deadline=None)
@given(lat_st, lon_st, st.integers(min_value=1, max_value=18))
def test_tile_np_matches_slippy(lat, lon, zoom):
    import math
    x, y = geo.tile_xyz_np(np.array([lat]), np.array([lon]), zoom)
    n = 1 << zoom
    wx = min(n - 1, max(0, int((lon + 180.0) / 360.0 * n)))
    lr = math.radians(lat)
    wy = min(n - 1, max(0, int((1.0 - math.log(math.tan(lr) + 1 / math.cos(lr)) / math.pi) / 2.0 * n)))
    assert (int(x[0]), int(y[0])) == (wx, wy)
