"""Broadcast point-in-polygon join: cell cover + ray-casting refine.

The core operator the reference promised but never shipped
(`FindPolygon`/`FindPolygon2` registered from the missing
cdrmobilitylib.jar, reference hive_init_commands/
initial_hive_commands_od.json:13-14). Design per BASELINE.json
north_star:

1. The polygon layer (a DIMENSION: zones, admin boundaries) is
   compiled driver-side into a cell index at a chosen resolution:
   - interior cells  -> polygon id decided, no per-point work
   - boundary cells  -> candidate polygon list, per-point ray cast
   The cover is exact: a cell is interior iff all 4 corners are
   inside AND no polygon edge intersects the cell rectangle.
2. The index is broadcast (Spark broadcast variable, NOT a shuffle).
3. Fact rows compute their cell id JVM-side (codegen expression) and
   are refined in an Arrow-batched mapInPandas kernel: one numpy
   ray-cast call per (boundary polygon x batch), never per row.

At 10^12 rows this is a map-only stage — zero shuffle — with work
proportional to boundary-cell density only. Hotspot polygons (a huge
Voronoi cell around a downtown tower) are handled by RESOLUTION, not
row salting: raise `res` until boundary cells are thin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geo


def _edges_cross_cells(
    ring: np.ndarray, xs: np.ndarray, ys: np.ndarray, nx: int, ny: int
) -> np.ndarray:
    """(ny, nx) bool: does any polygon edge intersect each grid cell?

    Vectorized Liang-Barsky clip of every edge against the cells in
    its own bbox window — O(edges x cells-under-edge), all numpy.
    """
    out = np.zeros((ny, nx), dtype=bool)
    vx = ring[:, 0]
    vy = ring[:, 1]
    ax, ay = vx, vy
    bx, by = np.roll(vx, -1), np.roll(vy, -1)
    for e in range(len(ring)):
        x_lo, x_hi = min(ax[e], bx[e]), max(ax[e], bx[e])
        y_lo, y_hi = min(ay[e], by[e]), max(ay[e], by[e])
        i0 = max(0, int(np.searchsorted(xs, x_lo, side="right")) - 1)
        i1 = min(nx - 1, int(np.searchsorted(xs, x_hi, side="right")) - 1)
        j0 = max(0, int(np.searchsorted(ys, y_lo, side="right")) - 1)
        j1 = min(ny - 1, int(np.searchsorted(ys, y_hi, side="right")) - 1)
        if i1 < i0 or j1 < j0:
            continue
        cx0 = xs[i0:i1 + 1][None, :]
        cx1 = xs[i0 + 1:i1 + 2][None, :]
        cy0 = ys[j0:j1 + 1][:, None]
        cy1 = ys[j0 + 1:j1 + 2][:, None]
        dx = bx[e] - ax[e]
        dy = by[e] - ay[e]
        t0 = np.zeros((j1 - j0 + 1, i1 - i0 + 1))
        t1 = np.ones_like(t0)
        ok = np.ones_like(t0, dtype=bool)
        for p, q in (
            (-dx, ax[e] - cx0),
            (dx, cx1 - ax[e]),
            (-dy, ay[e] - cy0),
            (dy, cy1 - ay[e]),
        ):
            if p == 0:
                ok &= np.broadcast_to(q >= 0, ok.shape)
            else:
                t = np.broadcast_to(q, ok.shape) / p
                if p < 0:
                    t0 = np.maximum(t0, t)
                else:
                    t1 = np.minimum(t1, t)
        ok &= t0 <= t1
        out[j0:j1 + 1, i0:i1 + 1] |= ok
    return out


class PolygonIndex:
    """Driver-side compiled cell index of a polygon layer.

    interior: dict cell -> poly_idx (first polygon wins: layers are
    expected non-overlapping; overlaps resolve by layer order).
    boundary: dict cell -> np.ndarray of candidate poly_idx.
    """

    def __init__(self, polys: list[tuple[object, np.ndarray]], res: int):
        self.res = res
        self.ids = [pid for pid, _ in polys]
        self.rings = [np.asarray(r, dtype=np.float64) for _, r in polys]
        self.interior: dict[int, int] = {}
        boundary: dict[int, list[int]] = {}
        n = 1 << res
        for idx, ring in enumerate(self.rings):
            if len(ring) < 3:
                continue
            min_lon, min_lat, max_lon, max_lat = geo.polygon_bbox(ring)
            ix0 = max(0, int(np.floor((min_lon - geo.LON0) / geo.DLON * n)))
            ix1 = min(n - 1, int(np.floor((max_lon - geo.LON0) / geo.DLON * n)))
            iy0 = max(0, int(np.floor((min_lat - geo.LAT0) / geo.DLAT * n)))
            iy1 = min(n - 1, int(np.floor((max_lat - geo.LAT0) / geo.DLAT * n)))
            if ix1 < ix0 or iy1 < iy0:
                continue
            nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
            # grid of cell-corner coordinates: (ny+1) x (nx+1)
            xs = geo.LON0 + geo.DLON * np.arange(ix0, ix1 + 2) / n
            ys = geo.LAT0 + geo.DLAT * np.arange(iy0, iy1 + 2) / n
            gx, gy = np.meshgrid(xs, ys)
            cin = geo.point_in_polygon_np(gy.ravel(), gx.ravel(), ring).reshape(
                ny + 1, nx + 1
            )
            all_in = cin[:-1, :-1] & cin[:-1, 1:] & cin[1:, :-1] & cin[1:, 1:]
            any_in = cin[:-1, :-1] | cin[:-1, 1:] | cin[1:, :-1] | cin[1:, 1:]
            crosses = _edges_cross_cells(ring, xs, ys, nx, ny)
            interior_mask = all_in & ~crosses
            boundary_mask = (any_in | crosses) & ~interior_mask
            for iy_rel, ix_rel in zip(*np.nonzero(interior_mask)):
                cell = geo.xy_to_cell(res, ix0 + int(ix_rel), iy0 + int(iy_rel))
                self.interior.setdefault(cell, idx)
            for iy_rel, ix_rel in zip(*np.nonzero(boundary_mask)):
                cell = geo.xy_to_cell(res, ix0 + int(ix_rel), iy0 + int(iy_rel))
                boundary.setdefault(cell, []).append(idx)
        self.boundary = {c: np.array(v, dtype=np.int64) for c, v in boundary.items()}
        # Vectorized lookup tables (sorted keys + searchsorted) — the
        # kernel must not do per-unique-cell Python dict lookups.
        self.int_keys = np.fromiter(self.interior.keys(), dtype=np.int64)
        order = np.argsort(self.int_keys)
        self.int_keys = self.int_keys[order]
        self.int_vals = np.fromiter(self.interior.values(), dtype=np.int64)[order]
        # <=64 polygons: candidate sets as one uint64 bitmask per cell,
        # enabling a per-POLYGON (not per-cell) refinement loop in the
        # kernel — 25 vectorized ray-casts per batch instead of one
        # Python iteration per boundary cell present.
        self.bnd_keys: np.ndarray | None = None
        self.bnd_masks: np.ndarray | None = None
        if len(self.rings) <= 64 and self.boundary:
            self.bnd_keys = np.fromiter(self.boundary.keys(), dtype=np.int64)
            order = np.argsort(self.bnd_keys)
            self.bnd_keys = self.bnd_keys[order]
            self.bnd_masks = np.array(
                [
                    int(np.bitwise_or.reduce(1 << v.astype(np.uint64)))
                    for v in self.boundary.values()
                ],
                dtype=np.uint64,
            )[order]

    def lookup_interior(self, cells: np.ndarray) -> np.ndarray:
        """Vectorized cell -> interior polygon idx (-1 if not interior)."""
        if len(self.int_keys) == 0:
            return np.full(len(cells), -1, dtype=np.int64)
        pos = np.clip(
            np.searchsorted(self.int_keys, cells), 0, len(self.int_keys) - 1
        )
        return np.where(
            self.int_keys[pos] == cells, self.int_vals[pos], -1
        ).astype(np.int64)

    def lookup_boundary_mask(self, cells: np.ndarray) -> np.ndarray:
        """Vectorized cell -> candidate bitmask (0 if not boundary)."""
        pos = np.searchsorted(self.bnd_keys, cells)
        pos = np.clip(pos, 0, len(self.bnd_keys) - 1)
        return np.where(
            self.bnd_keys[pos] == cells, self.bnd_masks[pos], np.uint64(0)
        )

    def stats(self) -> dict:
        return {
            "res": self.res,
            "polygons": len(self.rings),
            "interior_cells": len(self.interior),
            "boundary_cells": len(self.boundary),
        }


def assign_zone_np(idx: PolygonIndex, cells: np.ndarray, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Vectorized polygon assignment (-1 = none) shared by the
    pip_join UDF and the fused benchmark kernel: interior cells via
    one searchsorted, boundary rows via one ray cast per polygon."""
    uniq, inv = np.unique(cells, return_inverse=True)
    out = idx.lookup_interior(uniq)[inv]
    if idx.bnd_keys is not None:
        cand = idx.lookup_boundary_mask(uniq)[inv]
        for pidx in range(len(idx.rings)):
            sel = np.flatnonzero(
                (out == -1) & ((cand >> np.uint64(pidx)) & np.uint64(1) == 1)
            )
            if len(sel) == 0:
                continue
            hit = geo.point_in_polygon_np(lat[sel], lon[sel], idx.rings[pidx])
            out[sel[hit]] = pidx
    else:
        bound_ci = [ci for ci, c in enumerate(uniq) if int(c) in idx.boundary]
        if bound_ci:
            order = np.argsort(inv, kind="stable")
            starts = np.searchsorted(inv[order], np.arange(len(uniq)))
            ends = np.append(starts[1:], len(inv))
            for ci in bound_ci:
                rows = order[starts[ci]:ends[ci]]
                undecided = rows[out[rows] == -1]
                for pidx in idx.boundary[int(uniq[ci])]:
                    if len(undecided) == 0:
                        break
                    hit = geo.point_in_polygon_np(
                        lat[undecided], lon[undecided], idx.rings[pidx]
                    )
                    out[undecided[hit]] = pidx
                    undecided = undecided[~hit]
    return out


def pip_join(
    df: DataFrame,
    polys: list[tuple[object, np.ndarray]],
    lat_col: str = "lat",
    lon_col: str = "lon",
    out_col: str = "poly_id",
    res: int = 8,
) -> DataFrame:
    """Attach the containing polygon's id (or null) to every row.

    Map-only: cell id is computed JVM-side; the Arrow kernel touches
    only boundary-cell rows with real geometry work.
    """
    spark = df.sparkSession
    index = PolygonIndex(polys, res)
    bc = spark.sparkContext.broadcast(index)
    id_strs = [str(p) for p in index.ids]

    work = df.withColumn("__cell", F.expr(geo.cell_id_sql(lat_col, lon_col, res)))

    # Scalar pandas UDF over ONLY (cell, lat, lon): Spark's
    # ArrowEvalPython ships just the 3 argument columns (24 B/row) to
    # the worker and stitches the result back positionally — every
    # passthrough column (ids, captions, decode stats, ...) stays
    # JVM-side. The previous mapInPandas variant round-tripped the
    # WHOLE row through pandas (with a per-batch DataFrame copy) and
    # was 3x the Python CPU of the decode stage itself.
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def refine(cells_s: pd.Series, lat_s: pd.Series, lon_s: pd.Series) -> pd.Series:
        idx: PolygonIndex = bc.value
        out = assign_zone_np(
            idx,
            cells_s.to_numpy(dtype=np.int64),
            lat_s.to_numpy(dtype=np.float64),
            lon_s.to_numpy(dtype=np.float64),
        )
        return pd.Series(out)

    # __pidx -> id string via an array literal (element_at is 1-based;
    # __pidx = -1 i.e. "no polygon" indexes nothing -> NULL). Pure JVM
    # expression — no broadcast-join stage for the id restore.
    ids_arr = F.array(*[F.lit(s) for s in id_strs])
    refined = work.withColumn(
        "__pidx", refine(F.col("__cell"), F.col(lat_col), F.col(lon_col))
    )
    return refined.withColumn(
        out_col,
        F.when(
            F.col("__pidx") >= 0,
            F.element_at(ids_arr, (F.col("__pidx") + F.lit(1)).cast("int")),
        ),
    ).drop("__pidx", "__cell")
