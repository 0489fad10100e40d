"""GeoJSON zone-layer export + stats merge (reference S9 parity).

Reference parity: Common/cdr_statistics.py:232-283 merges
zone-population CSV rows into a GeoJSON FeatureCollection's
``features[].properties`` — but its matching body is a disabled mock
comparing against the literal 'Kochi Ken' (quirk Q6, marked
"# TODO fix mockup" at cdr_statistics.py:258-260). This module is the
working version the reference intended: driver-side merge AFTER the
distributed aggregate, keyed on the zone id.

The polygon geometry comes from the engine's own Voronoi layer
(sources/synthetic.voronoi_polygons), so the engine can also EMIT the
GeoJSON layer itself — the reference shipped its .json layers as
static files.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
from pyspark.sql import DataFrame


def zones_to_geojson(
    polys: list[tuple[Any, np.ndarray]], properties: dict[Any, dict] | None = None
) -> dict:
    """Build a FeatureCollection from (zone_id, ring lon/lat) pairs."""
    feats = []
    for zid, ring in polys:
        ring = np.asarray(ring, dtype=float)
        coords = ring.tolist()
        if coords and coords[0] != coords[-1]:
            coords.append(coords[0])
        props = {"zone_id": int(zid)}
        if properties and zid in properties:
            props.update(properties[zid])
        feats.append(
            {
                "type": "Feature",
                "properties": props,
                "geometry": {"type": "Polygon", "coordinates": [coords]},
            }
        )
    return {"type": "FeatureCollection", "features": feats}


def merge_stats(
    geojson: dict, stats: DataFrame, key: str = "zone_id"
) -> dict:
    """Merge an aggregate DataFrame into features[].properties by zone
    id (the fixed version of cdr_statistics.py:255-263). Small-result
    collect; distributed work happened upstream.

    Keys compare as STRINGS on both sides: zones_to_geojson stores
    int zone ids while pip_join/run_pipeline emit string ids, and a
    raw ``in`` test between the two silently merged nothing."""
    rows = {str(r[key]): r.asDict() for r in stats.collect()}
    out = json.loads(json.dumps(geojson))  # deep copy
    for feat in out["features"]:
        zid = str(feat["properties"].get(key))
        if zid in rows:
            extra = {k: v for k, v in rows[zid].items() if k != key}
            feat["properties"].update(extra)
    return out
