"""Zone-level spatial statistics: Getis–Ord Gi* hotspots, global
Moran's I, and local Moran (LISA) over the zone-population surface.

The reference's analysis chain stops at the J3 zone-population
aggregate (reference queries/statistics/zone_population.sql:1-4):
per-zone event counts over the tower-Voronoi layer. These operators
add the standard next step of a geospatial analyst — spatial-
autocorrelation statistics over exactly that per-zone count surface:

- ``getis_ord_gi_star``: the Gi* hotspot z-score (Getis & Ord,
  "The Analysis of Spatial Association by Use of Distance
  Statistics", Geographical Analysis 1992; the starred 1995 form
  that includes the focal zone) with binary distance-band weights.
- ``morans_i``: global Moran's I (Moran, Biometrika 1950) with
  inverse-distance weights — one row: is the count surface
  clustered (I > E[I]) or dispersed?
- ``local_morans_i``: the per-zone LISA decomposition (Anselin,
  "Local Indicators of Spatial Association", Geographical Analysis
  1995) under the same inverse-distance weights.

Scale shapes (the tower layer is a DIMENSION — 10^2..10^5 rows vs
10^12 fact rows, operators/zones.py):

- The ONLY fact-scale work in all three is the per-zone count:
  one partial-aggregatable groupBy (map-side combine, one exchange
  of |zones| rows). Everything after runs on the zone dimension.
- Gi* finds distance-band neighbors with an EXACT binned equi-join
  (cell side = radius, 9-offset explode — the co_presence shape):
  |zones| * 9 probe rows against a hash join, never |zones|^2, so
  a 10^5-tower layer stays ~10^6 candidate pairs. Correctness is
  pinned against the brute-force cross join in pytest.
- Moran/LISA use DENSE inverse-distance weights, which are
  inherently all-pairs; the dim self-join is broadcast and guarded
  (``MAX_DENSE_ZONES``) — for larger layers use the distance-band
  Gi* (sparse weights) instead, as any production GIS does.

Cross-engine determinism: per-zone counts, neighbor sums and
neighbor counts are exact BIGINTs; means and weights are closed-form
doubles shared snippet-for-snippet with the DuckDB twins; x*x sums
are accumulated in DOUBLE (exact while counts < 2^26; at larger
magnitudes only the final rounding digit can move) so int64 can
never overflow at 10^12-event scale. The only cross-engine
nondeterminism — floating sum ORDER over the (tiny) zone dimension —
is absorbed by rounding every emitted statistic to 6 decimals and
adding +0.0 (collapsing IEEE -0.0, which the two engines round to
with opposite signs on |v| < 5e-7), the same contract as
operators/mobility.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geo
from ..functions.geo import dlit

#: metres per degree of latitude — the constant the Voronoi metric,
#: kNN dist_m, and the mobility indicators all share.
M_PER_DEG = geo.M_PER_DEG

#: dense (all-pairs) weights are dimension-only work; past this the
#: caller should switch to the sparse distance-band Gi*.
MAX_DENSE_ZONES = 5000

#: default Gi* distance band: 30 km on the ~111 x 90 km fixture box
#: gives each zone a genuine neighborhood without spanning the box.
DEFAULT_RADIUS_M = 30000.0

_D2_IJ = geo.planar_d2_sql("i_tlat", "i_tlon", "j_tlat", "j_tlon")

#: inverse-distance weight in 1/metres (i != j rows only).
_W_INV = f"({dlit(1.0)} / (sqrt({_D2_IJ}) * {dlit(M_PER_DEG)}))"


def _band_pred(radius_m: float) -> str:
    """d(i, j) <= radius_m in the shared planar metric, sqrt-free:
    d2_degrees <= (r / m_per_deg)^2 with the bound folded into ONE
    python-side literal so both engines compare identical doubles."""
    bound = (float(radius_m) / M_PER_DEG) ** 2
    return f"({_D2_IJ}) <= {dlit(bound)}"


def _gi_formula() -> str:
    """Gi* z-score from (x, sx, wi) x (n, mean, s2) — Getis & Ord
    1995 eq. 6/7 with binary weights: sum(w^2) == sum(w) == wi."""
    return (
        f"CASE WHEN n <= 1 OR s2 <= {dlit(0.0)} OR (n * wi - wi * wi) <= 0 "
        "THEN CAST(NULL AS DOUBLE) ELSE "
        "(round((sx - mean * wi) / (sqrt(s2) * "
        f"sqrt(CAST(n * wi - wi * wi AS DOUBLE) / (n - {dlit(1.0)}))), 6)"
        f" + {dlit(0.0)}) END"
    )


# mean and population variance from exact integer sum_x and the
# double-accumulated sum_x2; shared verbatim with the oracle bodies.
_MEAN = "(CAST(sum_x AS DOUBLE) / n)"
_S2 = f"((sum_x2 / n) - {_MEAN} * {_MEAN})"


def zone_value_frame(zoned: DataFrame, towers: DataFrame) -> DataFrame:
    """Per-zone event count x with the zone centroid, INCLUDING
    zero-count zones (a hotspot statistic over a surface that drops
    its empty cells is biased): towers LEFT JOIN the one-exchange
    fact aggregate."""
    counts = zoned.groupBy("zone_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    return (
        towers.select("zone_id", "tlat", "tlon")
        .join(counts, "zone_id", "left")
        .withColumn("x", F.coalesce(F.col("x"), F.lit(0).cast("bigint")))
    )


def _globals_row(zc: DataFrame) -> DataFrame:
    return zc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum(F.col("x").cast("double") * F.col("x")).alias("sum_x2"),
    )


def _bin_cells(
    pts: DataFrame, radius_m: float, cols: tuple[str, ...]
) -> DataFrame:
    """Attach (cu, cv) grid-cell ids with cell side == ``radius_m``
    (planar meters) to a (*cols, lat, lon) frame. One binning
    implementation shared by every exact band join in this module —
    the bijection argument below depends on cell side == radius."""
    r = float(radius_m)
    cu = F.floor(F.col("lat") * F.lit(M_PER_DEG) / F.lit(r))
    cv = F.floor(F.col("lon") * F.lit(geo.LON_SCALE * M_PER_DEG) / F.lit(r))
    return pts.select(*cols, "lat", "lon", cu.alias("cu"), cv.alias("cv"))


def _eps_binned_pairs(
    binned: DataFrame,
    radius_m: float,
    cols: tuple[str, ...],
    include_self: bool,
) -> DataFrame:
    """EXACT within-radius ordered pairs over a :func:`_bin_cells`
    frame via the 9-offset equi-join: because cell side == radius,
    every in-band pair lands in one of the 9 neighboring cells, and
    each (i, j) matches exactly ONE offset — a bijection onto the
    cross join's in-band pairs (pinned in tests/test_spatialstats.py
    for both consumers). Candidates are bounded by LOCAL density,
    never |pts|^2. Output: ``i_``/``j_``-prefixed copies of ``cols``
    for every pair with planar distance <= radius; both directions
    present; ``cols[0]`` is the identity column used to drop the
    zero-distance self pair when ``include_self`` is False (Gi*'s
    starred form keeps it)."""
    r = float(radius_m)
    probe = (
        binned.select(
            *[F.col(c).alias(f"i_{c}") for c in cols],
            F.col("lat").alias("i_lat"),
            F.col("lon").alias("i_lon"),
            "cu",
            "cv",
        )
        .withColumn("du", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dv", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
    )
    build = binned.select(
        *[F.col(c).alias(f"j_{c}") for c in cols],
        F.col("lat").alias("j_lat"),
        F.col("lon").alias("j_lon"),
        F.col("cu").alias("j_cu"),
        F.col("cv").alias("j_cv"),
    )
    d2 = geo.planar_d2_sql("i_lat", "i_lon", "j_lat", "j_lon")
    bound = (r / M_PER_DEG) ** 2
    pairs = probe.join(
        build,
        (probe.cu + probe.du == build.j_cu)
        & (probe.cv + probe.dv == build.j_cv),
    ).where(F.expr(f"({d2}) <= {dlit(bound)}"))
    if not include_self:
        pairs = pairs.where(F.col(f"i_{cols[0]}") != F.col(f"j_{cols[0]}"))
    return pairs.select(
        *[f"i_{c}" for c in cols], *[f"j_{c}" for c in cols]
    )


def getis_ord_gi_star(
    zoned: DataFrame,
    towers: DataFrame,
    radius_m: float = DEFAULT_RADIUS_M,
) -> DataFrame:
    """Per-zone Gi* hotspot z-score with binary weights within
    ``radius_m`` (the focal zone included — the starred statistic).

    Physical plan: one fact exchange (zone counts), then the EXACT
    binned neighbor equi-join on the dimension — bin side == radius,
    so every in-band pair lands in one of the 9 neighboring cells;
    each (i, j) matches exactly one offset, making the join a
    bijection onto the cross-join's in-band pairs (pinned in
    tests/test_spatialstats.py). Output: (zone_id, n_events,
    n_neighbors, gi_z).
    """
    r = float(radius_m)
    if r <= 0.0:
        raise ValueError("radius_m must be positive")
    # materialize the |zones|-row value frame once: it feeds BOTH the
    # neighbor-pair lineage and the globals row, and Spark has no
    # common-subplan reuse — without this the fact-scale zone-count
    # aggregate runs once per consumer
    zc = zone_value_frame(zoned, towers).localCheckpoint(eager=True)
    binned = _bin_cells(
        zc.select(
            "zone_id",
            "x",
            F.col("tlat").alias("lat"),
            F.col("tlon").alias("lon"),
        ),
        r,
        ("zone_id", "x"),
    )
    pairs = _eps_binned_pairs(binned, r, ("zone_id", "x"), include_self=True)
    nb = pairs.groupBy(
        F.col("i_zone_id").alias("zone_id"), F.col("i_x").alias("x")
    ).agg(
        F.sum("j_x").cast("bigint").alias("sx"),
        F.count(F.lit(1)).cast("bigint").alias("wi"),
    )
    out = nb.crossJoin(F.broadcast(_globals_row(zc)))
    return (
        out.withColumn("mean", F.expr(_MEAN))
        .withColumn("s2", F.expr(_S2))
        .select(
            "zone_id",
            F.col("x").alias("n_events"),
            F.col("wi").alias("n_neighbors"),
            F.expr(_gi_formula()).alias("gi_z"),
        )
    )


def _dense_pairs(zc: DataFrame) -> DataFrame:
    """All i != j zone pairs with centred values — dimension-only
    (guarded) broadcast self-join for the dense-weight statistics.

    ``zc`` is consumed three times (the count guard's action, the
    globals row, and the pair self-join), so callers pass an eagerly
    localCheckpoint'ed frame — the fact-scale zone-count aggregate
    must not rerun per consumer."""
    n_zones = zc.count()
    if n_zones > MAX_DENSE_ZONES:
        raise ValueError(
            "dense inverse-distance weights are all-pairs; for "
            f"{n_zones} zones use the distance-band getis_ord_gi_star"
        )
    g = _globals_row(zc)
    zcz = zc.crossJoin(F.broadcast(g)).select(
        "zone_id",
        "tlat",
        "tlon",
        "x",
        "n",
        "sum_x",
        "sum_x2",
        (F.col("x").cast("double") - F.expr(_MEAN)).alias("z"),
    )
    i = zcz.select(
        F.col("zone_id").alias("i_zone"),
        F.col("tlat").alias("i_tlat"),
        F.col("tlon").alias("i_tlon"),
        F.col("x").alias("i_x"),
        F.col("z").alias("i_z"),
        "n",
        "sum_x",
        "sum_x2",
    )
    j = zcz.select(
        F.col("zone_id").alias("j_zone"),
        F.col("tlat").alias("j_tlat"),
        F.col("tlon").alias("j_tlon"),
        F.col("z").alias("j_z"),
    )
    return i.join(F.broadcast(j), F.col("i_zone") != F.col("j_zone"))


def morans_i(zoned: DataFrame, towers: DataFrame) -> DataFrame:
    """Global Moran's I over the zone-count surface with
    inverse-distance weights: one row (n_zones, s0, morans_i,
    expected_i). I > E[I] = -1/(n-1) reads as spatial clustering.

    Plan: one fact exchange for the counts; the pair stage and both
    final aggregates are dimension-only single-row reductions.
    """
    pairs = _dense_pairs(
        zone_value_frame(zoned, towers).localCheckpoint(eager=True)
    )
    # m2 = sum(z^2) over ZONES (not pairs), folded from the exact
    # global moments instead of a second scan: sum(z^2) =
    # sum_x2 - n * mean^2.
    m2 = f"(sum_x2 - n * {_MEAN} * {_MEAN})"
    agg = pairs.groupBy().agg(
        F.first("n").cast("bigint").alias("n"),
        F.first("sum_x").alias("sum_x"),
        F.first("sum_x2").alias("sum_x2"),
        F.sum(F.expr(_W_INV)).alias("s0"),
        F.sum(F.expr(_W_INV) * F.col("i_z") * F.col("j_z")).alias("num"),
    )
    return agg.select(
        F.col("n").alias("n_zones"),
        F.round("s0", 6).alias("s0"),
        F.expr(
            f"CASE WHEN n <= 1 OR {m2} <= {dlit(0.0)} THEN CAST(NULL AS DOUBLE) "
            f"ELSE round((n / s0) * num / {m2}, 6) + {dlit(0.0)} END"
        ).alias("morans_i"),
        F.expr(
            f"CASE WHEN n <= 1 THEN CAST(NULL AS DOUBLE) "
            f"ELSE round({dlit(-1.0)} / (n - {dlit(1.0)}), 6) END"
        ).alias("expected_i"),
    )


def local_morans_i(zoned: DataFrame, towers: DataFrame) -> DataFrame:
    """Per-zone LISA: I_i = z_i * sum_j(w_ij z_j) / (sum(z^2) / n)
    under the same inverse-distance weights as :func:`morans_i`
    (Anselin 1995 eq. 7 with m2 the population second moment).
    Output: (zone_id, n_events, lisa); positive = the zone sits in a
    like-valued cluster, negative = a spatial outlier.
    """
    pairs = _dense_pairs(
        zone_value_frame(zoned, towers).localCheckpoint(eager=True)
    )
    li = pairs.groupBy(
        F.col("i_zone").alias("zone_id"),
        F.col("i_x").alias("x"),
        F.col("i_z").alias("z"),
        "n",
        "sum_x",
        "sum_x2",
    ).agg(F.sum(F.expr(_W_INV) * F.col("j_z")).alias("lag"))
    m2n = f"((sum_x2 - n * {_MEAN} * {_MEAN}) / n)"
    return li.select(
        "zone_id",
        F.col("x").alias("n_events"),
        F.expr(
            f"CASE WHEN n <= 1 OR {m2n} <= {dlit(0.0)} THEN CAST(NULL AS DOUBLE) "
            f"ELSE round(z * lag / {m2n}, 6) + {dlit(0.0)} END"
        ).alias("lisa"),
    )


# ---------------------------------------------------------------------------
# DuckDB twins — same snippets over the shared `zoned` + `towers` CTEs.
# Each body CONTINUES the caller's WITH chain (leading ", zc AS ...")
# and must be appended directly to the zoned CTE prefix.

_ZC_CTE = (
    "zc AS (SELECT t.zone_id, t.tlat, t.tlon, "
    "CAST(coalesce(e.x, 0) AS BIGINT) AS x FROM towers t LEFT JOIN ("
    "SELECT zone_id, CAST(count(*) AS BIGINT) AS x FROM zoned "
    "GROUP BY zone_id) e ON t.zone_id = e.zone_id)"
)

_G_CTE = (
    "g AS (SELECT CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(x) AS BIGINT) AS sum_x, "
    "sum(CAST(x AS DOUBLE) * x) AS sum_x2 FROM zc)"
)

_PAIR_COLS = (
    "i.zone_id AS i_zone, i.tlat AS i_tlat, i.tlon AS i_tlon, "
    "i.x AS i_x, j.zone_id AS j_zone, j.tlat AS j_tlat, "
    "j.tlon AS j_tlon, j.x AS j_x"
)


def gi_star_oracle_body(radius_m: float = DEFAULT_RADIUS_M) -> str:
    """DuckDB twin of :func:`getis_ord_gi_star` (cross join + the
    identical band predicate stands in for the binned equi-join —
    pinned equal in pytest)."""
    return (
        f", {_ZC_CTE}, {_G_CTE}, "
        f"nb AS (SELECT i_zone AS zone_id, i_x AS x, "
        "CAST(sum(j_x) AS BIGINT) AS sx, "
        f"CAST(count(*) AS BIGINT) AS wi FROM (SELECT {_PAIR_COLS} "
        f"FROM zc i, zc j) p WHERE {_band_pred(radius_m)} "
        "GROUP BY i_zone, i_x) "
        "SELECT zone_id, x AS n_events, wi AS n_neighbors, "
        f"{_gi_formula()} AS gi_z FROM ("
        f"SELECT nb.zone_id, nb.x, nb.sx, nb.wi, g.n, g.sum_x, g.sum_x2, "
        f"{_MEAN} AS mean, {_S2} AS s2 FROM nb CROSS JOIN g)"
    )


def _pairs_cte() -> str:
    return (
        f"zz AS (SELECT zc.*, CAST(x AS DOUBLE) - {_MEAN} AS z, "
        "g.n, g.sum_x, g.sum_x2 FROM zc CROSS JOIN g), "
        "pairs AS (SELECT i.zone_id AS i_zone, i.tlat AS i_tlat, "
        "i.tlon AS i_tlon, i.x AS i_x, i.z AS i_z, i.n, i.sum_x, "
        "i.sum_x2, j.tlat AS j_tlat, j.tlon AS j_tlon, j.z AS j_z "
        "FROM zz i JOIN zz j ON i.zone_id <> j.zone_id)"
    )


def morans_i_oracle_body() -> str:
    """DuckDB twin of :func:`morans_i`."""
    m2 = f"(sum_x2 - n * {_MEAN} * {_MEAN})"
    return (
        f", {_ZC_CTE}, {_G_CTE}, {_pairs_cte()} "
        "SELECT n AS n_zones, round(s0, 6) AS s0, "
        f"CASE WHEN n <= 1 OR {m2} <= {dlit(0.0)} THEN CAST(NULL AS DOUBLE) "
        f"ELSE round((n / s0) * num / {m2}, 6) + {dlit(0.0)} END AS morans_i, "
        f"CASE WHEN n <= 1 THEN CAST(NULL AS DOUBLE) "
        f"ELSE round({dlit(-1.0)} / (n - {dlit(1.0)}), 6) END AS expected_i "
        "FROM (SELECT CAST(min(n) AS BIGINT) AS n, min(sum_x) AS sum_x, "
        f"min(sum_x2) AS sum_x2, sum({_W_INV}) AS s0, "
        f"sum({_W_INV} * i_z * j_z) AS num FROM pairs)"
    )


def lisa_oracle_body() -> str:
    """DuckDB twin of :func:`local_morans_i`."""
    m2n = f"((sum_x2 - n * {_MEAN} * {_MEAN}) / n)"
    return (
        f", {_ZC_CTE}, {_G_CTE}, {_pairs_cte()} "
        "SELECT zone_id, x AS n_events, "
        f"CASE WHEN n <= 1 OR {m2n} <= {dlit(0.0)} THEN CAST(NULL AS DOUBLE) "
        f"ELSE round(z * lag / {m2n}, 6) + {dlit(0.0)} END AS lisa FROM ("
        "SELECT i_zone AS zone_id, i_x AS x, i_z AS z, n, sum_x, sum_x2, "
        f"sum({_W_INV} * j_z) AS lag FROM pairs "
        "GROUP BY i_zone, i_x, i_z, n, sum_x, sum_x2)"
    )


# ---------------------------------------------------------------------------
# Stay-point DBSCAN: clustering detected stays into discovered POIs.
# The canonical step AFTER the reference's TripSegmentationCDR stay
# detection (operators/interpolation.py stay_points, reference
# bytecode parity documented there): density-cluster everyone's stay
# points into places (Ester et al., "A Density-Based Algorithm for
# Discovering Clusters", KDD 1996; applied to location history as in
# Ye et al. 2009 / Zheng et al. 2010's stay-point -> POI pipelines).
#
# DBSCAN's textbook labeling is visit-order-dependent for border
# points (a border point in reach of two clusters joins whichever
# was expanded first). This implementation is the DETERMINISTIC
# variant every distributed DBSCAN uses: core points take the MIN
# core sid of their density-connected component (exact connected
# components, not an approximation); border points take the MIN
# cluster id among their core neighbors. Same rule in the oracle,
# so labels hash-match.
#
# Scale shape: neighbor search is the same exact eps-binned
# equi-join as Gi* (|stays| * 9 probe rows, candidates bounded by
# LOCAL density); components run on the CORE-EDGE graph via
# dedup.dedup_clusters' alternating-star rewrite (Kiveris et al.
# SoCC'14, O(log^2 n) rounds regardless of id layout,
# fixpoint-checked, raises on non-convergence). A pathological coincident mass (every
# event at one mall anchor) would make the cell join quadratic, so
# ``max_cell_points`` REFUSES (banding_for_corpus style) instead of
# silently exploding.

#: DBSCAN defaults tuned on the faithful-dwell fixture at sf0.01:
#: 3 km bands merge nearby dwell anchors (min anchor spacing 2.2 km)
#: into 89 multi-anchor places with all three roles present.
DBSCAN_EPS_M = 3000.0
DBSCAN_MIN_PTS = 4
MAX_CELL_POINTS = 100_000


def _sid_sql(dialect: str) -> str:
    """Deterministic 60-bit stay id from the (uid, pdt, seg_id)
    natural key — portable md5 snippet, identical in both engines
    (collisions ~ n^2 / 2^60: negligible and deterministic)."""
    from ..functions import texthash

    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    key = (
        f"concat_ws('|', CAST(uid AS {str_t}), "
        f"CAST(pdt AS {str_t}), CAST(seg_id AS {str_t}))"
    )
    return texthash.md5_int_sql(key, dialect)


def dbscan_points(
    pts: DataFrame,
    eps_m: float = DBSCAN_EPS_M,
    min_pts: int = DBSCAN_MIN_PTS,
    max_cell_points: int = MAX_CELL_POINTS,
) -> DataFrame:
    """Exact DBSCAN over a (sid, lat, lon) point set (deterministic
    min-label variant, see module notes). Output: one row per input
    point — (sid, n_in_eps, role 'core'|'border'|'noise',
    cluster_id = min core sid of the place, NULL for noise)."""
    from . import dedup

    r = float(eps_m)
    if r <= 0.0:
        raise ValueError("eps_m must be positive")
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    # the point set is consumed by several independent actions (the
    # occupancy guard, the neighbor aggregate, the CC's eager
    # checkpoint, the border join), so materialize the binned points
    # and the pair set ONCE — without this every action replays the
    # full upstream lineage (for stay_point_clusters, the stay
    # detection window over the event fact)
    binned = _bin_cells(
        pts.select("sid", "lat", "lon"), r, ("sid",)
    ).localCheckpoint(eager=True)
    occ = binned.groupBy("cu", "cv").count().agg(F.max("count")).collect()[0][0]
    if occ is not None and occ > max_cell_points:
        raise ValueError(
            f"a single eps-cell holds {occ} points (> {max_cell_points}): "
            "the neighbor join would go quadratic on a coincident mass; "
            "shrink eps_m or pre-aggregate coincident points"
        )
    pairs = _eps_binned_pairs(
        binned, r, ("sid",), include_self=False
    ).localCheckpoint(eager=True)
    # both directions are present (every point plays i and j), so
    # one groupBy gives the full neighbor count and the edge set is
    # already symmetric for the component step.
    nbc = pairs.groupBy(F.col("i_sid").alias("sid")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nn")
    )
    graded = (
        binned.select("sid")
        .join(nbc, "sid", "left")
        .select(
            "sid",
            (F.coalesce(F.col("nn"), F.lit(0)) + F.lit(1))
            .cast("bigint")
            .alias("n_in_eps"),
        )
        .localCheckpoint(eager=True)
    )
    core = graded.where(F.col("n_in_eps") >= min_pts).select("sid")
    core_edges = (
        pairs.join(core.withColumnRenamed("sid", "i_sid"), "i_sid")
        .join(core.withColumnRenamed("sid", "j_sid"), "j_sid")
        .select(F.col("i_sid").alias("doc_a"), F.col("j_sid").alias("doc_b"))
    )
    labels = dedup.dedup_clusters(
        core.select(F.col("sid").alias("doc_id")), pairs=core_edges
    ).select(F.col("doc_id").alias("sid"), "cluster_id")
    border = (
        pairs.join(labels.withColumnRenamed("sid", "j_sid"), "j_sid")
        .join(core.withColumnRenamed("sid", "i_sid"), "i_sid", "left_anti")
        .groupBy(F.col("i_sid").alias("sid"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    out = (
        graded.join(labels.withColumnRenamed("cluster_id", "core_cid"), "sid", "left")
        .join(border.withColumnRenamed("cluster_id", "border_cid"), "sid", "left")
        .select(
            "sid",
            "n_in_eps",
            F.when(F.col("core_cid").isNotNull(), F.lit("core"))
            .when(F.col("border_cid").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("core_cid", "border_cid").alias("cluster_id"),
        )
    )
    return out


def stay_point_clusters(
    stays: DataFrame,
    eps_m: float = DBSCAN_EPS_M,
    min_pts: int = DBSCAN_MIN_PTS,
    max_cell_points: int = MAX_CELL_POINTS,
) -> DataFrame:
    """POI discovery over a stay-point table (the
    interpolation.stay_points output): DBSCAN the genuine stays
    (is_stay) and return every stay with its natural key —
    (uid, pdt, seg_id, n_in_eps, role, cluster_id).
    ``max_cell_points`` forwards to :func:`dbscan_points`' coincident
    -mass refusal for callers who have sized the join themselves."""
    sp = stays.where(F.col("is_stay")).select(
        "uid",
        "pdt",
        "seg_id",
        F.expr(_sid_sql("spark")).alias("sid"),
        "lat",
        "lon",
    ).localCheckpoint(eager=True)  # consumed by the DBSCAN actions AND the final key join
    lab = dbscan_points(
        sp.select("sid", "lat", "lon"), eps_m, min_pts, max_cell_points
    )
    return sp.select("uid", "pdt", "seg_id", "sid").join(lab, "sid").select(
        "uid", "pdt", "seg_id", "n_in_eps", "role", "cluster_id"
    )


def stay_point_clusters_oracle(
    stays_sql: str,
    eps_m: float = DBSCAN_EPS_M,
    min_pts: int = DBSCAN_MIN_PTS,
) -> str:
    """DuckDB twin of :func:`stay_point_clusters`: cross-join
    neighbors under the identical band arithmetic + recursive-CTE
    transitive closure with the same min-label rule (the
    dedup_clusters_oracle pattern). ``stays_sql`` is a full SELECT
    producing the stay_points schema."""
    d2 = geo.planar_d2_sql("i.lat", "i.lon", "j.lat", "j.lon")
    bound = (float(eps_m) / M_PER_DEG) ** 2
    return (
        "WITH RECURSIVE "
        f"sp AS (SELECT {_sid_sql('duckdb')} AS sid, uid, pdt, seg_id, "
        f"lat, lon FROM ({stays_sql}) WHERE is_stay), "
        "prs AS (SELECT i.sid AS i_sid, j.sid AS j_sid FROM sp i "
        f"JOIN sp j ON i.sid <> j.sid AND ({d2}) <= {dlit(bound)}), "
        "graded AS (SELECT sp.sid, CAST(coalesce(nbc.nn, 0) + 1 AS BIGINT) "
        "AS n_in_eps FROM sp LEFT JOIN (SELECT i_sid AS sid, count(*) AS nn "
        "FROM prs GROUP BY 1) nbc ON sp.sid = nbc.sid), "
        f"core AS (SELECT sid FROM graded WHERE n_in_eps >= {int(min_pts)}), "
        "edges AS (SELECT i_sid AS src, j_sid AS dst FROM prs "
        "WHERE i_sid IN (SELECT sid FROM core) "
        "AND j_sid IN (SELECT sid FROM core)), "
        "reach AS (SELECT src, dst FROM edges "
        "UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src), "
        "lab AS (SELECT c.sid, least(c.sid, coalesce(min(r.dst), c.sid)) "
        "AS cluster_id FROM core c LEFT JOIN reach r ON r.src = c.sid "
        "GROUP BY c.sid), "
        "brd AS (SELECT p.i_sid AS sid, min(l.cluster_id) AS cluster_id "
        "FROM prs p JOIN lab l ON p.j_sid = l.sid "
        "WHERE p.i_sid NOT IN (SELECT sid FROM core) GROUP BY 1) "
        "SELECT sp.uid, sp.pdt, sp.seg_id, graded.n_in_eps, "
        "CASE WHEN lab.sid IS NOT NULL THEN 'core' "
        "WHEN brd.sid IS NOT NULL THEN 'border' ELSE 'noise' END AS role, "
        "coalesce(lab.cluster_id, brd.cluster_id) AS cluster_id "
        "FROM sp JOIN graded ON sp.sid = graded.sid "
        "LEFT JOIN lab ON sp.sid = lab.sid "
        "LEFT JOIN brd ON sp.sid = brd.sid"
    )
