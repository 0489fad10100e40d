"""Per-user mobility indicators: radius of gyration, location
entropy, and displacement statistics.

These are the standard CDR mobility metrics (Gonzalez/Hidalgo/
Barabasi, "Understanding individual human mobility patterns", Nature
2008) computed downstream of exactly the frames the reference's own
chain produces: the canonical CDR fact (`prepare.events_as_cdr`, the
input to every statistics query, e.g. reference
queries/statistics/daily_cdrs.sql:1-6) and the zone-assigned fact the
frequent-locations chain groups on (reference
queries/statistics/frequent_locations.sql:6-13). The reference stops
at visit counts per (uid, zone); these operators add the per-user
spatial-dispersion summaries a mobility analyst derives next, each as
a single-aggregation Spark plan with a bit-parity DuckDB twin.

Scale shapes (all verified by plan tests):

- ``radius_of_gyration``: the planar rog is computed in CLOSED FORM
  from per-user moment sums — sum(x), sum(x*x), sum(y), sum(y*y) —
  so the plan is ONE partial-aggregatable groupBy (map-side combine,
  one exchange of |users| rows), never the naive
  centroid-join-then-re-aggregate double shuffle. Coordinates are
  centred on the fixture origin before squaring so the variance
  subtraction keeps ~11 significant digits at any corpus size.
- ``location_entropy``: Shannon entropy over a user's zone-visit
  distribution, algebraically restated as ln(T) - sum(c*ln(c))/T so
  the per-zone counts never need the per-user total on the same row:
  two stacked groupBys that share one hash exchange lineage
  ((uid, zone) then uid — the second is a near-free re-reduce of at
  most |zones| rows per user).
- ``user_displacement``: consecutive-step path statistics via ONE
  window sort on (uid -> call_time, event_id) feeding a groupBy on
  the window's own partition key, so Catalyst inserts no second
  exchange — the same single-shuffle shape as sessionize.

Every emitted metre/entropy value is rounded (3 decimals for metres,
6 for entropy) so the only cross-engine nondeterminism — floating
sum order under partial aggregation — is absorbed; the formulas
themselves are shared snippet-for-snippet with the DuckDB oracle
(`*_ORACLE_BODY` below), in the repo's portable-SQL dialect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import geo
from ..functions.geo import dlit

#: metres per degree of latitude — the same constant the Voronoi
#: zone metric uses to express planar degree distances in metres
#: (`operators/zones.py`, knn dist_m).
M_PER_DEG = geo.M_PER_DEG

# Centred planar coordinates (degrees): x north, y east scaled by the
# fixture mid-latitude cosine — the SAME planar metric that defines
# the Voronoi zones (geo.planar_d2_sql), so rog is measured in the
# geometry the rest of the engine joins in. Centring on the fixture
# origin keeps |x|,|y| < 1 degree, so sum(x*x) carries ~11 significant
# digits through the variance subtraction regardless of corpus size.
_X_SQL = f"(lat - {dlit(geo.LAT0)})"
_Y_SQL = f"((lon - {dlit(geo.LON0)}) * {dlit(geo.LON_SCALE)})"

# rog_m = sqrt(var(x) + var(y)) * M_PER_DEG over a user's points,
# var via the moment identity (sum_sq - sum^2/n)/n; greatest(0, ...)
# clamps the -1ulp negative a zero-variance user can produce.
_ROG_FORMULA = (
    "round(sqrt(greatest(CAST('0.0' AS DOUBLE), "
    "((sxx - sx * sx / n) + (syy - sy * sy / n)) / n)) "
    f"* {dlit(M_PER_DEG)}, 3)"
)


def radius_of_gyration(cdr: DataFrame) -> DataFrame:
    """Per-user radius of gyration in metres over the planar zone
    metric: rog = sqrt(mean squared distance to the user's centroid).

    Output: (uid, n_events, rog_m), rog_m rounded to mm.

    Physical plan: one projection + ONE hash aggregate on uid — the
    moment sums are map-side partials, so the exchange carries one
    row per (user, map partition), never the raw points, and there is
    no centroid self-join.
    """
    pts = cdr.select(
        "uid",
        F.expr(_X_SQL).alias("x"),
        F.expr(_Y_SQL).alias("y"),
    )
    agg = pts.groupBy("uid").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    return agg.select(
        "uid",
        F.col("n").cast("long").alias("n_events"),
        F.expr(_ROG_FORMULA).alias("rog_m"),
    )


def rog_oracle_body() -> str:
    """DuckDB twin of :func:`radius_of_gyration` over the ``cdr``
    CTE — the inner moment sums and the outer formula are the same
    snippets the Spark plan evaluates."""
    return (
        "SELECT uid, CAST(n AS BIGINT) AS n_events, "
        f"{_ROG_FORMULA} AS rog_m FROM ("
        "SELECT uid, CAST(count(*) AS DOUBLE) AS n, "
        f"sum(x) AS sx, sum(x * x) AS sxx, "
        "sum(y) AS sy, sum(y * y) AS syy FROM ("
        f"SELECT uid, {_X_SQL} AS x, {_Y_SQL} AS y FROM cdr) GROUP BY uid)"
    )


# Entropy restated join-free: H = ln(T) - sum(c*ln(c))/T. norm_entropy
# divides by ln(n_zones) (the maximum achievable H), 0 for a
# single-zone user.
_ENTROPY_FORMULA = "round(ln(t) - slc / t, 6)"
_NORM_FORMULA = (
    "round(CASE WHEN n_zones = 1 THEN CAST('0.0' AS DOUBLE) "
    "ELSE (ln(t) - slc / t) / ln(CAST(n_zones AS DOUBLE)) END, 6)"
)


def location_entropy(zoned: DataFrame) -> DataFrame:
    """Per-user Shannon entropy of the zone-visit distribution (nats),
    plus the ln(n_zones)-normalized form in [0, 1].

    Output: (uid, n_zones, n_events, entropy, norm_entropy).

    Physical plan: groupBy (uid, zone_id) for the visit counts, then a
    groupBy uid over at most |zones| rows per user computing T,
    sum(c*ln c), and n_zones in one pass — H needs no per-row total,
    so there is no window and no self-join.
    """
    counts = zoned.groupBy("uid", "zone_id").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    agg = counts.groupBy("uid").agg(
        F.count(F.lit(1)).alias("n_zones"),
        F.sum("c").alias("t"),
        F.sum(F.expr("c * ln(c)")).alias("slc"),
    )
    return agg.select(
        "uid",
        "n_zones",
        F.col("t").cast("long").alias("n_events"),
        F.expr(_ENTROPY_FORMULA).alias("entropy"),
        F.expr(_NORM_FORMULA).alias("norm_entropy"),
    )


def entropy_oracle_body() -> str:
    """DuckDB twin of :func:`location_entropy` over the ``zoned``
    CTE (same zone assignment the frequent-locations oracle uses)."""
    return (
        "SELECT uid, n_zones, CAST(t AS BIGINT) AS n_events, "
        f"{_ENTROPY_FORMULA} AS entropy, {_NORM_FORMULA} AS norm_entropy "
        "FROM (SELECT uid, count(*) AS n_zones, sum(c) AS t, "
        "sum(c * ln(c)) AS slc FROM ("
        "SELECT uid, zone_id, CAST(count(*) AS DOUBLE) AS c "
        "FROM zoned GROUP BY uid, zone_id) GROUP BY uid)"
    )


def user_displacement(cdr: DataFrame) -> DataFrame:
    """Per-user consecutive-step path statistics: number of moves,
    total great-circle travel distance, and the longest single step,
    in metres (sp_distance / haversine metric, reference UDF analogue
    hive_init_commands/initial_hive_commands_od.json:41).

    Events are ordered by (call_time, event_id) within the user —
    the same deterministic tie-break as the trajectory chain.
    Single-event users are kept with n_moves = 0 and 0.0 distances.

    Physical plan: ONE exchange — the lag window partitions on uid
    and the rollup groups on uid, so the groupBy reuses the window's
    hash partitioning; the haversine is JVM-side codegen.
    """
    w = Window.partitionBy("uid").orderBy("call_time", "event_id")
    seq = cdr.select("uid", "event_id", "call_time", "lat", "lon")
    stepped = (
        seq.withColumn("plat", F.lag("lat").over(w))
        .withColumn("plon", F.lag("lon").over(w))
        .withColumn(
            "step_m",
            F.expr(geo.haversine_sql("plat", "plon", "lat", "lon")),
        )
    )
    zero = F.expr(dlit(0.0))
    return stepped.groupBy("uid").agg(
        F.count("step_m").alias("n_moves"),
        F.round(F.coalesce(F.sum("step_m"), zero), 3).alias("total_travel_m"),
        F.round(F.coalesce(F.max("step_m"), zero), 3).alias("max_step_m"),
    )


def displacement_oracle_body() -> str:
    """DuckDB twin of :func:`user_displacement` over the ``cdr`` CTE:
    identical lag spec, identical haversine snippet."""
    hav = geo.haversine_sql("plat", "plon", "lat", "lon")
    z = dlit(0.0)
    return (
        "SELECT uid, count(step_m) AS n_moves, "
        f"round(coalesce(sum(step_m), {z}), 3) AS total_travel_m, "
        f"round(coalesce(max(step_m), {z}), 3) AS max_step_m FROM ("
        f"SELECT uid, {hav} AS step_m FROM ("
        "SELECT uid, lat, lon, "
        "lag(lat) OVER (PARTITION BY uid ORDER BY call_time, event_id) AS plat, "
        "lag(lon) OVER (PARTITION BY uid ORDER BY call_time, event_id) AS plon "
        "FROM cdr)) GROUP BY uid"
    )


# ---------------------------------------------------------------------------
# co-presence contact graph

#: default co-presence window: 15 minutes in microseconds — the same
#: 15-min constant the reference's stay detection uses
#: (TripSegmentationCDR bytecode TIME_MIN=15.0, SURVEY.md §2.9).
CO_PRESENCE_US = 900 * 1_000_000


def co_presence_pairs(
    zoned: DataFrame, window_us: int = CO_PRESENCE_US
) -> DataFrame:
    """The raw contact-pair stream behind :func:`co_presence`: one
    row per (event, event) pair observed in the same zone within
    ±``window_us``, each pair exactly once.

    Binned formulation (same mechanics as
    ``temporal.range_neighbor_counts``): bucket events by
    floor(t / window); any in-window pair's buckets differ by at most
    1, so probing the 3 adjacent buckets via a 3-row explode has 100%
    recall, and the exact |dt| filter gives 100% precision. The join
    is a plain equi-join on (zone_id, bucket) — shuffle-partitioned
    and AQE-skew-splittable — never Spark's quadratic inequality-join
    fallback. ``uid_a < uid_b`` on the probe side both drops
    self-pairs and counts each event pair exactly once (the probe
    explodes, the build side keeps its native bucket, so a given
    (event, event) pair can only meet at the build row's bucket).

    Output: (uid_a, uid_b, zone_id, tus_a, tus_b) — int64 micros.
    """
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    base = zoned.select(
        "uid",
        "zone_id",
        F.unix_micros(F.col("call_time").cast("timestamp")).alias("tus"),
    )
    binned = base.withColumn("bin", F.floor(F.col("tus") / F.lit(window_us)))
    probe = binned.select(
        F.col("uid").alias("uid_a"),
        "zone_id",
        F.col("tus").alias("ptus"),
        F.explode(
            F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)
        ).alias("bin"),
    )
    return (
        probe.join(binned, on=["zone_id", "bin"])
        .where(
            (F.col("uid_a") < F.col("uid"))
            & (F.abs(F.col("ptus") - F.col("tus")) <= window_us)
        )
        .select(
            "uid_a",
            F.col("uid").alias("uid_b"),
            "zone_id",
            F.col("ptus").alias("tus_a"),
            F.col("tus").alias("tus_b"),
        )
    )


def co_presence(zoned: DataFrame, window_us: int = CO_PRESENCE_US) -> DataFrame:
    """Contact graph: for every unordered user pair, how many times
    the two were observed in the SAME zone within ±``window_us`` of
    each other — the co-location product CDR epidemiology and
    social-tie studies derive (one row per contact pair per zone).

    See :func:`co_presence_pairs` for the binned-equi-join mechanics.

    Scale: candidates are bounded by LOCAL (zone, window) density —
    a stadium-zone burst concentrates one key, which AQE splits; the
    global corpus size never enters the candidate count. Output is
    the contact multigraph rolled up per (uid_a, uid_b, zone_id).

    Output: (uid_a, uid_b, zone_id, n_contacts).
    """
    return co_presence_pairs(zoned, window_us).groupBy(
        "uid_a", "uid_b", "zone_id"
    ).agg(F.count(F.lit(1)).alias("n_contacts"))


def co_presence_oracle_body(window_us: int = CO_PRESENCE_US) -> str:
    """DuckDB twin over the ``zoned`` CTE: the direct all-pairs
    formulation (quadratic is fine at sf0.01), exact by definition."""
    return (
        "SELECT a.uid AS uid_a, b.uid AS uid_b, a.zone_id, "
        "count(*) AS n_contacts FROM "
        "(SELECT uid, zone_id, epoch_us(call_time) AS tus FROM zoned) a "
        "JOIN (SELECT uid, zone_id, epoch_us(call_time) AS tus FROM zoned) b "
        "ON a.zone_id = b.zone_id AND a.uid < b.uid "
        f"AND abs(a.tus - b.tus) <= {window_us} "
        "GROUP BY 1, 2, 3"
    )


# ---------------------------------------------------------------------------
# daily mobility motifs

#: cap on collapsed stops per user-day before a day is excluded from
#: the census — the same role as the reference's 500-event trajectory
#: guard (insert_la_cdr_all_with_ant_zone_by_uid_od.sql:6): a runaway
#: key (logging artifact, tower ping-pong) is bounded, not collected.
MOTIF_MAX_STOPS = 500


def motif_census(zoned: DataFrame, max_stops: int = MOTIF_MAX_STOPS) -> DataFrame:
    """Daily-mobility motif census (Schneider et al., "Unravelling
    daily human mobility motifs", J. R. Soc. Interface 2013): each
    user-day reduces to its canonical stop-sequence signature —
    consecutive repeats collapsed, zones relabelled by first
    appearance (A B A C -> "1-2-1-3") — and the census counts
    user-days and distinct users per motif. The handful of motifs
    covering most user-days is the standard regularity result.

    Plan: ONE fact exchange. The per-day sequence is
    array_sort(collect_list(struct(call_time, event_id, zone))) — the
    A11 trajectory-collect shape — and the collapse, first-appearance
    relabel (array_position into array_distinct, which preserves
    first-occurrence order), and motif string are all array lambdas
    in the same projection, so no window and no second fact shuffle;
    the census rollup then aggregates |motifs|-bounded keys. Lambdas
    guard index-0 with CASE (no out-of-bounds access under ANSI).

    Output: (motif, n_stops, n_user_days, n_users).
    """
    if max_stops < 1:
        raise ValueError("max_stops must be >= 1")
    per_day = (
        zoned.select(
            "uid",
            F.col("call_time").cast("date").alias("pdt"),
            F.struct(
                F.col("call_time").alias("ct"),
                F.col("event_id").alias("eid"),
                F.col("zone_id").alias("z"),
            ).alias("s"),
        )
        .groupBy("uid", "pdt")
        .agg(F.expr("transform(array_sort(collect_list(s)), x -> x.z)").alias("zs"))
        .withColumn(
            "stops",
            F.expr(
                "filter(zs, (x, i) -> CASE WHEN i = 0 THEN true "
                "ELSE x != zs[i - 1] END)"
            ),
        )
        .where(F.expr(f"size(stops) <= {max_stops}"))
        .select(
            "uid",
            F.expr(
                "array_join(transform(stops, x -> cast("
                "array_position(array_distinct(stops), x) as string)), '-')"
            ).alias("motif"),
            F.expr("cast(size(stops) as bigint)").alias("n_stops"),
        )
    )
    return per_day.groupBy("motif", "n_stops").agg(
        F.count(F.lit(1)).alias("n_user_days"),
        F.countDistinct("uid").alias("n_users"),
    )


def motif_census_oracle_body(max_stops: int = MOTIF_MAX_STOPS) -> str:
    """DuckDB twin over the ``zoned`` CTE — the window/dense_rank
    formulation (list_distinct's order is not guaranteed in DuckDB,
    so the oracle relabels via each zone's min stop index instead;
    same result by definition)."""
    return (
        "SELECT motif, n_stops, count(*) AS n_user_days, "
        "count(DISTINCT uid) AS n_users FROM ("
        "SELECT uid, pdt, string_agg(CAST(lab AS VARCHAR), '-' ORDER BY seq)"
        " AS motif, count(*) AS n_stops FROM ("
        "SELECT r.uid, r.pdt, r.seq, dense_rank() OVER ("
        "PARTITION BY r.uid, r.pdt ORDER BY f.first_seen) AS lab FROM ("
        "SELECT uid, pdt, zone_id, row_number() OVER ("
        "PARTITION BY uid, pdt ORDER BY rn) AS seq FROM ("
        "SELECT uid, pdt, zone_id, rn, lag(zone_id) OVER ("
        "PARTITION BY uid, pdt ORDER BY rn) AS pz FROM ("
        "SELECT uid, CAST(call_time AS DATE) AS pdt, zone_id, "
        "row_number() OVER (PARTITION BY uid, CAST(call_time AS DATE) "
        "ORDER BY call_time, event_id) AS rn FROM zoned)) "
        "WHERE pz IS NULL OR zone_id <> pz) r JOIN ("
        "SELECT uid, pdt, zone_id, min(seq) AS first_seen FROM ("
        "SELECT uid, pdt, zone_id, row_number() OVER ("
        "PARTITION BY uid, pdt ORDER BY rn) AS seq FROM ("
        "SELECT uid, pdt, zone_id, rn, lag(zone_id) OVER ("
        "PARTITION BY uid, pdt ORDER BY rn) AS pz FROM ("
        "SELECT uid, CAST(call_time AS DATE) AS pdt, zone_id, "
        "row_number() OVER (PARTITION BY uid, CAST(call_time AS DATE) "
        "ORDER BY call_time, event_id) AS rn FROM zoned)) "
        "WHERE pz IS NULL OR zone_id <> pz) GROUP BY 1, 2, 3) f "
        "USING (uid, pdt, zone_id)) GROUP BY 1, 2 "
        f"HAVING count(*) <= {max_stops}) GROUP BY 1, 2"
    )


# ---------------------------------------------------------------------------
# contact-graph PageRank (deterministic integer fixed-point)

#: initial integer mass per node. With 64-bit sums the iteration is
#: overflow-safe up to ~10^8 nodes (damping_pct * total_mass must fit
#: int64); shrink via the ``scale`` argument for a larger graph.
PR_SCALE = 1_000_000_000
PR_DAMP_PCT = 85
PR_ITERS = 10


def contact_pagerank(
    contacts: DataFrame,
    n_iters: int = PR_ITERS,
    damping_pct: int = PR_DAMP_PCT,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Weighted PageRank centrality over the co-presence contact
    graph (:func:`co_presence` output) — who anchors the contact
    network, the quantity CDR epidemiology ranks seed/sentinel users
    by (PageRank: Brin & Page, WWW 1998; weighted form over contact
    multiplicity).

    DETERMINISTIC INTEGER fixed point: ranks are int64 units
    (``scale`` per node initially, i.e. classical pagerank times
    N*scale); one iteration is

        q(u)   = pr(u) div W(u)                 per-unit-weight share
        pr'(v) = (100-d)*scale div 100
                 + (d * sum_u q(u) * w(u, v)) div 100

    with W(u) the node's total contact weight and d = damping_pct.
    Integer sums are exact and associative, so the result is
    partitioning-invariant and hash-identical to the chained-CTE
    oracle — no FP mass, nothing to round. Floor division sheds
    < W(u) + 1 units per node per round (deterministically); the
    shed mass is O(1/scale) of the distribution, far below ranking
    resolution. Nodes are the edge ENDPOINTS: the graph is
    symmetric, so every node has W(u) >= 1 and there is no dangling
    mass to reallocate.

    Scale shape: the edge list shuffles once into the out-weight
    dimension; each of the K FIXED iterations is one join on src
    (rank frame vs out-weights — AQE broadcasts the smaller side),
    one contribution join against the checkpointed symmetric edge
    list, and one groupBy(dst) with map-side integer partials; the
    rank frame is localCheckpointed per round so lineage stays O(1)
    (the dedup_clusters discipline). A viral hub concentrates its
    incoming-contribution key, which AQE skew-splits — the same
    join-not-agg skew posture as co_presence itself.

    Output: (uid, pr_units bigint).
    """
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    if not 1 <= damping_pct <= 99:
        raise ValueError("damping_pct must be in [1, 99]")
    if scale < 100:
        raise ValueError("scale must be >= 100")
    e = contacts.groupBy("uid_a", "uid_b").agg(
        F.sum("n_contacts").cast("bigint").alias("w")
    )
    sym = e.select(
        F.col("uid_a").alias("src"), F.col("uid_b").alias("dst"), "w"
    ).unionByName(
        e.select(F.col("uid_b").alias("src"), F.col("uid_a").alias("dst"), "w")
    ).localCheckpoint(eager=True)
    wt = (
        sym.groupBy("src")
        .agg(F.sum("w").alias("wt"))
        .localCheckpoint(eager=True)
    )
    base = (100 - damping_pct) * scale // 100
    # the out-weight rides the rank frame (8 bytes/row) so the
    # per-unit share is a projection, not a join — one join per
    # iteration (contributions), not two
    from ..plans.checkpoint import CheckpointChain

    chain = CheckpointChain(contacts.sparkSession)
    pr = wt.select(
        F.col("src").alias("uid"), "wt", F.lit(scale).cast("bigint").alias("pr")
    )
    for _ in range(n_iters):
        q = pr.select(
            F.col("uid").alias("src"), F.expr("pr div wt").alias("qv")
        )
        sc = (
            sym.join(q, "src")
            .select("dst", (F.col("qv") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("sc"))
        )
        # chain.checkpoint frees round n-1's blocks when round n
        # materializes (bare chained localCheckpoints pin a rank-frame
        # copy per iteration for the session lifetime)
        pr = chain.checkpoint(
            wt.select(F.col("src").alias("uid"), "wt")
            .join(sc.withColumnRenamed("dst", "uid"), "uid", "left")
            .select(
                "uid",
                "wt",
                F.expr(
                    f"CAST({base} + (({damping_pct} * coalesce(sc, 0)) div 100)"
                    " AS BIGINT)"
                ).alias("pr"),
            )
        )
    return pr.select("uid", F.col("pr").alias("pr_units"))


def contact_pagerank_oracle_body(
    n_iters: int = PR_ITERS,
    damping_pct: int = PR_DAMP_PCT,
    scale: int = PR_SCALE,
    window_us: int = CO_PRESENCE_US,
) -> str:
    """DuckDB twin over the ``zoned`` CTE (leading ``, `` — continues
    the WITH chain): the all-pairs co-presence form feeding K CHAINED
    iteration CTEs generated here (aggregation is not allowed in a
    recursive CTE term, and K is fixed anyway). Identical integer
    recurrence — `//` on non-negative values == Spark's `div`."""
    base = (100 - damping_pct) * scale // 100
    ctes = [
        f"cp AS ({co_presence_oracle_body(window_us)})",
        "e AS (SELECT uid_a, uid_b, CAST(sum(n_contacts) AS BIGINT) AS w "
        "FROM cp GROUP BY 1, 2)",
        "sym AS (SELECT uid_a AS src, uid_b AS dst, w FROM e "
        "UNION ALL SELECT uid_b, uid_a, w FROM e)",
        "wt AS (SELECT src, sum(w) AS wt FROM sym GROUP BY 1)",
        f"pr0 AS (SELECT src AS uid, CAST({scale} AS BIGINT) AS pr FROM wt)",
    ]
    for k in range(1, n_iters + 1):
        ctes.append(
            f"pr{k} AS (SELECT wt.src AS uid, "
            f"{base} + (({damping_pct} * coalesce(s.sc, 0)) // 100) AS pr "
            "FROM wt LEFT JOIN (SELECT dst, sum(qv * w) AS sc FROM sym "
            f"JOIN (SELECT p.uid AS src, p.pr // t.wt AS qv FROM pr{k - 1} p "
            "JOIN wt t ON p.uid = t.src) q USING (src) GROUP BY 1) s "
            "ON wt.src = s.dst)"
        )
    return (
        ", "
        + ", ".join(ctes)
        + f" SELECT uid, CAST(pr AS BIGINT) AS pr_units FROM pr{n_iters}"
    )
