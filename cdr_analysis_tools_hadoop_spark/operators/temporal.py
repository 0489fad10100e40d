"""Temporal join/segmentation operators Spark lacks natively:
gap-based sessionization, as-of join, and a binned range self-join.

The reference's trajectory chain is built on exactly these temporal
primitives, hand-rolled per query: TripSegmentationCDR walks a
time-ordered per-user sequence splitting on a gap/radius rule
(reference TripOD/src bytecode, surveyed in SURVEY.md §2.9), and the
OD edge rules pair each event with its most recent predecessor
(`trajectory.py`). This module exposes the same machinery as three
composable, generic operators over any (key, timestamp) table.

All three are pure DataFrame algebra — window functions and bucketed
equi-joins, zero Python UDFs, zero inequality joins:

- ``sessionize``: one shuffle on the key; lag + running-sum share a
  single window sort; the per-session rollup groups on
  (key, session_idx), which HashPartitioning(key) already satisfies,
  so Catalyst inserts NO second exchange.
- ``asof_join``: the union-window formulation — tag both sides, one
  shuffle of the union on the key, one window sort,
  ``last(payload, ignorenulls)`` carries the latest right-side value
  forward to each left row. Never a broadcast-nested-loop or
  per-left-row subquery: cost is sort-shuffle of |L|+|R|, the only
  shape that survives 100 TB on both sides.
- ``range_neighbor_counts``: the binned range join — bucket by
  floor(ts / window), probe the 3 adjacent buckets via a 3-way
  explode, equi-join on (key, bucket), exact |dt| filter after.
  Candidates are linear in matches (every true pair differs by at
  most one bucket), never the quadratic inequality-join fallback.

Timestamps are compared in int64 microseconds (`unix_micros` /
DuckDB `epoch_us`) so engine and oracle agree bit-for-bit. Parquet
naive timestamps (TIMESTAMP_NTZ) are cast through TIMESTAMP under
the session's pinned UTC zone (`session.py`), which reads the naive
value as UTC — exactly DuckDB's `epoch_us` on a naive TIMESTAMP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(col):
    """int64 micros from TIMESTAMP or TIMESTAMP_NTZ (UTC session)."""
    return F.unix_micros(col.cast("timestamp"))

HOUR_US = 3_600_000_000
#: default sessionize gap: 12 h in microseconds
GAP_US_DEFAULT = 12 * HOUR_US
#: default range-join half-window: ±6 h in microseconds
RANGE_US_DEFAULT = 6 * HOUR_US


def _session_labels(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_us: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-event session labels: (key, __oid, tus, *extra_cols,
    session_idx). The lag and the running sum order by the same
    (tus, __oid) spec, so both Windows share ONE sort after ONE hash
    exchange on the key."""
    seq = events.select(
        key_col,
        F.col(id_col).alias("__oid"),
        _us(F.col(ts_col)).alias("tus"),
        *[F.col(c) for c in extra_cols],
    )
    w = Window.partitionBy(key_col).orderBy("tus", "__oid")
    prev = F.lag("tus").over(w)
    marked = seq.withColumn(
        "__ns",
        F.when(prev.isNull() | ((F.col("tus") - prev) > gap_us), 1).otherwise(0),
    )
    return marked.withColumn("session_idx", F.sum("__ns").over(w)).drop("__ns")


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int = GAP_US_DEFAULT,
) -> DataFrame:
    """Gap-based sessions: a new session starts whenever the gap to
    the previous event of the same key exceeds ``gap_us``.

    Returns one row per session: (key, session_idx, n_events,
    start_us, end_us, duration_us) with session_idx 1-based in time
    order within the key.

    Physical plan: ONE exchange (hash on key). The lag and the
    running sum order by the same (ts, id) spec, so the second Window
    reuses the first's sort; the rollup groups on (key, session_idx)
    which the existing hash partitioning on key already satisfies —
    Catalyst inserts no further exchange, and ties on equal
    timestamps are broken by ``id_col`` so the result is
    deterministic.
    """
    return (
        _session_labels(events, key_col, ts_col, id_col, gap_us)
        .groupBy(key_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("tus").alias("start_us"),
            F.max("tus").alias("end_us"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts_col: str,
    right_ts_col: str,
    right_id_col: str,
    payload_cols: tuple[str, ...],
    prefix: str = "asof_",
) -> DataFrame:
    """As-of LEFT join: each left row gains the payload of the latest
    right row with the same key and ``right_ts <= left_ts``
    (inclusive), or NULLs when no right row precedes it.

    Determinism at exact timestamp ties between right rows: the row
    with the LARGEST ``right_id_col`` wins (both the engine ordering
    and the documented oracle dedup pick it).

    Output: every ``left`` column plus ``ts_us`` (left timestamp,
    int64 micros) and ``{prefix}{payload}`` for each payload column.

    Physical plan: union the tagged sides, ONE exchange on the key,
    ONE window sort on (ts, side, tie); ``last(payload,
    ignorenulls=True)`` over the unbounded-preceding frame carries
    the newest right payload onto each left row; filter back to left
    rows. No inequality join, no per-row lookup — the only as-of
    shape whose cost is a single sort-shuffle of |L| + |R|.
    """
    # right side first at equal timestamps => inclusive <= semantics
    lrows = left.select(
        F.col(key_col).alias("__k"),
        _us(F.col(left_ts_col)).alias("ts_us"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        *[F.col(c) for c in left.columns],
        *[
            F.lit(None).cast(right.schema[p].dataType).alias(f"__p_{p}")
            for p in payload_cols
        ],
    )
    rrows = right.select(
        F.col(key_col).alias("__k"),
        _us(F.col(right_ts_col)).alias("ts_us"),
        F.lit(0).alias("__side"),
        F.col(right_id_col).cast("long").alias("__tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *[F.col(p).alias(f"__p_{p}") for p in payload_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("ts_us", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lrows.unionByName(rrows).select(
        "*",
        *[
            F.last(f"__p_{p}", ignorenulls=True).over(w).alias(f"{prefix}{p}")
            for p in payload_cols
        ],
    )
    return carried.where(F.col("__side") == 1).select(
        *left.columns,
        "ts_us",
        *[f"{prefix}{p}" for p in payload_cols],
    )


def range_neighbor_counts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_us: int = RANGE_US_DEFAULT,
) -> DataFrame:
    """For every event, the number of OTHER events of the same key
    within ±``window_us`` microseconds — a range self-join.

    Binned formulation: bucket rows by floor(ts / window); a true
    pair's buckets differ by at most 1, so probing the 3 adjacent
    buckets via a 3-row explode gives 100% recall and the exact
    |dt| <= window filter gives 100% precision. The join is a plain
    equi-join on (key, bucket) — shuffle-partitioned, AQE-skew-
    splittable — never the quadratic inequality-join fallback Spark
    would otherwise plan. Events with zero neighbours are kept
    (count 0) via a final left join back onto the event spine.

    The count aggregate and the spine join both key on
    (``key_col``, ``id_col``), not the id alone, so ids only need to
    be unique WITHIN a key (e.g. per-user sequence numbers) — with a
    bare-id key, counts from same-id events of different keys would
    silently merge.
    """
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    base = events.select(
        key_col,
        F.col(id_col).alias("eid"),
        _us(F.col(ts_col)).alias("tus"),
    )
    binned = base.withColumn("bin", F.floor(F.col("tus") / F.lit(window_us)))
    probe = binned.select(
        key_col,
        F.col("eid").alias("probe_id"),
        F.col("tus").alias("ptus"),
        F.explode(
            F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)
        ).alias("bin"),
    )
    cand = probe.join(binned, on=[key_col, "bin"]).where(
        (F.abs(F.col("ptus") - F.col("tus")) <= window_us)
        & (F.col("probe_id") != F.col("eid"))
    )
    counts = cand.groupBy(
        key_col, F.col("probe_id").alias("eid")
    ).agg(F.count(F.lit(1)).alias("__n"))
    return (
        base.join(counts, on=[key_col, "eid"], how="left")
        .select(
            F.col("eid").alias(id_col),
            F.coalesce(F.col("__n"), F.lit(0)).alias("n_neighbors"),
        )
    )


def session_funnel(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_us: int = GAP_US_DEFAULT,
    entry_type: str = "view",
    goal_type: str = "purchase",
) -> DataFrame:
    """Per-session funnel conversion: for every gap-based session
    (same rule as :func:`sessionize`), the entry/goal event counts
    and whether the session CONVERTED — a goal event at or after the
    session's first entry event.

    Output per (key, session_idx): n_events, n_entries, n_goals,
    first_entry_us / last_goal_us (int64 micros, NULL when the stage
    never fired), converted (0/1). All-integer, so the DuckDB twin
    is FP-free.

    Physical plan: identical to sessionize — the label window and
    the funnel rollup share ONE hash exchange on the key; the
    conditional aggregates are map-side partials. Composition is the
    point: any stage pair (signup->purchase, click->error) is the
    same single-shuffle plan.
    """
    lab = _session_labels(
        events, key_col, ts_col, id_col, gap_us, extra_cols=(type_col,)
    )
    is_entry = F.col(type_col) == entry_type
    is_goal = F.col(type_col) == goal_type
    agg = lab.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(is_entry.cast("long")).alias("n_entries"),
        F.sum(is_goal.cast("long")).alias("n_goals"),
        F.min(F.when(is_entry, F.col("tus"))).alias("first_entry_us"),
        F.max(F.when(is_goal, F.col("tus"))).alias("last_goal_us"),
    )
    return agg.withColumn(
        "converted",
        (
            F.col("first_entry_us").isNotNull()
            & F.col("last_goal_us").isNotNull()
            & (F.col("last_goal_us") >= F.col("first_entry_us"))
        ).cast("int"),
    )
