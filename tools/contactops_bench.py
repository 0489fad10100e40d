"""10x timings for the co-presence contact graph and the C4 line
filter — same per-attempt hypervisor-steal gating as
tools/newops_bench.py (clean = steal <= 2% of busy time, >= 2 clean
attempts, median of clean attempts, all attempts disclosed).

co_presence runs over a generated (uid, ts, zone) frame at CDR-like
contact density (n_zones controls per-bucket occupancy; the 25-zone
test fixture is far denser than any real tower map) in two shapes:
uniform zones, and a hot zone owning ``hot_frac`` of all events (the
stadium burst — the operator's skew surface).

Usage: python tools/contactops_bench.py [n_events] [n_zones] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _cpu_counters() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(v) for v in parts[1:9]]
    idle = vals[3] + vals[4]
    steal = vals[7]
    busy = sum(vals) - idle - steal
    return busy, steal


def _timed_clean(fn, repeats: int, max_attempts: int = 8,
                 steal_max_pct: float = 2.0):
    attempts: list[dict] = []
    while len([a for a in attempts if a["clean"]]) < repeats and len(
        attempts
    ) < max_attempts:
        b0, s0 = _cpu_counters()
        t0 = time.time()
        fn()
        dt = time.time() - t0
        b1, s1 = _cpu_counters()
        steal_pct = 100.0 * (s1 - s0) / max((s1 - s0) + (b1 - b0), 1)
        attempts.append(
            {"sec": round(dt, 2), "steal_pct": round(steal_pct, 1),
             "clean": steal_pct <= steal_max_pct}
        )
    clean = sorted(a["sec"] for a in attempts if a["clean"])
    dirty = len(clean) < 2
    vals = clean or sorted(a["sec"] for a in attempts)
    return {
        "median_sec": vals[len(vals) // 2],
        "dirty": dirty,
        "attempts": attempts,
    }


def _contact_events(spark, n: int, n_zones: int, hot_frac: float = 0.0,
                    n_uids: int = 50_000, n_days: int = 30):
    """Deterministic (uid, call_time, zone_id) frame: uniform zone
    spread, with ``hot_frac`` of events piled onto zone 0.

    zone and time are xxhash64-spread, NOT linear-congruential: with
    ``zone = a*id % Z`` and ``ts = b*id % T`` every same-zone event
    pair is >= lcm-structured seconds apart, which silently zeroes
    the contact count (the LCG-correlation artifact the embedding
    planes hit in r3) — hashing decorrelates the two axes."""
    from pyspark.sql import functions as F

    hot_n = int(n * hot_frac)
    idc = F.col("id")
    sec = F.abs(F.xxhash64(idc)) % (n_days * 86_400)
    zone = F.when(idc < hot_n, F.lit(0)).otherwise(
        F.abs(F.xxhash64(idc + 1_000_000_007)) % n_zones
    )
    return spark.range(0, n, 1, 128).select(
        (idc % n_uids).alias("uid"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(secs=sec.cast("double"))
        ).alias("call_time"),
        zone.cast("long").alias("zone_id"),
    )


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_zones = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from cdr_analysis_tools_hadoop_spark.operators import mobility, textops
    from cdr_analysis_tools_hadoop_spark.session import build_session
    from cdr_analysis_tools_hadoop_spark.sources import synthetic

    spark = build_session("contactops-bench")
    ev_uniform = _contact_events(spark, n_events, n_zones).localCheckpoint()
    ev_hot = _contact_events(
        spark, n_events, n_zones, hot_frac=0.02
    ).localCheckpoint()
    docs = synthetic.documents_df(
        spark, 50_000, partitions=64
    ).localCheckpoint()
    planted = textops.planted_lines_sql("text", "doc_id", "spark")

    box: dict[str, int] = {}
    ops = {
        "co_presence_uniform": lambda: box.__setitem__(
            "co_presence_uniform", mobility.co_presence(ev_uniform).count()
        ),
        "co_presence_hot_zone": lambda: box.__setitem__(
            "co_presence_hot_zone", mobility.co_presence(ev_hot).count()
        ),
        "c4_line_filter": lambda: box.__setitem__(
            "c4_line_filter", textops.c4_line_filter(docs, planted).count()
        ),
    }
    results = {}
    for name, fn in ops.items():
        fn()  # warm-up
        results[name] = _timed_clean(fn, repeats)
        results[name]["rows"] = box[name]
    print(json.dumps(
        {"n_events": n_events, "n_zones": n_zones, "ops": results}
    ))


if __name__ == "__main__":
    main()
