"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf dir, compares row count, sorted column
names, and an order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from cdr_analysis_tools_hadoop_spark.session import build_session

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def value_hash(rows, columns) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def _norm(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = build_session("oracle-check")
    con = duckdb.connect()
    # large-sf runs: bound DuckDB's memory and give it a spill dir —
    # an in-memory connection otherwise grows unbounded on the
    # brute-force oracles (the sf0.1 DBSCAN closure ate >100 GiB).
    # Cap at min(40 GiB, 60% of RAM) so smaller hosts spill instead
    # of tripping the kernel OOM killer
    with open("/proc/meminfo") as f:
        total_kib = int(f.readline().split()[1])
    cap_gib = max(1, min(40, int(total_kib * 0.6 / 1024**2)))
    con.execute(f"SET memory_limit='{cap_gib}GB'")
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duck_spill'")
    # ORACLE_SKIP: comma-separated query names whose ORACLE side is
    # infeasible at this sf (quadratic-by-design small-scale
    # yardsticks); they are recorded as skipped, not silently absent
    skip = {
        s.strip()
        for s in os.environ.get("ORACLE_SKIP", "").split(",")
        if s.strip()
    }
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        t_spark = time.time() - t0
        if name in skip:
            print(
                f"  {name:35s} rows={len(srows):7d}  "
                f"(oracle SKIPPED at this sf) {t_spark:.1f}s"
            )
            record[name] = {
                "mode": "oracle-skipped-at-sf",
                "spark_rows": len(srows),
                "spark_sec": round(t_spark, 2),
            }
            continue
        if name not in oracles:
            print(f"  {name:35s} rows={len(srows):7d}  (no oracle — rows-only) {t_spark:.1f}s")
            record[name] = {
                "mode": "rows-only", "spark_rows": len(srows),
                "spark_sec": round(t_spark, 2),
            }
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        drows = res.fetchall()
        dcols = [d[0] for d in res.description]
        t_duck = time.time() - t0
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = value_hash([tuple(r) for r in srows], scols)
        dh = value_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        col_note = "=" if ok_cols else f"{sorted(scols)}!={sorted(dcols)}"
        hash_note = "=" if ok_hash else f"{sh}!={dh}"
        print(
            f"  {name:35s} {status} rows {len(srows)}/{len(drows)} "
            f"cols={col_note} hash {hash_note} "
            f"[spark {t_spark:.1f}s duck {t_duck:.2f}s]"
        )
        record[name] = {
            "mode": "oracle", "rows_match": ok_rows,
            "schema_match": ok_cols, "hash_match": ok_hash,
            "spark_rows": len(srows), "oracle_rows": len(drows),
            "spark_sec": round(t_spark, 2), "duck_sec": round(t_duck, 2),
        }
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_rows and ok_cols:
                _diff(srows, scols, drows, dcols)
    json_out = os.environ.get("ORACLE_JSON")
    if json_out:
        import json as _json
        import subprocess
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
        with open(json_out, "w") as f:
            _json.dump(
                {"sf_dir": sf_dir, "head": head,
                 "n_oracle": sum(1 for r in record.values() if r["mode"] == "oracle"),
                 "n_rows_only": sum(1 for r in record.values() if r["mode"] == "rows-only"),
                 "failures": failures, "queries": record},
                f, indent=1)
        print(f"record -> {json_out}")
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all OK")
    return 0


def _diff(srows, scols, drows, dcols, limit=5):
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sset = sorted(tuple(_norm(r[i]) for i in so) for r in srows)
    dset = sorted(tuple(_norm(r[i]) for i in do) for r in drows)
    sonly = [r for r in sset if r not in set(map(tuple, dset))][:limit]
    donly = [r for r in dset if r not in set(map(tuple, sset))][:limit]
    print("    cols:", [scols[i] for i in so])
    for r in sonly:
        print("    spark-only:", r)
    for r in donly:
        print("    duck-only: ", r)


if __name__ == "__main__":
    raise SystemExit(main())
