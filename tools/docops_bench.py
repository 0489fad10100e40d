"""10x timings for the document-curation operators (packing, PII
redaction, repetition, mixture, plus the r4 sampling ops for a clean
re-measure) at 50k synthetic docs on local[32], with the same
per-attempt hypervisor-steal gating as tools/scaling_bench.py.

Prints one JSON line; paste the table into BENCH/SF1.md. A run where
an op never gets 2 clean attempts is flagged dirty — report it as an
UPPER BOUND, never as a clean median.

Usage: python tools/docops_bench.py [n_docs] [repeats]
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


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from cdr_analysis_tools_hadoop_spark.operators import (
        packing, sampling, textops,
    )
    from cdr_analysis_tools_hadoop_spark.session import build_session
    from cdr_analysis_tools_hadoop_spark.sources import synthetic

    spark = build_session("docops-bench")
    docs = synthetic.documents_df(spark, n_docs, partitions=64).localCheckpoint()

    box: dict[str, int] = {}
    ops = {
        "sequence_packing": lambda: box.__setitem__(
            "sequence_packing", packing.sequence_packing(docs).count()
        ),
        "pii_redaction_planted": lambda: box.__setitem__(
            "pii_redaction_planted",
            textops.pii_redaction(
                docs, textops.planted_pii_sql("text", "doc_id", "spark")
            ).count(),
        ),
        "text_repetition": lambda: box.__setitem__(
            "text_repetition", textops.repetition_scores(docs).count()
        ),
        "domain_mixture": lambda: box.__setitem__(
            "domain_mixture", textops.domain_mixture(docs).count()
        ),
        "dataset_split": lambda: box.__setitem__(
            "dataset_split", sampling.dataset_split(docs).count()
        ),
        "quota_sample": lambda: box.__setitem__(
            "quota_sample", sampling.quota_sample(docs).count()
        ),
        "split_contamination": lambda: box.__setitem__(
            "split_contamination", sampling.split_contamination(docs).count()
        ),
    }
    results = {}
    for name, fn in ops.items():
        fn()  # warm-up (plan compile, page cache)
        results[name] = _timed_clean(fn, repeats)
        results[name]["rows"] = box[name]
    print(json.dumps({"n_docs": n_docs, "ops": results}))


if __name__ == "__main__":
    main()
