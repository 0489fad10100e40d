"""Two-parallelism-level scaling benchmark (BASELINE.md §3 protocol).

Runs the flagship image pipeline via bench.py at local[8] (level A,
stands in for N executors) and local[32] (level B, 4N executors) in
separate JVMs on the SAME input, 1 warm-up + >=3 timed repeats per
level (median), and writes BENCH/BASELINE.md with throughputs and
the scaling efficiency  throughput_B / (4 * throughput_A)
(north-rule target >= 0.8).

Usage:  python tools/scaling_bench.py [n_images] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVEL_A = 8
LEVEL_B = 32


def run_level(cpus: int, n_images: int, repeats: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_IMAGES=str(n_images),
        SPARK_GRAFT_BENCH_REPEATS=str(repeats),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    line = [ln for ln in out.strip().split("\n") if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    a = run_level(LEVEL_A, n_images, repeats)
    b = run_level(LEVEL_B, n_images, repeats)
    thr_a = a["images_per_sec"]
    thr_b = b["images_per_sec"]
    eff = thr_b / ((LEVEL_B / LEVEL_A) * thr_a)
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    md = os.path.join(ROOT, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — two-parallelism-level scaling evidence

Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} by
`python tools/scaling_bench.py {n_images} {repeats}` (median of
{repeats} timed runs per level after one warm-up; fresh JVM per
level; identical input: {n_images} deterministic synthetic images,
seed-fixed, written once to /tmp and reused by both levels).

Job: decode-validate (Arrow kernel) -> phash->anchor -> cell encode
-> broadcast PIP join vs 25 tower-Voronoi polygons -> tile-pyramid
assignment (z14) -> zone/tile aggregate  (pipeline.run_pipeline).

| level | master | images/sec | pipeline sec (median) |
|---|---|---|---|
| A (N) | local[{LEVEL_A}] | {thr_a} | {a['queries']['image_pipeline']} |
| B (4N) | local[{LEVEL_B}] | {thr_b} | {b['queries']['image_pipeline']} |

**Scaling efficiency** = throughput_B / (4 x throughput_A) =
{thr_b} / (4 x {thr_a}) = **{eff:.3f}**  (north-rule target >= 0.8)

Spark conf (both levels, session.py): AQE on (coalesce + skew-join),
shuffle.partitions = 2 x cores, maxPartitionBytes=16m (binary blobs
split finer so map stages use every core), Arrow pandas UDFs
everywhere, dynamic partition overwrite. The pipeline's only shuffle
is the final zone/tile aggregate; decode/anchor/cell/PIP/tile are
map-only, which is what makes the N->4N scaling hold.

Headline analytics at sf={a['sf']} (level B seconds):
{json.dumps(b['queries'], indent=2)}

Raw JSON:
- level A: `{json.dumps(a)}`
- level B: `{json.dumps(b)}`
"""
        )
    print(json.dumps({"thr_a": thr_a, "thr_b": thr_b, "efficiency": round(eff, 3)}))
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
