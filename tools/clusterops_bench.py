"""10x timings for the late-r4 clustering / vocab / BPE / image-CC
operators at 50k rows on local[32], with the same per-attempt
hypervisor-steal gating as tools/docops_bench.py.

Prints one JSON line; paste the table into BENCH/SF1.md. An op that
never collects 2 clean attempts is flagged dirty — report it as an
UPPER BOUND, never as a clean median.

Usage: python tools/clusterops_bench.py [n] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

sys.path.insert(0, os.path.join(ROOT, "tools"))

from docops_bench import _timed_clean  # noqa: E402  (same steal gate)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from cdr_analysis_tools_hadoop_spark.operators import (
        bpe, clustering, multimodal, textops,
    )
    from cdr_analysis_tools_hadoop_spark.session import build_session
    from cdr_analysis_tools_hadoop_spark.sources import synthetic

    spark = build_session("clusterops-bench")
    docs = synthetic.documents_df(spark, n, partitions=64).localCheckpoint()
    emb = synthetic.embeddings_df(
        spark, n, dup_every=10, partitions=64
    ).localCheckpoint()
    # the synthetic pattern space saturates the 64-bit average-hash
    # well below 50k images (pairs grow ~quadratically: 184k @ 5k,
    # 2.97M @ 20k at d<=6), so the CC entry runs at 20k with the
    # tight d<=2 re-encode radius (seeded recall 3999/4000) and the
    # graph density is disclosed with the result — a self-similarity
    # property of the generator, not of the operator
    n_img = min(n, 20_000)
    imgs = synthetic.images_df(spark, n_img, partitions=64, dup_every=5)

    # k scales with the corpus (SemDeDup: k ~ N / target_cluster_size)
    k = 64

    box: dict[str, int] = {}
    ops = {
        "vocab_ngram_counts": lambda: box.__setitem__(
            "vocab_ngram_counts", textops.vocab_ngram_counts(docs).count()
        ),
        "bpe_merges_16": lambda: box.__setitem__(
            "bpe_merges_16", bpe.bpe_learn_merges(docs, 16).count()
        ),
        "embedding_kmeans_k64": lambda: box.__setitem__(
            "embedding_kmeans_k64",
            clustering.embedding_kmeans(emb, k=k, n_iters=8).count(),
        ),
        "semantic_dedup_k64": lambda: box.__setitem__(
            "semantic_dedup_k64",
            clustering.semantic_dedup(emb, k=k, threshold=0.9)
            .filter("NOT keep")
            .count(),
        ),
        "image_dup_clusters_20k_d2": lambda: box.__setitem__(
            "image_dup_clusters_20k_d2",
            multimodal.image_dup_clusters(imgs, 2, n_hint=n_img)
            .filter("NOT is_representative")
            .count(),
        ),
    }
    results = {}
    for name, fn in ops.items():
        fn()  # warm-up (plan compile, page cache)
        results[name] = _timed_clean(fn, repeats)
        results[name]["rows"] = box[name]
        print(f"# {name}: {results[name]['median_sec']}s "
              f"rows={box[name]} dirty={results[name]['dirty']}",
              file=sys.stderr)
    print(json.dumps({"n": n, "k": k, "ops": results}))


if __name__ == "__main__":
    main()
