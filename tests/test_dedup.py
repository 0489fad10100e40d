from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.functions import texthash as th
from cdr_analysis_tools_hadoop_spark.operators import dedup

@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_shingle_snippet_matches_python(spark):
    text = "a b c d"
    row = spark.sql(
        f"SELECT {th.shingles_sql(th.tokens_sql(repr(text), 'spark'), 2, 'spark')} AS sh"
    ).collect()[0]
    assert row.sh == ["a b", "b c", "c d"]
    one_tok = th.tokens_sql("'a'", "spark")
    short = spark.sql(
        f"SELECT {th.shingles_sql(one_tok, 2, 'spark')} AS sh"
    ).collect()[0]
    assert short.sh == []


def test_exact_dedup_counts_copies(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")],
        "doc_id long, text string",
    )
    out = {r.text_hash: r for r in dedup.exact_dedup(df).collect()}
    assert len(out) == 2
    dup = [r for r in out.values() if r.n_copies == 2]
    assert len(dup) == 1 and dup[0].keeper_doc_id == 1


def test_simhash_is_deterministic_int(docs):
    rows = dedup.simhash_signatures(docs.limit(20)).collect()
    assert all(0 <= r.simhash < (1 << th.SIMHASH_BITS) for r in rows)
    rows2 = dedup.simhash_signatures(docs.limit(20)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_lsh_pairs_have_valid_jaccard(docs):
    pairs = dedup.minhash_lsh_pairs(docs).collect()
    for p in pairs:
        assert p.doc_a < p.doc_b
        assert dedup.LSH_VERIFY_THRESHOLD <= p.jaccard <= 1.0


def test_lsh_candidates_subset_of_true_pairs(docs):
    """Every LSH-verified pair must also appear in the exact n-gram
    jaccard join at the same threshold (LSH only prunes candidates)."""
    lsh = {
        (p.doc_a, p.doc_b)
        for p in dedup.minhash_lsh_pairs(docs, threshold=0.1).collect()
    }
    exact = {
        (p.doc_a, p.doc_b)
        for p in dedup.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    assert lsh <= exact


def test_dedup_clusters_known_components(spark):
    from cdr_analysis_tools_hadoop_spark.operators import dedup

    # docs 0,1,2 share text (one component via exact dup pairs);
    # 3,4 share; 5 unique. Use texts long enough to shingle.
    base_a = "the quick brown fox jumps over the lazy dog again and again"
    base_b = "pack my box with five dozen liquor jugs every single day now"
    uniq = "sphinx of black quartz judge my vow completely different text"
    rows = [(0, base_a), (1, base_a), (2, base_a + " extra"),
            (3, base_b), (4, base_b), (5, uniq)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.cluster_id, r.is_representative)
           for r in dedup.dedup_clusters(docs, threshold=0.3).collect()}
    assert out[0] == (0, True)
    assert out[1][0] == 0 and not out[1][1]
    assert out[3] == (3, True)
    assert out[4][0] == 3 and not out[4][1]
    assert out[5] == (5, True)


def _path_graph(spark, n=300):
    """n docs + explicit path edges (i, i+1): graph diameter n-1,
    far beyond max_iters=20 for plain one-hop min propagation."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    return docs, pairs


def test_dedup_clusters_long_chain(spark):
    """Diameter 299 >> 20 rounds: one-hop min propagation alone
    cannot reach the fixpoint in max_iters=20; the alternating-star
    edge rewrite converges in O(log^2 n) rounds and labels the path
    0."""
    docs, pairs = _path_graph(spark)
    out = dedup.dedup_clusters(docs, pairs=pairs).collect()
    assert len(out) == 300
    assert all(r.cluster_id == 0 for r in out)


def test_dedup_clusters_adversarial_id_path(spark):
    """The id layout that defeats min-label propagation even WITH a
    label-over-label jump (the jump target is a local minimum whose
    label is itself): a 2000-node path with RANDOMLY permuted ids
    needs ~n/2 one-hop rounds (measured 4554 for n=10000) but must
    converge inside the default 20 alternating-star rounds, labeling
    every node with the global min id."""
    import random

    rng = random.Random(7)
    ids = list(range(2000))
    rng.shuffle(ids)
    docs = spark.createDataFrame(
        [(i, "d") for i in ids], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)],
        "doc_a long, doc_b long",
    )
    out = dedup.dedup_clusters(docs, pairs=pairs).collect()
    assert len(out) == 2000
    assert all(r.cluster_id == 0 for r in out)
    assert sum(r.is_representative for r in out) == 1


def test_dedup_clusters_matches_union_find_on_random_graph(spark):
    """Exactness vs an independent union-find on a random sparse
    graph (mixed component sizes, isolated nodes)."""
    import random

    rng = random.Random(23)
    n = 500
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(400)
    ]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list[int]] = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    want = {i: min(m) for m in comp.values() for i in m}
    docs = spark.createDataFrame(
        [(i, "d") for i in range(n)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(docs, pairs=pairs).collect()
    }
    assert got == want


def test_dedup_clusters_raises_without_convergence(spark):
    docs, pairs = _path_graph(spark)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_clusters(docs, pairs=pairs, max_iters=2)


def test_ngram_max_df_prunes_hot_shingle(spark):
    """10 docs whose ONLY overlap is one boilerplate shingle: the
    uncapped join pays all 45 pairs; max_df below the shingle's DF
    prunes every one (the hot-shingle skew guard)."""
    rows = [(i, f"u{i} common boiler v{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.ngram_jaccard_pairs(docs, threshold=0.08).collect()
    assert len(uncapped) == 45
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.08, max_df=5).collect()
    assert capped == []


def test_documents_df_deterministic_and_dups_found(spark):
    """The scalable synthetic document corpus: identical text for any
    partitioning, and the seeded one-word-edit dups are recovered by
    the MinHash-LSH chain (>= 95% of the (i-1, i) ground truth)."""
    from cdr_analysis_tools_hadoop_spark.sources import synthetic

    d4 = synthetic.documents_df(spark, 300, partitions=4)
    d2 = synthetic.documents_df(spark, 300, partitions=2)
    t4 = {r.doc_id: r.text for r in d4.collect()}
    t2 = {r.doc_id: r.text for r in d2.collect()}
    assert t4 == t2 and len(t4) == 300

    pairs = {
        tuple(sorted((r.doc_a, r.doc_b)))
        for r in dedup.minhash_lsh_pairs(d4).collect()
    }
    seeded = {(i - 1, i) for i in range(10, 300, 10)}
    assert len(seeded & pairs) / len(seeded) >= 0.95
    # clusters label each seeded dup with its predecessor's component
    labels = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(d4, pairs=dedup.minhash_lsh_pairs(d4)).collect()
    }
    hits = sum(1 for a, b in seeded if labels[a] == labels[b])
    assert hits / len(seeded) >= 0.95


def test_simhash_near_dup_strategy_equivalence(spark, docs):
    """The oracle-certified simhash Hamming query returns the same
    exact pair set under every physical strategy — broadcast (the
    contract default), grouped, and the combination join."""
    from cdr_analysis_tools_hadoop_spark.operators import dedup as dd

    outs = {}
    for mode in ("broadcast", "grouped", "join"):
        outs[mode] = {
            (r.id_a, r.id_b, r.hamming)
            for r in dd.simhash_near_dup(docs, mode=mode).collect()
        }
    assert outs["broadcast"] == outs["grouped"] == outs["join"]
    assert len(outs["broadcast"]) > 0


def test_minhash_signature_stage_is_map_only(spark, docs):
    """Late-r4 plan pin: the per-doc signature (count + 16 minima)
    folds over the in-row hash array — for a well-partitioned input
    there is NO Exchange before banding (the r3 form paid a global
    distinct plus a signature groupBy)."""
    par = spark.sparkContext.defaultParallelism
    wide = docs.repartition(par * 2)  # spread() passthrough territory
    sig = dedup._minhash_sig(dedup._shingle_hash_arrays(wide))
    plan = sig._jdf.queryExecution().executedPlan().toString()
    # the only Exchange allowed is the test input's own round-robin
    # repartition; the operator itself must add none (in particular
    # no hash partitioning — no distinct, no groupBy)
    assert plan.count("Exchange") == plan.count(
        "Exchange RoundRobinPartitioning"
    ) == 1
    assert "hashpartitioning" not in plan


def test_dedup_clusters_ignores_foreign_pair_ids(spark):
    """A caller-supplied pair frame referencing ids absent from docs:
    those edges are ignored (the pre-rewrite label loop never created
    labels for foreign ids), so cluster_id always names a docs row
    and the component keeps a representative — id 1 below must NOT
    become a cluster id or a bridge between 5 and 6."""
    docs = spark.createDataFrame(
        [(5, "d"), (6, "d")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(5, 1), (6, 1)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: (r.cluster_id, r.is_representative)
        for r in dedup.dedup_clusters(docs, pairs=pairs).collect()
    }
    assert out == {5: (5, True), 6: (6, True)}


# ---------------------------------------------------------------------------
# prefix-filtered exact Jaccard join (r5)


def _brute_jaccard_pairs(texts: dict[int, str], w: int, t: float):
    import math

    shs = {}
    for i, txt in texts.items():
        toks = txt.split(" ")
        shs[i] = (
            set(" ".join(toks[j : j + w]) for j in range(len(toks) - w + 1))
            if len(toks) >= w
            else set()
        )
    out = set()
    ids = sorted(shs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(shs[a] & shs[b])
            union = len(shs[a]) + len(shs[b]) - inter
            if union and round(inter / union, 6) >= t:
                out.add((a, b))
    return out


def test_prefix_jaccard_matches_sparse_join_on_corpus(docs):
    """Same semantics, different physical strategy: the prefix-filter
    path must reproduce the sparse shingle join exactly at the same
    threshold (both exact by construction)."""
    t = dedup.PREFIX_JACCARD_THRESHOLD
    a = sorted(
        map(tuple, dedup.prefix_jaccard_pairs(docs, threshold=t).collect())
    )
    b = sorted(
        map(tuple, dedup.ngram_jaccard_pairs(docs, threshold=t).collect())
    )
    assert a == b
    assert len(a) > 0  # the corpus plants near-dups


def test_prefix_jaccard_matches_brute_force_random(spark):
    """Recall completeness across thresholds, including ones whose
    t*n hits float-ceil edge cases (0.1*30 rounds UP in binary)."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for i in range(60):
        n = rng.randint(1, 25)
        texts[i] = " ".join(rng.choice(vocab) for _ in range(n))
    # planted near-identical pair
    texts[100] = texts[0] + " extra"
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    for t in (0.1, 0.3, 0.5, 0.75, 1.0):
        got = {
            (r.doc_a, r.doc_b)
            for r in dedup.prefix_jaccard_pairs(df, threshold=t).collect()
        }
        want = _brute_jaccard_pairs(texts, dedup.NGRAM_W, t)
        assert got == want, f"t={t}: {got ^ want}"


def test_prefix_jaccard_rejects_bad_threshold(docs):
    import pytest as _pytest

    for bad in (0.0, -0.5, 1.5):
        with _pytest.raises(ValueError):
            dedup.prefix_jaccard_pairs(docs, threshold=bad)


def test_prefix_jaccard_boilerplate_generates_no_candidates(spark):
    """The scale claim, measured: a boilerplate shingle shared by ALL
    docs contributes C(n,2) candidate pairs to the plain sparse join
    but ZERO to the prefix join (high df sorts it out of every
    prefix). Output equality must still hold."""
    n_docs = 120
    texts = {}
    for i in range(n_docs):
        # 12 unique-per-doc words (deterministic — the n_cand bound
        # below depends on this df structure) + one boilerplate tail
        # every doc shares ("wiki footer")
        body = " ".join(f"w{i}x{j}" for j in range(12))
        texts[i] = body + " wiki footer"
    # two planted near-dup pairs
    texts[200] = texts[0]
    texts[201] = texts[1] + " extra"
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    t = 0.5
    cand = dedup._prefix_candidates(df, dedup.NGRAM_W, t)
    n_cand = cand.count()
    # sparse-join volume from the boilerplate shingle alone would be
    # C(122, 2) = 7381; the prefix join must stay within the planted
    # structure (each doc's prefix = its RARE half, which excludes
    # 'wiki footer' / 'footer'-suffix shingles)
    assert n_cand < 50, n_cand
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.prefix_jaccard_pairs(df, threshold=t).collect()
    }
    want = _brute_jaccard_pairs(texts, dedup.NGRAM_W, t)
    assert got == want and (0, 200) in got
