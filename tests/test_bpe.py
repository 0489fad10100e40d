from __future__ import annotations

import pytest

from cdr_analysis_tools_hadoop_spark.operators import bpe


def _ref_learn(word_freqs: dict[str, int], n_merges: int, min_pair_count: int = 2):
    """Pure-Python reference BPE learner (Sennrich get_stats/merge
    loop) with the same deterministic tie-break."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        key = tuple(list(w) + [bpe.END_OF_WORD])
        vocab[key] = vocab.get(key, 0) + f
    merges = []
    for rank in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        (left, right), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, left + right, cnt))
        new: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new[k] = new.get(k, 0) + f
        vocab = new
    return merges


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest newest"),
    (3, "newest newest newest widest widest"),
    (4, "low lower newest widest"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bpe_merges_match_reference_learner(docs):
    wf: dict[str, int] = {}
    for _, text in CORPUS:
        for w in text.split():
            wf[w] = wf.get(w, 0) + 1
    want = _ref_learn(wf, 12)
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in bpe.bpe_learn_merges(docs, 12).orderBy("rank").collect()
    ]
    assert got == want
    # the classic corpus learns e+s, es+t, est+</w> early
    merged = [g[3] for g in got]
    assert "es" in merged and "est" in merged


def test_bpe_merges_deterministic_across_partitioning(spark):
    a = spark.createDataFrame(CORPUS, "doc_id long, text string").repartition(7)
    b = spark.createDataFrame(CORPUS, "doc_id long, text string").repartition(2)
    ga = [tuple(r) for r in bpe.bpe_learn_merges(a, 8).orderBy("rank").collect()]
    gb = [tuple(r) for r in bpe.bpe_learn_merges(b, 8).orderBy("rank").collect()]
    assert ga == gb


def test_bpe_encode_roundtrip_and_compression(docs):
    merges = [
        (r.left, r.right)
        for r in bpe.bpe_learn_merges(docs, 12).orderBy("rank").collect()
    ]
    out = {r.doc_id: r for r in bpe.bpe_encode(docs, merges).collect()}
    for doc_id, text in CORPUS:
        words = text.split()
        toks = out[doc_id].tokens
        # concatenating tokens and splitting on the end-of-word
        # marker reproduces the original words exactly
        joined = "".join(toks)
        assert joined.split(bpe.END_OF_WORD)[:-1] == words
        # merges compress: fewer tokens than characters+markers
        assert out[doc_id].n_tokens < sum(len(w) + 1 for w in words)


def test_bpe_pair_counts_match_reference_stats(docs):
    wf: dict[str, int] = {}
    for _, text in CORPUS:
        for w in text.split():
            wf[w] = wf.get(w, 0) + 1
    stats: dict[tuple[str, str], int] = {}
    for w, f in wf.items():
        syms = list(w) + [bpe.END_OF_WORD]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] = stats.get(p, 0) + f
    got = {
        (r.lhs, r.rhs): r.pair_count
        for r in bpe.bpe_pair_counts(docs).collect()
    }
    assert got == stats
