from __future__ import annotations

import pytest

from cdr_analysis_tools_hadoop_spark.operators import textops


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_stats_simple(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox")], "doc_id long, text string"
    )
    r = textops.token_stats(df).collect()[0]
    assert r.n_tokens == 4
    assert r.n_words == 4
    assert r.len_chars == 19
    assert abs(r.avg_token_len - 4.0) < 1e-9


def test_quality_bounds_and_stopword_effect(spark):
    rich = "the " + " ".join(f"w{i}" for i in range(40))
    poor = "x " * 3
    df = spark.createDataFrame(
        [(1, rich), (2, poor.strip())], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in textops.quality_scores(df).collect()}
    assert 0 <= out[2].quality_millis < out[1].quality_millis <= 1000
    assert out[1].stopword_ratio > 0


def test_language_id_deterministic_and_total(docs):
    a = sorted(map(tuple, textops.language_id(docs.limit(50)).collect()))
    b = sorted(map(tuple, textops.language_id(docs.limit(50)).collect()))
    assert a == b
    assert len(a) == 50
    assert {r[1] for r in a} <= set(textops.LANGS)


def test_fingerprints_are_sorted_kmin(docs):
    rows = textops.fingerprints(docs.limit(10)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.fp_rank, r.fp_hash))
    for doc, fps in by_doc.items():
        fps.sort()
        hashes = [h for _, h in fps]
        assert hashes == sorted(hashes)
        assert len(fps) <= textops.FINGERPRINT_K
