from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from cdr_analysis_tools_hadoop_spark.operators import packing, textops


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# sequence_packing


def _python_packing(rows, budget, buckets):
    """Reference pack-and-chop layout, computed row-by-row."""
    per_bucket: dict[int, int] = {}
    out = {}
    for doc_id, n_tok in sorted(rows):
        b = doc_id % buckets
        cum = per_bucket.get(b, 0)
        out[doc_id] = (
            b,
            n_tok,
            cum // budget,
            cum % budget,
            (cum + n_tok - 1) // budget,
        )
        per_bucket[b] = cum + n_tok
    return out


def test_packing_matches_python_reference(docs):
    budget, buckets = 64, 4
    got = {
        r.doc_id: (r.bucket, r.n_tokens, r.start_pack, r.start_offset, r.end_pack)
        for r in packing.sequence_packing(docs, budget, buckets).collect()
    }
    toks = [
        (r.doc_id, r.n)
        for r in docs.select(
            "doc_id", (F.size(F.split("text", " ")) + 1).alias("n")
        ).collect()
    ]
    assert got == _python_packing(toks, budget, buckets)


def test_packing_stream_is_gapless_per_bucket(docs):
    """Consecutive docs in a bucket tile the token stream exactly:
    doc k+1 starts where doc k ended (+1 slot), so no pack slot is
    skipped or double-assigned."""
    budget = 128
    out = packing.sequence_packing(docs, budget=budget, buckets=8).collect()
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert len(by_bucket) == 8
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in rows:
            assert 0 <= r.start_offset < budget
            assert r.start_pack == pos // budget
            assert r.start_offset == pos % budget
            assert r.end_pack == (pos + r.n_tokens - 1) // budget
            assert r.end_pack >= r.start_pack
            pos += r.n_tokens


def test_packing_independent_of_partitioning(docs):
    a = sorted(map(tuple, packing.sequence_packing(docs).collect()))
    b = sorted(
        map(tuple, packing.sequence_packing(docs.repartition(13)).collect())
    )
    assert a == b


def test_packing_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        packing.sequence_packing(docs, budget=0)
    with pytest.raises(ValueError):
        packing.sequence_packing(docs, buckets=0)


# ---------------------------------------------------------------------------
# pii_redaction


def test_pii_redaction_counts_and_clean_text(spark):
    planted = textops.planted_pii_sql("text", "doc_id", "spark")
    docs = spark.createDataFrame(
        [(i, f"plain words row {i}") for i in range(0, 106)],
        "doc_id long, text string",
    )
    # redact the PLANTED text and also surface it for local re-checks
    out = {
        r.doc_id: r
        for r in textops.pii_redaction(docs, planted)
        .join(docs.select("doc_id", F.expr(planted).alias("aug")), "doc_id")
        .collect()
    }
    assert len(out) == 106
    email_re, phone_re, ip_re = (re.compile(p) for _, p, _ in textops.PII_PATTERNS)
    for i, r in out.items():
        assert r.n_email == (1 if i % 3 == 0 else 0)
        assert r.n_phone == (1 if i % 5 == 0 else 0)
        assert r.n_ip == (1 if i % 7 == 0 else 0)
        # the counts agree with Python's regex engine on the same text
        assert r.n_email == len(email_re.findall(r.aug))
        assert r.n_phone == len(phone_re.findall(r.aug))
        assert r.n_ip == len(ip_re.findall(r.aug))


def test_pii_redaction_output_is_clean(spark):
    """Re-running redaction over the redacted text finds nothing:
    replacement removed every match and introduced none."""
    planted = textops.planted_pii_sql("text", "doc_id", "spark")
    docs = spark.createDataFrame(
        [(i, f"plain words row {i}") for i in range(0, 106)],
        "doc_id long, text string",
    )
    e = textops._redact_exprs(planted, "spark")
    clean = docs.select("doc_id", F.expr(e["clean"]).alias("text"))
    again = textops.pii_redaction(clean)
    hit = again.filter("n_email + n_phone + n_ip > 0").count()
    assert hit == 0
    # idempotent: redacting clean text changes nothing
    assert again.join(clean, "doc_id").filter(
        "clean_hash <> md5(text) OR clean_len <> length(text)"
    ).count() == 0
