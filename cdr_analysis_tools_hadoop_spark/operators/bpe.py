"""Byte-pair-encoding tokenizer training over the corpus.

Classic BPE (Sennrich et al. 2016, arXiv:1508.07909): count word
frequencies once over the corpus, then repeatedly merge the most
frequent adjacent symbol pair inside the word-frequency table.

Scale split — the part that touches the corpus vs the part that
iterates:

- ``word_frequencies`` is the ONLY corpus-scale stage: one explode +
  one groupBy(word) with map-side partials. Everything downstream
  operates on the word-frequency table, which is vocabulary-sized
  (10^5..10^8 rows at 100 TB — thousands of times smaller than the
  corpus and independent of corpus growth once saturated).
- each merge iteration is one vocabulary-sized explode + aggregate
  (the pair count), a global top-1 (TakeOrderedAndProject — one row
  to the driver; that row IS the learned merge, i.e. model state,
  not data), and a map-only Arrow-batched merge apply. The frame is
  localCheckpoint-ed per round so lineage stays O(1) across merges.

The merge sequence is deterministic: ties on pair count break on
(left, right) lexicographically, matching the in-test pure-Python
reference learner the pytest pins the operator against. Rows-only in
the driver contract — an iterative algorithm is the documented
non-SQL case.

Reference parity: the reference has no tokenizer ops (opaque payload
strings, SURVEY.md §1.2); this is part of the axes-B training-data
layer the graft adds.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cdr_analysis_tools_hadoop_spark.functions import texthash as th

N_MERGES = 16
END_OF_WORD = "</w>"


def word_frequencies(docs: DataFrame) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-scale
    pass. Empty tokens (consecutive separators) are dropped."""
    tok = th.tokens_sql("text", "spark")
    return (
        docs.select(F.explode(F.expr(tok)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Each word as its character symbols plus the end-of-word
    marker — the classic BPE alphabet."""
    return words.select(
        F.expr(
            f"concat(split(word, ''), array('{END_OF_WORD}'))"
        ).alias("syms"),
        "freq",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent symbol pairs (overlaps included,
    as in the reference learner's get_stats)."""
    pairs = F.expr(
        "zip_with(slice(syms, 1, size(syms) - 1), "
        "slice(syms, 2, size(syms) - 1), "
        "(a, b) -> struct(a AS left, b AS right))"
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _merge_applied(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every non-overlapping leftmost (left, right) run with
    the merged symbol — Arrow-batched, map-only."""
    merged = left + right

    @pandas_udf("array<string>")
    def apply_merge(syms: pd.Series) -> pd.Series:
        def one(s):
            out = []
            i, n = 0, len(s)
            while i < n:
                if i < n - 1 and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return syms.map(one)

    return vocab.select(apply_merge("syms").alias("syms"), "freq")


def bpe_learn_merges(
    docs: DataFrame, n_merges: int = N_MERGES, min_pair_count: int = 2
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus.

    Output: (rank, left, right, merged, pair_count) — rank is the
    merge order (0-based), pair_count the frequency that won the
    round. Stops early when no pair reaches ``min_pair_count``.
    """
    from ..plans.checkpoint import CheckpointChain

    spark = docs.sparkSession
    chain = CheckpointChain(spark)
    vocab = chain.checkpoint(_initial_symbols(word_frequencies(docs)))
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0].pair_count < min_pair_count:
            break
        t = top[0]
        merges.append((rank, t.left, t.right, t.left + t.right, t.pair_count))
        # CheckpointChain frees the superseded round's blocks once the
        # new checkpoint materializes — chained bare localCheckpoints
        # would pin one vocabulary copy per merge for the session
        # lifetime (DataFrame.unpersist does not release them)
        vocab = chain.checkpoint(_merge_applied(vocab, t.left, t.right))
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count long"
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Tokenize the corpus with a learned merge list: per word, apply
    merges in rank order (each greedy leftmost, non-overlapping) —
    the standard BPE encoder. Map-only, Arrow-batched; the merge
    table is a closure constant (the model), never a runtime join.

    Output: (doc_id, n_tokens, tokens array<string>).
    """
    merge_list = [tuple(m) for m in merges]

    @pandas_udf("array<string>")
    def encode(words: pd.Series) -> pd.Series:
        def one_word(w, _cache={}):
            if w in _cache:
                return _cache[w]
            s = list(w) + [END_OF_WORD]
            for left, right in merge_list:
                i, out = 0, []
                n = len(s)
                while i < n:
                    if i < n - 1 and s[i] == left and s[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
                if len(s) == 1:
                    break
            if len(_cache) < 100_000:
                _cache[w] = s
            return s

        return words.map(
            lambda ws: [t for w in ws for t in one_word(w)]
        )

    tok = th.tokens_sql("text", "spark")
    return docs.select(
        "doc_id",
        encode(F.expr(f"filter({tok}, w -> w != '')")).alias("tokens"),
    ).select("doc_id", F.expr("size(tokens)").alias("n_tokens"), "tokens")


def bpe_pair_counts(docs: DataFrame) -> DataFrame:
    """The BPE learner's round-0 statistics table: frequency-weighted
    adjacent character-pair counts over the word vocabulary — the
    exact aggregate every merge iteration recomputes (get_stats).
    Oracle-backed: certifies the counting kernel of the iterative
    loop the same way kmeans_refine_assign certifies Lloyd's.

    Output: (lhs, rhs, pair_count).
    """
    return _pair_counts(_initial_symbols(word_frequencies(docs))).select(
        F.col("left").alias("lhs"),
        F.col("right").alias("rhs"),
        "pair_count",
    )


def bpe_pair_counts_oracle(view: str = "documents") -> str:
    tok = th.tokens_sql("text", "duckdb")
    return (
        f"WITH tok AS (SELECT unnest({tok}) AS word FROM {view}), "
        "w AS (SELECT word, count(*) AS freq FROM tok WHERE word != '' "
        "GROUP BY 1), "
        "syms AS (SELECT list_append([substr(word, i, 1) "
        "for i in generate_series(1, len(word))], "
        f"'{END_OF_WORD}') AS s, freq FROM w), "
        "pairs AS (SELECT unnest([{'lhs': s[i], 'rhs': s[i+1]} "
        "for i in generate_series(1, len(s) - 1)]) AS p, freq FROM syms) "
        "SELECT p.lhs AS lhs, p.rhs AS rhs, "
        "CAST(sum(freq) AS BIGINT) AS pair_count FROM pairs GROUP BY 1, 2"
    )
