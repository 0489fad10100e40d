"""Portable text-hashing primitives for dedup / fingerprinting.

Every primitive is emitted as a SQL snippet in two dialects —
``spark`` and ``duckdb`` — built from the same arithmetic so both
engines produce bit-identical values (the driver's correctness gate
hash-compares results; see tools/check_oracle.py).

The core is a 60-bit integer hash derived from md5 (both engines
implement RFC 1321 md5 identically; the top 15 hex chars parse into
a non-negative int64). All derived hashes (MinHash permutations,
SimHash bit votes) are mod-P arithmetic on that value with P < 2^31
so products stay below 2^62 (no int64 overflow in either engine).

Reference parity: the reference has no dedup operators (its
``check_duplicate`` flag is a plain SELECT DISTINCT,
Common/hive_create_tables.py:231-234 / insert_preprocess_cdr.sql:1-2).
This module supplies the scale-path equivalents a 100 TB training-data
pipeline needs: content hashing, MinHash+LSH banding, SimHash.
"""

from __future__ import annotations

# Mersenne prime 2^31 - 1: (a * (h % P) + b) % P never overflows
# int64 for a, b < P because (P-1)^2 + P < 2^62.
P = 2_147_483_647

# MinHash permutation constants: deterministic, pairwise distinct,
# derived from Knuth's multiplicative constant. Frozen — changing them
# changes every signature.
NUM_PERM = 16
MINHASH_A = [(2_654_435_761 * (k + 1)) % P for k in range(NUM_PERM)]
MINHASH_B = [(40_503 * k + 1_299_721) % P for k in range(NUM_PERM)]

# LSH banding: 8 bands x 2 rows. P(candidate) = 1 - (1 - J^2)^8,
# ~50% at J≈0.28 — tuned low because the synthetic corpus tops out
# near J=0.12 and the gate needs non-degenerate candidate sets.
LSH_BANDS = 8
LSH_ROWS = 2
assert LSH_BANDS * LSH_ROWS == NUM_PERM

SIMHASH_BITS = 32


def md5_int_sql(expr: str, dialect: str) -> str:
    """60-bit non-negative int64 hash of a string expression."""
    if dialect == "spark":
        return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def tokens_sql(expr: str, dialect: str) -> str:
    """Whitespace tokenization; both engines keep empty tokens on
    consecutive separators, so token arrays match element-for-element."""
    if dialect == "spark":
        return f"split({expr}, ' ')"
    return f"string_split({expr}, ' ')"


def shingles_sql(tok: str, w: int, dialect: str) -> str:
    """Array of ``w``-word shingles (space-joined) from a token array.

    Empty array when the document has fewer than ``w`` tokens —
    Spark's ``sequence(1, 0)`` would count *down*, hence the CASE
    guard; DuckDB's ``generate_series(1, 0)`` is already empty.
    """
    if dialect == "spark":
        return (
            f"(case when size({tok}) < {w} then array() "
            f"else transform(sequence(1, size({tok}) - {w - 1}), "
            f"i -> array_join(slice({tok}, i, {w}), ' ')) end)"
        )
    return (
        f"[array_to_string({tok}[i:i+{w - 1}], ' ') "
        f"for i in generate_series(1, greatest(0, len({tok}) - {w - 1}))]"
    )


def normalize_text_sql(expr: str, dialect: str) -> str:
    """Lowercase + collapse runs of spaces (exact-dedup key)."""
    if dialect == "spark":
        return f"regexp_replace(lower({expr}), ' +', ' ')"
    return f"regexp_replace(lower({expr}), ' +', ' ', 'g')"


def minhash_perm_sql(h: str, k: int) -> str:
    """k-th MinHash permutation of an int64 hash (dialect-neutral)."""
    return f"(({MINHASH_A[k]} * (({h}) % {P}) + {MINHASH_B[k]}) % {P})"


def shiftright_sql(expr: str, bits: int, dialect: str) -> str:
    if dialect == "spark":
        return f"shiftright({expr}, {bits})"
    return f"(({expr}) >> {bits})"
