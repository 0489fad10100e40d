"""Portable vector kernels over ``array<float>`` embedding columns.

Bit-exactness strategy: a dot product is emitted as ONE unrolled
left-associative expression (``a[0]*b[0] + a[1]*b[1] + ...``) with
every element cast to double first. IEEE 754 +|*|/|sqrt are exactly
specified, and both Spark and DuckDB parse ``+`` left-associative, so
the two engines evaluate the identical expression tree and produce
bit-identical doubles — no "sum over unnest" whose accumulation order
is engine-dependent.

LSH hyperplanes are deterministic integer coefficient vectors from an
LCG (frozen constants); only the SIGN of the plane dot matters, so
integer coefficients lose nothing.
"""

from __future__ import annotations

DIM = 64

# sign-hyperplane count for the LSH bucket signature (2^8 buckets)
NUM_PLANES = 8

_LCG_A = 1_103_515_245
_LCG_C = 12_345


def plane_coeff(p: int, i: int) -> int:
    """Deterministic integer coefficient in [-1000, 1000]."""
    return (_LCG_A * (p * DIM + i) + _LCG_C) % 2001 - 1000


def elem_sql(col: str, i: int, dialect: str) -> str:
    """i-th element (0-based) as double."""
    if dialect == "spark":
        return f"cast({col}[{i}] as double)"
    return f"{col}[{i + 1}]::DOUBLE"


def _fold_sql(pairwise: str) -> str:
    """Spark left fold of a zip_with product array. A left fold
    ``((0+t0)+t1)+...`` equals the left-assoc chain ``t0+t1+...``
    bit-for-bit (0.0 + x == x in IEEE), so this matches the DuckDB
    unrolled expression while keeping the codegen method tiny —
    the unrolled 64..512-term form made janino compile the stage
    for ~90 s."""
    return (
        f"aggregate({pairwise}, cast(0 as double), (acc, v) -> acc + v)"
    )


def dot_sql(a: str, b: str, dialect: str, dim: int = DIM) -> str:
    if dialect == "spark":
        return _fold_sql(
            f"zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double))"
        )
    terms = " + ".join(
        f"{elem_sql(a, i, dialect)} * {elem_sql(b, i, dialect)}"
        for i in range(dim)
    )
    return f"({terms})"


def norm2_sql(col: str, dialect: str, dim: int = DIM) -> str:
    return dot_sql(col, col, dialect, dim)


def plane_dot_sql(col: str, p: int, dialect: str, dim: int = DIM) -> str:
    if dialect == "spark":
        coeffs = "array(" + ",".join(
            str(plane_coeff(p, i)) for i in range(dim)
        ) + ")"
        return _fold_sql(
            f"zip_with({col}, {coeffs}, "
            f"(x, c) -> cast(c as double) * cast(x as double))"
        )
    terms = " + ".join(
        f"({plane_coeff(p, i)}) * {elem_sql(col, i, dialect)}"
        for i in range(dim)
    )
    return f"({terms})"


def lsh_sig_sql(col: str, dialect: str, dim: int = DIM) -> str:
    """8-bit bucket id: sign bit per hyperplane."""
    terms = " + ".join(
        f"(case when {plane_dot_sql(col, p, dialect, dim)} > 0 "
        f"then {1 << p} else 0 end)"
        for p in range(NUM_PLANES)
    )
    return f"({terms})"


def cosine_sql(a: str, b: str, na2: str, nb2: str, dialect: str) -> str:
    """cosine given precomputed squared norms (column refs)."""
    return f"({dot_sql(a, b, dialect)} / sqrt(({na2}) * ({nb2})))"
