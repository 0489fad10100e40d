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

import math

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
    """cosine given precomputed squared norms (column refs).

    Zero-norm vectors score 0.0 instead of dividing by zero: under
    Spark 4's default ANSI mode the bare division raises
    DIVIDE_BY_ZERO (not NULL), so one degenerate embedding would kill
    a whole scoring job. The guard text is dialect-neutral, so engine
    and oracle stay expression-identical."""
    return (
        f"(CASE WHEN ({na2}) * ({nb2}) = 0 THEN CAST(0 AS DOUBLE) "
        f"ELSE ({dot_sql(a, b, dialect)} / sqrt(({na2}) * ({nb2}))) END)"
    )


# Near-dup banding: OR-amplified sign-LSH, (bands, rows) DERIVED from
# the requested threshold via the 1-(1-p^r)^b curve with
# p = 1 - acos(threshold)/pi, targeting 99% recall AT the threshold
# (worst case — higher-sim pairs recall better). A pair is a
# candidate when ANY band key matches; recall vs the exact all-pairs
# baseline is asserted empirically in tests (test_similarity) at both
# a loose (0.4) and a tight (0.9) threshold.
#
# The near-dup planes use a splitmix64-mixed coefficient stream, NOT
# the LCG stream of plane_coeff: adjacent LCG planes are correlated
# enough that 4-row band bits badly undershoot the iid curve
# (measured 75% recall where the formula said 94%); with the mixed
# stream measured recall tracks the prediction within ~1 point.

_M64 = (1 << 64) - 1


def _mix64(x: int) -> int:
    """splitmix64 finalizer — full-avalanche integer mix."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return (x ^ (x >> 31)) & _M64


def mix64_np(x):
    """Vectorized splitmix64 (bit-identical to _mix64) — the ONE
    shared copy; nd_plane_matrix and the synthetic generators must
    stay bit-for-bit in sync with the scalar/SQL streams."""
    import numpy as np

    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def nd_plane_coeff(p: int, i: int) -> int:
    """Deterministic well-mixed integer coefficient in [-1000, 1000]."""
    return _mix64(p * DIM + i) % 2001 - 1000


def nd_plane_matrix(n_planes: int, dim: int = DIM):
    """(n_planes, dim) float64 matrix of nd_plane_coeff values,
    built vectorized (same splitmix64 stream, bit-for-bit)."""
    import numpy as np

    idx = (
        np.arange(n_planes, dtype=np.uint64)[:, None] * np.uint64(DIM)
        + np.arange(dim, dtype=np.uint64)[None, :]
    )
    return (mix64_np(idx) % np.uint64(2001)).astype(np.float64) - 1000.0


def banding_for_corpus(
    threshold: float,
    n: int,
    target_recall: float = 0.99,
    max_bands: int = 192,
    max_rows: int = 24,
) -> tuple[int, int]:
    """Corpus-size-aware (bands, rows) for the near-dup scale mode.

    banding_for_threshold's 32-band budget keeps rows <= 8, i.e. at
    most 2^8 buckets per band — the right cost point for small
    corpora, but bucket occupancy grows like N/2^rows, so random
    candidate pairs grow like bands * N^2 / 2^(rows+1): quadratic
    once N >> 2^rows. The scale rule pins rows ~ log2(N) + 2 so that
    expected random candidates stay ~ O(bands * N), then takes bands
    from the same 1-(1-p^r)^b recall curve. bands is capped at
    max_bands (hashing cost bands*rows plane dots per vector); when
    the cap binds — tight thresholds at very large N — achieved
    recall falls below target (0.9 @ rows=24: 95% at the 192 cap)
    and the caller should shard the corpus or raise max_bands.
    """
    b0, r0 = banding_for_threshold(threshold, target_recall)
    rows = max(r0, min(max_rows, math.ceil(math.log2(max(n, 2))) + 2))
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    pr = p ** rows
    if pr >= 1.0:
        return 1, rows
    bands = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pr))
    if bands > max_bands:
        achieved = 1.0 - (1.0 - pr) ** max_bands
        if achieved < 0.9:
            # the cap binding a little (e.g. 95% at a 99% target) is a
            # sane cost tradeoff; an achieved recall collapse (loose
            # threshold x huge N -> sub-1%) must never be silent
            raise ValueError(
                f"banding_for_corpus: {max_bands}-band cap yields recall "
                f"{achieved:.3f} < 0.9 at threshold {threshold}, n={n}; "
                "shard the corpus or raise max_bands"
            )
    return min(bands, max_bands), rows


def nd_plane_dot_sql(col: str, p: int, dialect: str, dim: int = DIM) -> str:
    if dialect == "spark":
        coeffs = "array(" + ",".join(
            str(nd_plane_coeff(p, i)) for i in range(dim)
        ) + ")"
        return _fold_sql(
            f"zip_with({col}, {coeffs}, "
            f"(x, c) -> cast(c as double) * cast(x as double))"
        )
    terms = " + ".join(
        f"({nd_plane_coeff(p, i)}) * {elem_sql(col, i, dialect)}"
        for i in range(dim)
    )
    return f"({terms})"


def banding_for_threshold(
    threshold: float,
    target_recall: float = 0.99,
    max_bands: int = 32,
    max_rows: int = 8,
) -> tuple[int, int]:
    """(bands, rows) for >= target_recall at the threshold: the
    LARGEST rows whose required band count fits max_bands — more rows
    per band = selectivity grows like p^r, i.e. the best candidate
    pruning the band budget affords. Hash cost is bands*rows plane
    dots (linear in N); pruning is what survives 10^12 rows."""
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    best: tuple[int, int] | None = None
    for rows in range(1, max_rows + 1):
        pr = p ** rows
        if pr >= 1.0:
            bands = 1
        else:
            bands = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pr))
        if bands <= max_bands:
            best = (bands, rows)
    if best is None:
        # threshold so low no row count fits: single sign bit, all bands
        best = (max_bands, 1)
    return best


def band_key_sql(
    col: str, band: int, dialect: str, rows: int, dim: int = DIM
) -> str:
    """rows-bit sign key for one band (planes band*rows ...)."""
    terms = " + ".join(
        f"(case when {nd_plane_dot_sql(col, band * rows + r, dialect, dim)} > 0 "
        f"then {1 << r} else 0 end)"
        for r in range(rows)
    )
    return f"({terms})"


# ---------------------------------------------------------------------------
# IVF coarse quantizer (frozen deterministic codebook)
#
# Like the LSH planes, the codebook is data-independent: centroid
# coefficients come from a frozen LCG stream, so Spark and DuckDB
# inline the IDENTICAL literals at any scale factor and the inverted
# lists are reproducible without a training artifact. A production
# deployment would train k-means on a sample and persist the codebook
# — the query-side mechanics (assign + nprobe inverted-list join) are
# exactly what is exercised here.

NLIST = 8
NPROBE = 2

_IVF_SALT = 777_767


def centroid_coeff(j: int, i: int) -> int:
    """Deterministic integer coefficient in [-1000, 1000]."""
    return (_LCG_A * (j * DIM + i + _IVF_SALT) + _LCG_C) % 2001 - 1000


def _centroid_norm2(j: int, dim: int = DIM) -> int:
    return sum(centroid_coeff(j, i) ** 2 for i in range(dim))


def centroid_dot_sql(col: str, j: int, dialect: str, dim: int = DIM) -> str:
    if dialect == "spark":
        coeffs = "array(" + ",".join(
            str(centroid_coeff(j, i)) for i in range(dim)
        ) + ")"
        return _fold_sql(
            f"zip_with({col}, {coeffs}, "
            f"(x, c) -> cast(c as double) * cast(x as double))"
        )
    terms = " + ".join(
        f"({centroid_coeff(j, i)}) * {elem_sql(col, i, dialect)}"
        for i in range(dim)
    )
    return f"({terms})"


def _centroid_dist_struct(col: str, j: int, dialect: str, dim: int) -> str:
    # ||x - c||^2 - ||x||^2  =  ||c||^2 - 2<x, c>  (monotone in the
    # true distance for a fixed row; ||x||^2 dropped)
    d = (
        f"(cast({_centroid_norm2(j, dim)} as double) "
        f"- cast(2 as double) * {centroid_dot_sql(col, j, dialect, dim)})"
    )
    if dialect == "spark":
        return f"named_struct('d', {d}, 'c', {j})"
    return f"{{'d': {d}, 'c': {j}}}"


def ivf_assign_sql(col: str, dialect: str, dim: int = DIM, nlist: int = NLIST) -> str:
    """Nearest-centroid cluster id (argmin via sorted struct array —
    lexicographic struct ordering in both engines)."""
    structs = ", ".join(
        _centroid_dist_struct(col, j, dialect, dim) for j in range(nlist)
    )
    if dialect == "spark":
        return f"(array_sort(array({structs}))[0].c)"
    return f"((list_sort([{structs}])[1]).c)"


def ivf_probe_sql(
    col: str, dialect: str, dim: int = DIM, nlist: int = NLIST, nprobe: int = NPROBE
) -> str:
    """List of the nprobe nearest cluster ids (query-side probe set)."""
    structs = ", ".join(
        _centroid_dist_struct(col, j, dialect, dim) for j in range(nlist)
    )
    if dialect == "spark":
        return (
            f"slice(transform(array_sort(array({structs})), x -> x.c), 1, {nprobe})"
        )
    return f"(list_transform(list_sort([{structs}]), x -> x.c)[1:{nprobe}])"
