"""Dialect-neutral exact-integer SQL arithmetic shared by the
engine (Spark) and its DuckDB oracle twins.

Both engines run with 64-bit integer semantics (Spark 4 defaults to
ANSI mode, so overflow is a crash, not a wrap), which makes the naive
``x * 1_000_000`` ppm idiom a landmine: it overflows once ``x``
passes ~9.2e12 — about 37 TB of whitespace-tokenized text, well below
the 100 TB design point the corpus operators advertise.
"""

from __future__ import annotations


def ppm_div_sql(num: str, den: str, dialect: str) -> str:
    """Exact ``num * 1_000_000 div den`` without the 64-bit overflow
    of the literal product: base-1000 long division in three stages,
    each multiplying a remainder < ``den`` by only 1000, so every
    intermediate stays below ``den`` * 1000 (safe for den up to
    ~9.2e15). Identity: a*10^6 div S = (a*10^3 div S)*10^3 +
    ((a*10^3 % S)*10^3) div S, applied twice. The remaining ceiling
    is the RESULT itself: (num div den) * 1e6 still overflows when
    the quotient exceeds ~9.2e12 — i.e. a nine-million-fold upsample
    quota, far outside any sane mixture. Dialect-neutral text so the
    DuckDB oracle is expression-identical."""
    dv = "div" if dialect == "spark" else "//"
    r1 = f"(({num}) % ({den}))"
    return (
        f"((({num}) {dv} ({den})) * 1000000 + "
        f"(({r1} * 1000) {dv} ({den})) * 1000 + "
        f"((({r1} * 1000 % ({den})) * 1000) {dv} ({den})))"
    )
