"""Morton (Z-order) curve encoding of tile coordinates.

Parity target: reference zCurve.kt:8-31 — interleave of two 16-bit tile
coordinates into one 32-bit code (so zoom levels <= 15 are safe), used as
the spatial partition key ``hash`` (reference Tyler.kt:127-131).

Three faces of the same function:

* :func:`interleave` / :func:`deinterleave` — pure Python (kernel + tests)
* :func:`morton_col` — PySpark Column expression (JVM-side bitwise ops,
  stays inside whole-stage codegen; no UDF)
* :func:`morton_sql` — the identical computation as an ANSI-SQL string
  fragment DuckDB can run (for oracle twins)

All three use the classic magic-number bit-spreading ladder, so the Spark
plan is 8 bitwise ops per coordinate — negligible vs. a parquet scan and
fully codegen-able.
"""

from __future__ import annotations

MAX_COORD = 1 << 16  # zCurve.kt supports x, y < 2^16 (hash_level <= 15)

_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread(v: int) -> int:
    """Spread the low 16 bits of v into the even bit positions of 32 bits."""
    for shift, mask in _MASKS:
        v = (v | (v << shift)) & mask
    return v


def _unspread(v: int) -> int:
    v &= 0x55555555
    v = (v | (v >> 1)) & 0x33333333
    v = (v | (v >> 2)) & 0x0F0F0F0F
    v = (v | (v >> 4)) & 0x00FF00FF
    v = (v | (v >> 8)) & 0x0000FFFF
    return v


def interleave(x: int, y: int) -> int:
    """Morton code of tile (x, y): x in even bits, y in odd bits.

    Matches reference zCurve.kt:20-31 (x first / low bit).
    """
    if not (0 <= x < MAX_COORD and 0 <= y < MAX_COORD):
        raise ValueError(f"tile coords out of 16-bit Morton domain: ({x}, {y})")
    return _spread(x) | (_spread(y) << 1)


def deinterleave(code: int) -> tuple[int, int]:
    """Inverse of :func:`interleave` (reference zCurve.kt:8-18)."""
    return _unspread(code), _unspread(code >> 1)


def morton_range(x: int, y: int, delta: int) -> tuple[int, int]:
    """[lo, hi] Morton-code range covering the 2^delta x 2^delta aligned
    block of child tiles under parent tile (x, y).

    Because the block is aligned, the range is contiguous: this is the
    single BETWEEN predicate replacing the reference's dense enumeration
    (application.kt:371-379, which materializes 4^delta codes).
    """
    lo = interleave(x << delta, y << delta)
    hi = interleave((x << delta) + (1 << delta) - 1, (y << delta) + (1 << delta) - 1)
    return lo, hi


# ---------------------------------------------------------------- Spark side

def morton_col(x_col, y_col):
    """PySpark Column: Morton interleave of two integer tile-coord columns.

    Pure ``shiftleft``/``&``/``|`` — JVM-side, codegen'd, no UDF.
    """
    from pyspark.sql import functions as F

    def spread(c):
        c = F.col(c) if isinstance(c, str) else c
        c = c.cast("long")
        for shift, mask in _MASKS:
            c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
        return c

    return spread(x_col).bitwiseOR(F.shiftleft(spread(y_col), 1)).cast("long")


# ----------------------------------------------------------------- SQL side

def spread_sql(expr: str) -> str:
    """SQL fragment spreading the low 16 bits of ``expr`` (DuckDB/ANSI)."""
    e = f"CAST(({expr}) AS BIGINT)"
    for shift, mask in _MASKS:
        e = f"((({e}) | (({e}) << {shift})) & {mask})"
        # note: re-substituting e keeps it a pure expression tree; DuckDB CSE
        # handles the duplication.
    return e


def morton_sql(x_expr: str, y_expr: str) -> str:
    """SQL fragment computing the Morton code of (x_expr, y_expr)."""
    return f"({spread_sql(x_expr)} | ({spread_sql(y_expr)} << 1))"
