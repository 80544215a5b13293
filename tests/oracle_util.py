"""Local replica of the driver's oracle-parity check.

Runs a registered query's Spark builder and its DuckDB oracle SQL over the
same sf dir, then compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted, NaN-safe, small float
tolerance so genuinely-equal plans pass while wrong plans still fail
loudly — the driver's check is an exact hash, so builders must keep
float-producing expressions engine-exact; see sources/features.py).
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    # floats compare BIT-EXACT (hex) — a full sweep showed every oracle
    # query achieves it (integer/fixed-point aggregates, sequential folds),
    # and the driver's value hash is exact, so the local gate must be too.
    # ints normalize through float when small so BIGINT vs DOUBLE columns
    # carrying the same value still match.
    if v is None:
        return ("\x00null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("\x01nan",)
        return ("f", v.hex())
    if isinstance(v, int):
        return ("f", float(v).hex()) if abs(v) < 2**52 else ("i", v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat().replace("+00:00", ""))
    if isinstance(v, list):
        return ("l", tuple(_norm(x) for x in v))
    return ("s", str(v))


def compare(spark, sf_dir: str, name: str) -> None:
    """Assert Spark result == DuckDB oracle result for query ``name``."""
    from tank_spark.plans.registry import load_all

    q = load_all()[name]
    assert q.oracle is not None, f"{name} has no oracle"
    sdf = q.spark(spark, sf_dir)
    s_cols = sorted(sdf.columns)
    s_rows = [tuple(_norm(row[c]) for c in s_cols) for row in sdf.collect()]

    con = duckdb_con(sf_dir)

    # Result-type guard (VERDICT r5): _norm erases integer-width
    # differences locally, but the driver hashes exact values — a DuckDB
    # HUGEINT (e.g. bare SUM(BIGINT)) hash-mismatches Spark's BIGINT even
    # when every value is equal. Reject oracle output columns whose type
    # the Spark side cannot emit, so the bug class fails HERE, not at the
    # driver. DECIMAL is allowed only when the Spark column is DecimalType.
    from pyspark.sql.types import DecimalType

    spark_decimals = {
        f.name for f in sdf.schema.fields if isinstance(f.dataType, DecimalType)
    }
    desc = con.execute(f"DESCRIBE {q.oracle}").fetchall()
    for col_name, col_type, *_ in desc:
        t = col_type.upper()
        assert "HUGEINT" not in t, (
            f"{name}: oracle column {col_name!r} is {col_type} — DuckDB "
            "int128 never hash-matches Spark; CAST it (e.g. AS BIGINT)"
        )
        if t.startswith("DECIMAL") and col_name not in spark_decimals:
            raise AssertionError(
                f"{name}: oracle column {col_name!r} is {col_type} but the "
                "Spark column is not DecimalType — the driver hash will "
                "mismatch; CAST the oracle column to the Spark type"
            )

    res = con.execute(q.oracle)
    d_cols_raw = [d[0] for d in res.description]
    d_rows_raw = res.fetchall()
    order = sorted(range(len(d_cols_raw)), key=lambda i: d_cols_raw[i])
    d_cols = [d_cols_raw[i] for i in order]
    d_rows = [tuple(_norm(r[i]) for i in order) for r in d_rows_raw]
    con.close()

    assert s_cols == d_cols, f"{name}: columns differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_sorted, d_sorted = sorted(s_rows), sorted(d_rows)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert a == b, f"{name}: first row mismatch at {i}:\n  spark={a}\n  duck ={b}"
