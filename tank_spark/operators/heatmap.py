"""The heatmap query — tank's only aggregation (reference
application.kt:522-615; SURVEY.md §2.4).

Reference semantics: split the requested tile into an n x n grid (n=24 for
z in 1..9, else 16), map each cell's center to its zoom-13 Morton bucket,
count features per bucket, keep cells with count > 0.

The reference issues up to n^2 sequential count queries (576 round-trips at
mid zooms — its dominant cost, application.kt:556-599). Here the same
result is ONE pruned scan + ONE partial-aggregated groupBy on ``hash``
(bounded key domain: at most 2^(2*(13-z)) buckets under the tile), joined
to the broadcast-sized cell grid. At 100 TB: map-side combine shrinks the
shuffle to <= #buckets rows; the cell grid (<= 576 rows) broadcasts.

Cell -> bucket mapping is exact integer arithmetic:
floor(((x*n + i + 0.5) / (n*2^z)) * 2^13)  ==  ((2*(x*n+i)+1) * 2^13) DIV (2*n*2^z)
so the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.geom.morton import morton_col, morton_sql
from tank_spark.operators.tiles import tile_hash_range
from tank_spark.plans.registry import register
from tank_spark.sources.features import FEATURES_CTE, features_df


def grid_n(z: int) -> int:
    """Reference application.kt:549-553: 24x24 for z in 1..9, else 16x16."""
    return 24 if 1 <= z <= 9 else 16


def heatmap(spark: SparkSession, sf_dir: str, z: int, x: int, y: int) -> DataFrame:
    """Heatmap for tile (z, x, y): (cell_i, cell_j, n_features), count>0."""
    n = grid_n(z)
    lo, hi = tile_hash_range(z, x, y)

    cells = (
        spark.range(n).select(F.col("id").alias("cell_i"))
        .crossJoin(spark.range(n).select(F.col("id").alias("cell_j")))
    )
    denom = 2 * n * (1 << z)
    ctx = F.expr(f"(2*({x}*{n} + cell_i) + 1) * 8192 DIV {denom}")
    cty = F.expr(f"(2*({y}*{n} + cell_j) + 1) * 8192 DIV {denom}")
    cells = cells.withColumn("cell_hash", morton_col(ctx, cty))

    counts = (
        features_df(spark, sf_dir)
        .filter(F.col("hash").between(lo, hi))
        .groupBy("hash")
        .agg(F.count(F.lit(1)).alias("n_features"))
    )
    # inner join == the reference's count>0 filter (application.kt:602)
    return (
        F.broadcast(cells)
        .join(counts, cells.cell_hash == counts.hash)
        .select("cell_i", "cell_j", "n_features")
    )


def heatmap_oracle(z: int, x: int, y: int) -> str:
    n = grid_n(z)
    lo, hi = tile_hash_range(z, x, y)
    denom = 2 * n * (1 << z)
    ctx = f"((2*({x}*{n} + cell_i) + 1) * 8192) // {denom}"
    cty = f"((2*({y}*{n} + cell_j) + 1) * 8192) // {denom}"
    return f"""{FEATURES_CTE},
cells AS (
  SELECT a.cell_i, b.cell_j FROM
    (SELECT unnest(generate_series(0, {n - 1})) AS cell_i) a,
    (SELECT unnest(generate_series(0, {n - 1})) AS cell_j) b
),
cellmap AS (
  SELECT cell_i, cell_j, {morton_sql("ctx", "cty")} AS cell_hash
  FROM (SELECT cell_i, cell_j, {ctx} AS ctx, {cty} AS cty FROM cells)
),
counts AS (
  SELECT hash, COUNT(*) AS n_features FROM features
  WHERE hash BETWEEN {lo} AND {hi} GROUP BY hash
)
SELECT cell_i, cell_j, n_features FROM cellmap JOIN counts ON cell_hash = hash
"""


@register("heatmap_z9", heatmap_oracle(9, 80, 196),
          doc="heatmap, 24x24 grid regime: one groupBy replaces 576 point counts")
def heatmap_z9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heatmap(spark, sf_dir, 9, 80, 196)


@register("heatmap_z11", heatmap_oracle(11, 320, 784),
          doc="heatmap, 16x16 grid regime")
def heatmap_z11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heatmap(spark, sf_dir, 11, 320, 784)


@register("heatmap_z14", heatmap_oracle(14, 2562, 6275),
          doc="heatmap, z>hash_level regime: every cell maps to the single "
              "parent zoom-13 bucket (cells repeat its count) — reference "
              "semantics preserved exactly")
def heatmap_z14(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (2562 >> 1, 6275 >> 1) = (1281, 3137)
    return heatmap(spark, sf_dir, 14, 2562, 6275)
