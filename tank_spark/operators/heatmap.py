"""The heatmap query — tank's only aggregation (reference
application.kt:522-615; SURVEY.md §2.4).

Reference semantics: subdivide the requested tile's bbox IN DEGREES into an
n x n grid (n=24 for z in 1..9, else 16; application.kt:549-555), map each
cell's degree-space midpoint through the slippy-tile formula to its zoom-13
Morton bucket (application.kt:556-566 — the y mapping is nonlinear in
latitude), count features per bucket, keep cells with count > 0.

``cell_j`` counts from the SOUTH edge of the tile (the reference iterates
cells from bbox[1] = min latitude upward).

The reference plans the cell grid driver-side and issues up to n^2
sequential count queries (576 round-trips at mid zooms — its dominant
cost). Here the grid is planned driver-side the same way (<= 576 tuples of
pure-Python math — the same planner-side role as the tile query's [lo, hi])
but executed as ONE pruned scan + ONE partial-aggregated groupBy on
``hash``, joined to the broadcast literal cell grid. At 100 TB: map-side
combine shrinks the shuffle to <= #buckets rows; the grid (<= 576 rows)
broadcasts. Because both the Spark plan and the DuckDB oracle consume the
SAME precomputed integer cell->bucket tuples, the comparison is engine-exact
even though the mapping itself is transcendental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.geom import tilemath
from tank_spark.geom.morton import interleave
from tank_spark.operators.tiles import tile_hash_range
from tank_spark.plans.registry import register
from tank_spark.sources.features import FEATURES_CTE, HASH_LEVEL, features_df
from tank_spark.util import local_values_df


def grid_n(z: int) -> int:
    """Reference application.kt:549-553: 24x24 for z in 1..9, else 16x16."""
    return 24 if 1 <= z <= 9 else 16


def cell_grid(z: int, x: int, y: int) -> list[tuple[int, int, int]]:
    """Driver-side cell planning: (cell_i, cell_j, cell_hash) for every
    grid cell of tile (z, x, y).

    Exactly the reference's math (application.kt:549-566): tile bbox in
    degrees, linear subdivision, midpoint of each cell, slippy formula at
    hash_level, Morton interleave. cell_j=0 is the southernmost row.
    """
    n = grid_n(z)
    lon0, lat0, lon1, lat1 = tilemath.tile_bbox(z, x, y)
    xd = (lon1 - lon0) / n
    yd = (lat1 - lat0) / n
    out = []
    for i in range(n):
        lon = lon0 + (i + 0.5) * xd
        for j in range(n):
            lat = lat0 + (j + 0.5) * yd
            tx, ty = tilemath.tile_number(lat, lon, HASH_LEVEL)
            out.append((i, j, interleave(tx, ty)))
    return out


def heatmap_for(spark: SparkSession, feats: DataFrame,
                z: int, x: int, y: int) -> DataFrame:
    """Heatmap over an arbitrary features DataFrame: (cell_i, cell_j,
    n_features), count>0 (the reference's count filter,
    application.kt:602)."""
    lo, hi = tile_hash_range(z, x, y)
    cells = local_values_df(
        spark, cell_grid(z, x, y), "cell_i long, cell_j long, cell_hash long"
    )
    counts = (
        feats.filter(F.col("hash").between(lo, hi))
        .groupBy("hash")
        .agg(F.count(F.lit(1)).alias("n_features"))
    )
    # inner join == the reference's count>0 filter
    return (
        F.broadcast(cells)
        .join(counts, cells.cell_hash == counts.hash)
        .select("cell_i", "cell_j", "n_features")
    )


def heatmap(spark: SparkSession, sf_dir: str, z: int, x: int, y: int) -> DataFrame:
    """Heatmap for tile (z, x, y) over the derived features table."""
    return heatmap_for(spark, features_df(spark, sf_dir), z, x, y)


def heatmap_oracle(z: int, x: int, y: int) -> str:
    lo, hi = tile_hash_range(z, x, y)
    values = ", ".join(f"({i}, {j}, {h})" for i, j, h in cell_grid(z, x, y))
    return f"""{FEATURES_CTE},
cells(cell_i, cell_j, cell_hash) AS (VALUES {values}),
counts AS (
  SELECT hash, COUNT(*) AS n_features FROM features
  WHERE hash BETWEEN {lo} AND {hi} GROUP BY hash
)
SELECT cell_i, cell_j, n_features FROM cells JOIN counts ON cell_hash = hash
"""


@register("heatmap_z9", heatmap_oracle(9, 80, 196),
          doc="heatmap, 24x24 grid regime: one groupBy replaces 576 point "
              "counts; degree-space cell midpoints per the reference")
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
