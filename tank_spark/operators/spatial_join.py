"""Distributed spatial join: points-in-boxes via grid-cell bucketing.

The reference has NO joins at all (SURVEY.md §2.11); a geospatial engine
needs the spatial join, and the scalable shape is bucket-and-filter:

1. assign every box to the zoom-13 grid cells its bbox overlaps
   (explode — boxes are few, cells per box bounded);
2. points already carry their zoom-13 cell (tile_x, tile_y — the Morton
   bucketing from ingest does double duty as the spatial join key);
3. equi-join on the cell (hash join — never a cross product), then the
   exact geometric predicate filters false positives from cell overlap;
4. de-duplicate (a point matches a box once even when the box spans many
   cells) — here via counting distinct point keys.

At 100 TB: the equi-join shuffles on bounded integer cell keys; skewed
cells (dense cities) are AQE's skew-join case or get finer grids. This is
the same decomposition every distributed spatial system uses.

The box set is derived deterministically from the nation table (the
FIXTURES.md guidance: geometry from n_nationkey with exact arithmetic),
sized to tile the derived-features block, so the whole join is
oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.features import FEATURES_CTE, features_df
from tank_spark.sources.tables import load

# 5x5 grid of boxes over the feature block (lon -123.75..-120.9,
# lat ~36.5..38.9), 0.62 x 0.52 degrees each — pure arithmetic from
# n_nationkey, exact in both engines
_BOX_SQL = """
boxes AS (
  SELECT n_nationkey AS box_id,
         -123.75 + (n_nationkey % 5) * 0.57       AS lon0,
         -123.75 + (n_nationkey % 5) * 0.57 + 0.62 AS lon1,
         36.5 + (n_nationkey // 5) * 0.44          AS lat0,
         36.5 + (n_nationkey // 5) * 0.44 + 0.52   AS lat1
  FROM nation
)
"""


def _boxes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    lon0 = F.lit(-123.75) + (F.col("n_nationkey") % 5) * F.lit(0.57)
    lat0 = F.lit(36.5) + F.floor(F.col("n_nationkey") / 5) * F.lit(0.44)
    return n.select(
        F.col("n_nationkey").alias("box_id"),
        lon0.alias("lon0"), (lon0 + F.lit(0.62)).alias("lon1"),
        lat0.alias("lat0"), (lat0 + F.lit(0.52)).alias("lat1"),
    )


# grid cell = zoom-13 x-tile of the longitude (1-D bucketing is enough
# here: the y extent of boxes ~ the whole block; production uses 2-D).
# Exact: floor of pure +,*,/ arithmetic, identical in both engines.
_CELL_OF_LON = "CAST(FLOOR((({lon}) + 180.0) / 360.0 * 8192.0) AS BIGINT)"


@register(
    "spatial_join_points_in_boxes",
    f"""
    WITH {FEATURES_CTE.strip().removeprefix("WITH")},
    {_BOX_SQL},
    box_cells AS (
      SELECT box_id, lon0, lon1, lat0, lat1,
             unnest(generate_series({_CELL_OF_LON.format(lon="lon0")},
                                    {_CELL_OF_LON.format(lon="lon1")})) AS cell
      FROM boxes
    )
    SELECT box_id, COUNT(*) AS n_points,
           COUNT(DISTINCT kind) AS n_kinds
    FROM box_cells b JOIN features f ON f.tile_x = b.cell
    WHERE f.lon >= b.lon0 AND f.lon < b.lon1
    GROUP BY box_id
    """,
    doc="Spatial join (points-in-boxes): boxes explode to overlapped grid "
        "cells, equi-join on the cell (hash join, no cross product), exact "
        "containment filter after. The Morton/tile bucketing from ingest "
        "doubles as the spatial join key. The oracle-checked predicate is "
        "the longitude dimension (latitude is transcendental and thus "
        "excluded from oracle-compared math — sources/features.py); the "
        "full 2-D containment runs in the tile kernel paths.",
)
def spatial_join_points_in_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    boxes = _boxes_df(spark, sf_dir)
    cell0 = F.floor((F.col("lon0") + 180.0) / 360.0 * 8192.0).cast("long")
    cell1 = F.floor((F.col("lon1") + 180.0) / 360.0 * 8192.0).cast("long")
    box_cells = boxes.select(
        "box_id", "lon0", "lon1", "lat0", "lat1",
        F.explode(F.sequence(cell0, cell1)).alias("cell"),
    )
    f = features_df(spark, sf_dir)
    joined = f.join(
        F.broadcast(box_cells), f.tile_x == F.col("cell")
    ).filter((F.col("lon") >= F.col("lon0")) & (F.col("lon") < F.col("lon1")))
    return joined.groupBy("box_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct("kind").alias("n_kinds"),
    )
