"""The engine's scalar/geo function surface (SURVEY.md §2.7) in two forms:

* **Column expressions** (preferred — JVM-side, codegen'd): ``morton``,
  ``tile_x``/``tile_y``, ``tile_bbox_*``, mercator projection. These are
  what the operators use internally.
* **SQL registration** (``register_sql_functions``): the same functions
  callable from ``spark.sql`` as ``tank_morton(x, y)`` etc. Registration
  uses expression-building where possible; the WKT helpers are Python UDFs
  (documented slow path — geometry text manipulation is not a hot loop;
  hot paths use the Arrow kernels in operators/mvt_tiles.py).

Reference parity notes: morton == zCurve.kt interleave; tile math ==
Tyler.kt:128 / Tile.kt:11; geohash (reference geohash.kt — DEAD CODE
there with no call sites, implemented r13 for inventory totality) ==
geom/geohash.py, registered as tank_geohash_encode/decode.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from tank_spark.geom.morton import morton_col
from tank_spark.geom.tilemath import tile_x_col, tile_y_col

__all__ = [
    "morton", "tile_x", "tile_y", "lon_of_tile", "lat_of_tile",
    "mercator_x", "mercator_y", "register_sql_functions",
]

morton = morton_col
tile_x = tile_x_col
tile_y = tile_y_col


def lon_of_tile(x_col, zoom: int) -> Column:
    """West edge longitude of tile column ``x`` at ``zoom`` (slippy inverse)."""
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    return x / F.lit(float(1 << zoom)) * 360.0 - 180.0


def lat_of_tile(y_col, zoom: int) -> Column:
    """North edge latitude of tile column ``y`` at ``zoom``."""
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    n = F.lit(float(1 << zoom))
    return F.degrees(F.atan(F.sinh(F.lit(math.pi) * (1 - 2 * y / n))))


def mercator_x(lon_col) -> Column:
    """WGS84 lon -> unit-mercator x in [0,1] (geojson-vt convention)."""
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    return lon / 360.0 + 0.5


def mercator_y(lat_col) -> Column:
    """WGS84 lat -> unit-mercator y in [0,1] (clamped at the poles)."""
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    sin = F.sin(F.radians(lat))
    y = 0.5 - F.log((1 + sin) / (1 - sin)) / F.lit(4 * math.pi)
    return F.least(F.greatest(y, F.lit(0.0)), F.lit(1.0))


def register_sql_functions(spark: SparkSession) -> None:
    """Make the surface callable from SQL: ``SELECT tank_morton(x, y)``.

    Numeric functions register as Python UDFs for API availability; the
    Column forms above are the fast path and what internal plans use.
    WKT helpers wrap the pure-Python kernel.
    """
    from pyspark.sql import types as T

    from tank_spark.geom import geohash
    from tank_spark.geom import morton as m
    from tank_spark.geom import tilemath, wkt

    spark.udf.register(
        "tank_morton", lambda x, y: m.interleave(int(x), int(y)), T.LongType()
    )
    spark.udf.register(
        "tank_morton_decode",
        lambda c: list(m.deinterleave(int(c))), T.ArrayType(T.LongType()),
    )
    spark.udf.register(
        "tank_tile_number",
        lambda lat, lon, z: list(tilemath.tile_number(float(lat), float(lon), int(z))),
        T.ArrayType(T.LongType()),
    )
    spark.udf.register(
        "tank_tile_bbox",
        lambda z, x, y: list(tilemath.tile_bbox(int(z), int(x), int(y))),
        T.ArrayType(T.DoubleType()),
    )
    spark.udf.register(
        "tank_wkt_centroid",
        lambda w: list(wkt.centroid(*wkt.loads(w))), T.ArrayType(T.DoubleType()),
    )
    spark.udf.register(
        "tank_wkt_bbox",
        lambda w: list(wkt.bbox(*wkt.loads(w))), T.ArrayType(T.DoubleType()),
    )
    spark.udf.register(
        "tank_geohash_encode",
        lambda lat, lon: geohash.encode(float(lat), float(lon)),
        T.StringType(),
    )
    spark.udf.register(
        "tank_geohash_decode",
        lambda g: list(geohash.decode(g)), T.ArrayType(T.DoubleType()),
    )
