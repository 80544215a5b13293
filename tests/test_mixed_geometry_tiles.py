"""Distributed tile pipeline with MIXED geometry types: lines and
polygons crossing tile boundaries go through the full project -> clip ->
transform -> MVT path on real Spark (not just the pure-Python kernel
tests), and the decoded output is checked against independently computed
expectations."""

from __future__ import annotations

from tests.conftest import SF_DIR  # noqa: F401  (session fixture import)


def _mixed_features(spark):
    """A tiny feature table around z13 tile (1310, 3166): a point inside,
    a linestring crossing the tile's west edge, a polygon straddling the
    south-east corner, and a far-away point (must be pruned)."""
    from pyspark.sql import functions as F

    from tank_spark.geom import morton, tilemath, wkt

    rows = []

    def add(key, kind, wkt_str):
        gtype, coords = wkt.loads(wkt_str)
        cx, cy = wkt.centroid(gtype, coords)
        xt, yt = tilemath.tile_number(cy, cx, 13)
        rows.append((key, f"feat-{key}", morton.interleave(xt, yt),
                     kind, 1.0, 1, "t", wkt_str))

    lon_min, lat_min, lon_max, lat_max = tilemath.tile_bbox(13, 1310, 3166)
    lon_mid, lat_mid = (lon_min + lon_max) / 2, (lat_min + lat_max) / 2
    add(1, "poi", f"POINT ({lon_mid} {lat_mid})")
    # crosses the west edge: half in tile 1309, centroid in 1310
    add(2, "road",
        f"LINESTRING ({lon_min - 0.01} {lat_mid}, {lon_mid} {lat_mid}, "
        f"{lon_mid} {lat_min + 0.001})")
    # polygon straddling the SE corner
    add(3, "building",
        f"POLYGON (({lon_mid} {lat_min - 0.005}, {lon_max + 0.005} {lat_min - 0.005}, "
        f"{lon_max + 0.005} {lat_mid}, {lon_mid} {lat_mid}, {lon_mid} {lat_min - 0.005}))")
    add(4, "poi", "POINT (10 10)")  # far away

    return spark.createDataFrame(
        rows,
        "key long, uid string, hash long, kind string, score double, "
        "cnt int, tag string, geometry string",
    )


def test_mixed_geometries_through_distributed_pipeline(spark):
    from pyspark.sql import functions as F

    from tank_spark.geom import mvt as mvtmod
    from tank_spark.operators.mvt_tiles import (
        EXTEND, LAYER, TILE_OUT_SCHEMA, _tile_kernel,
    )
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    feats = _mixed_features(spark)
    src = feats.withColumns(
        {"z": F.lit(13), "x": F.lit(1310), "y": F.lit(3166)}
    ).filter(F.col("key") != 4).select(
        "z", "x", "y", "key", "geometry", "kind", "score", "cnt", "tag"
    )
    out = src.groupBy("z", "x", "y").applyInPandas(_tile_kernel, TILE_OUT_SCHEMA).collect()
    assert len(out) == 1
    layer = mvtmod.decode(bytes(out[0]["mvt"]))[LAYER]
    by_id = {f["id"]: f for f in layer["features"]}
    assert set(by_id) == {1, 2, 3}

    # the point sits near the tile center in integer coords
    px, py = by_id[1]["coords"]
    assert abs(px - EXTEND / 2) < EXTEND * 0.02
    assert abs(py - EXTEND / 2) < EXTEND * 0.02

    # the line was clipped at the buffered west edge: min x == -buffer/2
    line = by_id[2]
    assert line["geom_type"] in ("LineString", "MultiLineString")
    pts = line["coords"] if line["geom_type"] == "LineString" else [
        p for part in line["coords"] for p in part
    ]
    min_x = min(p[0] for p in pts)
    assert -40 <= min_x <= 0  # clipped into the 32-unit buffer, not beyond

    # the polygon survives as a closed ring clipped to the buffered tile
    poly = by_id[3]
    assert poly["geom_type"] in ("Polygon", "MultiPolygon")
    ring = poly["coords"][0] if poly["geom_type"] == "Polygon" else poly["coords"][0][0]
    assert ring[0] == ring[-1]
    for p in ring:
        assert -40 <= p[0] <= EXTEND + 40 and -40 <= p[1] <= EXTEND + 40


def test_geojson_featurecollection_ingest(spark, tmp_path):
    import json

    from tank_spark.api import Tank
    from tank_spark.operators.table_ops import write_feature_table
    from tank_spark.sources.features import features_df

    d = str(tmp_path / "layer")
    write_feature_table(features_df(spark, SF_DIR).drop("ts"), d)
    t = Tank(spark, d)
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "id": "g1",
             "geometry": {"type": "Point", "coordinates": [-122.4, 37.77]},
             "properties": {"kind": "poi", "score": 2.5, "cnt": 3, "tag": "x"}},
            {"type": "Feature", "id": "g2",
             "geometry": {"type": "Polygon", "coordinates":
                          [[[-122.41, 37.76], [-122.40, 37.76],
                            [-122.40, 37.77], [-122.41, 37.77],
                            [-122.41, 37.76]]]},
             "properties": {"kind": "building"}},
            {"type": "Feature", "id": "g3", "geometry": None,
             "properties": {"kind": "poi"}},  # no geometry -> rejected
        ],
    }
    res = t.ingest_geojson(json.dumps(fc))
    assert res == {"accepted": 2, "rejected": 1}
    g2 = t.get_feature("g2").collect()[0]
    assert g2["kind"] == "building" and g2["score"] == 0.0  # default applied
    assert g2["hash"] is not None
