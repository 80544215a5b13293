"""Kernel tests: morton, tile math, WKT, clip, MVT round-trips.

Property-based where cheap (hypothesis is available in the image).
"""

import math

from hypothesis import given, settings, strategies as st

from tank_spark.geom import clip as clipmod
from tank_spark.geom import morton, mvt, tilemath, wkt


# ------------------------------------------------------------------ morton

@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
def test_morton_roundtrip(x, y):
    code = morton.interleave(x, y)
    assert 0 <= code < 2**32
    assert morton.deinterleave(code) == (x, y)


def test_morton_known_values():
    # interleave(x in even bits, y in odd bits)
    assert morton.interleave(0, 0) == 0
    assert morton.interleave(1, 0) == 1
    assert morton.interleave(0, 1) == 2
    assert morton.interleave(1, 1) == 3
    assert morton.interleave(0b11, 0b11) == 0b1111
    assert morton.interleave(2**16 - 1, 2**16 - 1) == 2**32 - 1


@given(st.integers(0, 2**10 - 1), st.integers(0, 2**10 - 1), st.integers(0, 5))
def test_morton_range_contiguous_cover(x, y, delta):
    """The aligned-block Morton range contains exactly the block's codes."""
    lo, hi = morton.morton_range(x, y, delta)
    assert hi - lo + 1 >= (1 << delta) ** 2  # range covers at least the block
    # all child codes fall inside [lo, hi]
    for cx in (x << delta, (x << delta) + (1 << delta) - 1):
        for cy in (y << delta, (y << delta) + (1 << delta) - 1):
            assert lo <= morton.interleave(cx, cy) <= hi
    # an aligned 2^d block is a perfectly contiguous Z-curve segment
    assert hi - lo + 1 == (1 << delta) ** 2 or delta == 0 and lo == hi


def test_morton_out_of_domain():
    import pytest
    with pytest.raises(ValueError):
        morton.interleave(2**16, 0)


# ---------------------------------------------------------------- tilemath

def test_tile_number_known():
    # (0,0) sits at the center of the world -> tile (2^(z-1), 2^(z-1))
    assert tilemath.tile_number(0.0, 0.0, 1) == (1, 1)
    assert tilemath.tile_number(0.0, 0.0, 13) == (4096, 4096)
    # NW quadrant point
    xt, yt = tilemath.tile_number(45.0, -90.0, 2)
    assert (xt, yt) == (1, 1)
    # slippy formula spot value: San Francisco at z=13
    xt, yt = tilemath.tile_number(37.7749, -122.4194, 13)
    assert (xt, yt) == (1310, 3166)


@given(st.floats(-85.0, 85.0), st.floats(-179.99, 179.99), st.integers(1, 15))
@settings(max_examples=200)
def test_tile_bbox_contains_point(lat, lon, z):
    xt, yt = tilemath.tile_number(lat, lon, z)
    lon_min, lat_min, lon_max, lat_max = tilemath.tile_bbox(z, xt, yt)
    assert lon_min - 1e-9 <= lon <= lon_max + 1e-9
    assert lat_min - 1e-7 <= lat <= lat_max + 1e-7


@given(st.floats(-85.0, 85.0), st.floats(-180.0, 180.0))
def test_project_unproject_roundtrip(lat, lon):
    x, y = tilemath.project(lon, lat)
    assert 0.0 <= x <= 1.0 and 0.0 <= y <= 1.0
    lon2, lat2 = tilemath.unproject(x, y)
    assert math.isclose(lon, lon2, abs_tol=1e-9)
    assert math.isclose(lat, lat2, abs_tol=1e-9)


def test_project_matches_tile_number():
    """floor(project * 2^z) equals the slippy tile number."""
    for lat, lon, z in [(37.7, -122.4, 13), (52.5, 13.4, 10), (-33.9, 151.2, 8)]:
        x, y = tilemath.project(lon, lat)
        xt, yt = tilemath.tile_number(lat, lon, z)
        assert int(x * (1 << z)) == xt
        assert int(y * (1 << z)) == yt


# --------------------------------------------------------------------- wkt

WKT_CASES = [
    "POINT (30 10)",
    "LINESTRING (30 10, 10 30, 40 40)",
    "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
    "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
    "MULTIPOINT (10 40, 40 30, 20 20, 30 10)",
    "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
    "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
    "((15 5, 40 10, 10 20, 5 10, 15 5)))",
]


def test_wkt_roundtrip():
    for w in WKT_CASES:
        t, c = wkt.loads(w)
        assert wkt.dumps(t, c) == w


def test_wkt_floats_and_sci():
    t, c = wkt.loads("POINT (-122.419416 37.774929)")
    assert t == "Point"
    assert math.isclose(c[0], -122.419416)
    t, c = wkt.loads("POINT (1e-3 -2.5E2)")
    assert math.isclose(c[0], 0.001) and math.isclose(c[1], -250.0)


def test_wkt_bbox_centroid():
    t, c = wkt.loads("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert wkt.bbox(t, c) == (0, 0, 4, 4)
    cx, cy = wkt.centroid(t, c)
    assert math.isclose(cx, 2.0) and math.isclose(cy, 2.0)
    # line centroid is length-weighted
    t, c = wkt.loads("LINESTRING (0 0, 10 0)")
    cx, cy = wkt.centroid(t, c)
    assert math.isclose(cx, 5.0) and math.isclose(cy, 0.0)
    # polygon with hole: centroid of ring area, not vertices
    t, c = wkt.loads(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 1 3, 3 3, 3 1, 1 1))"
    )
    cx, cy = wkt.centroid(t, c)
    assert 5.0 < cx < 5.3 and 5.0 < cy < 5.3  # pulled away from the hole at (2,2)


# -------------------------------------------------------------------- clip

def test_clip_point():
    assert clipmod.clip("Point", [5, 5], 0, 0, 10, 10) == ("Point", [5, 5])
    assert clipmod.clip("Point", [15, 5], 0, 0, 10, 10) is None
    # edge-inclusive
    assert clipmod.clip("Point", [10, 10], 0, 0, 10, 10) is not None


def test_clip_line_crossing():
    t, c = clipmod.clip("LineString", [[-5, 5], [15, 5]], 0, 0, 10, 10)
    assert t == "LineString"
    assert c == [[0, 5], [10, 5]]


def test_clip_line_reentrant():
    # enters, exits, re-enters -> MultiLineString with 2 runs
    line = [[-5, 5], [5, 5], [5, 15], [8, 15], [8, 5], [15, 5]]
    t, c = clipmod.clip("LineString", line, 0, 0, 10, 10)
    assert t == "MultiLineString"
    assert len(c) == 2


def test_clip_line_outside():
    assert clipmod.clip("LineString", [[20, 20], [30, 30]], 0, 0, 10, 10) is None


def test_clip_polygon_corner():
    # square overlapping the rect corner -> clipped to the overlap
    ring = [[5, 5], [15, 5], [15, 15], [5, 15], [5, 5]]
    t, c = clipmod.clip("Polygon", [ring], 0, 0, 10, 10)
    assert t == "Polygon"
    pts = set(map(tuple, c[0]))
    assert pts == {(5, 5), (10, 5), (10, 10), (5, 10)}
    assert c[0][0] == c[0][-1]  # closed


def test_clip_polygon_outside_and_covering():
    ring = [[20, 20], [30, 20], [30, 30], [20, 30], [20, 20]]
    assert clipmod.clip("Polygon", [ring], 0, 0, 10, 10) is None
    # polygon covering the whole rect -> clipped to the rect itself
    ring = [[-10, -10], [20, -10], [20, 20], [-10, 20], [-10, -10]]
    t, c = clipmod.clip("Polygon", [ring], 0, 0, 10, 10)
    area = abs(sum(x1 * y2 - x2 * y1 for (x1, y1), (x2, y2) in zip(c[0], c[0][1:]))) / 2
    assert area == 100.0


@given(st.lists(st.tuples(st.floats(-20, 30), st.floats(-20, 30)),
                min_size=2, max_size=8))
@settings(max_examples=100)
def test_clip_line_stays_inside(pts):
    line = [[x, y] for x, y in pts]
    res = clipmod.clip("LineString", line, 0, 0, 10, 10)
    if res is None:
        return
    for p in wkt.iter_points(*res):
        assert -1e-9 <= p[0] <= 10 + 1e-9
        assert -1e-9 <= p[1] <= 10 + 1e-9


# --------------------------------------------------------------------- mvt

def test_mvt_roundtrip_point():
    feats = [{"geom_type": "Point", "coords": [100, 200],
              "props": {"kind": "poi", "score": 1.5, "cnt": 7}, "id": 42}]
    tile = mvt.decode(mvt.encode(feats, layer_name="base"))
    layer = tile["base"]
    assert layer["extent"] == 4096 and layer["version"] == 2
    f = layer["features"][0]
    assert f["id"] == 42
    assert f["geom_type"] == "Point" and f["coords"] == [100, 200]
    assert f["props"] == {"kind": "poi", "score": 1.5, "cnt": 7}


def test_mvt_roundtrip_all_types():
    feats = [
        {"geom_type": "LineString", "coords": [[0, 0], [10, 5], [20, 0]],
         "props": {"a": -3}},
        {"geom_type": "Polygon",
         "coords": [[[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]]],
         "props": {"b": True}},
        {"geom_type": "MultiPoint", "coords": [[1, 1], [2, 2]], "props": {}},
    ]
    tile = mvt.decode(mvt.encode(feats))
    out = tile["io.marauder.tank"]["features"]
    assert out[0]["geom_type"] == "LineString"
    assert out[0]["coords"] == [[0, 0], [10, 5], [20, 0]]
    assert out[0]["props"] == {"a": -3}
    assert out[1]["geom_type"] == "Polygon"
    # ring closed and same vertex set
    ring = out[1]["coords"][0]
    assert ring[0] == ring[-1]
    assert set(map(tuple, ring)) == {(0, 0), (100, 0), (100, 100), (0, 100)}
    assert out[1]["props"] == {"b": True}
    assert out[2]["geom_type"] == "MultiPoint"
    assert out[2]["coords"] == [[1, 1], [2, 2]]


def _ring_area2(ring):
    return sum(x1 * y2 - x2 * y1 for (x1, y1), (x2, y2) in zip(ring, ring[1:]))


def test_mvt_polygon_winding_normalized():
    """MVT 2.1 §4.3.3.3: exterior rings positive signed area, holes
    negative — regardless of input winding. GeoJSON CCW exteriors become
    negative-area after the y-down tile transform and must be reversed."""
    ccw_in_ydown = [[0, 100], [100, 100], [100, 0], [0, 0], [0, 100]]  # area < 0
    hole_pos = [[25, 25], [75, 25], [75, 75], [25, 75], [25, 25]]       # area > 0
    feats = [{"geom_type": "Polygon", "coords": [ccw_in_ydown, hole_pos],
              "props": {}}]
    out = mvt.decode(mvt.encode(feats))["io.marauder.tank"]["features"][0]
    assert out["geom_type"] == "Polygon"
    ext, hole = out["coords"][0], out["coords"][1]
    assert _ring_area2(ext) > 0 and _ring_area2(hole) < 0
    assert set(map(tuple, ext)) == set(map(tuple, ccw_in_ydown))
    # MultiPolygon: a second positive exterior starts a new polygon (the
    # decoder relies on winding; pre-fix it merged rings into holes)
    second = [[200, 300], [300, 300], [300, 200], [200, 200], [200, 300]]
    feats = [{"geom_type": "MultiPolygon",
              "coords": [[ccw_in_ydown], [second]], "props": {}}]
    out = mvt.decode(mvt.encode(feats))["io.marauder.tank"]["features"][0]
    assert out["geom_type"] == "MultiPolygon"
    assert len(out["coords"]) == 2
    for poly in out["coords"]:
        assert _ring_area2(poly[0]) > 0


def test_mvt_value_dedup():
    feats = [{"geom_type": "Point", "coords": [0, 0], "props": {"k": "v"}}
             for _ in range(10)]
    blob = mvt.encode(feats)
    tile = mvt.decode(blob)
    assert len(tile["io.marauder.tank"]["features"]) == 10
    # shared key/value tables keep the blob small: 10 features share 1 key+1 value
    assert len(blob) < 200


@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
@settings(max_examples=50, deadline=None)
def test_morton_sql_emitter_matches_python(x, y):
    """The DuckDB SQL emitter (used by every oracle) must agree with the
    Python kernel bit-for-bit."""
    import duckdb

    from tank_spark.geom.morton import morton_sql

    got = duckdb.sql(f"SELECT {morton_sql(str(x), str(y))} AS m").fetchone()[0]
    assert got == morton.interleave(x, y)


@given(
    st.lists(
        st.tuples(st.integers(-100, 4196), st.integers(-100, 4196)),
        min_size=1, max_size=6,
    ),
    st.integers(0, 2**40),
    st.text(alphabet="abcdef ", min_size=0, max_size=12),
)
@settings(max_examples=60, deadline=None)
def test_mvt_point_roundtrip_property(pts, fid, tag):
    """Any multipoint with in/out-of-extent integer coords, any id, any
    props round-trips through encode/decode unchanged."""
    if len(pts) == 1:
        f = {"geom_type": "Point", "coords": list(pts[0]),
             "props": {"tag": tag, "n": fid % 1000}, "id": fid}
    else:
        f = {"geom_type": "MultiPoint", "coords": [list(p) for p in pts],
             "props": {"tag": tag, "n": fid % 1000}, "id": fid}
    out = mvt.decode(mvt.encode([f]))["io.marauder.tank"]["features"][0]
    assert out["id"] == fid
    assert out["props"] == {"tag": tag, "n": fid % 1000}
    if f["geom_type"] == "Point":
        assert out["coords"] == f["coords"]
    else:
        got = out["coords"] if out["geom_type"] == "MultiPoint" else [out["coords"]]
        assert got == f["coords"]


@given(st.lists(st.tuples(st.floats(-30, 40), st.floats(-30, 40)),
                min_size=3, max_size=7))
@settings(max_examples=60, deadline=None)
def test_clip_polygon_stays_inside_property(pts):
    """Clipped polygon vertices always lie inside the clip rect."""
    ring = [list(p) for p in pts] + [list(pts[0])]
    res = clipmod.clip("Polygon", [ring], 0, 0, 10, 10)
    if res is None:
        return
    for p in wkt.iter_points(*res):
        assert -1e-9 <= p[0] <= 10 + 1e-9
        assert -1e-9 <= p[1] <= 10 + 1e-9


# ---------------------------------------------------------------------------
# geohash (reference geohash.kt — dead code there; implemented r13 for
# inventory totality)
# ---------------------------------------------------------------------------

from tank_spark.geom import geohash


def test_geohash_known_vector():
    # the canonical public test vector (Wikipedia's own example)
    assert geohash.encode(57.64911, 10.40744) == "u4pruydqqvj8"
    lat, lon = geohash.decode("u4pruydqqvj8")
    assert abs(lat - 57.64911) < 1e-6 and abs(lon - 10.40744) < 1e-6


def test_geohash_strict_gt_boundary():
    # the reference bisects with STRICT `value > mid` (geohash.kt:45,54):
    # (0, 0) sits exactly on every first-level boundary and takes the
    # LOW cell each time -> first char '7', then all 'z' as the
    # intervals converge to 0 from below
    assert geohash.encode(0.0, 0.0) == "7zzzzzzzzzzz"


def test_geohash_precision_and_roundtrip():
    assert len(geohash.encode(52.5, 13.4)) == 12      # geohash.kt PRECISION
    assert geohash.encode(52.5, 13.4, precision=5) == \
        geohash.encode(52.5, 13.4)[:5]
    # decode returns the cell center; re-encoding the center reproduces
    # the hash (the center is never on a bisection boundary)
    import random

    rng = random.Random(13)
    for _ in range(200):
        lat = rng.uniform(-89.9, 89.9)
        lon = rng.uniform(-179.9, 179.9)
        g = geohash.encode(lat, lon)
        clat, clon = geohash.decode(g)
        # cell size at 12 chars: 60 bits -> lon 30 bits, lat 30 bits
        assert abs(clat - lat) <= 180.0 / (1 << 30)
        assert abs(clon - lon) <= 360.0 / (1 << 30)
        assert geohash.encode(clat, clon) == g


def test_geohash_decode_rejects_junk():
    import pytest as _pytest

    with _pytest.raises(KeyError):
        geohash.decode("abca")  # 'a' is not base32 (geohash alphabet)
