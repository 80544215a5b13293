"""Minimal WKT codec for the geometry types the reference stores.

The reference serializes every feature geometry to WKT text for storage
(Tyler.kt:133) and parses it back on read (application.kt:296, 437). Its
geometry model covers Point / LineString / Polygon and their Multi*
variants (GeoJSON types via io.marauder.charged.models.Geometry).

Internal geometry representation used throughout this kernel (mirrors
GeoJSON coordinate nesting):

    ("Point",        [x, y])
    ("LineString",   [[x, y], ...])
    ("Polygon",      [ring, ...])          ring = [[x, y], ...] closed
    ("MultiPoint",   [[x, y], ...])
    ("MultiLineString", [line, ...])
    ("MultiPolygon", [poly, ...])

No external geo deps (shapely is not available in this environment).
"""

from __future__ import annotations

import re

_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
_PAIR_RE = re.compile(rf"({_NUM})\s+({_NUM})")


def _fmt(v: float) -> str:
    """Format a coordinate: integral floats without trailing .0 stay exact."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _pairs(text: str) -> list[list[float]]:
    return [[float(a), float(b)] for a, b in _PAIR_RE.findall(text)]


def _split_top(text: str) -> list[str]:
    """Split a paren-group list on top-level commas: '(a),(b)' -> ['a','b']."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
            if depth == 1:
                start = i + 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                parts.append(text[start:i])
    return parts


def loads(wkt: str):
    """Parse WKT -> (geom_type, coordinates). Raises ValueError on junk."""
    wkt = wkt.strip()
    m = re.match(r"^\s*(\w+)\s*(?:\((.*)\)|EMPTY)\s*$", wkt, re.S | re.I)
    if not m:
        raise ValueError(f"unparseable WKT: {wkt[:80]!r}")
    kind = m.group(1).upper()
    body = m.group(2)
    if body is None:  # EMPTY
        empty = {"POINT": [], "LINESTRING": [], "POLYGON": [],
                 "MULTIPOINT": [], "MULTILINESTRING": [], "MULTIPOLYGON": []}
        if kind not in empty:
            raise ValueError(f"unsupported WKT type: {kind}")
        return _CANON[kind], empty[kind]
    if kind == "POINT":
        pts = _pairs(body)
        if not pts:
            raise ValueError(f"unparseable WKT point: {wkt[:80]!r}")
        return "Point", pts[0]
    if kind == "LINESTRING":
        return "LineString", _pairs(body)
    if kind == "POLYGON":
        return "Polygon", [_pairs(r) for r in _split_top(body)]
    if kind == "MULTIPOINT":
        return "MultiPoint", _pairs(body)
    if kind == "MULTILINESTRING":
        return "MultiLineString", [_pairs(r) for r in _split_top(body)]
    if kind == "MULTIPOLYGON":
        return "MultiPolygon", [
            [_pairs(r) for r in _split_top(p)] for p in _split_top(body)
        ]
    raise ValueError(f"unsupported WKT type: {kind}")


_CANON = {
    "POINT": "Point", "LINESTRING": "LineString", "POLYGON": "Polygon",
    "MULTIPOINT": "MultiPoint", "MULTILINESTRING": "MultiLineString",
    "MULTIPOLYGON": "MultiPolygon",
}


def dumps(geom_type: str, coords) -> str:
    """(geom_type, coordinates) -> WKT string."""
    t = geom_type.upper()

    def pt(p):
        return f"{_fmt(p[0])} {_fmt(p[1])}"

    def line(ps):
        return ", ".join(pt(p) for p in ps)

    if t == "POINT":
        return f"POINT ({pt(coords)})" if coords else "POINT EMPTY"
    if t == "LINESTRING":
        return f"LINESTRING ({line(coords)})" if coords else "LINESTRING EMPTY"
    if t == "POLYGON":
        if not coords:
            return "POLYGON EMPTY"
        return "POLYGON (" + ", ".join(f"({line(r)})" for r in coords) + ")"
    if t == "MULTIPOINT":
        return f"MULTIPOINT ({line(coords)})" if coords else "MULTIPOINT EMPTY"
    if t == "MULTILINESTRING":
        if not coords:
            return "MULTILINESTRING EMPTY"
        return "MULTILINESTRING (" + ", ".join(f"({line(l)})" for l in coords) + ")"
    if t == "MULTIPOLYGON":
        if not coords:
            return "MULTIPOLYGON EMPTY"
        polys = ", ".join(
            "(" + ", ".join(f"({line(r)})" for r in p) + ")" for p in coords
        )
        return f"MULTIPOLYGON ({polys})"
    raise ValueError(f"unsupported geometry type: {geom_type}")


# ------------------------------------------------------- derived quantities

def bbox(geom_type: str, coords) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) — reference Region.kt:37-47 / calcBbox."""
    pts = list(iter_points(geom_type, coords))
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return min(xs), min(ys), max(xs), max(ys)


def iter_points(geom_type, coords):
    t = geom_type
    if t == "Point":
        yield coords
    elif t in ("LineString", "MultiPoint"):
        yield from coords
    elif t in ("Polygon", "MultiLineString"):
        for part in coords:
            yield from part
    elif t == "MultiPolygon":
        for poly in coords:
            for ring in poly:
                yield from ring


def centroid(geom_type: str, coords) -> tuple[float, float]:
    """Geometry centroid, JTS-compatible semantics (reference Tyler.kt:127
    uses JTS ``.centroid``): area centroid for polygons, length-weighted
    centroid for lines, mean for points.
    """
    t = geom_type
    if t == "Point":
        return coords[0], coords[1]
    if t == "MultiPoint":
        xs = [p[0] for p in coords]
        ys = [p[1] for p in coords]
        return sum(xs) / len(xs), sum(ys) / len(ys)
    if t in ("LineString", "MultiLineString"):
        lines = [coords] if t == "LineString" else coords
        sx = sy = total = 0.0
        for line in lines:
            for (x1, y1), (x2, y2) in zip(line, line[1:]):
                seg = ((x2 - x1) ** 2 + (y2 - y1) ** 2) ** 0.5
                sx += (x1 + x2) / 2 * seg
                sy += (y1 + y2) / 2 * seg
                total += seg
        if total == 0:  # degenerate: all points coincide
            return lines[0][0][0], lines[0][0][1]
        return sx / total, sy / total
    if t in ("Polygon", "MultiPolygon"):
        polys = [coords] if t == "Polygon" else coords
        sx = sy = area = 0.0
        for poly in polys:
            for i, ring in enumerate(poly):
                rx = ry = ra = 0.0
                for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
                    cross = x1 * y2 - x2 * y1
                    rx += (x1 + x2) * cross
                    ry += (y1 + y2) * cross
                    ra += cross
                # normalize winding: exterior contributes positive area,
                # holes negative, regardless of stored ring orientation
                want_neg = i > 0
                if (ra < 0) != want_neg:
                    rx, ry, ra = -rx, -ry, -ra
                sx, sy, area = sx + rx, sy + ry, area + ra
        if area == 0:  # degenerate polygon: fall back to vertex mean
            pts = list(iter_points(t, coords))
            return (sum(p[0] for p in pts) / len(pts),
                    sum(p[1] for p in pts) / len(pts))
        return sx / (3 * area), sy / (3 * area)
    raise ValueError(f"unsupported geometry type: {t}")
