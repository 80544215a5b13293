"""Rect-vs-geometry predicates for per-feature cache invalidation.

The reference's V3 walk (BoundingManager.kt:37-55) asks two JTS
questions per quadtree tile: ``tile.coveredBy(feature_geometry)`` and
``tile.intersects(feature_geometry)``.  The tile side is always an
axis-aligned lon/lat rectangle (Tile.kt:12-19), which lets both
predicates be answered exactly with rational-free double arithmetic —
no general polygon-polygon clipping needed:

* ``rect_intersects``: any rect corner inside the polygon (even-odd
  over all rings, so holes count), OR any geometry vertex inside the
  closed rect, OR any geometry segment meeting the closed rect.
* ``rect_covered_by``: all four rect corners inside-or-on-boundary AND
  no ring segment passing through the rect's OPEN interior.  Boundary
  contact is allowed, matching JTS ``coveredBy`` (within + boundary).

Only (Multi)Polygons can cover a rectangle; points and lines always
fall through to the intersects branch, exactly as in JTS.

MultiPolygon covering is tested per member polygon.  A rect straddling
two adjacent members of a union is reported as merely intersecting —
the walk then recurses and invalidates the same tiles individually
instead of as one subtree, so the invalidated SET is identical, only
less compressed (never an under-invalidation).
"""

from __future__ import annotations

Rect = tuple[float, float, float, float]  # xmin, ymin, xmax, ymax


def _on_segment(px: float, py: float, ax: float, ay: float,
                bx: float, by: float) -> bool:
    """Point (px,py) lies on closed segment a-b (exact collinearity)."""
    cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    if cross != 0.0:
        return False
    return (min(ax, bx) <= px <= max(ax, bx)
            and min(ay, by) <= py <= max(ay, by))


def point_in_rings(px: float, py: float, rings) -> bool:
    """Even-odd point-in-polygon over all rings (holes flip parity).
    Boundary points count as inside (JTS coveredBy allows boundary)."""
    inside = False
    for ring in rings:
        n = len(ring)
        for i in range(n - 1):
            ax, ay = ring[i][0], ring[i][1]
            bx, by = ring[i + 1][0], ring[i + 1][1]
            if _on_segment(px, py, ax, ay, bx, by):
                return True
            if (ay > py) != (by > py):
                # x of the edge at height py; exact since ay != by here
                xint = ax + (py - ay) * (bx - ax) / (by - ay)
                if px < xint:
                    inside = not inside
    return inside


def _seg_meets_rect(p, q, rect: Rect, open_interior: bool) -> bool:
    """Segment p-q meets the rect — CLOSED rect when ``open_interior``
    is False, strict OPEN interior when True (Liang–Barsky)."""
    xmin, ymin, xmax, ymax = rect
    x1, y1 = p[0], p[1]
    x2, y2 = q[0], q[1]
    dx, dy = x2 - x1, y2 - y1
    t0, t1 = 0.0, 1.0
    for num, den in ((xmin - x1, dx), (x1 - xmax, -dx),
                     (ymin - y1, dy), (y1 - ymax, -dy)):
        if den == 0.0:
            if num > 0.0:
                return False
        else:
            t = num / den
            if den > 0.0:
                if t > t1:
                    return False
                if t > t0:
                    t0 = t
            else:
                if t < t0:
                    return False
                if t < t1:
                    t1 = t
    if not open_interior:
        return True
    # the clipped run must have positive length AND not lie entirely on
    # the rect boundary (a segment sliding along an edge never enters
    # the open interior)
    if t0 >= t1:
        return False
    mx = x1 + 0.5 * (t0 + t1) * dx
    my = y1 + 0.5 * (t0 + t1) * dy
    return xmin < mx < xmax and ymin < my < ymax


def _pt_in_rect(p, rect: Rect) -> bool:
    return rect[0] <= p[0] <= rect[2] and rect[1] <= p[1] <= rect[3]


def _iter_rings(geom_type: str, coords):
    if geom_type == "Polygon":
        yield from coords
    elif geom_type == "MultiPolygon":
        for poly in coords:
            yield from poly


def rect_intersects(geom_type: str, coords, rect: Rect) -> bool:
    """JTS ``rect.intersects(geometry)`` for an axis-aligned rect."""
    xmin, ymin, xmax, ymax = rect
    if geom_type == "Point":
        return _pt_in_rect(coords, rect)
    if geom_type == "MultiPoint":
        return any(_pt_in_rect(p, rect) for p in coords)
    if geom_type == "LineString":
        return any(
            _seg_meets_rect(coords[i], coords[i + 1], rect, False)
            for i in range(len(coords) - 1)
        )
    if geom_type == "MultiLineString":
        return any(rect_intersects("LineString", line, rect) for line in coords)
    if geom_type in ("Polygon", "MultiPolygon"):
        polys = coords if geom_type == "MultiPolygon" else [coords]
        for poly in polys:
            # rect corner inside the polygon (handles rect-inside-poly)
            if any(point_in_rings(cx, cy, poly)
                   for cx in (xmin, xmax) for cy in (ymin, ymax)):
                return True
            # any ring edge meeting the closed rect (handles poly-inside-
            # rect and all boundary crossings)
            for ring in poly:
                if any(_seg_meets_rect(ring[i], ring[i + 1], rect, False)
                       for i in range(len(ring) - 1)):
                    return True
        return False
    raise ValueError(f"unsupported geometry type: {geom_type}")


def rect_covered_by(geom_type: str, coords, rect: Rect) -> bool:
    """JTS ``rect.coveredBy(geometry)`` for an axis-aligned rect.
    Only area-bearing geometries can cover a rectangle."""
    if geom_type not in ("Polygon", "MultiPolygon"):
        return False
    xmin, ymin, xmax, ymax = rect
    polys = coords if geom_type == "MultiPolygon" else [coords]
    for poly in polys:
        if not all(point_in_rings(cx, cy, poly)
                   for cx in (xmin, xmax) for cy in (ymin, ymax)):
            continue
        crossed = False
        for ring in poly:
            if any(_seg_meets_rect(ring[i], ring[i + 1], rect, True)
                   for i in range(len(ring) - 1)):
                crossed = True
                break
        if not crossed:
            return True
    return False
