"""Axis-aligned rectangle clipping, geojson-vt style.

Parity target: the reference's ``clipper.clip(fc, z2, x-k1, x+k3, y-k1,
y+k3)`` call (application.kt:450-458) — clip every geometry to the
buffered tile rectangle given in *tile units* (world coords x 2^zoom).
Semantics follow the public geojson-vt clip algorithm the marauder
"charged" library implements (SURVEY.md §2.9):

* Points: kept iff inside the rect (inclusive edges).
* LineStrings: segment-clipped; a line crossing the rect is cut into the
  inside portion(s); multiple runs become a MultiLineString.
* Polygons: Sutherland–Hodgman against the 4 half-planes (rings stay
  closed; empty rings dropped).
* Geometries fully outside -> None (feature dropped, geojson-vt behavior).
"""

from __future__ import annotations


def _clip_ring(ring, xmin, ymin, xmax, ymax):
    """Sutherland–Hodgman polygon clip of one closed ring to a rect."""
    def clip_halfplane(pts, inside, intersect):
        out = []
        if not pts:
            return out
        prev = pts[-1]
        prev_in = inside(prev)
        for cur in pts:
            cur_in = inside(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect(prev, cur))
            prev, prev_in = cur, cur_in
        return out

    def ix_at_x(p, q, x):
        t = (x - p[0]) / (q[0] - p[0])
        return [x, p[1] + t * (q[1] - p[1])]

    def ix_at_y(p, q, y):
        t = (y - p[1]) / (q[1] - p[1])
        return [p[0] + t * (q[0] - p[0]), y]

    pts = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else list(ring)
    pts = clip_halfplane(pts, lambda p: p[0] >= xmin, lambda p, q: ix_at_x(p, q, xmin))
    pts = clip_halfplane(pts, lambda p: p[0] <= xmax, lambda p, q: ix_at_x(p, q, xmax))
    pts = clip_halfplane(pts, lambda p: p[1] >= ymin, lambda p, q: ix_at_y(p, q, ymin))
    pts = clip_halfplane(pts, lambda p: p[1] <= ymax, lambda p, q: ix_at_y(p, q, ymax))
    if len(pts) < 3:
        return None
    return pts + [pts[0]]  # re-close


def _clip_line(line, xmin, ymin, xmax, ymax):
    """Clip a polyline to a rect -> list of runs (each a point list)."""
    def inside(p):
        return xmin <= p[0] <= xmax and ymin <= p[1] <= ymax

    def clip_seg(p, q):
        """Liang–Barsky: portion of segment p-q inside rect, or None."""
        x1, y1 = p
        x2, y2 = q
        dx, dy = x2 - x1, y2 - y1
        t0, t1 = 0.0, 1.0
        for num, den in (
            (xmin - x1, dx), (x1 - xmax, -dx),
            (ymin - y1, dy), (y1 - ymax, -dy),
        ):
            if den == 0:
                if num > 0:
                    return None
            else:
                t = num / den
                if den > 0:
                    if t > t1:
                        return None
                    if t > t0:
                        t0 = t
                else:
                    if t < t0:
                        return None
                    if t < t1:
                        t1 = t
        return ([x1 + t0 * dx, y1 + t0 * dy], [x1 + t1 * dx, y1 + t1 * dy])

    runs, cur = [], []
    for p, q in zip(line, line[1:]):
        seg = clip_seg(p, q)
        if seg is None:
            if len(cur) >= 2:
                runs.append(cur)
            cur = []
            continue
        a, b = seg
        if not cur:
            cur = [a, b]
        elif cur[-1] == a:
            cur.append(b)
        else:
            if len(cur) >= 2:
                runs.append(cur)
            cur = [a, b]
        if b != [*q]:  # exited the rect mid-segment: run ends here
            if len(cur) >= 2:
                runs.append(cur)
            cur = []
    if len(cur) >= 2:
        runs.append(cur)
    return runs


def clip(geom_type: str, coords, xmin: float, ymin: float, xmax: float, ymax: float):
    """Clip (geom_type, coords) to rect; returns (type, coords) or None."""
    t = geom_type
    if t == "Point":
        x, y = coords[0], coords[1]
        return (t, coords) if xmin <= x <= xmax and ymin <= y <= ymax else None
    if t == "MultiPoint":
        kept = [p for p in coords if xmin <= p[0] <= xmax and ymin <= p[1] <= ymax]
        if not kept:
            return None
        return ("Point", kept[0]) if len(kept) == 1 else ("MultiPoint", kept)
    if t == "LineString":
        runs = _clip_line(coords, xmin, ymin, xmax, ymax)
        if not runs:
            return None
        return ("LineString", runs[0]) if len(runs) == 1 else ("MultiLineString", runs)
    if t == "MultiLineString":
        runs = []
        for line in coords:
            runs.extend(_clip_line(line, xmin, ymin, xmax, ymax))
        if not runs:
            return None
        return ("LineString", runs[0]) if len(runs) == 1 else ("MultiLineString", runs)
    if t == "Polygon":
        rings = [_clip_ring(r, xmin, ymin, xmax, ymax) for r in coords]
        if not rings or rings[0] is None:  # outer ring gone -> polygon gone
            return None
        return ("Polygon", [r for r in rings if r is not None])
    if t == "MultiPolygon":
        polys = []
        for poly in coords:
            rings = [_clip_ring(r, xmin, ymin, xmax, ymax) for r in poly]
            if rings and rings[0] is not None:
                polys.append([r for r in rings if r is not None])
        if not polys:
            return None
        return ("Polygon", polys[0]) if len(polys) == 1 else ("MultiPolygon", polys)
    raise ValueError(f"unsupported geometry type: {t}")
