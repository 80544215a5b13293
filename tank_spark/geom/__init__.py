"""Pure-Python geometry/tile kernel (no external geo deps).

Semantics pinned to the reference's call sites (SURVEY.md §2.7, §2.9):
Morton z-curve bucketing (reference zCurve.kt), slippy tile math
(reference Tyler.kt:128, application.kt:384-399), spherical-mercator
unit projection, axis-aligned rect clipping and MVT encoding per the
public geojson-vt / vector-tile-spec 2.1 algorithms.
"""
