"""Cache-invalidation tests: region clustering, quadtree cover
correctness (every affected cached tile is invalidated; disjoint tiles
are not), subtree-root compression."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from tank_spark.geom import tilemath
from tank_spark.operators.invalidation import (
    BBox, cluster_regions, invalidation_keys_for, quadtree_cover,
    subtree_contains,
)


def test_cluster_regions_merges_to_cap():
    boxes = [BBox(i, i, i + 1, i + 1) for i in range(10)]
    regions = cluster_regions(boxes, max_regions=3)
    assert len(regions) == 3
    # every input bbox is inside some region
    for b in boxes:
        assert any(r.covers(b) for r in regions)


def test_quadtree_cover_small_region():
    # a small bbox around one z13 tile in the features block
    lon_min, lat_min, lon_max, lat_max = tilemath.tile_bbox(13, 1281, 3137)
    dirty = BBox(lon_min + 1e-6, lat_min + 1e-6, lon_max - 1e-6, lat_max - 1e-6)
    tiles, roots = quadtree_cover(dirty)
    cover = set(tiles)
    for root in roots:
        assert subtree_contains(root, root)
    # the dirty tile's whole ancestor chain (z2..z13) must be affected
    for z in range(2, 14):
        shift = 13 - z
        t = (z, 1281 >> shift, 3137 >> shift)
        assert t in cover or any(subtree_contains(r, t) for r in roots)
    # a far-away tile is NOT invalidated
    far = (13, 100, 100)
    assert far not in cover and not any(subtree_contains(r, far) for r in roots)


def test_quadtree_cover_whole_world_is_one_root():
    dirty = BBox(-180.0, -86.0, 180.0, 86.0)
    tiles, roots = quadtree_cover(dirty)
    # world-sized dirt covers the root tile -> one subtree root, no walk
    assert roots == [(0, 0, 0)] and tiles == []
    keys = invalidation_keys_for([dirty])
    assert keys == ["subtree/0/0/0"]  # compressed, not 4^15 keys


@given(
    st.floats(-120.0, 120.0), st.floats(-60.0, 60.0),
    st.floats(0.001, 5.0), st.floats(0.001, 5.0),
)
@settings(max_examples=25, deadline=None)
def test_cover_is_sound(lon, lat, w, h):
    """Soundness: any cached tile whose bbox intersects the dirty region
    is caught by the cover (tile list or a subtree root)."""
    dirty = BBox(lon, lat, lon + w, lat + h)
    tiles, roots = quadtree_cover(dirty, zoom_start=2, zoom_end=8)
    cover = set(tiles)
    # check exhaustively at z=8 in the dirty neighborhood
    x0, y0 = tilemath.tile_number(min(lat + h, 85.0), lon, 8)
    x1, y1 = tilemath.tile_number(max(lat, -85.0), min(lon + w, 179.99), 8)
    for x in range(max(x0 - 1, 0), min(x1 + 2, 256)):
        for y in range(max(y0 - 1, 0), min(y1 + 2, 256)):
            lon_min, lat_min, lon_max, lat_max = tilemath.tile_bbox(8, x, y)
            if dirty.intersects(BBox(lon_min, lat_min, lon_max, lat_max)):
                t = (8, x, y)
                assert t in cover or any(subtree_contains(r, t) for r in roots), t


def test_invalidation_keys_pair_tile_and_heatmap():
    lon_min, lat_min, lon_max, lat_max = tilemath.tile_bbox(13, 1281, 3137)
    keys = invalidation_keys_for(
        [BBox(lon_min, lat_min, lon_max, lat_max)], zoom_end=13
    )
    tile_keys = {k for k in keys if k.startswith("tile/")}
    hm_keys = {k.replace("heatmap/", "tile/") for k in keys if k.startswith("heatmap/")}
    assert tile_keys == hm_keys and len(tile_keys) > 0
