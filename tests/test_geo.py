"""PIP edge semantics (ST_Intersects parity: boundary in, overlaps both,
holes out) + WKB + geometry reductions."""

import numpy as np

from bano_ray.geo.geomops import (CircleUnionZone, convex_hull, haversine_m,
                                  hull_centroid, hull_diameter_m,
                                  shoelace_area, street_label_point)
from bano_ray.geo.pip import PolygonIndex, points_in_polygon
from bano_ray.geo.wkb import (decode, encode_multipolygon, encode_point,
                              encode_polygon, polygon_rings)

SQUARE = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
HOLE = np.array([[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]], float)


def test_wkb_roundtrip():
    kind, pt = decode(encode_point(2.5, 48.1))
    assert kind == "point" and pt == (2.5, 48.1)
    polys = polygon_rings(encode_polygon([SQUARE, HOLE]))
    assert len(polys) == 1 and len(polys[0]) == 2
    mp = polygon_rings(encode_multipolygon([[SQUARE], [SQUARE + 10]]))
    assert len(mp) == 2


def test_pip_interior_hole_boundary_outside():
    polys = [[SQUARE, HOLE]]
    px = np.array([2.0, 1.5, 0.0, 4.0, 2.0, 5.0, 1.0])
    py = np.array([3.0, 1.5, 0.0, 2.0, 0.0, 5.0, 1.5])
    got = points_in_polygon(px, py, polys)
    #       interior, in-hole, corner, edge, edge, outside, hole-boundary
    assert list(got) == [True, False, True, True, True, False, True]


def test_pip_multipolygon_and_overlap_multimatch():
    mp = [[SQUARE], [SQUARE + 10]]
    got = points_in_polygon(np.array([2.0, 12.0, 7.0]), np.array([2.0, 12.0, 7.0]), mp)
    assert list(got) == [True, True, False]
    # two overlapping polygons: ST_Intersects semantics → point matches both
    idx = PolygonIndex([("A", encode_polygon([SQUARE])),
                        ("B", encode_polygon([SQUARE + 2]))])
    pi, gi = idx.assign_all(np.array([3.0]), np.array([3.0]))
    assert sorted(idx.keys[g] for g in gi) == ["A", "B"]


def test_bbox_fallback_catches_hole_points():
    # a point inside the hole misses the exact pass but the bbox pass
    # (reference bano/sql/hsnr_bbox_insee_nocache.sql:20) catches it
    idx = PolygonIndex([("A", encode_polygon([SQUARE, HOLE]))])
    pi, _ = idx.assign_all(np.array([1.5]), np.array([1.5]))
    assert len(pi) == 0
    pi, gi = idx.assign_bbox(np.array([1.5]), np.array([1.5]))
    assert len(pi) == 1 and idx.keys[gi[0]] == "A"


def test_convex_hull_and_diameter():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8]])
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert abs(hull_diameter_m(pts) - haversine_m(0, 0, 1, 1)) < 1e-6
    cx, cy = hull_centroid(pts)
    assert abs(cx - 0.5) < 1e-9 and abs(cy - 0.5) < 1e-9
    assert abs(shoelace_area(SQUARE[:-1]) - 16.0) < 1e-12


def test_street_label_point_is_on_line():
    lp = street_label_point([np.array([[0.0, 0.0], [10.0, 0.0]])])
    assert lp == (5.0, 0.0)


def test_circle_union_zone():
    z = CircleUnionZone(np.array([[0.0, 0.0], [1.0, 0.0]]), radius=0.1)
    got = z.contains(np.array([0.05, 0.5, 1.05]), np.array([0.0, 0.0, 0.0]))
    assert list(got) == [True, False, True]


def test_line_centroid_length_weighted():
    from bano_ray.geo.geomops import line_centroid

    # L-shaped line: long leg dominates
    c = line_centroid(np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 2.0]]))
    assert abs(c[0] - (5.0 * 10 + 10.0 * 2) / 12) < 1e-12
    assert abs(c[1] - (0.0 * 10 + 1.0 * 2) / 12) < 1e-12
    assert line_centroid(np.array([[3.0, 4.0]])) == (3.0, 4.0)


class TestRasterVector:
    def test_rasterize_box_counts(self):
        from bano_ray.geo.cells import cell_decode
        from bano_ray.geo.raster import cell_centers, rasterize
        from bano_ray.geo.wkb import encode_polygon

        ring = np.array([[0.0, 44.0], [1.75, 44.0], [1.75, 45.0], [0.0, 45.0],
                         [0.0, 44.0]])
        cells = rasterize(encode_polygon([ring]), 10)
        assert len(cells) > 0
        lon, lat = cell_centers(cells)
        assert (lon > 0.0).all() and (lon < 1.75).all()
        assert (lat > 44.0).all() and (lat < 45.0).all()
        z, _, _ = cell_decode(cells)
        assert (z == 10).all()

    def test_rasterize_vectorize_roundtrip(self):
        from bano_ray.geo.pip import points_in_polygon
        from bano_ray.geo.raster import cell_centers, rasterize, vectorize_cells
        from bano_ray.geo.wkb import encode_polygon, polygon_rings
        from bano_ray.geo.cells import cover_bbox

        shell = np.array([[0.0, 44.0], [1.0, 44.0], [1.0, 45.0], [0.0, 45.0],
                          [0.0, 44.0]])
        hole = np.array([[0.3, 44.3], [0.3, 44.7], [0.7, 44.7], [0.7, 44.3],
                         [0.3, 44.3]])
        blob = encode_polygon([shell, hole])
        cells = rasterize(blob, 11)
        out = vectorize_cells(cells)
        polys = polygon_rings(out)
        # every candidate center classifies the same vs the vectorized outline
        cand = cover_bbox(-0.1, 43.9, 1.1, 45.1, 11)
        lon, lat = cell_centers(cand)
        in_vec = points_in_polygon(lon, lat, polys)
        in_set = np.isin(cand, cells)
        assert (in_vec == in_set).all()

    def test_vectorize_empty(self):
        from bano_ray.geo.raster import vectorize_cells
        from bano_ray.geo.wkb import polygon_rings

        assert polygon_rings(vectorize_cells(np.array([], dtype=np.int64))) == []


def test_cell_sharded_index_matches_broadcast_index():
    """Property: the cell-sharded PIP resolves every point to exactly the
    same (min-slot) polygon as the broadcast PolygonIndex — zone boxes and
    the nested postal polygons, random + boundary-ish points."""
    import numpy as np
    from bano_ray import datagen as dg
    from bano_ray.geo.pip import PolygonIndex
    from bano_ray.geo.pip_sharded import CellShardedIndex

    rng = np.random.default_rng(7)
    lon = rng.uniform(dg.LON0 - 0.5, dg.LON0 + dg.LON_SPAN + 0.5, 4000)
    lat = rng.uniform(dg.LAT0 - 0.5, dg.LAT0 + dg.LAT_SPAN + 0.5, 4000)
    for polys in (dg.zone_boxes_wkb(), dg.postal_polygons_wkb()):
        ref = PolygonIndex(polys)
        shd = CellShardedIndex(polys)
        for method in ("assign_all", "assign_bbox"):
            NO = np.iinfo(np.int64).max

            def resolve(ix):
                slot = np.full(len(lon), NO, dtype=np.int64)
                pi, gi = getattr(ix, method)(lon, lat)
                if len(pi):
                    np.minimum.at(slot, pi, gi)
                return slot

            assert (resolve(ref) == resolve(shd)).all()


class TestTileOverlap:
    def test_partition_of_zone(self, ray_session):
        """Per zone, overlap areas must sum to the zone's exact Mercator
        tile-unit area, and every tile must contain its slice."""
        import numpy as np

        from bano_ray import datagen
        from bano_ray.pipelines.queries import TILE_OVERLAP_Z, q_tile_overlap

        n = float(1 << TILE_OVERLAP_Z)

        def fy(lat):
            r = lat * (np.pi / 180.0)
            return (1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0 * n

        df = q_tile_overlap("/root/testdata/sf0.001").to_pandas()
        assert (df["area"] > 0).all()
        for zi in (0, 27, 55):
            insee = str(zi + 1).zfill(5)
            x0, x1, y0, y1 = datagen.zone_box(zi)
            zone_area = ((x1 + 180.0) / 360.0 * n - (x0 + 180.0) / 360.0 * n) \
                * (fy(y0) - fy(y1))
            got = df[df["insee"] == insee]["area"].sum()
            assert abs(got - zone_area) < 1e-6
            sub = df[df["insee"] == insee]
            assert (sub["area"] <= 1.0 + 1e-12).all()


class TestGeohash:
    def test_known_cities(self):
        import numpy as np

        from bano_ray.geo.cells import geohash6

        got = geohash6(np.array([-0.1278, 2.3522, -74.0060]),
                       np.array([51.5074, 48.8566, 40.7128]))
        # canonical geohashes: London gcpvj..., Paris u09tv..., NYC dr5re...
        assert list(got) == ["gcpvj0", "u09tvw", "dr5regy"[:6]]

    def test_prefix_locality(self):
        import numpy as np

        from bano_ray.geo.cells import geohash6

        a = geohash6(np.array([2.0, 2.0001]), np.array([45.0, 45.0001]))
        assert a[0][:4] == a[1][:4]
