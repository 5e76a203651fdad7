import numpy as np

from bano_ray.geo.cells import (cell_children, cell_decode, cell_encode,
                                cell_parent, cover_bbox, tile_bbox_mercator,
                                tiles_to_cells)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-179, 179, 5000)
    lat = rng.uniform(-80, 80, 5000)
    for z in (3, 8, 13, 16):
        c = cell_encode(lon, lat, z)
        zz, x, y = cell_decode(c)
        assert (zz == z).all()
        assert (x >= 0).all() and (x < (1 << z)).all()
        c2 = cell_encode(lon, lat, z)
        assert (c == c2).all()


def test_parent_child_consistency():
    c = cell_encode([2.35], [48.85], 14)
    p = cell_parent(c)
    kids = cell_children(int(p[0]))
    assert int(c[0]) in set(kids.tolist())
    _, x, y = cell_decode(c)
    _, px, py = cell_decode(p)
    assert px == x // 2 and py == y // 2


def test_tile_bbox_matches_reference_constants():
    # reference bano/models.py:310-313 with z/x/y = 16/33000/22500
    xmin, ymin, xmax, ymax = tile_bbox_mercator(16, 33000, 22500)
    size = 40075016.68 / 2 ** 16
    assert abs(xmin - (-20037508.34 + size * 33000)) < 1e-6
    assert abs(ymax - (20037508.34 - size * 22500)) < 1e-6


def test_cover_and_tiles_to_cells():
    cov = cover_bbox(-5, 41, 9, 51, 6)
    assert len(cov) > 0
    z, x, y = cell_decode(cov)
    assert (z == 6).all()
    # z16 tile maps to exactly one z13 ancestor; coarse tile fans out
    one = tiles_to_cells([16], [33000], [22500], 13)
    assert len(one) == 1
    many = tiles_to_cells([11], [1031], [703], 13)
    assert len(many) == 16
