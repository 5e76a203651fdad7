"""Quadtree leaves (geo/cells.quadtree_leaves): the leaf set must
partition the point stream — counts sum to the total and no leaf is an
ancestor of another."""
import numpy as np


def test_leaves_partition_points(ray_session, sf_dir):
    import pyarrow.parquet as pq

    from bano_ray import datagen
    from bano_ray.geo.cells import quadtree_leaves

    ds = datagen.images_dataset(sf_dir).select_columns(["lon", "lat"])
    leaves = quadtree_leaves(ds, z_hi=12, z_lo=8).to_pandas()
    total = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert int(leaves["n_points"].sum()) == total

    # antichain: normalizing every leaf to z12 ranges, no two overlap
    z = leaves["z"].to_numpy()
    x = leaves["x"].to_numpy()
    y = leaves["y"].to_numpy()
    seen = set()
    for zi, xi, yi in zip(z, x, y):
        s = 12 - zi
        x0, x1 = xi << s, ((xi + 1) << s) - 1
        y0, y1 = yi << s, ((yi + 1) << s) - 1
        for (za, a0, a1, b0, b1) in seen:
            assert not (a0 <= x1 and x0 <= a1 and b0 <= y1 and y0 <= b1), \
                "overlapping leaves"
        seen.add((zi, x0, x1, y0, y1))
