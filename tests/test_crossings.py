"""Segment-intersection join (stages/crossings.py): strictness, the
canonical-cell dedup, and negative-coordinate cells."""
import numpy as np
import pandas as pd
import pyarrow as pa

from bano_ray.stages.crossings import CELL, _cells_emit, _pair_fn


def _count(segs: pd.DataFrame) -> int:
    cells = _cells_emit(pa.Table.from_pandas(segs, preserve_index=False)
                        ).to_pandas()
    tot = 0
    for _, g in cells.groupby("bucket"):
        out = _pair_fn(g)
        if len(out):
            tot += int(out["n"].sum())
    return tot


def _two(ax, ay, bx, by, cx, cy, dx, dy, zone=3) -> pd.DataFrame:
    return pd.DataFrame({
        "zid": [zone * 1000 + 1, zone * 1000 + 2],
        "ax": [ax, cx], "ay": [ay, cy],
        "bx": [bx, dx], "by": [by, dy],
        "sidx": [1, 2],
    })


def test_proper_crossing_counts_once():
    assert _count(_two(100, 100, 300, 300, 100, 200, 300, 0)) == 1


def test_spanning_cells_still_once():
    # both segments cross several grid cells; canonical-cell rule must
    # yield exactly one count
    assert _count(_two(-150_000, 10_000, 250_000, 180_000,
                       -40_000, 190_000, -140_000, -120_000)) == 1


def test_touching_endpoint_not_crossing():
    # segments share an endpoint — o1 or o3 is 0 → strict test excludes
    assert _count(_two(0, 0, 100, 100, 100, 100, 200, 0)) == 0


def test_collinear_overlap_not_crossing():
    assert _count(_two(0, 0, 200, 0, 100, 0, 300, 0)) == 0


def test_same_street_never_pairs():
    df = _two(100, 100, 300, 300, 100, 200, 300, 0)
    df["sidx"] = 1
    df["zid"] = [3001, 3001]
    assert _count(df) == 0


def test_different_zone_never_pairs():
    df = _two(100, 100, 300, 300, 100, 200, 300, 0)
    df["zid"] = [3001, 4002]
    assert _count(df) == 0


def test_bbox_disjoint_fast_reject():
    assert _count(_two(0, 0, 100, 100, 500_000, 500_000,
                       600_000, 600_000)) == 0


def test_dense_cell_chunking_exact():
    # a grid of vertical vs horizontal streets inside ONE cell: v*h
    # crossings, exercised through the chunked pair matrices
    nv, nh = 13, 11
    rows = []
    for i in range(nv):
        rows.append((3, 100 + i, 1000 + i * 50, 500, 1000 + i * 50, 2500))
    for j in range(nh):
        rows.append((3, 300 + j, 900, 600 + j * 100, 2600, 600 + j * 100))
    df = pd.DataFrame(rows, columns=["zone", "sidx", "ax", "ay", "bx", "by"])
    df["zid"] = df["zone"] * 1000 + df["sidx"]
    assert _count(df[["zid", "ax", "ay", "bx", "by", "sidx"]]) == nv * nh
