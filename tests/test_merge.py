"""Merge semantics: differential equivalence of the two merge
implementations over randomized synthesized groups (the oracle-parity gate
covers absolute correctness; this pins the implementations to each other)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import bano_ray.datagen as dg
from bano_ray.geo.pip import PolygonIndex
from bano_ray.pipelines.cumul import _registry_as_points, _tag_points
from bano_ray.stages.merge import merge_zone, merge_zone_vec
from bano_ray.stages.parse import _assign_with_index, parse_caption


def _groups(ids, keys):
    idx = PolygonIndex(dg.zone_boxes_wkb())
    b = dg.synthesize_batch(pa.table({"doc_id": pa.array(ids)}))
    b = parse_caption(b)
    b = _assign_with_index(idx, b)
    pts = _tag_points(b).to_pandas()
    reg = _registry_as_points().to_pandas()
    return pd.concat([pts, reg], ignore_index=True).groupby(list(keys))


@pytest.mark.parametrize("seed,n,keys", [
    (0, 2000, ("insee", "salt")),
    (7, 8000, ("insee",)),
    (3, 500, ("insee", "salt")),
])
def test_vec_matches_sequential(seed, n, keys):
    rng = np.random.default_rng(seed)
    ids = rng.choice(np.arange(100000, dtype=np.int64), size=n, replace=False)
    for _, g in _groups(ids, keys):
        a = merge_zone(g)
        b = merge_zone_vec(g)
        cols = list(a.columns)
        aa = a.sort_values(cols, kind="stable").reset_index(drop=True)
        bb = b[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        pd.testing.assert_frame_equal(aa, bb, check_dtype=False)


def test_empty_and_registry_only_groups():
    empty = pd.DataFrame()
    assert len(merge_zone(empty)) == 0
    reg = _registry_as_points().to_pandas()
    one = reg[reg["insee"] == "00001"]
    assert len(merge_zone(one)) == 0
    assert len(merge_zone_vec(one)) == 0
