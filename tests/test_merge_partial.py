"""Differential: map-side partial aggregation == row replay, across
arbitrary batch splits (associativity of the combiner rules)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import bano_ray.datagen as dg
from bano_ray.geo.pip import PolygonIndex
from bano_ray.pipelines.cumul import _registry_as_points, _tag_points
from bano_ray.stages.merge import merge_zone
from bano_ray.stages.merge_partial import (finalize_group, partial_from_points,
                                           recombine, registry_partials)
from bano_ray.stages.parse import _assign_with_index, parse_caption


def _points(ids):
    idx = PolygonIndex(dg.zone_boxes_wkb())
    b = dg.synthesize_batch(pa.table({"doc_id": pa.array(ids)}))
    b = parse_caption(b)
    b = _assign_with_index(idx, b)
    return _tag_points(b).to_pandas()


def _seq(pts):
    reg = _registry_as_points().to_pandas()
    allr = pd.concat([pts, reg], ignore_index=True)
    return pd.concat([merge_zone(g) for _, g in allr.groupby(["insee", "salt"])],
                     ignore_index=True)


def _par(pts, nbatches, tree=False):
    chunks = np.array_split(np.arange(len(pts)), nbatches)
    parts = [partial_from_points(pts.iloc[c]) for c in chunks if len(c)]
    if tree:  # optional tree-combine stage is itself associative
        half = len(parts) // 2 or 1
        parts = [recombine(pd.concat(parts[:half], ignore_index=True)),
                 recombine(pd.concat(parts[half:], ignore_index=True))] \
            if len(parts) > 1 else parts
    parts.append(registry_partials())
    allp = pd.concat(parts, ignore_index=True)
    return pd.concat([finalize_group(g) for _, g in allp.groupby(["insee", "salt"])],
                     ignore_index=True)


@pytest.mark.parametrize("seed,n,nb,tree", [
    (0, 4000, 1, False),
    (1, 4000, 7, False),
    (2, 12000, 5, True),
])
def test_partial_equals_replay(seed, n, nb, tree):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.choice(np.arange(300000, dtype=np.int64), size=n, replace=False))
    pts = _points(ids)
    a = _seq(pts)
    b = _par(pts, nb, tree=tree)
    cols = list(a.columns)
    aa = a.sort_values(cols, kind="stable").reset_index(drop=True)
    bb = b[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(aa, bb, check_dtype=False)
