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


def _labels(pts):
    """Gated street-label rows (what stages/label.py produces), built
    locally from the datagen way grid."""
    from bano_ray.functions.normalize import normalize
    from bano_ray.geo.geomops import street_label_point

    osm_insee = set(pts.loc[pts["source"] == "OSM", "insee"])
    rows = []
    for z in range(dg.NZONES):
        zi = str(z + 1).zfill(5)
        if zi not in osm_insee:
            continue
        for s in dg.WAY_SIDX:
            lon, lat = street_label_point(dg.way_fragments(z, s))
            name = dg.street_spelling0(s)
            rows.append({"insee": zi, "street_key": normalize(name),
                         "street": name, "lon": lon, "lat": lat})
    return pd.DataFrame(rows)


def _seq(pts, lab):
    from bano_ray.pipelines.cumul import _labels_as_points_batch

    reg = _registry_as_points().to_pandas()
    frames = [pts, reg]
    if len(lab):
        frames.append(_labels_as_points_batch(
            pa.Table.from_pandas(lab, preserve_index=False)).to_pandas())
    allr = pd.concat(frames, ignore_index=True)
    return pd.concat([merge_zone(g) for _, g in allr.groupby(["insee", "salt"])],
                     ignore_index=True)


def _par(pts, lab, nbatches, tree=False):
    from bano_ray.stages.merge_partial import label_partial_batch

    chunks = np.array_split(np.arange(len(pts)), nbatches)
    parts = [partial_from_points(pts.iloc[c]) for c in chunks if len(c)]
    if len(lab):
        parts.append(label_partial_batch(lab))
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
    lab = _labels(pts)
    a = _seq(pts, lab)
    b = _par(pts, lab, nb, tree=tree)
    cols = list(a.columns)
    aa = a.sort_values(cols, kind="stable").reset_index(drop=True)
    bb = b[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(aa, bb, check_dtype=False)


def test_label_voie_rows_semantics():
    """Way-only streets (J10 population): registry fantoir attaches via the
    point_par_rue fill, but voie_fantoir stays '' (the FANTOIR attach ran
    before the label load); street 45 has a label but no registry entry, so
    a label-only group for it carries fantoir '' unless a highway tagged
    one."""
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(np.arange(300000, dtype=np.int64), size=4000,
                             replace=False))
    pts = _points(ids)
    lab = _labels(pts)
    out = _par(pts, lab, 3)
    voies = out[out["rec_type"] == "voie"]
    wayonly = voies[voies["street_key"].isin(
        {k for k in lab["street_key"]
         if k not in set(pts["street_key"])})]
    wo = voies.merge(lab[["insee", "street_key"]], on=["insee", "street_key"])
    assert len(wo) > 0
    # way-only sidx 64/65 rows: fantoir = registry code, voie_fantoir empty
    from bano_ray.functions.normalize import normalize
    wayonly_keys = {normalize(g[0]) for g in dg.WAYONLY_SPELLINGS}
    w2 = voies[voies["street_key"].isin(wayonly_keys)]
    assert len(w2) > 0
    assert (w2["fantoir"].str.len() == 10).all()
    assert (w2["voie_fantoir"] == "").all()
    # label points override the fallback: every labeled street's voie point
    # equals the way-derived label
    from bano_ray.geo.geomops import street_label_point
    lab_pts = {(r.insee, r.street_key): (r.lon, r.lat)
               for r in lab.itertuples(index=False)}
    merged = voies.merge(lab, on=["insee", "street_key"], suffixes=("", "_lab"))
    assert len(merged) > 0
    assert (merged["lon"] == merged["lon_lab"]).all()
    assert (merged["lat"] == merged["lat_lab"]).all()


@pytest.mark.parametrize("seed,n", [(11, 400), (12, 1200), (13, 3000)])
def test_partial_fast_equals_pandas(seed, n):
    """The integer-coded lexsort combiner (partial_from_points_fast) emits
    exactly the same partial-state rows as the pandas reference combiner,
    modulo row order."""
    from bano_ray.stages.merge_partial import (PARTIAL_COLS,
                                               partial_from_points_fast)

    rng = np.random.default_rng(seed)
    ids = rng.choice(200000, size=n, replace=False).astype(np.int64)
    pts = _points(ids)
    slow = partial_from_points(pts)
    fast = partial_from_points_fast(
        pa.Table.from_pandas(pts, preserve_index=False)).to_pandas()
    cols = list(PARTIAL_COLS)
    assert sorted(fast.columns) == sorted(slow.columns)
    a = slow[cols].sort_values(cols).reset_index(drop=True)
    b = fast[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_partial_fast_empty():
    from bano_ray.stages.merge_partial import partial_from_points_fast

    pts = _points(np.array([3], dtype=np.int64)).iloc[:0]
    out = partial_from_points_fast(
        pa.Table.from_pandas(pts, preserve_index=False)).to_pandas()
    assert len(out) == 0


def test_fast_combiner_chunked_input_equals_contiguous():
    """Multi-chunk Arrow tables (as produced by unions / block concats) must
    run through the dictionary-code combiner identically to a contiguous
    table — chunk dictionaries differ and must unify."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from bano_ray.stages.merge_partial import partial_from_points_fast

    rng = np.random.default_rng(11)
    n = 600
    hn_pool = ["", "12", "3 bis", "5;7", "1"]
    df = pd.DataFrame({
        "rec_type": "point",
        "insee": np.char.zfill(rng.integers(1, 4, n).astype(str), 5),
        "salt": rng.integers(0, 8, n), "doc_id": np.arange(n),
        "source": np.array(["OSM", "BAN", "BAL", "CADASTRE"])[rng.integers(0, 4, n)],
        "street": np.array(["Rue A", "Rue B"], dtype=object)[rng.integers(0, 2, n)],
        "street_key": np.array(["rue a", "rue b"], dtype=object)[rng.integers(0, 2, n)],
        "hn": np.array(hn_pool, dtype=object)[rng.integers(0, len(hn_pool), n)],
        "lon": rng.uniform(-5, 9, n), "lat": rng.uniform(41, 51, n),
        "fantoir_raw": np.where(rng.random(n) < 0.5, "0000100a2A", ""),
        "postcode": np.where(rng.random(n) < 0.5, "75001", ""),
        "pseudo_adresse": np.where(rng.random(n) < 0.3, "true", "false"),
        "highway_type": np.array(["residential", "primary", ""], dtype=object)[
            rng.integers(0, 3, n)],
    })
    df["fant_valid"] = (df["fantoir_raw"].str.len() == 10) & \
        (df["fantoir_raw"].str[:5] == df["insee"])
    df["hn_len"] = df["hn"].str.len()
    whole = pa.Table.from_pandas(df, preserve_index=False)
    parts = pa.concat_tables([
        pa.Table.from_pandas(df.iloc[:200], preserve_index=False),
        pa.Table.from_pandas(df.iloc[200:450], preserve_index=False),
        pa.Table.from_pandas(df.iloc[450:], preserve_index=False)])
    assert parts.column("insee").num_chunks == 3
    a = partial_from_points_fast(parts).to_pandas()
    b = partial_from_points_fast(whole).to_pandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True))
