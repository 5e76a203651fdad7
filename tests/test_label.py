"""G5 street-label pre-pass: gate semantics and expansion invariance."""

import pyarrow as pa

import bano_ray.datagen as dg


def _gate(ray, sf, expand):
    import pyarrow.compute as pc

    from bano_ray.stages.parse import make_zone_assigner

    ds = dg.images_dataset(sf, expand=expand, doc_residue=(4, 0))
    zones_ref = ray.put(dg.zone_boxes_wkb())
    ds = ds.map_batches(make_zone_assigner(zones_ref),
                        batch_format="pyarrow", batch_size=None)

    def u(b):
        return pa.table({"insee": pc.unique(b.column("insee"))})

    return set(ds.map_batches(u, batch_format="pyarrow", batch_size=None)
               .groupby("insee").count().to_pandas()["insee"])


def test_label_gate_expand_inv(ray_session, sf_dir):
    """The reduced-expansion gate scan (street_labels gate_expand=4) sees
    exactly the OSM-commune set of any larger expansion: bench expansion is
    locality-preserving and expand >= 4 covers every source residue."""
    import ray

    g4 = _gate(ray, sf_dir, 4)
    assert _gate(ray, sf_dir, 8) == g4
    assert _gate(ray, sf_dir, 16) == g4


def test_street_labels_gated_rows(ray_session, sf_dir):
    """One label row per (OSM-bearing commune, way street); points match
    the direct geometry computation."""
    from bano_ray.geo.geomops import street_label_point
    from bano_ray.stages.label import street_labels

    df = street_labels(sf_dir).to_pandas()
    gated = sorted(df["insee"].unique())
    assert len(df) == len(gated) * len(dg.WAY_SIDX)
    r = df.iloc[0]
    z = int(r["insee"]) - 1
    sidx = [s for s in dg.WAY_SIDX
            if dg.street_spelling0(s) == r["street"]][0]
    lon, lat = street_label_point(dg.way_fragments(z, sidx))
    assert (r["lon"], r["lat"]) == (lon, lat)
