import numpy as np
import pyarrow as pa

from bano_ray import datagen as dg
from bano_ray.functions.normalize import normalize


def test_spelling_groups_normalize_to_one_key_each():
    keys = []
    for group in dg.STREET_SPELLINGS:
        norms = {normalize(s) for s in group}
        assert len(norms) == 1, group
        keys.append(norms.pop())
    assert len(set(keys)) == len(keys), "merge keys must be distinct across streets"


def test_synthesis_is_deterministic_and_sql_shaped():
    doc = pa.table({"doc_id": pa.array(np.arange(500, dtype=np.int64))})
    a = dg.synthesize_batch(doc)
    b = dg.synthesize_batch(doc)
    assert a.equals(b)
    lon = a.column("lon").to_numpy()
    lat = a.column("lat").to_numpy()
    assert (lon > dg.LON0).all() and (lon < dg.LON0 + dg.LON_SPAN).all()
    assert (lat > dg.LAT0).all() and (lat < dg.LAT0 + dg.LAT_SPAN).all()
    # urban skew: doc_id % 20 == 0 rows all inside the dense window
    urban = np.arange(500) % dg.URBAN_MOD == 0
    assert (lon[urban] >= dg.URBAN_LON0).all()
    assert (lon[urban] <= dg.URBAN_LON0 + dg.URBAN_SPAN).all()


def test_phash_dup_pairs_planted():
    d = np.arange(0, 1100, dtype=np.int64)
    ph = dg.phash_of(d)
    # doc_id 11k and 11k+1 share a phash
    assert ph[11] == ph[12]
    assert ph[22] == ph[23]
    assert ph[3] != ph[4]


def test_zone_arithmetic_matches_box_geometry():
    """The floor-arithmetic zone (oracle side) must equal geometric PIP
    against the WKB box zones (engine side)."""
    from bano_ray.geo.pip import PolygonIndex

    d = np.arange(2000, dtype=np.int64)
    lon, lat = dg.lon_lat(d)
    zone = dg.zone_of(lon, lat)
    insee = dg.insee_of_zone(zone)
    idx = PolygonIndex(dg.zone_boxes_wkb())
    pi, gi = idx.assign_all(lon, lat)
    # every point hits at least its arithmetic zone; points on shared edges
    # may legitimately hit two zones (ST_Intersects semantics)
    got = {}
    for p, g in zip(pi.tolist(), gi.tolist()):
        got.setdefault(p, set()).add(idx.keys[g])
    for i in range(len(d)):
        assert insee[i] in got.get(i, set()), i


def test_bytes_roundtrip_through_codecs():
    from bano_ray.codecs import decode_image, psnr

    doc = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64))})
    t = dg.synthesize_batch(doc, with_bytes=True)
    for r in t.to_pylist():
        px = decode_image(r["bytes"], r["fmt"])
        src = dg.pixels_of(int(r["image_id"][3:]), r["w"], r["h"])
        assert px.shape == src.shape
        if r["fmt"] == "png":
            assert (px == src).all()
        else:
            assert psnr(src, px) >= 40.0


def test_registry_and_dims_shapes():
    reg = dg.registry_table()
    # K_REG document streets + the way-only (J10) registry entries per zone
    assert reg.num_rows == dg.NZONES * (dg.K_REG + dg.NWAYONLY)
    dims = dg.zone_dims_table()
    assert dims.num_rows == dg.NZONES


def test_hamlet_spelling_invariants():
    """BAN/BAL/CADASTRE spellings share one key; normalize(OSM)+' '+tail ==
    that key; family A keys are 4 words, family B 5; append_suffixe on the
    raw OSM name lands on the canonical key (the re-unification contract)."""
    from bano_ray.functions.normalize import normalize
    from bano_ray.functions.validity import append_suffixe

    for i, g in enumerate(dg.HAMLET_SPELLINGS):
        tail = dg.HAMLET_TAILS[0] if i < dg.NHAMLET // 2 else dg.HAMLET_TAILS[1]
        n_osm, n_ban = normalize(g[0]), normalize(g[1])
        assert n_ban == normalize(g[2]) == normalize(g[3])
        assert n_ban == n_osm + " " + tail
        assert len(n_ban) <= 30
        want_words = 4 if i < dg.NHAMLET // 2 else 5
        assert len(n_ban.split()) == want_words
        assert normalize(append_suffixe(g[0], tail)) == n_ban


def test_hamlet_population_clusters_inside_buffer():
    """All hamlet points of a family sit in one zone and within the 3e-4-deg
    suffix buffer of each other (so circle-union zones from any 2 samples
    cover the family); families never overlap each other's buffers."""
    d = np.arange(5000, dtype=np.int64)
    ham = dg.is_hamlet(d)
    hd = d[ham]
    sidx = dg.street_idx(hd)
    lon, lat = dg.lon_lat(hd)
    assert len(set(dg.zone_of(lon, lat).tolist())) == 1
    half = dg.NSTREET + dg.NHAMLET // 2
    for mask in (sidx < half, sidx >= half):
        lo, la = lon[mask], lat[mask]
        dx = lo[:, None] - lo[None, :]
        dy = la[:, None] - la[None, :]
        assert float(np.sqrt(dx ** 2 + dy ** 2).max()) < 3e-4
        # each family has >5 distinct streets (the selection threshold)
        fam_sidx = sidx[mask]
        assert len(set(fam_sidx.tolist())) > 5
    # families are disjoint in space
    a = sidx < half
    dx = lon[a][:, None] - lon[~a][None, :]
    dy = lat[a][:, None] - lat[~a][None, :]
    assert float(np.sqrt(dx ** 2 + dy ** 2).min()) > 3e-4


def _lance_fixture_dir(tmp_path, with_parquet=True):
    """An sf-dir whose documents table is 'lance' (a marker dir; the reader
    is monkeypatched — the lance package is absent in this sandbox)."""
    import shutil

    d = tmp_path / "sf_lance"
    d.mkdir()
    (d / "documents.lance").mkdir()  # lance datasets are directories
    if with_parquet:
        shutil.copy("/root/testdata/sf0.001/documents.parquet",
                    d / "documents.parquet")
    return str(d)


def test_images_dataset_takes_lance_branch(ray_session, tmp_path, monkeypatch):
    """With documents.lance present, images_dataset reads through
    ray.data.read_lance with column pruning, and the (prefilter, expand,
    synthesize) pipeline produces output identical to the parquet path."""
    import ray.data

    import bano_ray.datagen as dg

    sf = _lance_fixture_dir(tmp_path)
    calls = []

    def fake_read_lance(path, columns=None, **kw):
        calls.append((path, tuple(columns or ())))
        # stand-in for the lance scanner: same pruned doc_id stream
        return ray.data.read_parquet(f"{sf}/documents.parquet", columns=list(columns))

    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance)

    for kwargs in ({}, {"expand": 3}, {"doc_residue": (4, 1)}):
        calls.clear()
        via_lance = (dg.images_dataset(sf, **kwargs)
                     .select_columns(["doc_id", "caption", "phash", "lon", "lat"])
                     .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert calls and calls[0][0].endswith("documents.lance")
        assert calls[0][1] == ("doc_id",), "lance read must be column-pruned"
        via_parquet = (dg.images_dataset("/root/testdata/sf0.001", **kwargs)
                       .select_columns(["doc_id", "caption", "phash", "lon", "lat"])
                       .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert via_lance.equals(via_parquet), f"lance/parquet diverge for {kwargs}"


def test_images_dataset_lance_unavailable_falls_back_loudly(ray_session, tmp_path):
    """The real sandbox has no lance package: with a parquet twin present the
    reader warns and falls back; without one it raises (never silent)."""
    import warnings

    import bano_ray.datagen as dg

    sf = _lance_fixture_dir(tmp_path, with_parquet=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        n = dg.images_dataset(sf).count()
    assert n > 0
    assert any("lance reader is unavailable" in str(x.message) for x in w)

    bare = tmp_path / "bare"
    bare.mkdir()
    sf_bare = _lance_fixture_dir(bare, with_parquet=False)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="lance reader is unavailable"):
        dg.images_dataset(sf_bare)
