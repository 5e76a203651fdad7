"""Sources readers, display expansion, rep promotion, postal tie-break."""

import gzip

import numpy as np
import pandas as pd
import pyarrow as pa

from bano_ray.functions.display import (expand_display_name, promote_rep,
                                        rep_b_as_bis)
from bano_ray.geo.wkb import encode_polygon
from bano_ray.sources_io import (PostalIndex, geojson_features_to_table,
                                 parse_fixed_width_batch, read_delimited,
                                 read_fixed_width)


def test_expand_display_name():
    arr = pa.array(["IMP DES LILAS", "RTE DU GAL LECLERC", "BD ST MICHEL",
                    'PL DE LA "MAIRIE"', "RUE HTE DU VX BOURG"])
    out = expand_display_name(arr).to_pylist()
    assert out == ["Impasse DES LILAS", "Route DU Général LECLERC",
                   "Boulevard Saint MICHEL", "Place DE LA MAIRIE",
                   "RUE Haute DU Vieux BOURG"]


def test_rep_b_as_bis_except_semantics():
    ban = pd.DataFrame({
        "id_fantoir": ["F1", "F1", "F2", "F3", "F3"],
        "numero": ["4", "4", "7", "9", "9"],
        "rep": ["b", "a", "b", "b", "c"],
    })
    # F1/4 has an 'a' sibling, F3/9 has a 'c' sibling → only F2/7 promotes
    assert rep_b_as_bis(ban) == {("F2", "7")}
    out = promote_rep(ban)
    by = dict(zip(zip(out["id_fantoir"], out["numero"], out["rep"]),
                  out["housenumber"]))
    assert by[("F2", "7", "b")] == "7 bis"
    assert by[("F1", "4", "b")] == "4 b"


def test_geojson_features_roundtrip():
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"nom": "Le Pré", "commune": "00001"},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]}},
        {"type": "Feature", "properties": {"nom": "Pt", "commune": "00002"},
         "geometry": {"type": "Point", "coordinates": [2.5, 48.0]}},
    ]}
    import json

    t = geojson_features_to_table(json.dumps(fc))
    assert t.num_rows == 2 and "geom_wkb" in t.column_names
    from bano_ray.geo.wkb import decode

    kind, val = decode(t.column("geom_wkb")[1].as_py())
    assert kind == "point" and val == (2.5, 48.0)


def test_fixed_width_parse_batch():
    # real FANTOIR layout (sql/load_fantoir.sql): dept(2) dir(1) com(3)
    # voie(4) cle(1) nature(4) libelle(26) ... annul@74 ... type@109 bati@110
    rec = ("75" + "1" + "056" + "1234" + "K" + "RUE " + "DES FLEURS".ljust(26)
           ).ljust(73) + "O" + "".ljust(108 - 74) + "1" + "B"
    t = parse_fixed_width_batch(pa.table({"text": [rec, "123456 HEADER", "123 HDR"]}))
    assert t.num_rows == 1  # header rows filtered
    r = t.to_pylist()[0]
    assert r["code_insee"] == "75056" and r["id_voie"] == "1234"
    assert r["fantoir10"] == "750561234K"
    assert r["nature_voie"] == "RUE" and r["libelle_voie"] == "DES FLEURS"
    assert r["caractere_annul"] == "O" and r["type_voie"] == "1" and r["ld_bati"] == "B"
    # 97x dept rule
    rec97 = ("97" + "4" + "411" + "0001" + "A").ljust(120)
    t2 = parse_fixed_width_batch(pa.table({"text": [rec97]}))
    assert t2.to_pylist()[0]["code_dept"] == "974"


def test_read_delimited_and_fixed_width(ray_session, tmp_path):
    p = tmp_path / "bal.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("cle;numero;voie\nA1;12;Rue du Test\nA2;7;Avenue Haute\n")
    ds = read_delimited(str(p), delimiter=";")
    assert ds.count() == 2 and "voie" in ds.schema().names
    fw = tmp_path / "fantoir.txt"
    rec = ("01" + "1" + "001" + "0005" + "B" + "GR  " + "GRANDE RUE".ljust(26)).ljust(120)
    fw.write_text(rec + "\n")
    t = read_fixed_width(str(fw)).to_pandas()
    assert t.iloc[0]["libelle_voie"] == "GRANDE RUE"
    assert t.iloc[0]["fantoir10"] == "010010005B"


def test_postal_smallest_area_tie_break():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    inner = np.array([[2, 2], [6, 2], [6, 6], [2, 6], [2, 2]], float)
    idx = PostalIndex([("P_OUTER", encode_polygon([outer])),
                       ("P_INNER", encode_polygon([inner]))])
    got = idx.assign_smallest([3.0, 8.0, 20.0], [3.0, 8.0, 20.0])
    assert list(got) == ["P_INNER", "P_OUTER", ""]


def test_append_suffixe_reference_quirks():
    from bano_ray.functions.validity import append_suffixe

    assert append_suffixe("Rue des Fleurs", "LE BOURG") == "Rue des Fleurs LE BOURG"
    # already suffixed (raw tail match) → unchanged
    assert append_suffixe("Rue des Fleurs LE BOURG", "LE BOURG") == "Rue des Fleurs LE BOURG"
    # empty suffix → unchanged
    assert append_suffixe("Rue A", "") == "Rue A"
    # short normalized name (<= suffix length) always appends
    assert append_suffixe("Rue", "QUARTIER DES LONGS CHAMPS") == "Rue QUARTIER DES LONGS CHAMPS"


def test_shapefile_point_roundtrip(tmp_path):
    """K4: .shp/.shx/.dbf trio round-trips points + text attributes; header
    invariants (file code, shape type, record count) hold."""
    import struct
    import pandas as pd
    from bano_ray.sources_io_shp import read_point_shapefile, write_point_shapefile

    df = pd.DataFrame({
        "id": ["000010001A-1", "000010001A-2", "000020002A-7"],
        "voie": ["Rue des Lilas", "Rue de l'Église", "Chemin du Pré Haut"],
        "lon": [2.351, -1.25, 5.5],
        "lat": [48.85, 43.6, 44.0],
    })
    base = str(tmp_path / "part")
    write_point_shapefile(df, base, attr_cols=["id", "voie"])
    raw = open(base + ".shp", "rb").read()
    assert struct.unpack(">I", raw[:4])[0] == 9994
    assert struct.unpack("<I", raw[32:36])[0] == 1
    shx = open(base + ".shx", "rb").read()
    assert (len(shx) - 100) // 8 == 3
    out = read_point_shapefile(base)
    assert len(out) == 3
    assert list(out["ID"]) == list(df["id"])
    assert list(out["VOIE"]) == list(df["voie"])
    assert out["lon"].tolist() == df["lon"].tolist()
    assert out["lat"].tolist() == df["lat"].tolist()


def test_shapefile_partitioned_sink(ray_session, sf_dir, tmp_path):
    """Distributed K4 sink over the CSV export: one shapefile trio per
    zone, atomic rename publish, re-readable."""
    import os
    from bano_ray.pipelines.exports import export_csv
    from bano_ray.sources_io_shp import read_point_shapefile, write_shapefile_partitioned

    out_dir = str(tmp_path / "shp")
    manifest = write_shapefile_partitioned(
        export_csv(sf_dir), out_dir, partition_col="ville").to_pandas()
    assert len(manifest) > 0
    total = 0
    for _, row in manifest.iterrows():
        base = os.path.join(out_dir, row["partition"])
        for ext in (".shp", ".shx", ".dbf"):
            assert os.path.exists(base + ext)
        part = read_point_shapefile(base)
        assert len(part) == row["n"]
        total += len(part)
    assert total == export_csv(sf_dir).count()


def test_pbf_roundtrip_and_distributed_read(ray_session, tmp_path):
    """S5: spec-level invariants — blob framing, zlib blobs, DenseNodes
    delta/zigzag coding, string-table tags — via write → distributed read."""
    import numpy as np
    from bano_ray.sources_pbf import (parse_dense_block, decode_blob,
                                      read_pbf, scan_blobs, write_pbf)

    rng = np.random.default_rng(2)
    n = 20000
    ids = np.sort(rng.choice(10**9, n, replace=False)).astype(np.int64)
    lon = rng.uniform(-5, 9, n)
    lat = rng.uniform(41, 51, n)
    tags = [[("addr:housenumber", str(i % 97)), ("addr:street", f"Rue {i % 13}")]
            for i in range(n)]
    p = str(tmp_path / "t.osm.pbf")
    write_pbf(p, ids, lon, lat, tags)

    blobs = scan_blobs(p)
    assert blobs[0]["type"] == "OSMHeader"
    assert sum(b["type"] == "OSMData" for b in blobs) == (n + 7999) // 8000

    df = read_pbf(p).to_pandas().sort_values("node_id").reset_index(drop=True)
    assert (df["node_id"].to_numpy() == ids).all()
    # coordinates are quantized to 1e-7 deg
    assert np.abs(df["lon"].to_numpy() - lon).max() < 1e-7
    assert np.abs(df["lat"].to_numpy() - lat).max() < 1e-7
    assert df["addr_housenumber"].tolist() == [t[0][1] for t in tags]
    assert df["addr_street"].tolist() == [t[1][1] for t in tags]


def test_pbf_distributed_write_matches_single_writer(ray_session, tmp_path):
    """K-side of S5: write_pbf_dataset (per-batch part blobs + driver
    framing concat) must decode to exactly the single-writer file's rows
    (VERDICT r3 #7 — no full-stream driver materialization)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from bano_ray.sources_pbf import read_pbf, write_pbf, write_pbf_dataset

    rng = np.random.default_rng(4)
    n = 9000
    ids = np.sort(rng.choice(10**8, n, replace=False)).astype(np.int64)
    lon = rng.uniform(-5, 9, n)
    lat = rng.uniform(41, 51, n)
    df = pd.DataFrame({"doc_id": ids, "lon": lon, "lat": lat,
                       "name": [f"N{i % 7}" for i in range(n)]})

    p1 = str(tmp_path / "single.osm.pbf")
    write_pbf(p1, ids, lon, lat, [[("name", s)] for s in df["name"]])

    def tag_fn(d):
        return [[("name", s)] for s in d["name"]]

    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    p2 = str(tmp_path / "dist.osm.pbf")
    write_pbf_dataset(ds.sort("doc_id"), p2, tag_fn=tag_fn)

    a = read_pbf(p1, tag_keys=("name",)).to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    b = read_pbf(p2, tag_keys=("name",)).to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_read_delimited_fresh_conditional_fetch(ray_session, tmp_path):
    """S1 freshness hook: unchanged source is skipped (the engine analog of
    the reference's If-Modified-Since 304 path, bano/sources/ban.py:38-41);
    a touched source re-reads."""
    import os
    import time

    from bano_ray.sources_io import read_delimited_fresh

    p = str(tmp_path / "ban.csv")
    with open(p, "w") as f:
        f.write("a;b\n1;x\n2;y\n")
    ds, state = read_delimited_fresh(p, None)
    assert ds is not None and ds.count() == 2 and p in state
    ds2, state2 = read_delimited_fresh(p, state)
    assert ds2 is None and state2 == state          # unchanged → skipped
    time.sleep(0.01)
    with open(p, "a") as f:
        f.write("3;z\n")
    os.utime(p)
    ds3, state3 = read_delimited_fresh(p, state2)
    assert ds3 is not None and ds3.count() == 3
    assert state3[p] != state2[p]
