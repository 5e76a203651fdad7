"""Incremental / lineage / resume semantics (no Ray needed for the
planning pieces; the kill-and-resume test runs the partitioned writer)."""

import json
import os

import numpy as np
import pyarrow as pa

from bano_ray import datagen
from bano_ray.pipelines import incremental as inc


def test_impacted_zones_matches_box_arithmetic():
    t = inc.impacted_zones()
    assert t.num_rows >= len(datagen.EXPIRE_TILES)  # every tile hits ≥1 zone
    # each (tile, zone) pair really intersects
    from bano_ray.geo.cells import tile_bbox_lonlat

    for z, x, y, insee in zip(*(t.column(c).to_pylist() for c in ("z", "x", "y", "insee"))):
        lon0, lat0, lon1, lat1 = (v.item() for v in tile_bbox_lonlat(z, x, y))
        zi = int(insee) - 1
        zx, zy = zi // datagen.NZY, zi % datagen.NZY
        x0 = datagen.LON0 + datagen.LON_SPAN * zx / datagen.NZX
        x1 = datagen.LON0 + datagen.LON_SPAN * (zx + 1) / datagen.NZX
        y0 = datagen.LAT0 + datagen.LAT_SPAN * zy / datagen.NZY
        y1 = datagen.LAT0 + datagen.LAT_SPAN * (zy + 1) / datagen.NZY
        assert lon0 <= x1 and lon1 >= x0 and lat0 <= y1 and lat1 >= y0


def test_changed_cells_cover_tiles():
    cells = inc.changed_cells(res=12)
    assert len(cells) > 0
    from bano_ray.geo.cells import cell_decode

    zz, _, _ = cell_decode(cells)
    assert (zz == 12).all()


def test_partition_write_and_resume(tmp_path):
    out = str(tmp_path / "out")
    t1 = pa.table({"a": [1, 2], "insee": ["00001", "00001"]})
    rec = inc.write_partition(out, "00001", t1)
    assert rec["rows_out"] == 2
    done = inc.completed_partitions(out)
    assert done == {"00001"}
    # stale code version is NOT treated as complete
    lp = os.path.join(out, "insee=00001", "_lineage.json")
    j = json.load(open(lp))
    j["code_version"] = "old"
    json.dump(j, open(lp, "w"))
    assert inc.completed_partitions(out) == set()
    # partial (killed) write: partition dir without lineage → not complete
    os.makedirs(os.path.join(out, "insee=00002"))
    assert "00002" not in inc.completed_partitions(out)


def test_run_partitioned_kill_and_resume(ray_session, tmp_path, sf_dir):
    out = str(tmp_path / "cumul")
    # full run
    res1 = inc.run_partitioned(sf_dir, out)
    assert len(res1["written"]) > 0 and not res1["skipped_done"]
    # simulate a kill: remove lineage from one partition (incomplete)
    victim = res1["written"][0]
    os.remove(os.path.join(out, f"insee={victim}", "_lineage.json"))
    res2 = inc.run_partitioned(sf_dir, out)
    assert victim in res2["written"]          # recomputed
    assert set(res2["skipped_done"]) == set(res1["written"]) - {victim}
    # incremental mode: only tile-impacted zones recompute
    res3 = inc.run_partitioned(sf_dir, out, tiles=datagen.EXPIRE_TILES)
    impacted = inc.impacted_insee_set(datagen.EXPIRE_TILES)
    assert set(res3["written"]) | set(res3["skipped_done"]) <= impacted | set(res1["written"])


def test_arrondissement_substitution_semantics():
    """G9 metropolis rule: metro parents are never expired; their level-9
    arrondissement codes appear instead, and only for boxes the tile
    actually intersects (reference bano/models.py:330-360)."""
    from bano_ray import datagen
    from bano_ray.pipelines import incremental as inc

    arm = inc.impacted_zones(arrondissements=True).to_pandas()
    lvl8 = inc.impacted_zones().to_pandas()
    parents = {str(zi + 1).zfill(5) for zi in datagen.METRO_ZONES}
    arr_codes = {c for c, *_ in datagen.arrondissement_boxes()}
    assert not (set(arm["insee"]) & parents)
    assert set(arm["insee"]) - arr_codes == set(lvl8["insee"]) - parents
    # the coarse straddling tile must expire ALL 4 arrondissements of its
    # metro zone
    coarse = arm[(arm["z"] == 10)]
    assert len(coarse) == datagen.METRO_GRID ** 2
    # non-metro zones are identical between the two modes
    assert set(lvl8["insee"]) - parents <= set(arm["insee"])


def test_commune_list_exclusions():
    """J12: COMD rows and ARM parents excluded, ARM children included
    (reference bano/db_helpers.py:7-15)."""
    from bano_ray import datagen
    from bano_ray.pipelines.queries import q_commune_list

    out = q_commune_list("unused").to_pandas()
    cog = datagen.cog_communes_table().to_pandas()
    parents = {str(zi + 1).zfill(5) for zi in datagen.METRO_ZONES}
    comds = set(cog[cog["typecom"] == "COMD"]["com"])
    arms = set(cog[cog["typecom"] == "ARM"]["com"])
    got = set(out["com"])
    assert not (got & parents)
    assert not (got & comds)
    assert arms <= got
    assert comds and arms and parents  # the fixture actually plants all three
