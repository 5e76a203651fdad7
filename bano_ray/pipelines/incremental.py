"""Incremental recompute: expire tiles → impacted zones/cells → semi-join,
plus per-partition lineage records and resumable partitioned output.

Reference semantics: imposm expire tiles at z16 → tile bbox (truncated
mercator constants) → ``ST_Intersects`` vs zone polygons → distinct zone
list → only those zones reprocessed (``bano/models.py:305-360``,
``bano/update_manager.py:26-76``); each zone write is an idempotent
partition overwrite (``bano/models.py:117-119``).

Engine shape: the changed-zone set is tiny (planning data) and computed
driver-side; the *filter* it drives is a distributed semi-join
(``pc.is_in`` mask inside map_batches against a broadcast set).  Output is
partitioned parquet (one dir per zone) with a ``_lineage.json`` per
partition; a restarted run skips partitions whose lineage is complete.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

from .. import datagen
from ..geo.cells import tile_bbox_lonlat, tiles_to_cells

CODE_VERSION = "r1"


def impacted_zones(tiles: list[tuple[int, int, int]] | None = None,
                   arrondissements: bool = False) -> pa.Table:
    """(z,x,y) tiles → (z, x, y, insee) pairs for every zone whose box the
    tile bbox intersects (closed-box ST_Intersects semantics).

    ``arrondissements=True`` applies the reference's metropolis rule
    (``bano/models.py:330-360``): the metro parents' admin_level-8 polygons
    are EXCLUDED (reference ``NOT IN ('13055','69123','75056')``) and the
    admin_level-9 arrondissement polygons whose insee matches the metro
    prefixes take over — a tile over Paris/Lyon/Marseille expires
    arrondissements, not the parent commune.  Default False keeps the
    level-8 list: the synthetic point stream is keyed by zone insee, so the
    recompute semi-join (``run_partitioned``) stays on level-8 keys.
    """
    tiles = tiles if tiles is not None else datagen.EXPIRE_TILES
    z = np.array([t[0] for t in tiles], dtype=np.int64)
    x = np.array([t[1] for t in tiles], dtype=np.int64)
    y = np.array([t[2] for t in tiles], dtype=np.int64)
    lon0, lat0, lon1, lat1 = tile_bbox_lonlat(z, x, y)
    metro_parents = {str(zi + 1).zfill(5) for zi in datagen.METRO_ZONES} \
        if arrondissements else set()
    boxes: list[tuple[str, float, float, float, float]] = []
    for zi in range(datagen.NZONES):
        insee = str(zi + 1).zfill(5)
        if insee in metro_parents:
            continue
        x0, x1, y0, y1 = datagen.zone_box(zi)
        boxes.append((insee, x0, x1, y0, y1))
    if arrondissements:
        boxes.extend((code, x0, x1, y0, y1)
                     for code, _parent, x0, x1, y0, y1
                     in datagen.arrondissement_boxes())
    out_z, out_x, out_y, out_i = [], [], [], []
    for insee, x0, x1, y0, y1 in boxes:
        hit = (lon0 <= x1) & (lon1 >= x0) & (lat0 <= y1) & (lat1 >= y0)
        for j in np.nonzero(hit)[0]:
            out_z.append(int(z[j])); out_x.append(int(x[j])); out_y.append(int(y[j]))
            out_i.append(insee)
    t = pa.table({"z": pa.array(out_z, pa.int64()), "x": pa.array(out_x, pa.int64()),
                  "y": pa.array(out_y, pa.int64()), "insee": pa.array(out_i)})
    return t.sort_by([("z", "ascending"), ("x", "ascending"),
                      ("y", "ascending"), ("insee", "ascending")])


def impacted_insee_set(tiles=None) -> set[str]:
    return set(impacted_zones(tiles).column("insee").to_pylist())


def changed_cells(tiles=None, res: int = 12) -> np.ndarray:
    """Tile list → engine cells at partition resolution (ancestor/descendant
    mapping) — the semi-join key set for cell-partitioned pipelines."""
    tiles = tiles if tiles is not None else datagen.EXPIRE_TILES
    return tiles_to_cells([t[0] for t in tiles], [t[1] for t in tiles],
                          [t[2] for t in tiles], res)


def semi_join_zones(ds, insee_set: set[str]):
    """Distributed semi-join: keep only rows whose insee is in the changed
    set (broadcast set, arrow is_in mask — no shuffle)."""
    import pyarrow.compute as pc

    keys = pa.array(sorted(insee_set))

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("insee"), value_set=keys))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Lineage + resumable partitioned writes
# ---------------------------------------------------------------------------


def partition_dir(out_dir: str, insee: str) -> str:
    return os.path.join(out_dir, f"insee={insee}")


def write_partition(out_dir: str, insee: str, table: pa.Table,
                    input_rows: int | None = None) -> dict:
    """Atomic partition overwrite + lineage record (write tmp, fsync-free
    rename; lineage last so presence == completeness)."""
    import pyarrow.parquet as pq

    d = partition_dir(out_dir, insee)
    tmp = d + ".tmp"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.time()
    pq.write_table(table, os.path.join(tmp, "part.parquet"))
    if os.path.exists(d):
        import shutil
        shutil.rmtree(d)
    os.rename(tmp, d)
    lineage = {
        "insee": insee,
        "rows_out": table.num_rows,
        "rows_in": input_rows,
        "code_version": CODE_VERSION,
        "wall_s": round(time.time() - t0, 4),
        "ts": time.time(),
    }
    with open(os.path.join(d, "_lineage.json"), "w") as f:
        json.dump(lineage, f)
    return lineage


def completed_partitions(out_dir: str, code_version: str = CODE_VERSION) -> set[str]:
    """Partitions whose lineage is present and from the same code version."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("insee="):
            continue
        lp = os.path.join(out_dir, name, "_lineage.json")
        try:
            with open(lp) as f:
                rec = json.load(f)
            if rec.get("code_version") == code_version:
                done.add(name.split("=", 1)[1])
        except (OSError, json.JSONDecodeError):
            continue
    return done


def run_partitioned(sf_dir: str, out_dir: str, tiles=None,
                    expand: int = 1) -> dict:
    """Resumable flagship write: cumul per zone → parquet partitions.

    - incremental mode: only tile-impacted zones recompute (others skipped)
    - resume: partitions with valid lineage are skipped on restart
    Returns a summary manifest.

    Partition writes happen inside map_groups tasks: ``out_dir`` must be a
    shared filesystem (or object-store URI) on a multi-node cluster — the
    same requirement as any partitioned ``write_parquet``.
    """
    from .cumul import cumul_dataset

    import ray

    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir)
    targets = impacted_insee_set(tiles) if tiles is not None else None

    # resume compute skip: completed partitions filter out right after
    # zone assignment (broadcast membership), so a restarted run never
    # re-merges finished zones — not just never re-writes them
    drop_ref = ray.put(pa.array(sorted(done), pa.string())) if done else None
    ds = cumul_dataset(sf_dir, expand=expand, insee_drop=drop_ref)
    if targets is not None:
        ds = semi_join_zones(ds, targets)

    skipped, written = [], []

    def write_group(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame({"insee": [], "rows": []})
        insee = str(df["insee"].iloc[0])
        if insee in done:
            return pd.DataFrame({"insee": [insee], "rows": [-1]})
        table = pa.Table.from_pandas(df, preserve_index=False)
        rec = write_partition(out_dir, insee, table)
        return pd.DataFrame({"insee": [insee], "rows": [rec["rows_out"]]})

    res = ds.groupby("insee").map_groups(write_group, batch_format="pandas").to_pandas()
    for r in res.itertuples(index=False):
        (skipped if r.rows == -1 else written).append(r.insee)
    # compute-skipped zones never reach write_group — report them from the
    # lineage set (intersected with the incremental target set when given)
    skipped.extend(done if targets is None else (done & set(targets)))
    return {"written": sorted(written), "skipped_done": sorted(set(skipped)),
            "out_dir": out_dir}
