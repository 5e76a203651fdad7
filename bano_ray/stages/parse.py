"""Stateless parse + cell/zone assignment stages (map_batches, zero-copy Arrow).

- caption → (housenumber, street): the input schema carries the housenumber
  inside the caption ("<hn>, <street>"), mirroring the reference's
  numero+voie address record (``bano/models.py:10-19``).
- cell encoding at the engine resolution (partition key).
- zone assignment via the PolygonIndex actor stage (exact PIP pass +
  bbox-relaxation pass, reference G1/G3 semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.normalize import normalize_array
from ..geo.cells import cell_encode
from ..geo.pip import PolygonIndex

CELL_RES = 12  # engine partition resolution (~10 km tiles; skew-split deeper)


def parse_caption(batch: pa.Table) -> pa.Table:
    """Split caption into hn / street and attach the normalized merge key.

    The normalize rewrite runs once per UNIQUE street via Arrow
    dictionary-encode (the C++ hash table), and the per-row key column is
    re-flattened with ``pc.take`` — Python objects are only ever created
    for the uniques, never per row (the former ``to_numpy`` of the whole
    street column was the hot chain's largest per-row allocation)."""
    cap = batch.column("caption")
    if isinstance(cap, pa.ChunkedArray):
        cap = cap.combine_chunks()
    ext = pc.extract_regex(cap, r"^(?P<hn>.*?), (?P<street>.*)$")
    hn = pc.coalesce(pc.struct_field(ext, "hn"), pa.scalar("", type=pa.string()))
    street = pc.coalesce(pc.struct_field(ext, "street"), cap)
    d = pc.dictionary_encode(street)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    uniq = d.dictionary.to_numpy(zero_copy_only=False)
    key = pc.take(pa.array(normalize_array(uniq), type=pa.string()), d.indices)
    return (batch
            .append_column("hn", hn)
            .append_column("street", street)
            .append_column("street_key", key))


def encode_cells(batch: pa.Table, res: int = CELL_RES) -> pa.Table:
    cell = cell_encode(batch.column("lon").to_numpy(), batch.column("lat").to_numpy(), res)
    return batch.append_column("cell", pa.array(cell, type=pa.int64()))


def _assign_with_index(index: PolygonIndex, batch: pa.Table) -> pa.Table:
    """Exact PIP pass; rows left unmatched get the bbox relaxation pass
    (reference ``bano/sql/hsnr_bbox_insee_nocache.sql:20``).  Multi-matches
    keep the smallest polygon slot (= smallest zone id here) — deterministic,
    equivalent to the reference's UNION-dedup for identical keys."""
    lon = batch.column("lon").to_numpy()
    lat = batch.column("lat").to_numpy()
    n = len(lon)
    NO = np.iinfo(np.int64).max
    slot = np.full(n, NO, dtype=np.int64)
    via_bbox = np.zeros(n, dtype=bool)
    pi, gi = index.assign_all(lon, lat)
    if len(pi):
        np.minimum.at(slot, pi, gi)
    missing = np.nonzero(slot == NO)[0]
    if len(missing):
        pi2, gi2 = index.assign_bbox(lon[missing], lat[missing])
        if len(pi2):
            np.minimum.at(slot, missing[pi2], gi2)
            via_bbox[missing[pi2]] = True
    # flatten key strings in Arrow C (no per-row Python string objects)
    keys = pa.array(index.keys + [""], type=pa.string())
    assigned = pc.take(keys, pa.array(np.where(slot == NO, len(index.keys), slot)))
    return (batch
            .append_column("insee", assigned)
            .append_column("zone_via_bbox", pa.array(via_bbox)))


_INDEX_CACHE: dict = {}


def make_zone_assigner(zones_ref):
    """Stateless-task zone assigner with a worker-process-global index cache:
    the polygon index is built once per worker from the broadcast ref (never
    re-shipped / re-built per batch), without paying actor-pool startup.
    """
    def assign(batch: pa.Table) -> pa.Table:
        key = zones_ref.hex() if hasattr(zones_ref, "hex") else id(zones_ref)
        index = _INDEX_CACHE.get(key)
        if index is None:
            import ray

            zones = ray.get(zones_ref) if not isinstance(zones_ref, list) else zones_ref
            index = PolygonIndex(zones)
            _INDEX_CACHE[key] = index
        return _assign_with_index(index, batch)

    return assign


class ZoneAssigner:
    """Actor-pool form of the same stage — for deployments where index build
    is heavy (e.g. ~35k commune polygons) and warm actors amortize it.

    At 10^12-row scale the polygon side is sharded by cell and this stage
    becomes the per-cell ``map_groups`` PIP; the broadcast form is right
    whenever the polygon set fits a worker heap.
    """

    def __init__(self, zones_ref):
        import ray

        zones = ray.get(zones_ref) if not isinstance(zones_ref, list) else zones_ref
        self.index = PolygonIndex(zones)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _assign_with_index(self.index, batch)
