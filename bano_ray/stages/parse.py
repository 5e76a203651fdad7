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
    """Split caption into hn / street and attach the normalized merge key."""
    cap = batch.column("caption")
    if isinstance(cap, pa.ChunkedArray):
        cap = cap.combine_chunks()
    ext = pc.extract_regex(cap, r"^(?P<hn>.*?), (?P<street>.*)$")
    hn = pc.coalesce(pc.struct_field(ext, "hn"), pa.scalar("", type=pa.string()))
    street = pc.coalesce(pc.struct_field(ext, "street"), cap)
    key = normalize_array(street.to_numpy(zero_copy_only=False))
    return (batch
            .append_column("hn", hn)
            .append_column("street", street)
            .append_column("street_key", pa.array(key, type=pa.string())))


def encode_cells(batch: pa.Table, res: int = CELL_RES) -> pa.Table:
    cell = cell_encode(batch.column("lon").to_numpy(), batch.column("lat").to_numpy(), res)
    return batch.append_column("cell", pa.array(cell, type=pa.int64()))


class ZoneAssigner:
    """Actor-pool stage: broadcast polygon set → per-batch PIP.

    Built ONCE per actor from a ``ray.put`` object ref (never re-shipped per
    batch).  Exact pass first; rows it leaves unmatched get the bbox
    relaxation pass (reference ``bano/sql/hsnr_bbox_insee_nocache.sql:20``).
    Multi-matches keep the smallest zone id — deterministic, and equivalent
    to the reference's UNION-dedup for identical keys.

    At 10^12-row scale the polygon side is sharded by cell and this stage
    becomes the per-cell ``map_groups`` PIP; the broadcast form is right
    whenever the polygon set fits a worker heap (56 zones here,
    ~35k communes in the reference's world — both tiny).
    """

    def __init__(self, zones_ref):
        import ray

        zones = ray.get(zones_ref) if not isinstance(zones_ref, list) else zones_ref
        self.index = PolygonIndex(zones)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        n = len(lon)
        assigned = np.full(n, "", dtype=object)
        via_bbox = np.zeros(n, dtype=bool)
        pi, gi = self.index.assign_all(lon, lat)
        for p, g in zip(pi.tolist(), gi.tolist()):
            k = self.index.keys[g]
            if assigned[p] == "" or k < assigned[p]:
                assigned[p] = k
        missing = np.nonzero(assigned == "")[0]
        if len(missing):
            pi2, gi2 = self.index.assign_bbox(lon[missing], lat[missing])
            for p, g in zip(pi2.tolist(), gi2.tolist()):
                i = missing[p]
                k = self.index.keys[g]
                if assigned[i] == "" or k < assigned[i]:
                    assigned[i] = k
                via_bbox[i] = True
        return (batch
                .append_column("insee", pa.array(assigned, type=pa.string()))
                .append_column("zone_via_bbox", pa.array(via_bbox)))
