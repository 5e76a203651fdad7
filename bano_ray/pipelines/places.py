"""Places (lieux-dits) pipeline — reference ``bano/core_place.py:32-97``.

Replays the reference cascade per zone group:

1. seed one place per lieux-dits registry row (id = fantoir code)
2. CADASTRE place rows (street-only points): match by normalized name
   against FANTOIR facet names → update all targets; else NEW place with
   id = normalized name (``bano/models.py:238``)
3. OSM place rows: match by raw fantoir code, else by name, else NEW place
   (id = valid code, else normalized name); invalid codes stored as ''
   (``bano/core_place.py:49-61``)
4. output = per-place CADASTRE rows (format_toponyme display name) + OSM
   rows (``bano/models.py:250-254``)

Quirks preserved: ``add_place`` overwrites by id, so a late same-id place
REPLACES an earlier one (a cadastre-only place can be silently dropped by a
later OSM name-keyed place — reference behavior).

Input roles: street-only (no housenumber) CADASTRE/OSM rows whose street
falls in the lieu-dit band play the place-point role (the same OSM rows
also serve the highway role in the merge — mirroring the reference where
one OSM extract feeds both pipelines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import datagen
from ..functions.normalize import normalize
from ..functions.toponyme import format_toponyme
from ..runtime import ensure_worker_importable

LD_LO, LD_HI = 32, 48  # street band acting as lieux-dits (codes exist < K_REG)

PLACE_TYPES = ["hamlet", "village", "isolated_dwelling", "locality"]

PLACES_COLS = ["insee", "place_id", "source", "libelle_cadastre", "libelle_osm",
               "libelle_fantoir", "fantoir", "ld_bati", "ld_osm", "lon", "lat"]


def ld_registry_table() -> pa.Table:
    """Lieux-dits registry: band streets with codes (sidx < K_REG), official
    name = spelling 0, ld_bati alternating (reference fantoir_voie ld_bati)."""
    insee, f10, name, key, bati = [], [], [], [], []
    for z in range(datagen.NZONES):
        zi = str(z + 1).zfill(5)
        for s in range(LD_LO, min(LD_HI, datagen.K_REG)):
            insee.append(zi)
            f10.append(f"{zi}{str(s).zfill(4)}A")
            name.append(datagen.STREET_SPELLINGS[s][0])
            key.append(normalize(datagen.STREET_SPELLINGS[s][0]))
            bati.append("1" if s % 2 == 0 else "")
    return pa.table({"insee": insee, "fantoir10": f10, "name": name,
                     "street_key": key, "ld_bati": bati})


def place_type_of(doc_id: np.ndarray) -> np.ndarray:
    return np.asarray(PLACE_TYPES, dtype=object)[
        (datagen.stream(doc_id, 13) % 4).astype(np.int64)]


LD_KEYS = [normalize(datagen.STREET_SPELLINGS[s][0]) for s in range(LD_LO, LD_HI)]


def place_merge(df: pd.DataFrame) -> pd.DataFrame:
    """One zone group (place rows + 'ldreg' registry rows) → place rows."""
    empty = pd.DataFrame({c: pd.Series(dtype="float64" if c in ("lon", "lat")
                                       else "object") for c in PLACES_COLS})
    if len(df) == 0:
        return empty
    insee = str(df["insee"].iloc[0])

    places: dict[str, dict] = {}
    by_code: dict[str, set] = {}
    by_fname_key: dict[str, set] = {}

    def add_place(pid: str, p: dict):
        old = places.get(pid)
        if old is not None:  # overwrite-by-id: unregister old indexes
            if old["fantoir"]:
                by_code.get(old["fantoir"], set()).discard(pid)
            if old["fname_key"]:
                by_fname_key.get(old["fname_key"], set()).discard(pid)
        places[pid] = p
        if p["fantoir"]:
            by_code.setdefault(p["fantoir"], set()).add(pid)
        if p["fname_key"]:
            by_fname_key.setdefault(p["fname_key"], set()).add(pid)

    for r in df[df["rec_type"] == "ldreg"].itertuples(index=False):
        add_place(r.fantoir_raw, {
            "fantoir": r.fantoir_raw, "fname": r.street,
            "fname_key": r.street_key, "bati": r.ld_bati if r.ld_bati != "" else None,
            "cad": None, "osm": None,
        })

    pts = df[df["rec_type"] == "point"].sort_values("doc_id", kind="stable")
    for r in pts[pts["source"] == "CADASTRE"].itertuples(index=False):
        targets = sorted(by_fname_key.get(r.street_key, ()))
        if targets:
            for t in targets:
                places[t]["cad"] = (r.lon, r.lat, r.street)
        else:
            add_place(r.street_key, {
                "fantoir": "", "fname": "", "fname_key": "", "bati": -1,
                "cad": (r.lon, r.lat, r.street), "osm": None,
            })

    for r in pts[pts["source"] == "OSM"].itertuples(index=False):
        valid = len(r.fantoir_raw) == 10 and r.fantoir_raw[0:5] == insee
        eff = r.fantoir_raw if valid else ""
        ptype = place_type_of(np.array([r.doc_id]))[0]
        tf = sorted(by_code.get(r.fantoir_raw, ())) if r.fantoir_raw else []
        tn = sorted(by_fname_key.get(r.street_key, ()))
        osm_val = (r.lon, r.lat, ptype, r.street, eff)
        if tf:
            for t in tf:
                places[t]["osm"] = osm_val
        elif tn:
            for t in tn:
                places[t]["osm"] = osm_val
        else:
            add_place(eff or r.street_key, {
                "fantoir": eff, "fname": "", "fname_key": "", "bati": -1,
                "cad": None, "osm": osm_val,
            })

    rows = []
    for pid, p in places.items():
        bati = "" if p["bati"] is None else str(p["bati"])
        if p["cad"] is not None:
            lon, lat, name = p["cad"]
            rows.append({
                "insee": insee, "place_id": pid, "source": "CADASTRE",
                "libelle_cadastre": format_toponyme(name),
                "libelle_osm": (p["osm"][3].replace('"', "'") if p["osm"] else ""),
                "libelle_fantoir": p["fname"], "fantoir": p["fantoir"],
                "ld_bati": bati, "ld_osm": "", "lon": lon, "lat": lat,
            })
        if p["osm"] is not None:
            lon, lat, ptype, name, _ = p["osm"]
            rows.append({
                "insee": insee, "place_id": pid, "source": "OSM",
                "libelle_cadastre": "",
                "libelle_osm": name.replace('"', "'"),
                "libelle_fantoir": p["fname"], "fantoir": p["fantoir"],
                "ld_bati": bati, "ld_osm": ptype, "lon": lon, "lat": lat,
            })
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=PLACES_COLS).sort_values(
        ["place_id", "source"], kind="stable").reset_index(drop=True)


def places_dataset(sf_dir: str):
    """Zone-grouped places merge over street-only CADASTRE/OSM points in the
    lieu-dit band + lieux-dits registry rows."""
    import pyarrow.compute as pc
    import ray

    from .cumul import points_dataset

    ensure_worker_importable()
    keyset = pa.array(LD_KEYS)

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.equal(batch.column("hn"), ""),
                    pc.is_in(batch.column("street_key"), value_set=keyset)),
            pc.is_in(batch.column("source"), value_set=pa.array(["CADASTRE", "OSM"])))
        t = batch.filter(mask)
        n = t.num_rows
        return pa.table({
            "rec_type": pa.array(["point"] * n),
            "insee": t.column("insee"),
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "street": t.column("street"),
            "street_key": t.column("street_key"),
            "fantoir_raw": t.column("fantoir_raw"),
            "ld_bati": pa.array([""] * n),
            "lon": t.column("lon"),
            "lat": t.column("lat"),
        })

    pts = points_dataset(sf_dir).map_batches(prep, batch_format="pyarrow")
    reg = ld_registry_table()
    n = reg.num_rows
    regt = pa.table({
        "rec_type": pa.array(["ldreg"] * n),
        "insee": reg.column("insee"),
        "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),
        "source": pa.array([""] * n),
        "street": reg.column("name"),
        "street_key": reg.column("street_key"),
        "fantoir_raw": reg.column("fantoir10"),
        "ld_bati": reg.column("ld_bati"),
        "lon": pa.array(np.zeros(n)),
        "lat": pa.array(np.zeros(n)),
    })
    return pts.union(ray.data.from_arrow(regt)) \
        .groupby("insee").map_groups(place_merge, batch_format="pandas")
