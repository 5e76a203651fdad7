"""Per-zone cross-source merge — the reference's ``addr_2_db`` accumulator
semantics (``bano/core.py:281-323``, ``bano/models.py:22-165``) re-expressed
as a single ``groupby(insee).map_groups`` over co-shuffled rows.

One zone group contains: the four sources' parsed address rows, the OSM
street-only rows (highway role), and the registry rows for that zone.  The
group function replays the reference's per-source accumulation exactly:

- register street by normalized key; ``voies[source]`` facet set only by an
  accepted address (``bano/models.py:53-60``) or the OSM highway path
  (``bano/core.py:179-200``)
- OSM multi-number explode (``bano/core.py:141-156``); per-(street, numero)
  last-writer-wins in (doc, part) order
- OSM tag FANTOIR accepted only when 10 chars + zone prefix
  (``bano/models.py:198-200``)
- BAN fantoir9→fantoir10 repair (``bano/core.py:111-116``)
- CADASTRE pseudo_adresse drop (``bano/models.py:92``)
- registry attach: key match sets ``fantoirs['FANTOIR']`` + official name;
  else an OSM code known to the registry sets the official name
  (``bano/core.py:23-31``)
- best fantoir = OSM else FANTOIR else '' (``bano/models.py:76-77``)
- OSM-name-by-fantoir fallback for the voie_osm facet
  (``bano/models.py:127``, mapping built at ``bano/core.py:197-199``)
- cumul_voies label point = the reference's quirky "last first-inserted
  numero's last-written coords" (``bano/models.py:143-153``)
- highway-type bitmask OR-accumulation (``bano/core.py:273-279``)

Output is a union block: ``rec_type`` ∈ {adresse, voie} (one shuffle, one
pass; downstream filters by rec_type).

Scale note: the group key is the spatial partition (zone here, H3-style cell
in the general path) — bounded by skew splitting, so per-group work is O(cell
rows), and image ``bytes`` never enter this shuffle (only parsed metadata
columns are selected upstream; bytes re-join by image_id afterwards).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.housenumber import is_valid_housenumber, split_multi
from ..functions.validity import fantoir9_to_candidate, get_code_dept_from_insee

SOURCES_ORDER = ["OSM", "BAN", "BAL", "CADASTRE"]

HIGHWAY_TYPES = [
    "steps", "path", "cycleway", "footway", "pedestrian", "track", "service",
    "road", "living_street", "residential", "unclassified", "tertiary",
    "secondary", "primary", "trunk", "motorway",
]
HIGHWAY_TYPES_INDEX = {e: 2 ** i for i, e in enumerate(HIGHWAY_TYPES)}

ADRESSE_COLS = ["rec_type", "insee", "dept", "source", "street_key", "numero",
                "lon", "lat", "code_postal", "fantoir",
                "voie_osm", "voie_fantoir", "voie_bal", "voie_cadastre", "voie_autre",
                "highway_index"]


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype="float64" if c in ("lon", "lat") else
                                      ("int64" if c == "highway_index" else "object"))
                         for c in ADRESSE_COLS})


def merge_zone(df: pd.DataFrame, registry: dict[str, dict[str, str]] | None = None
               ) -> pd.DataFrame:
    """Replay the reference per-commune merge for one zone group.

    ``registry`` maps this zone's data three ways (built from the registry
    rows riding in the group or passed broadcast):
    ``key_to_f10`` (normalized official name → fantoir10),
    ``f10_to_name`` (fantoir10 → official name),
    ``f9_to_f10`` (fantoir10[0:9] → fantoir10).
    """
    if len(df) == 0:
        return _empty_out()
    insee = str(df["insee"].iloc[0])
    dept = get_code_dept_from_insee(insee)

    if registry is None:
        reg_rows = df[df["rec_type"] == "registry"]
        key_to_f10 = dict(zip(reg_rows["street_key"], reg_rows["fantoir_raw"]))
        f10_to_name = dict(zip(reg_rows["fantoir_raw"], reg_rows["street"]))
        f9_to_f10 = {f[0:9]: f for f in reg_rows["fantoir_raw"]}
    else:
        key_to_f10 = registry["key_to_f10"]
        f10_to_name = registry["f10_to_name"]
        f9_to_f10 = registry["f9_to_f10"]

    pts = df[df["rec_type"] == "point"].sort_values("doc_id", kind="stable")
    highways = pts[(pts["source"] == "OSM") & (pts["hn"] == "")]

    out_rows: list[dict] = []
    voie_rows: list[dict] = []

    for source in SOURCES_ORDER:
        rows = pts[pts["source"] == source]
        if source == "CADASTRE":
            rows = rows[rows["pseudo_adresse"] != "true"]
        if len(rows) == 0 and len(highways) == 0:
            continue

        # street accumulator: key → facets (reference Adresses, models.py:22-42)
        streets: dict[str, dict] = {}
        fantoir_to_osm_name: dict[str, str] = {}

        def register(key: str) -> dict:
            if key not in streets:
                streets[key] = {"voies": {}, "fantoirs": {}, "numeros": {},
                                "highway_index": 0}
            return streets[key]

        # 1) source's own address rows, in doc order
        for r in rows.itertuples(index=False):
            key = r.street_key
            st = register(key)
            hn_raw = r.hn
            if source == "OSM":
                fant = r.fantoir_raw if (len(r.fantoir_raw) == 10
                                         and r.fantoir_raw[0:5] == insee) else ""
                for part in split_multi(hn_raw) if hn_raw else []:
                    if not is_valid_housenumber(part):
                        continue
                    st["voies"]["OSM"] = r.street
                    st["numeros"][part] = (r.lon, r.lat, r.postcode)
                    if fant:
                        st["fantoirs"]["OSM"] = fant
            elif source == "BAN":
                if r.fantoir_raw and len(r.fantoir_raw) == 10:
                    f9 = fantoir9_to_candidate(r.fantoir_raw)
                    if f9 in f9_to_f10:
                        st["fantoirs"]["FANTOIR"] = f9_to_f10[f9]
                if is_valid_housenumber(hn_raw):
                    st["voies"]["BAN"] = r.street
                    st["numeros"][hn_raw] = (r.lon, r.lat, r.postcode)
            else:  # BAL / CADASTRE carry no usable postcode (reference)
                if is_valid_housenumber(hn_raw):
                    st["voies"][source] = r.street
                    st["numeros"][hn_raw] = (r.lon, r.lat, "")

        if not streets:
            continue  # reference: highways only load when addresses exist

        # 2) OSM highways (street-only rows), every source run
        for r in highways.itertuples(index=False):
            key = r.street_key
            st = register(key)
            if "OSM" in st["fantoirs"]:
                continue
            fant = r.fantoir_raw if (len(r.fantoir_raw) == 10
                                     and r.fantoir_raw[0:5] == insee) else ""
            if fant:
                st["fantoirs"]["OSM"] = fant
                fantoir_to_osm_name.setdefault(fant, r.street)
            st["voies"]["OSM"] = r.street

        # 2b) highway-type bitmask, OSM run only (bano/core.py:273-279,313).
        # The source query UNION-dedups (name, highway) pairs
        # (bano/sql/type_highway_insee.sql), so += over distinct types == OR.
        if source == "OSM":
            seen_types: dict[str, set] = {}
            for r in highways.itertuples(index=False):
                st = register(r.street_key)
                htype = getattr(r, "highway_type", "")
                if htype in HIGHWAY_TYPES_INDEX and \
                        htype not in seen_types.setdefault(r.street_key, set()):
                    seen_types[r.street_key].add(htype)
                    st["highway_index"] += HIGHWAY_TYPES_INDEX[htype]

        # 3) registry attach (add_fantoir_to_hsnr, bano/core.py:23-31)
        for key, st in streets.items():
            if key in key_to_f10:
                st["fantoirs"]["FANTOIR"] = key_to_f10[key]
                st["voies"]["FANTOIR"] = f10_to_name[key_to_f10[key]]
            elif st["fantoirs"].get("OSM") in f10_to_name:
                st["voies"]["FANTOIR"] = f10_to_name[st["fantoirs"]["OSM"]]

        # 4) save (bano/models.py:116-165)
        for key, st in streets.items():
            best = st["fantoirs"].get("OSM") or st["fantoirs"].get("FANTOIR") or ""
            voie_osm = st["voies"].get("OSM") or fantoir_to_osm_name.get(best, "")
            voie_fantoir = st["voies"].get("FANTOIR", "")
            voie_cadastre = st["voies"].get("CADASTRE", "")
            voie_bal = st["voies"].get("BAL", "")
            voie_autre = st["voies"].get(source, "") if source in ("CADASTRE", "BAL", "BAN") else ""
            label = None
            for num, (nlon, nlat, ncp) in st["numeros"].items():
                out_rows.append({
                    "rec_type": "adresse", "insee": insee, "dept": dept,
                    "source": source, "street_key": key, "numero": num,
                    "lon": nlon, "lat": nlat, "code_postal": ncp,
                    "fantoir": best, "voie_osm": voie_osm,
                    "voie_fantoir": voie_fantoir, "voie_bal": voie_bal,
                    "voie_cadastre": voie_cadastre, "voie_autre": voie_autre,
                    "highway_index": 0,
                })
                if source == "OSM":
                    label = (nlon, nlat)
            if source == "OSM" and label is not None:
                voie_rows.append({
                    "rec_type": "voie", "insee": insee, "dept": dept,
                    "source": source, "street_key": key, "numero": "",
                    "lon": label[0], "lat": label[1], "code_postal": "",
                    "fantoir": best, "voie_osm": voie_osm,
                    "voie_fantoir": voie_fantoir, "voie_bal": voie_bal,
                    "voie_cadastre": voie_cadastre, "voie_autre": voie_autre,
                    "highway_index": st["highway_index"],
                })

    out = pd.DataFrame(out_rows + voie_rows, columns=ADRESSE_COLS)
    if len(out) == 0:
        return _empty_out()
    out["highway_index"] = out["highway_index"].astype("int64")
    return out.sort_values(["rec_type", "source", "street_key", "numero"],
                           kind="stable").reset_index(drop=True)
