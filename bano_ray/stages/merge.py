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
  numero's last-written coords" (``bano/models.py:143-153``), OVERRIDDEN by
  the point_par_rue way-derived label when the street has one
  (``bano/core.py:237-264``, ``bano/models.py:151-153``): label rows from
  the distributed pre-pass (``stages/label.py``) ride the same shuffle as
  ``rec_type='label'``, register the street after the FANTOIR attach, fill
  the OSM name/fantoir facets when absent, and alone suffice to emit the
  voie row (way-only streets — the J10 population)
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
    labels = df[df["rec_type"] == "label"]

    out_rows: list[dict] = []
    voie_rows: list[dict] = []

    for source in SOURCES_ORDER:
        rows = pts[pts["source"] == source]
        if source == "CADASTRE":
            rows = rows[rows["pseudo_adresse"] != "true"]
        if len(rows) == 0 and len(highways) == 0 and len(labels) == 0:
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

        if not streets and not (source == "OSM" and len(labels)):
            # reference: highways only load when addresses exist — the
            # commune-level gate (core.py:314).  Labels arrive pre-gated to
            # OSM-bearing communes (stages/label.py), so an OSM pass with
            # labels proceeds to the load steps even when this salt shard
            # holds no OSM point rows (the reference gate is per commune,
            # not per shard).
            continue

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

        # 3b) point_par_rue load (bano/core.py:237-252) — AFTER the registry
        # attach, so a street registered only here carries no FANTOIR
        # facets; fills the OSM name/fantoir when absent and stores the
        # way-derived label point (applied at save for the OSM pass only).
        for r in labels.itertuples(index=False):
            st = register(r.street_key)
            if "OSM" not in st["voies"]:
                st["voies"]["OSM"] = r.street
            if "OSM" not in st["fantoirs"] and r.street_key in key_to_f10:
                st["fantoirs"]["OSM"] = key_to_f10[r.street_key]
            st["label_pt"] = (r.lon, r.lat)

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
            # point_par_rue override (bano/models.py:150-153): the
            # way-derived point beats the quirky last-numero fallback, and
            # alone suffices to emit the voie row (way-only streets)
            if source == "OSM" and "label_pt" in st:
                label = st["label_pt"]
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


# ---------------------------------------------------------------------------
# Vectorized merge — same semantics as merge_zone, pandas/numpy group ops
# instead of a per-row Python loop (the hot path at bench scale).
# Differentially tested against merge_zone (tests/test_merge.py) and against
# the DuckDB oracle.
# ---------------------------------------------------------------------------


def _explode_osm(rows: pd.DataFrame) -> pd.DataFrame:
    """Vectorized OSM multi-number explode: split results memoized per
    UNIQUE hn string, broadcast with np.repeat (housenumber strings are
    low-cardinality in any real corpus)."""
    hn = rows["hn"].to_numpy()
    uniq, inv = np.unique(hn.astype("U"), return_inverse=True)
    splits = [split_multi(u) for u in uniq]
    lens = np.array([len(s) for s in splits], dtype=np.int64)
    reps = lens[inv]
    idx = np.repeat(np.arange(len(rows)), reps)
    numeros = np.concatenate([np.asarray(splits[i], dtype=object) for i in inv]) \
        if len(rows) else np.empty(0, dtype=object)
    out = rows.iloc[idx].copy()
    out["numero"] = numeros
    # part ordering within a row = split order
    out["part_idx"] = np.concatenate([np.arange(r) for r in reps]) if len(rows) else []
    return out


def merge_zone_vec(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized replay of the reference per-commune merge (see
    :func:`merge_zone` for the semantics inventory and citations).

    Differential reference for the POINT-ONLY merge: ``rec_type='label'``
    rows are ignored here — the live pipelines run the partial-aggregation
    path (``merge_partial.finalize_group``), and label semantics are
    differentially covered by merge_zone vs finalize_group
    (tests/test_merge_partial.py)."""
    if len(df) == 0:
        return _empty_out()
    insee = str(df["insee"].iloc[0])
    dept = get_code_dept_from_insee(insee)

    reg_rows = df[df["rec_type"] == "registry"]
    key_to_f10 = dict(zip(reg_rows["street_key"], reg_rows["fantoir_raw"]))
    f10_to_name = dict(zip(reg_rows["fantoir_raw"], reg_rows["street"]))
    f9_to_f10 = {f[0:9]: f for f in reg_rows["fantoir_raw"]}

    pts = df[df["rec_type"] == "point"].sort_values("doc_id", kind="stable") \
        .reset_index(drop=True)
    if len(pts) == 0:
        return _empty_out()

    fr = pts["fantoir_raw"].astype(str)
    pts = pts.assign(
        fant_valid=(fr.str.len() == 10) & (fr.str.slice(0, 5) == insee),
        row_ord=np.arange(len(pts), dtype=np.int64),
    )

    hw = pts[(pts["source"] == "OSM") & (pts["hn"] == "")]
    # highway street-level facts (first-valid / last-row semantics of the
    # sequential has_already_fantoir loop)
    hw_valid = hw[hw["fant_valid"]]
    hw_first_valid = hw_valid.drop_duplicates("street_key", keep="first") \
        .set_index("street_key")
    hw_last = hw.drop_duplicates("street_key", keep="last").set_index("street_key")
    hw_counts = hw.groupby("street_key").size()
    # distinct highway types per street → += of powers == OR
    ht = hw[hw["highway_type"].isin(HIGHWAY_TYPES_INDEX)]
    ht = ht.drop_duplicates(["street_key", "highway_type"])
    hw_index = ht.assign(p=ht["highway_type"].map(HIGHWAY_TYPES_INDEX)) \
        .groupby("street_key")["p"].sum()

    out_frames: list[pd.DataFrame] = []

    for source in SOURCES_ORDER:
        rows = pts[pts["source"] == source]
        if source == "CADASTRE":
            rows = rows[rows["pseudo_adresse"] != "true"]
        if len(rows) == 0:
            continue

        # A. accepted numeros
        if source == "OSM":
            withhn = rows[rows["hn"] != ""]
            ex = _explode_osm(withhn) if len(withhn) else withhn.assign(
                numero=pd.Series(dtype=object), part_idx=pd.Series(dtype=np.int64))
            acc = ex[(ex["numero"].str.len() > 0) & (ex["numero"].str.len() <= 11)]
            cp_col = acc["postcode"]
        else:
            acc = rows[(rows["hn"].str.len() > 0) & (rows["hn"].str.len() <= 11)].copy()
            acc["numero"] = acc["hn"]
            acc["part_idx"] = 0
            cp_col = acc["postcode"] if source == "BAN" else ""
        acc = acc.assign(cp=cp_col)
        if len(acc) == 0:
            continue
        acc = acc.reset_index(drop=True)
        acc["seq"] = np.arange(len(acc), dtype=np.int64)  # (doc, part) order

        # last-writer per (street, numero)
        num_final = acc.drop_duplicates(["street_key", "numero"], keep="last")

        # B. street-level facts
        addr_last = acc.drop_duplicates("street_key", keep="last").set_index("street_key")
        keys = pd.Index(num_final["street_key"].unique())

        if source == "OSM":
            af = acc[acc["fant_valid"]].drop_duplicates("street_key", keep="last")
            addr_fant = af.set_index("street_key")["fantoir_raw"]
        else:
            addr_fant = pd.Series(dtype=object)
        if source == "BAN":
            cand = rows[rows["fantoir_raw"].str.len() == 10].copy()
            cand["f9"] = cand["fantoir_raw"].str.slice(0, 5) \
                + cand["fantoir_raw"].str.slice(6, 10)
            cand["f10"] = cand["f9"].map(f9_to_f10)
            cand = cand[cand["f10"].notna()].drop_duplicates("street_key", keep="last")
            ban_repair = cand.set_index("street_key")["f10"]
        else:
            ban_repair = pd.Series(dtype=object)

        # C. facets per emitting street
        fac = pd.DataFrame(index=keys)
        fac["has_hw"] = keys.isin(hw_counts.index)
        fac["hw_has_valid"] = keys.isin(hw_first_valid.index)
        fac["hw_fant"] = hw_first_valid["fantoir_raw"].reindex(keys)
        fac["hw_street"] = np.where(
            fac["hw_has_valid"], hw_first_valid["street"].reindex(keys),
            hw_last["street"].reindex(keys))
        fac["addr_street"] = addr_last["street"].reindex(keys)
        fac["addr_fant"] = addr_fant.reindex(keys)
        reg_f = pd.Series(keys.map(key_to_f10), index=keys, dtype=object)
        if source == "BAN":
            rep = ban_repair.reindex(keys)
            fac["fant_F"] = reg_f.where(reg_f.notna(), rep)
        else:
            fac["fant_F"] = reg_f
        if source == "OSM":
            af_k = fac["addr_fant"]
            fac["fant_osm"] = af_k.where(af_k.notna(), fac["hw_fant"])
        else:
            fac["fant_osm"] = fac["hw_fant"]
        b1 = fac["fant_osm"].where(fac["fant_osm"].notna(), fac["fant_F"])
        fac["best"] = b1.where(b1.notna(), "")
        # per-run OSM-name-by-code mapping (first valid hw row per code)
        code_to_name: dict = {}
        for f, st_name in zip(hw_first_valid["fantoir_raw"], hw_first_valid["street"]):
            code_to_name.setdefault(f, st_name)
        if source == "OSM":
            voie_osm = np.where(fac["addr_fant"].notna(), fac["addr_street"],
                                np.where(fac["has_hw"], fac["hw_street"],
                                         fac["addr_street"]))
        else:
            mapped = fac["best"].map(code_to_name)
            voie_osm = np.where(fac["has_hw"], fac["hw_street"],
                                mapped.where(mapped.notna(), ""))
        fac["voie_osm"] = voie_osm
        # registry attach name: key match, else OSM code known to registry
        vf = pd.Series(keys.map(lambda k: f10_to_name.get(key_to_f10.get(k, ""), "")),
                       index=keys)
        via_code = fac["fant_osm"].map(f10_to_name)
        fac["voie_fantoir"] = np.where(vf != "", vf,
                                       via_code.where(via_code.notna(), ""))
        fac["voie_bal"] = fac["addr_street"] if source == "BAL" else ""
        fac["voie_cadastre"] = fac["addr_street"] if source == "CADASTRE" else ""
        fac["voie_autre"] = fac["addr_street"] if source in ("BAN", "BAL", "CADASTRE") else ""

        # D. adresse rows
        nf = num_final.merge(fac[["best", "voie_osm", "voie_fantoir", "voie_bal",
                                  "voie_cadastre", "voie_autre"]],
                             left_on="street_key", right_index=True, how="left")
        adresse = pd.DataFrame({
            "rec_type": "adresse", "insee": insee, "dept": dept, "source": source,
            "street_key": nf["street_key"].to_numpy(),
            "numero": nf["numero"].to_numpy(),
            "lon": nf["lon"].to_numpy(), "lat": nf["lat"].to_numpy(),
            "code_postal": nf["cp"].to_numpy() if source in ("OSM", "BAN") else "",
            "fantoir": nf["best"].to_numpy(),
            "voie_osm": nf["voie_osm"].to_numpy(),
            "voie_fantoir": nf["voie_fantoir"].to_numpy(),
            "voie_bal": nf["voie_bal"].to_numpy(),
            "voie_cadastre": nf["voie_cadastre"].to_numpy(),
            "voie_autre": nf["voie_autre"].to_numpy(),
            "highway_index": 0,
        })
        out_frames.append(adresse)

        # E. voie rows (label point: last FIRST-inserted numero's last write)
        if source == "OSM":
            fs = acc.groupby(["street_key", "numero"], sort=False)["seq"].min()
            label = fs.reset_index().sort_values("seq", kind="stable") \
                .drop_duplicates("street_key", keep="last")
            lab = label.merge(
                num_final[["street_key", "numero", "lon", "lat"]],
                on=["street_key", "numero"], how="left")
            lab = lab.merge(fac, left_on="street_key", right_index=True, how="left")
            hwi = lab["street_key"].map(hw_index)
            lab["highway_index"] = hwi.where(hwi.notna(), 0).astype("int64")
            voie = pd.DataFrame({
                "rec_type": "voie", "insee": insee, "dept": dept, "source": source,
                "street_key": lab["street_key"].to_numpy(), "numero": "",
                "lon": lab["lon"].to_numpy(), "lat": lab["lat"].to_numpy(),
                "code_postal": "", "fantoir": lab["best"].to_numpy(),
                "voie_osm": lab["voie_osm"].to_numpy(),
                "voie_fantoir": lab["voie_fantoir"].to_numpy(),
                "voie_bal": lab["voie_bal"].to_numpy(),
                "voie_cadastre": lab["voie_cadastre"].to_numpy(),
                "voie_autre": lab["voie_autre"].to_numpy(),
                "highway_index": lab["highway_index"].to_numpy(),
            })
            out_frames.append(voie)

    if not out_frames:
        return _empty_out()
    out = pd.concat(out_frames, ignore_index=True)[ADRESSE_COLS]
    out["highway_index"] = out["highway_index"].astype("int64")
    return out.sort_values(["rec_type", "source", "street_key", "numero"],
                           kind="stable").reset_index(drop=True)

