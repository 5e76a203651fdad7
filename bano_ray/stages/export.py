"""Export-stage computations (per-zone pandas, run under
``groupby(insee).map_groups``).

- :func:`export_csv_zone` — the reference's CSV export
  (``bano/sql/export_csv_dept.sql``): canonical-number universe, 3-way
  source coalesce OSM>BAL>BAN, source labels {OSM,O+O,OD,C+O,CAD}, postal
  fallback chain, plausibility filters, final per-id dedup.
- :func:`street_json_zone` — the JSON street export
  (``bano/sql/export_json_dept_voies_rapprochees.sql``): first-by-priority
  dedup (OSM<BAL<BAN, CADASTRE dropped), postal fill, per-street importance
  score and housenumber packing.

Determinization note: where the reference leans on unspecified DB row order
(LEFT-JOIN fan-out + ROW_NUMBER ties), this engine pins a total order
(numero, lon, lat) — documented, and mirrored in the DuckDB oracles.
Geodesic lengths use a haversine sphere (R=6371008.8) rather than PostGIS's
spheroid; the formula is reproduced verbatim in the oracle SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.housenumber import PLAUSIBLE_RE, IMPLAUSIBLE_RE, canonical_num
from ..functions.rounding import sql_round

_POSTAL_INDEX = None


def get_postal_index():
    """Process-cached G8 postal polygon index (nested 'P'/'Q' boxes,
    smallest-area wins) — built once per worker from the closed-form
    polygon dim, never shipped per batch."""
    global _POSTAL_INDEX
    if _POSTAL_INDEX is None:
        from .. import datagen
        from ..sources_io import PostalIndex

        _POSTAL_INDEX = PostalIndex(datagen.postal_polygons_wkb())
    return _POSTAL_INDEX

EARTH_R = 6371008.8

EXPORT_CSV_COLS = ["id", "numero", "voie", "code_post", "ville", "source", "lat", "lon"]
_CSV_DTYPES = {"lat": "float64", "lon": "float64"}

STREET_JSON_COLS = ["fantoir", "citycode", "name", "postcode", "lat", "lon",
                    "city", "departement", "region", "importance", "housenumbers", "n_adresses"]
_JSON_DTYPES = {"lat": "float64", "lon": "float64", "importance": "float64",
                "n_adresses": "int64"}


def _typed_empty(cols: list[str], dtypes: dict[str, str]) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=dtypes.get(c, "object")) for c in cols})


def _nn(s) -> str:
    """'' ≡ NULL (the reference's VALUES-string hack turns '' into SQL NULL,
    bano/models.py:145)."""
    return s if isinstance(s, str) and s != "" else ""


def _first_nonempty(*vals) -> str:
    for v in vals:
        if isinstance(v, str) and v != "":
            return v
    return ""


def _plausible(n: str) -> bool:
    import re

    return (bool(re.match(PLAUSIBLE_RE, n)) and n != "99999"
            and not re.search(IMPLAUSIBLE_RE, n))


def _slice(df: pd.DataFrame, source: str, need_nonzero: bool) -> pd.DataFrame:
    s = df[df["source"] == source].copy()
    if need_nonzero:
        s = s[(s["lon"] != 0) & (s["lat"] != 0)]
    s["num"] = [canonical_num(n) for n in s["numero"]]
    # deterministic representative per (fantoir, num)
    s = s.sort_values(["numero", "lon", "lat"], kind="stable")
    return s.drop_duplicates(subset=["fantoir", "num"], keep="first").set_index(["fantoir", "num"])


def export_csv_zone(df: pd.DataFrame, min_cp: str, ville: str) -> pd.DataFrame:
    """One zone's cumul_adresses rows → export rows."""
    from ..datagen import zone_of, insee_of_zone

    if len(df) == 0:
        return _typed_empty(EXPORT_CSV_COLS, _CSV_DTYPES)
    adr = df[df["rec_type"] == "adresse"] if "rec_type" in df.columns else df
    adr = adr[adr["fantoir"] != ""]
    if len(adr) == 0:
        return _typed_empty(EXPORT_CSV_COLS, _CSV_DTYPES)

    u = adr.assign(num=[canonical_num(n) for n in adr["numero"]])
    u = u[["insee", "fantoir", "num"]].drop_duplicates()

    o = _slice(adr, "OSM", need_nonzero=False)
    od = _slice(adr, "BAL", need_nonzero=True)
    c = _slice(adr, "BAN", need_nonzero=True)

    # Vectorized coalesce: align each source slice to the unique
    # (fantoir, num) keys once (reindex), then the per-row priority picks,
    # source classification and plausibility filter are column ops — no
    # Python loop, and the postal polygon lookup runs ONCE per group (the
    # per-row assign_smallest call was the old hot spot).
    idx = pd.MultiIndex.from_arrays([u["fantoir"], u["num"]])
    po = idx.isin(o.index)
    pod = idx.isin(od.index)
    pc_ = idx.isin(c.index)

    def _col(s: pd.DataFrame, name: str) -> np.ndarray:
        return s[name].reindex(idx).fillna("").to_numpy(dtype=object)

    def _coalesce(*arrs: np.ndarray) -> np.ndarray:
        out = arrs[-1]
        for a in arrs[-2::-1]:
            out = np.where(a != "", a, out)
        return out

    numero = _coalesce(_col(o, "numero"), _col(od, "numero"),
                       _col(c, "numero"), np.full(len(u), "", dtype=object))
    # '' numero ≡ no geometry source matched (reference: lat IS NULL filter)
    numero_out = pd.Series(numero, dtype=object).str.upper() \
        .str.replace(" ", "", regex=False).fillna("").to_numpy(dtype=object)

    def _rep(a: np.ndarray) -> np.ndarray:
        return pd.Series(a, dtype=object).str.replace("’", "'", regex=False) \
            .fillna("").to_numpy(dtype=object)

    vo_od_raw = _col(od, "voie_osm")
    va_od = _col(od, "voie_autre")
    vo_c_raw = _col(c, "voie_osm")
    voie = _coalesce(_rep(_col(o, "voie_osm")), _rep(vo_od_raw),
                     _rep(vo_c_raw), va_od, _col(c, "voie_autre"),
                     np.full(len(u), "", dtype=object))
    voie = (pd.Series(voie, dtype=object)
            .str.replace('"', "'", regex=False)
            .str.replace(", ", " ", regex=False)
            .str.replace(",", " ", regex=False)
            .fillna("").to_numpy(dtype=object))

    def _fcol(s: pd.DataFrame, name: str) -> np.ndarray:
        return s[name].reindex(idx).to_numpy(dtype=np.float64)

    lon = np.where(po, _fcol(o, "lon"), np.where(pod, _fcol(od, "lon"),
                                                 _fcol(c, "lon")))
    lat = np.where(po, _fcol(o, "lat"), np.where(pod, _fcol(od, "lat"),
                                                 _fcol(c, "lat")))

    source = np.select(
        [po,
         pod & (vo_od_raw != "") & (vo_od_raw != va_od),
         pod,
         pc_ & (vo_c_raw != "")],
        ["OSM", "O+O", "OD", "C+O"], default="CAD").astype(object)

    num_s = pd.Series(numero_out, dtype=object)
    plaus = (num_s.str.match(PLAUSIBLE_RE).fillna(False).to_numpy(dtype=bool)
             & (numero_out != "99999")
             & ~num_s.str.contains(IMPLAUSIBLE_RE, regex=True)
             .fillna(False).to_numpy(dtype=bool))
    keep = (numero != "") & plaus

    fant = u["fantoir"].to_numpy(dtype=object)[keep]
    nums = u["num"].to_numpy(dtype=object)[keep]
    lon_k, lat_k = lon[keep], lat[keep]
    poly_cp = pd.Series(get_postal_index().assign_smallest(lon_k, lat_k),
                        dtype=object).fillna("").to_numpy(dtype=object)
    code_post = _coalesce(_col(o, "code_postal")[keep],
                          _col(c, "code_postal")[keep], poly_cp,
                          np.full(keep.sum(), min_cp, dtype=object))

    out = pd.DataFrame({
        "id": pd.Series(fant, dtype=object) + "-" + pd.Series(nums, dtype=object),
        "numero": numero_out[keep], "voie": voie[keep],
        "code_post": code_post, "ville": ville, "source": source[keep],
        "lat": lat_k, "lon": lon_k}, columns=EXPORT_CSV_COLS)
    if len(out) == 0:
        return _typed_empty(EXPORT_CSV_COLS, _CSV_DTYPES)
    out = out.sort_values(["id", "numero", "lat", "lon"], kind="stable")
    return out.drop_duplicates(subset=["id"], keep="first").sort_values("id").reset_index(drop=True)


def haversine_m(lon1, lat1, lon2, lat2):
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(v, dtype=np.float64))
                              for v in (lon1, lat1, lon2, lat2))
    h = (np.sin((lat2 - lat1) / 2.0) ** 2
         + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2.0) ** 2)
    return 2.0 * EARTH_R * np.arcsin(np.sqrt(h))


def _type_weight(voie_osm: str) -> int:
    if voie_osm.startswith("Boulevard") or voie_osm.startswith("Place") \
            or voie_osm.startswith("Espl"):
        return 4
    if voie_osm.startswith("Av"):
        return 3
    if voie_osm.startswith("Rue "):
        return 2
    return 1


def street_json_zone(df: pd.DataFrame, dims: dict) -> pd.DataFrame:
    """One zone's cumul rows (adresse + voie) → street JSON records.

    ``dims``: insee → {population, adm_weight, name, dept_name, region_name}.
    """
    from ..datagen import zone_of, insee_of_zone

    if len(df) == 0:
        return _typed_empty(STREET_JSON_COLS, _JSON_DTYPES)
    adr = df[df["rec_type"] == "adresse"].copy()
    voies = df[(df["rec_type"] == "voie") & (df["fantoir"] != "")]
    if len(adr) == 0 or len(voies) == 0:
        return _typed_empty(STREET_JSON_COLS, _JSON_DTYPES)
    insee = str(df["insee"].iloc[0])
    d = dims[insee]

    sortnum = {"OSM": 1, "BAL": 2, "BAN": 3}
    adr = adr[adr["source"].isin(sortnum)]  # CADASTRE dropped (inner join)
    adr["numero2"] = [n.replace("\\", ";").replace('"', "") for n in adr["numero"]]
    adr["sortnum"] = adr["source"].map(sortnum)
    adr = adr.sort_values(["sortnum", "lon", "lat"], kind="stable")
    adr = adr.drop_duplicates(subset=["fantoir", "numero2"], keep="first")
    # postal fill from the containing postal polygon — nested P/Q boxes,
    # smallest area wins (G8 live in the export path)
    poly_cp = get_postal_index().assign_smallest(adr["lon"].to_numpy(),
                                                 adr["lat"].to_numpy())
    adr["cp_eff"] = np.where(adr["code_postal"] != "", adr["code_postal"], poly_cp)
    # explicit bool array: a bare empty list would select columns, not rows
    adr = adr[np.fromiter((_plausible(n) for n in adr["numero2"]),
                          dtype=bool, count=len(adr))]

    rows = []
    for (fant, cp), g in adr.groupby(["fantoir", "cp_eff"], sort=True):
        if fant == "":
            continue
        v = voies[voies["fantoir"] == fant]
        if len(v) == 0:
            continue
        v = v.iloc[0]
        cnt = len(g)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        dist = float(haversine_m(lon[:, None], lat[:, None], lon[None, :], lat[None, :]).max())
        name = v["voie_osm"].replace("\t", " ").replace('"', "'").replace("’", "'")
        tw = _type_weight(v["voie_osm"])
        importance = sql_round(
            float(np.log10(d["adm_weight"] + np.log10(d["population"] + 1) / 3.0)
                  * np.log10(1.0 + np.log10(cnt + 1) + np.log10(dist + 1) + np.log10(tw))), 4)
        g2 = g.sort_values("numero2", kind="stable")
        hns = "#".join(f"{n}${la}${lo}" for n, la, lo in
                       zip(g2["numero2"], g2["lat"], g2["lon"]))
        rows.append({
            "fantoir": fant, "citycode": insee, "name": name, "postcode": cp,
            "lat": sql_round(float(v["lat"]), 6), "lon": sql_round(float(v["lon"]), 6),
            "city": d["name"], "departement": d["dept_name"], "region": d["region_name"],
            "importance": float(importance), "housenumbers": hns, "n_adresses": cnt,
        })
    out = pd.DataFrame(rows, columns=STREET_JSON_COLS)
    if len(out) == 0:
        return _typed_empty(STREET_JSON_COLS, _JSON_DTYPES)
    return out
