"""Map-side partial aggregation for the merge — the 100 TB shuffle design.

The reference's per-commune accumulator replay (:mod:`.merge`) shuffles every
parsed row.  But every rule in that accumulator is an ASSOCIATIVE reduction
over (zone, street[, numero]):

- numero last-writer            → argmax by (doc, part) order
- label point ("last first-inserted numero")
                                → max over numeros of (min order per numero)
- street-name facet (last accepted add_voie)
                                → argmax order
- OSM tag fantoir (last valid)  → argmax order among valid
- highway first-valid / last-row / distinct-type bitmask
                                → argmin / argmax / bitwise OR
- BAN fantoir9 repair (last matching raw)
                                → per-raw argmax, membership resolved at
                                  finalize against the co-partitioned registry

So the merge runs as: ``map_batches(partial_from_points)`` (combine inside
the batch — rows collapse to distinct-key state) → ONE ``groupby`` shuffle
of tiny partial-state rows → ``finalize_group`` (re-combine + facet logic).
Shuffle volume drops from O(input rows) to O(distinct street×numero), which
is what survives a 10^12-row corpus.

Equivalence with :func:`bano_ray.stages.merge.merge_zone` is differentially
tested (tests/test_merge_partial.py) and oracle-gated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.validity import get_code_dept_from_insee
from .merge import ADRESSE_COLS, HIGHWAY_TYPES_INDEX, SOURCES_ORDER, _empty_out, _explode_osm

# ord = doc_id * ORD_SCALE + part_idx.  2^20 parts per caption bounds real
# inputs by orders of magnitude while keeping doc_id headroom at 2^43 ids
# (~10^12 documents) before int64 overflow; exceeding it is a hard error —
# silently clamping would let last-writer ties resolve by groupby order and
# diverge from the row-replay merge.
ORD_SCALE = 1 << 20

PARTIAL_COLS = {
    "ptype": "object", "insee": "object", "salt": "int64", "source": "object",
    "street_key": "object", "numero": "object",
    "first_ord": "int64", "last_ord": "int64",
    "last_lon": "float64", "last_lat": "float64",
    "last_cp": "object", "last_street": "object",
    "vf_ord": "int64", "vf_fant": "object",
    "hw_fv_ord": "int64", "hw_fv_fant": "object", "hw_fv_street": "object",
    "hw_last_ord": "int64", "hw_last_street": "object", "hw_mask": "int64",
    "raw": "object", "brep_ord": "int64",
    "reg_name": "object", "reg_f10": "object",
}


def _empty_partial() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in PARTIAL_COLS.items()})


def _frame(rows: dict) -> pd.DataFrame:
    base = {c: rows.get(c) for c in PARTIAL_COLS}
    n = len(next(v for v in rows.values() if v is not None))
    out = {}
    for c, t in PARTIAL_COLS.items():
        v = base[c]
        if v is None:
            if t == "int64":
                v = np.full(n, -1, dtype=np.int64)
            elif t == "float64":
                v = np.zeros(n, dtype=np.float64)
            else:
                v = np.full(n, "", dtype=object)
        out[c] = v
    return pd.DataFrame(out)


def partial_from_points_arrow(df: pd.DataFrame):
    """Arrow-block wrapper: sort/shuffle over arrow blocks is far cheaper
    than over pandas object columns."""
    import pyarrow as pa

    return pa.Table.from_pandas(partial_from_points(df), preserve_index=False)


def partial_from_points(df: pd.DataFrame) -> pd.DataFrame:
    """One batch of parsed+assigned point rows → partial-state rows."""
    from ..runtime import tune_malloc

    tune_malloc()
    if len(df) == 0:
        return _empty_partial()
    df = df.sort_values("doc_id", kind="stable").reset_index(drop=True)
    if "fant_valid" not in df.columns:
        fr = df["fantoir_raw"].astype(str)
        df = df.assign(fant_valid=(fr.str.len() == 10)
                       & (fr.str.slice(0, 5) == df["insee"]))
    if "hn_len" not in df.columns:
        df = df.assign(hn_len=df["hn"].str.len().astype("int64"))
    frames: list[pd.DataFrame] = []

    for source in SOURCES_ORDER:
        rows = df[df["source"] == source]
        if source == "CADASTRE":
            rows = rows[rows["pseudo_adresse"] != "true"]
        if len(rows) == 0:
            continue
        if source == "OSM":
            withhn = rows[rows["hn_len"] > 0]
            if len(withhn):
                ex = _explode_osm(withhn)
                nl = ex["numero"].str.len()
                acc = ex[(nl > 0) & (nl <= 11)].copy()
            else:
                acc = withhn.assign(numero=pd.Series(dtype=object),
                                    part_idx=pd.Series(dtype=np.int64))
            if len(acc):
                part_idx = acc["part_idx"].to_numpy(dtype=np.int64)
                if part_idx.size and int(part_idx.max()) >= ORD_SCALE:
                    raise ValueError(
                        f"caption split into {int(part_idx.max()) + 1} parts; "
                        f"ORD_SCALE={ORD_SCALE} would collapse ordering")
                acc["ord"] = acc["doc_id"].to_numpy(dtype=np.int64) * ORD_SCALE + part_idx
                acc["cp"] = acc["postcode"]
        else:
            acc = rows[(rows["hn_len"] > 0) & (rows["hn_len"] <= 11)].copy()
            acc["numero"] = acc["hn"]
            acc["ord"] = acc["doc_id"].to_numpy(dtype=np.int64) * ORD_SCALE
            acc["cp"] = acc["postcode"] if source == "BAN" else ""

        if len(acc):
            acc = acc.reset_index(drop=True)
            keys = ["insee", "salt", "street_key", "numero"]
            g = acc.groupby(keys, sort=False)
            first_ord = g["ord"].min()
            last_idx = g["ord"].idxmax()
            last = acc.loc[last_idx].set_index(keys)
            if source == "OSM":
                vf = acc[acc["fant_valid"]]
                vf_ord = vf.groupby(keys, sort=False)["ord"].max()
                vf_rows = vf.loc[vf.groupby(keys, sort=False)["ord"].idxmax()] \
                    .set_index(keys)
            idxf = first_ord.index.to_frame(index=False)
            fr_ = _frame({
                "ptype": np.full(len(idxf), "pnum", dtype=object),
                "insee": idxf["insee"].to_numpy(),
                "salt": idxf["salt"].to_numpy(dtype=np.int64),
                "source": np.full(len(idxf), source, dtype=object),
                "street_key": idxf["street_key"].to_numpy(),
                "numero": idxf["numero"].to_numpy(),
                "first_ord": first_ord.to_numpy(dtype=np.int64),
                "last_ord": last["ord"].to_numpy(dtype=np.int64),
                "last_lon": last["lon"].to_numpy(),
                "last_lat": last["lat"].to_numpy(),
                "last_cp": last["cp"].to_numpy(),
                "last_street": last["street"].to_numpy(),
            })
            if source == "OSM" and len(vf_ord):
                vo = vf_ord.reindex(first_ord.index)
                vfa = vf_rows["fantoir_raw"].reindex(first_ord.index)
                fr_["vf_ord"] = np.where(vo.notna(), vo.to_numpy(), -1).astype(np.int64)
                fr_["vf_fant"] = np.where(vo.notna(), vfa.to_numpy(), "").astype(object)
            frames.append(fr_)

        if source == "BAN":
            fl = rows["fantoir_raw"].str.len() if "fant_len" not in rows.columns \
                else rows["fant_len"]
            cand = rows[fl == 10].copy()
            if len(cand):
                cand["ord"] = cand["doc_id"].to_numpy(dtype=np.int64) * ORD_SCALE
                keys = ["insee", "salt", "street_key", "fantoir_raw"]
                bo = cand.groupby(keys, sort=False)["ord"].max()
                idxf = bo.index.to_frame(index=False)
                frames.append(_frame({
                    "ptype": np.full(len(idxf), "brep", dtype=object),
                    "insee": idxf["insee"].to_numpy(),
                    "salt": idxf["salt"].to_numpy(dtype=np.int64),
                    "street_key": idxf["street_key"].to_numpy(),
                    "raw": idxf["fantoir_raw"].to_numpy(),
                    "brep_ord": bo.to_numpy(dtype=np.int64),
                }))

    # "seen" rows: the reference registers a street on EVERY row of the
    # pass (models.py register happens before housenumber validation), and
    # the FANTOIR attach covers all registered streets — so a street whose
    # rows were all rejected still gets voie_fantoir when a label later
    # emits its voie row.  O(distinct source×street) rows.
    seen_frames = []
    for source in SOURCES_ORDER:
        rows = df[df["source"] == source]
        if source == "CADASTRE":
            rows = rows[rows["pseudo_adresse"] != "true"]
        if len(rows) == 0:
            continue
        sk = rows.drop_duplicates(["insee", "salt", "street_key"])
        seen_frames.append(_frame({
            "ptype": np.full(len(sk), "seen", dtype=object),
            "insee": sk["insee"].to_numpy(),
            "salt": sk["salt"].to_numpy(dtype=np.int64),
            "source": np.full(len(sk), source, dtype=object),
            "street_key": sk["street_key"].to_numpy(),
        }))
    frames.extend(seen_frames)

    hw = df[(df["source"] == "OSM") & (df["hn"] == "")]
    if len(hw):
        hw = hw.copy()
        hw["ord"] = hw["doc_id"].to_numpy(dtype=np.int64) * ORD_SCALE
        keys = ["insee", "salt", "street_key"]
        g = hw.groupby(keys, sort=False)
        last = hw.loc[g["ord"].idxmax()].set_index(keys)
        hv = hw[hw["fant_valid"]]
        ht = hw[hw["highway_type"].isin(HIGHWAY_TYPES_INDEX)] \
            .drop_duplicates(keys + ["highway_type"])
        mask = ht.assign(p=ht["highway_type"].map(HIGHWAY_TYPES_INDEX)) \
            .groupby(keys, sort=False)["p"].sum()
        idx = last.index
        idxf = idx.to_frame(index=False)
        fr_ = _frame({
            "ptype": np.full(len(idxf), "hw", dtype=object),
            "insee": idxf["insee"].to_numpy(),
            "salt": idxf["salt"].to_numpy(dtype=np.int64),
            "street_key": idxf["street_key"].to_numpy(),
            "hw_last_ord": last["ord"].to_numpy(dtype=np.int64),
            "hw_last_street": last["street"].to_numpy(),
            "hw_mask": mask.reindex(idx).fillna(0).to_numpy(dtype=np.int64),
        })
        if len(hv):
            fvo = hv.groupby(keys, sort=False)["ord"].min()
            fv_rows = hv.loc[hv.groupby(keys, sort=False)["ord"].idxmin()].set_index(keys)
            fo = fvo.reindex(idx)
            fr_["hw_fv_ord"] = np.where(fo.notna(), fo.to_numpy(), -1).astype(np.int64)
            fr_["hw_fv_fant"] = np.where(
                fo.notna(), fv_rows["fantoir_raw"].reindex(idx).to_numpy(), "").astype(object)
            fr_["hw_fv_street"] = np.where(
                fo.notna(), fv_rows["street"].reindex(idx).to_numpy(), "").astype(object)
        frames.append(fr_)

    if not frames:
        return _empty_partial()
    return pd.concat(frames, ignore_index=True)


def registry_partials() -> pd.DataFrame:
    """Registry rows in partial-state form (co-partitioned via the same
    shuffle key)."""
    from .. import datagen
    from ..pipelines.cumul import street_salt

    reg = datagen.registry_table()
    n = reg.num_rows
    return _frame({
        "ptype": np.full(n, "registry", dtype=object),
        "insee": np.asarray(reg.column("insee").to_pylist(), dtype=object),
        "salt": street_salt(reg.column("street_key")),
        "street_key": np.asarray(reg.column("street_key").to_pylist(), dtype=object),
        "reg_name": np.asarray(reg.column("name").to_pylist(), dtype=object),
        "reg_f10": np.asarray(reg.column("fantoir10").to_pylist(), dtype=object),
    })


def label_partial_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Street-label rows (stages/label.py) in partial-state form (ptype
    'label'; reuses the last_* slots for the label name and point)."""
    import pyarrow as pa

    from ..pipelines.cumul import street_salt

    if len(df) == 0:
        return _empty_partial()
    return _frame({
        "ptype": np.full(len(df), "label", dtype=object),
        "insee": df["insee"].to_numpy(dtype=object),
        "salt": street_salt(pa.array(df["street_key"].astype(str))),
        "street_key": df["street_key"].to_numpy(dtype=object),
        "last_street": df["street"].to_numpy(dtype=object),
        "last_lon": df["lon"].to_numpy(dtype=np.float64),
        "last_lat": df["lat"].to_numpy(dtype=np.float64),
    })


def label_partial_arrow(df: pd.DataFrame):
    import pyarrow as pa

    return pa.Table.from_pandas(label_partial_batch(df), preserve_index=False)


def _combine(df: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Re-apply the associative rules across map-side partials."""
    out: dict[str, pd.DataFrame] = {}
    pn = df[df["ptype"] == "pnum"]
    if len(pn):
        keys = ["source", "street_key", "numero"]
        g = pn.groupby(keys, sort=False)
        first_ord = g["first_ord"].min()
        last = pn.loc[g["last_ord"].idxmax()].set_index(keys)
        vf = pn.loc[g["vf_ord"].idxmax()].set_index(keys)
        res = last[["last_ord", "last_lon", "last_lat", "last_cp", "last_street"]].copy()
        res["first_ord"] = first_ord
        res["vf_ord"] = vf["vf_ord"]
        res["vf_fant"] = vf["vf_fant"]
        out["pnum"] = res.reset_index()
    hw = df[df["ptype"] == "hw"]
    if len(hw):
        g = hw.groupby("street_key", sort=False)
        last = hw.loc[g["hw_last_ord"].idxmax()].set_index("street_key")
        # first valid: min positive ord → use max on negated trick
        hv = hw[hw["hw_fv_ord"] >= 0]
        res = last[["hw_last_ord", "hw_last_street"]].copy()
        res["hw_mask"] = g["hw_mask"].agg(lambda s: int(np.bitwise_or.reduce(s.to_numpy())))
        if len(hv):
            gv = hv.groupby("street_key", sort=False)
            fv = hv.loc[gv["hw_fv_ord"].idxmin()].set_index("street_key")
            res["hw_fv_ord"] = fv["hw_fv_ord"].reindex(res.index).fillna(-1).astype(np.int64)
            res["hw_fv_fant"] = fv["hw_fv_fant"].reindex(res.index).fillna("")
            res["hw_fv_street"] = fv["hw_fv_street"].reindex(res.index).fillna("")
        else:
            res["hw_fv_ord"] = -1
            res["hw_fv_fant"] = ""
            res["hw_fv_street"] = ""
        out["hw"] = res
    br = df[df["ptype"] == "brep"]
    if len(br):
        out["brep"] = br.groupby(["street_key", "raw"], sort=False)["brep_ord"] \
            .max().reset_index()
    rg = df[df["ptype"] == "registry"]
    if len(rg):
        out["registry"] = rg.drop_duplicates("street_key")
    lb = df[df["ptype"] == "label"]
    if len(lb):
        out["label"] = lb.drop_duplicates("street_key")
    sn = df[df["ptype"] == "seen"]
    if len(sn):
        out["seen"] = sn.drop_duplicates(["source", "street_key"])
    return out


def finalize_group(df: pd.DataFrame) -> pd.DataFrame:
    """Combined partials of one (zone, salt) group → cumul rows (same output
    schema and values as :func:`merge_zone`)."""
    if len(df) == 0:
        return _empty_out()
    insee = str(df["insee"].iloc[0])
    dept = get_code_dept_from_insee(insee)
    parts = _combine(df)

    rg = parts.get("registry")
    key_to_f10 = dict(zip(rg["street_key"], rg["reg_f10"])) if rg is not None else {}
    f10_to_name = dict(zip(rg["reg_f10"], rg["reg_name"])) if rg is not None else {}
    f9_to_f10 = {f[0:9]: f for f in key_to_f10.values()}

    pn = parts.get("pnum")
    lb = parts.get("label")
    if lb is not None and len(lb):
        lb = lb.drop_duplicates("street_key").set_index("street_key")
    else:
        lb = None
    if pn is None or len(pn) == 0:
        if lb is None:
            return _empty_out()
        pn = pd.DataFrame({c: pd.Series(dtype=t) for c, t in
                           (("source", "object"), ("street_key", "object"),
                            ("numero", "object"), ("first_ord", "int64"),
                            ("last_ord", "int64"), ("last_lon", "float64"),
                            ("last_lat", "float64"), ("last_cp", "object"),
                            ("last_street", "object"), ("vf_ord", "int64"),
                            ("vf_fant", "object"))})
    hw = parts.get("hw", pd.DataFrame())
    br = parts.get("brep", pd.DataFrame())
    if len(br):
        br = br.assign(f9=br["raw"].str.slice(0, 5) + br["raw"].str.slice(6, 10))
        br = br[br["f9"].isin(f9_to_f10)]
        br = br.loc[br.groupby("street_key")["brep_ord"].idxmax()]
        ban_repair = br.set_index("street_key")["f9"].map(f9_to_f10)
    else:
        ban_repair = pd.Series(dtype=object)

    code_to_name: dict = {}
    if len(hw):
        hv = hw[hw["hw_fv_ord"] >= 0].sort_values("hw_fv_ord", kind="stable")
        for f, st_name in zip(hv["hw_fv_fant"], hv["hw_fv_street"]):
            code_to_name.setdefault(f, st_name)

    out_frames = []
    for source in SOURCES_ORDER:
        nf = pn[pn["source"] == source]
        # the point_par_rue load (labels) emits voie rows in the OSM pass
        # even for streets with no address rows (way-only streets)
        if len(nf) == 0 and not (source == "OSM" and lb is not None):
            continue
        keys = pd.Index(nf["street_key"].unique())
        if source == "OSM" and lb is not None:
            keys = keys.union(lb.index)
        if len(nf):
            addr_last = nf.loc[nf.groupby("street_key")["last_ord"].idxmax()] \
                .set_index("street_key")
        else:
            addr_last = nf.set_index("street_key")
        fac = pd.DataFrame(index=keys)
        fac["has_pnum"] = keys.isin(nf["street_key"])
        if lb is not None:
            fac["has_label"] = keys.isin(lb.index)
            fac["label_street"] = lb["last_street"].reindex(keys)
            fac["label_lon"] = lb["last_lon"].reindex(keys)
            fac["label_lat"] = lb["last_lat"].reindex(keys)
        else:
            fac["has_label"] = False
            fac["label_street"] = None
            fac["label_lon"] = np.nan
            fac["label_lat"] = np.nan
        if len(hw):
            fac["has_hw"] = keys.isin(hw.index)
            fac["hw_has_valid"] = keys.isin(hw.index[hw["hw_fv_ord"] >= 0])
            fac["hw_fant"] = hw["hw_fv_fant"].reindex(keys)
            fac["hw_street"] = np.where(fac["hw_has_valid"],
                                        hw["hw_fv_street"].reindex(keys),
                                        hw["hw_last_street"].reindex(keys))
        else:
            fac["has_hw"] = False
            fac["hw_has_valid"] = False
            fac["hw_fant"] = None
            fac["hw_street"] = None
        fac.loc[fac["hw_fant"] == "", "hw_fant"] = None
        fac["addr_street"] = addr_last["last_street"].reindex(keys)
        if source == "OSM":
            vfm = nf[nf["vf_ord"] >= 0]
            if len(vfm):
                av = vfm.loc[vfm.groupby("street_key")["vf_ord"].idxmax()] \
                    .set_index("street_key")["vf_fant"]
            else:
                av = pd.Series(dtype=object)
            fac["addr_fant"] = av.reindex(keys)
        else:
            fac["addr_fant"] = None
        reg_f = pd.Series(keys.map(key_to_f10), index=keys, dtype=object)
        if source == "BAN":
            rep = ban_repair.reindex(keys)
            fac["fant_F"] = reg_f.where(reg_f.notna(), rep)
        else:
            fac["fant_F"] = reg_f
        # pre-label OSM fantoir (addresses/highways — what the registry
        # attach saw); the point_par_rue load then fills fantoirs['OSM']
        # from the registry mapping when still absent (core.py:247-249)
        if source == "OSM":
            afk = fac["addr_fant"]
            fac["fant_osm_pre"] = afk.where(afk.notna(), fac["hw_fant"])
        else:
            fac["fant_osm_pre"] = fac["hw_fant"]
        lab_code = reg_f.where(fac["has_label"], None)
        fac["fant_osm"] = fac["fant_osm_pre"].where(
            fac["fant_osm_pre"].notna(), lab_code)
        b1 = fac["fant_osm"].where(fac["fant_osm"].notna(), fac["fant_F"])
        fac["best"] = b1.where(b1.notna(), "")
        if source == "OSM":
            # voies['OSM'] priority: accepted-address name (kept when the
            # address set a valid fantoir, which makes highways skip), else
            # highway name, else address name, else the label name (3b
            # fills only when absent)
            fac["voie_osm"] = np.where(
                fac["addr_fant"].notna(), fac["addr_street"],
                np.where(fac["has_hw"], fac["hw_street"],
                         np.where(fac["has_pnum"], fac["addr_street"],
                                  fac["label_street"])))
        else:
            mapped = fac["best"].map(code_to_name)
            fac["voie_osm"] = np.where(
                fac["has_hw"], fac["hw_street"],
                np.where(fac["has_label"], fac["label_street"],
                         mapped.where(mapped.notna(), "")))
        # registry attach (step 3) runs BEFORE the label load (step 3b): a
        # street registered only by its label carries no FANTOIR facets, and
        # the attach's code path sees the PRE-label OSM fantoir.  A street
        # is registered (attach-eligible) when the pass saw ANY of its rows
        # — including rejected housenumbers ("seen" partials) — or a highway
        sn = parts.get("seen")
        if sn is not None:
            seen_keys = sn.loc[sn["source"] == source, "street_key"]
            attached = fac["has_pnum"] | fac["has_hw"] | keys.isin(seen_keys)
        else:
            attached = fac["has_pnum"] | fac["has_hw"]
        vf_n = pd.Series(keys.map(lambda k: f10_to_name.get(key_to_f10.get(k, ""), "")),
                         index=keys)
        via_code = fac["fant_osm_pre"].map(f10_to_name)
        fac["voie_fantoir"] = np.where(
            attached & (vf_n != ""), vf_n,
            np.where(attached, via_code.where(via_code.notna(), ""), ""))
        fac["voie_bal"] = fac["addr_street"] if source == "BAL" else ""
        fac["voie_cadastre"] = fac["addr_street"] if source == "CADASTRE" else ""
        fac["voie_autre"] = fac["addr_street"] if source in ("BAN", "BAL", "CADASTRE") else ""

        j = nf.merge(fac[["best", "voie_osm", "voie_fantoir", "voie_bal",
                          "voie_cadastre", "voie_autre"]],
                     left_on="street_key", right_index=True, how="left")
        out_frames.append(pd.DataFrame({
            "rec_type": "adresse", "insee": insee, "dept": dept, "source": source,
            "street_key": j["street_key"].to_numpy(),
            "numero": j["numero"].to_numpy(),
            "lon": j["last_lon"].to_numpy(), "lat": j["last_lat"].to_numpy(),
            "code_postal": j["last_cp"].to_numpy() if source in ("OSM", "BAN") else "",
            "fantoir": j["best"].to_numpy(),
            "voie_osm": j["voie_osm"].to_numpy(),
            "voie_fantoir": j["voie_fantoir"].to_numpy(),
            "voie_bal": j["voie_bal"].to_numpy(),
            "voie_cadastre": j["voie_cadastre"].to_numpy(),
            "voie_autre": j["voie_autre"].to_numpy(),
            "highway_index": 0,
        }))

        if source == "OSM":
            # fallback label point: last first-inserted numero's last write
            # (models.py:143-153); the point_par_rue label overrides it and
            # alone suffices to emit the voie row (way-only streets)
            if len(nf):
                fb = nf.loc[nf.groupby("street_key")["first_ord"].idxmax()] \
                    .set_index("street_key")[["last_lon", "last_lat"]]
            else:
                fb = pd.DataFrame({"last_lon": pd.Series(dtype="float64"),
                                   "last_lat": pd.Series(dtype="float64")})
            vfac = fac[fac["has_pnum"] | fac["has_label"]]
            vkeys = vfac.index
            lon = np.where(vfac["has_label"], vfac["label_lon"],
                           fb["last_lon"].reindex(vkeys))
            lat = np.where(vfac["has_label"], vfac["label_lat"],
                           fb["last_lat"].reindex(vkeys))
            if len(hw):
                hwi = pd.Series(vkeys.map(hw["hw_mask"]), index=vkeys)
                hwi = hwi.where(hwi.notna(), 0)
            else:
                hwi = pd.Series(0, index=vkeys)
            out_frames.append(pd.DataFrame({
                "rec_type": "voie", "insee": insee, "dept": dept, "source": source,
                "street_key": np.asarray(vkeys, dtype=object), "numero": "",
                "lon": lon, "lat": lat,
                "code_postal": "", "fantoir": vfac["best"].to_numpy(),
                "voie_osm": vfac["voie_osm"].to_numpy(),
                "voie_fantoir": vfac["voie_fantoir"].to_numpy(),
                "voie_bal": vfac["voie_bal"].to_numpy(),
                "voie_cadastre": vfac["voie_cadastre"].to_numpy(),
                "voie_autre": vfac["voie_autre"].to_numpy(),
                "highway_index": hwi.to_numpy(dtype=np.int64),
            }))

    if not out_frames:
        return _empty_out()
    out = pd.concat(out_frames, ignore_index=True)[ADRESSE_COLS]
    out["highway_index"] = out["highway_index"].astype("int64")
    return out.sort_values(["rec_type", "source", "street_key", "numero"],
                           kind="stable").reset_index(drop=True)


def recombine(df: pd.DataFrame) -> pd.DataFrame:
    """Tree-combine: re-apply the associative rules across several batches'
    partials, emitting PARTIAL_COLS rows again.  Used as a pre-shuffle
    coalesce stage (repartition → recombine) so the sort sees ~distinct-key
    cardinality instead of (batches × keys)."""
    if len(df) == 0:
        return _empty_partial()
    frames = []
    pn = df[df["ptype"] == "pnum"]
    if len(pn):
        keys = ["insee", "salt", "source", "street_key", "numero"]
        g = pn.groupby(keys, sort=False)
        first_ord = g["first_ord"].min()
        last = pn.loc[g["last_ord"].idxmax()].set_index(keys)
        vf = pn.loc[g["vf_ord"].idxmax()].set_index(keys)
        idxf = first_ord.index.to_frame(index=False)
        frames.append(_frame({
            "ptype": np.full(len(idxf), "pnum", dtype=object),
            "insee": idxf["insee"].to_numpy(),
            "salt": idxf["salt"].to_numpy(dtype=np.int64),
            "source": idxf["source"].to_numpy(),
            "street_key": idxf["street_key"].to_numpy(),
            "numero": idxf["numero"].to_numpy(),
            "first_ord": first_ord.to_numpy(dtype=np.int64),
            "last_ord": last["last_ord"].to_numpy(dtype=np.int64),
            "last_lon": last["last_lon"].to_numpy(),
            "last_lat": last["last_lat"].to_numpy(),
            "last_cp": last["last_cp"].to_numpy(),
            "last_street": last["last_street"].to_numpy(),
            "vf_ord": vf["vf_ord"].to_numpy(dtype=np.int64),
            "vf_fant": vf["vf_fant"].to_numpy(),
        }))
    hw = df[df["ptype"] == "hw"]
    if len(hw):
        keys = ["insee", "salt", "street_key"]
        g = hw.groupby(keys, sort=False)
        last = hw.loc[g["hw_last_ord"].idxmax()].set_index(keys)
        mask = g["hw_mask"].agg(lambda s: int(np.bitwise_or.reduce(s.to_numpy())))
        hv = hw[hw["hw_fv_ord"] >= 0]
        idx = last.index
        idxf = idx.to_frame(index=False)
        fr_ = _frame({
            "ptype": np.full(len(idxf), "hw", dtype=object),
            "insee": idxf["insee"].to_numpy(),
            "salt": idxf["salt"].to_numpy(dtype=np.int64),
            "street_key": idxf["street_key"].to_numpy(),
            "hw_last_ord": last["hw_last_ord"].to_numpy(dtype=np.int64),
            "hw_last_street": last["hw_last_street"].to_numpy(),
            "hw_mask": mask.reindex(idx).to_numpy(dtype=np.int64),
        })
        if len(hv):
            gv = hv.groupby(keys, sort=False)
            fv = hv.loc[gv["hw_fv_ord"].idxmin()].set_index(keys)
            fo = fv["hw_fv_ord"].reindex(idx)
            fr_["hw_fv_ord"] = fo.fillna(-1).to_numpy(dtype=np.int64)
            fr_["hw_fv_fant"] = fv["hw_fv_fant"].reindex(idx).fillna("").to_numpy()
            fr_["hw_fv_street"] = fv["hw_fv_street"].reindex(idx).fillna("").to_numpy()
        frames.append(fr_)
    br = df[df["ptype"] == "brep"]
    if len(br):
        keys = ["insee", "salt", "street_key", "raw"]
        bo = br.groupby(keys, sort=False)["brep_ord"].max()
        idxf = bo.index.to_frame(index=False)
        frames.append(_frame({
            "ptype": np.full(len(idxf), "brep", dtype=object),
            "insee": idxf["insee"].to_numpy(),
            "salt": idxf["salt"].to_numpy(dtype=np.int64),
            "street_key": idxf["street_key"].to_numpy(),
            "raw": idxf["raw"].to_numpy(),
            "brep_ord": bo.to_numpy(dtype=np.int64),
        }))
    rg = df[df["ptype"] == "registry"]
    if len(rg):
        frames.append(rg.drop_duplicates(["insee", "street_key"])[list(PARTIAL_COLS)])
    lb = df[df["ptype"] == "label"]
    if len(lb):
        # one label per (commune, street) by construction — duplicates
        # across coalesced batches are identical rows
        frames.append(lb.drop_duplicates(["insee", "street_key"])[list(PARTIAL_COLS)])
    sn = df[df["ptype"] == "seen"]
    if len(sn):
        frames.append(sn.drop_duplicates(
            ["insee", "salt", "source", "street_key"])[list(PARTIAL_COLS)])
    if not frames:
        return _empty_partial()
    return pd.concat(frames, ignore_index=True)


def recombine_arrow(df: pd.DataFrame):
    import pyarrow as pa

    return pa.Table.from_pandas(recombine(df), preserve_index=False)


# ---------------------------------------------------------------------------
# Fast combiner: the same partial-state reduction as partial_from_points,
# re-expressed as integer-coded lexsort group reductions over Arrow-native
# arrays.  partial_from_points's pandas object-key groupbys measured
# 4.15 us/row single-threaded (~47% of the whole synthesis->partial chain)
# and their hash tables / object allocations are exactly the memory traffic
# that inflates per-row CPU at high task concurrency.  Differentially
# pinned equal to partial_from_points (tests/test_merge_partial.py) and
# covered end-to-end by the merge oracles.
# ---------------------------------------------------------------------------


def _runs(key: np.ndarray, order_vals: np.ndarray | None = None):
    """Sort rows by (key[, order_vals]) and return (perm, starts, ends) of
    the equal-key runs.  perm[starts] indexes each group's minimum
    order_vals row, perm[ends-1] its maximum."""
    if order_vals is None:
        perm = np.argsort(key, kind="stable")
    else:
        perm = np.lexsort((order_vals, key))
    k = key[perm]
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    ends = np.r_[starts[1:], np.int64(len(k))]
    return perm, starts, ends


def _str_lens(a: np.ndarray) -> np.ndarray:
    return np.fromiter((len(x) for x in a), dtype=np.int64, count=len(a))


def _dict_col(t, name):
    """(codes int64[n], values pa.StringArray) of a string column via Arrow
    dictionary-encode — the C++ hash table does the factorize; no per-row
    Python string objects are ever created (VERDICT r3 #1: the former
    ``to_numpy(zero_copy_only=False)`` of every string column was the
    flagship hot chain's dominant memory traffic)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = pc.dictionary_encode(t.column(name))
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    return d.indices.to_numpy().astype(np.int64), d.dictionary


def _gather_str(values, codes) -> np.ndarray:
    """Group-representative string gather: codes (int64, -1 → '') → object
    ndarray.  Python strings materialize only here — O(groups) rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    codes = np.asarray(codes, dtype=np.int64)
    out = np.full(len(codes), "", dtype=object)
    ok = codes >= 0
    if ok.any():
        out[ok] = pc.take(values, pa.array(codes[ok])).to_numpy(zero_copy_only=False)
    return out


def _gather_arr(values, codes):
    """Arrow-native group-representative gather (codes int64, -1 → '') —
    the output column is built entirely in C, no Python strings at all."""
    import pyarrow as pa
    import pyarrow.compute as pc

    codes = np.asarray(codes, dtype=np.int64)
    if (codes < 0).any():
        values = pa.concat_arrays([values, pa.array([""], type=values.type)])
        codes = np.where(codes >= 0, codes, len(values) - 1)
    return pc.take(values, pa.array(codes))


def _const_arr(n: int, s: str):
    """Length-n constant string column via a C-level take of one value."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.take(pa.array([s], type=pa.string()),
                   pa.array(np.zeros(n, dtype=np.int32)))


def _partial_table(rows: dict, n: int) -> "pa.Table":
    """Arrow-native PARTIAL_COLS table with typed defaults (the pandas
    ``_frame`` + ``Table.from_pandas`` round-trip was ~15% of the combiner's
    wall; output columns are numpy/Arrow already, so assemble directly)."""
    import pyarrow as pa

    cols = {}
    for c, ty in PARTIAL_COLS.items():
        v = rows.get(c)
        if v is None:
            if ty == "int64":
                v = np.full(n, -1, dtype=np.int64)
            elif ty == "float64":
                v = np.zeros(n, dtype=np.float64)
            else:
                v = _const_arr(n, "")
        if not isinstance(v, (pa.Array, pa.ChunkedArray)):
            v = pa.array(v, type=pa.string() if ty == "object" else None)
        cols[c] = v
    return pa.table(cols)


def partial_from_points_fast(t) -> "pa.Table":
    """Arrow-in/arrow-out twin of :func:`partial_from_points` (see module
    docstring for the reduction inventory).  Semantics notes mirrored from
    the pandas combiner:

    - ord = doc_id * ORD_SCALE + part_idx is unique per exploded row
      (doc_id unique per batch), so every argmin/argmax is unambiguous and
      group-output row order is irrelevant downstream.
    - the CADASTRE pseudo_adresse filter applies to BOTH the pnum and the
      'seen' sections; 'seen' registers streets BEFORE housenumber
      validity (reference models.py registers on every row).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.housenumber import split_multi
    from ..runtime import tune_malloc

    tune_malloc()
    if t.num_rows == 0:
        return _partial_table({}, 0)   # typed empty (string, not null, cols)

    # String columns stay Arrow: dictionary codes (int) drive every mask,
    # key and reduction; Python strings materialize only for the O(groups)
    # output rows via _gather_str.
    src_c, src_d = _dict_col(t, "source")
    src_code = {v: i for i, v in enumerate(src_d.to_pylist())}
    insee_c, insee_d = _dict_col(t, "insee")
    sk_c, sk_d = _dict_col(t, "street_key")
    hn_c, hn_d = _dict_col(t, "hn")
    cp_c, cp_d = _dict_col(t, "postcode")
    st_c, st_d = _dict_col(t, "street")
    fa_c, fa_d = _dict_col(t, "fantoir_raw")
    hw_c, hw_d = _dict_col(t, "highway_type")
    salt = t.column("salt").to_numpy().astype(np.int64)
    doc = t.column("doc_id").to_numpy().astype(np.int64)
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    pseudo_ok = pc.not_equal(t.column("pseudo_adresse"), "true") \
        .to_numpy(zero_copy_only=False).astype(bool)
    fvalid = t.column("fant_valid").to_numpy(zero_copy_only=False).astype(bool)
    hl = t.column("hn_len").to_numpy().astype(np.int64)
    fa_len_u = pc.utf8_length(fa_d).to_numpy()   # per-unique lengths
    fa_len = fa_len_u[fa_c]

    sdim = int(salt.max()) + 1
    base_key = (insee_c * sdim + salt) * len(sk_d) + sk_c

    frames: list[pd.DataFrame] = []

    for source in SOURCES_ORDER:
        m = src_c == src_code.get(source, -1)
        if source == "CADASTRE":
            m &= pseudo_ok
        if not m.any():
            continue

        if source == "OSM":
            ridx = np.flatnonzero(m & (hl > 0))
            if len(ridx):
                # explode multi-number captions (split computed per unique
                # hn CODE — strings touched once per unique, same as
                # merge._explode_osm's memoized split)
                uh_codes, ih = np.unique(hn_c[ridx], return_inverse=True)
                uh = pc.take(hn_d, pa.array(uh_codes)).to_pylist()
                splits = [split_multi(u) for u in uh]
                lens = np.array([len(s) for s in splits], dtype=np.int64)
                reps = lens[ih]
                eidx = np.repeat(ridx, reps)
                nums = np.concatenate(
                    [np.asarray(splits[i], dtype=object) for i in ih]) \
                    if reps.sum() else np.empty(0, dtype=object)
                tot = int(reps.sum())
                part = (np.arange(tot, dtype=np.int64)
                        - np.repeat(np.cumsum(reps) - reps, reps))
                nl = _str_lens(nums)
                keep = (nl > 0) & (nl <= 11)
                eidx, nums, part = eidx[keep], nums[keep], part[keep]
            else:
                eidx = np.empty(0, dtype=np.int64)
                nums = np.empty(0, dtype=object)
                part = np.empty(0, dtype=np.int64)
            if len(eidx):
                if int(part.max()) >= ORD_SCALE:
                    raise ValueError(
                        f"caption split into {int(part.max()) + 1} parts; "
                        f"ORD_SCALE={ORD_SCALE} would collapse ordering")
            ord_ = doc[eidx] * ORD_SCALE + part
            cp_codes = cp_c[eidx]
        else:
            eidx = np.flatnonzero(m & (hl > 0) & (hl <= 11))
            nums = None   # hn codes are the group facet directly
            ord_ = doc[eidx] * ORD_SCALE
            cp_codes = cp_c[eidx] if source == "BAN" \
                else np.full(len(eidx), -1, dtype=np.int64)

        if len(eidx):
            if nums is None:
                cn = hn_c[eidx]
                key = base_key[eidx] * len(hn_d) + cn
            else:
                # exploded parts are NEW strings (not batch uniques):
                # factorize them; equal parts from different captions must
                # share a group
                cn, _u_num = pd.factorize(nums)
                key = base_key[eidx] * max(len(_u_num), 1) + cn
            perm, st, en = _runs(key, ord_)
            firsts, lasts = perm[st], perm[en - 1]
            rows = {
                "ptype": _const_arr(len(st), "pnum"),
                "insee": _gather_arr(insee_d, insee_c[eidx[firsts]]),
                "salt": salt[eidx[firsts]],
                "source": _const_arr(len(st), source),
                "street_key": _gather_arr(sk_d, sk_c[eidx[firsts]]),
                "numero": (pa.array(nums[firsts], type=pa.string())
                           if nums is not None
                           else _gather_arr(hn_d, cn[firsts])),
                "first_ord": ord_[firsts],
                "last_ord": ord_[lasts],
                "last_lon": lon[eidx[lasts]].astype(np.float64),
                "last_lat": lat[eidx[lasts]].astype(np.float64),
                "last_cp": _gather_arr(cp_d, cp_codes[lasts]),
                "last_street": _gather_arr(st_d, st_c[eidx[lasts]]),
            }
            if source == "OSM":
                vsel = fvalid[eidx]
                if vsel.any():
                    vperm, vst, ven = _runs(key[vsel], ord_[vsel])
                    vlast = vperm[ven - 1]
                    vkeys = key[vsel][vlast]
                    gkeys = key[firsts]  # ascending (runs are key-sorted)
                    pos = np.searchsorted(vkeys, gkeys)
                    hit = (pos < len(vkeys))
                    pos_c = np.minimum(pos, len(vkeys) - 1)
                    hit &= vkeys[pos_c] == gkeys
                    rows["vf_ord"] = np.where(hit, ord_[vsel][vlast][pos_c],
                                              -1).astype(np.int64)
                    rows["vf_fant"] = _gather_arr(
                        fa_d, np.where(hit, fa_c[eidx[vsel]][vlast][pos_c], -1))
            frames.append(_partial_table(rows, len(st)))

        if source == "BAN":
            bidx = np.flatnonzero(m)
            bidx = bidx[fa_len[bidx] == 10]
            if len(bidx):
                cf = fa_c[bidx]
                key = base_key[bidx] * len(fa_d) + cf
                ord_b = doc[bidx] * ORD_SCALE
                perm, st, en = _runs(key, ord_b)
                lasts = perm[en - 1]
                frames.append(_partial_table({
                    "ptype": _const_arr(len(st), "brep"),
                    "insee": _gather_arr(insee_d, insee_c[bidx[lasts]]),
                    "salt": salt[bidx[lasts]],
                    "street_key": _gather_arr(sk_d, sk_c[bidx[lasts]]),
                    "raw": _gather_arr(fa_d, fa_c[bidx[lasts]]),
                    "brep_ord": ord_b[lasts],
                }, len(st)))

    # 'seen' rows: distinct (insee, salt, street_key) per source
    for source in SOURCES_ORDER:
        m = src_c == src_code.get(source, -1)
        if source == "CADASTRE":
            m &= pseudo_ok
        midx = np.flatnonzero(m)
        if len(midx) == 0:
            continue
        perm, st, _en = _runs(base_key[midx])
        firsts = midx[perm[st]]
        frames.append(_partial_table({
            "ptype": _const_arr(len(st), "seen"),
            "insee": _gather_arr(insee_d, insee_c[firsts]),
            "salt": salt[firsts],
            "source": _const_arr(len(st), source),
            "street_key": _gather_arr(sk_d, sk_c[firsts]),
        }, len(st)))

    # highway rows: OSM rows with no housenumber
    hidx = np.flatnonzero((src_c == src_code.get("OSM", -1)) & (hl == 0))
    if len(hidx):
        key = base_key[hidx]
        ord_h = doc[hidx] * ORD_SCALE
        perm, st, en = _runs(key, ord_h)
        lasts = perm[en - 1]
        gkeys = key[perm[st]]
        rows = {
            "ptype": _const_arr(len(st), "hw"),
            "insee": _gather_arr(insee_d, insee_c[hidx[lasts]]),
            "salt": salt[hidx[lasts]],
            "street_key": _gather_arr(sk_d, sk_c[hidx[lasts]]),
            "hw_last_ord": ord_h[lasts],
            "hw_last_street": _gather_arr(st_d, st_c[hidx[lasts]]),
        }
        # distinct-highway-type bitmask per street (string→bit map computed
        # once per unique highway type)
        hw_lut = np.asarray([HIGHWAY_TYPES_INDEX.get(v, -1)
                             for v in hw_d.to_pylist()], dtype=np.int64)
        pv_row = hw_lut[hw_c[hidx]]
        psel = pv_row >= 0
        mask_out = np.zeros(len(st), dtype=np.int64)
        if psel.any():
            pv = pv_row[psel]
            comp = key[psel] * np.int64(len(HIGHWAY_TYPES_INDEX) * 2) + \
                np.log2(pv).astype(np.int64)
            ucomp, uf = np.unique(comp, return_index=True)
            k2 = key[psel][uf]
            p2 = pv[uf]
            p_perm, p_st, p_en = _runs(k2)
            sums = np.add.reduceat(p2[p_perm], p_st)
            pos = np.searchsorted(gkeys, k2[p_perm[p_st]])
            mask_out[pos] = sums
        rows["hw_mask"] = mask_out
        # first-valid-fantoir facet
        hsel = fvalid[hidx]
        if hsel.any():
            vperm, vst, ven = _runs(key[hsel], ord_h[hsel])
            vfirst = vperm[vst]
            vkeys = key[hsel][vfirst]
            pos = np.searchsorted(vkeys, gkeys)
            hit = pos < len(vkeys)
            pos_c = np.minimum(pos, len(vkeys) - 1)
            hit &= vkeys[pos_c] == gkeys
            rows["hw_fv_ord"] = np.where(
                hit, ord_h[hsel][vfirst][pos_c], -1).astype(np.int64)
            rows["hw_fv_fant"] = _gather_arr(
                fa_d, np.where(hit, fa_c[hidx[hsel]][vfirst][pos_c], -1))
            rows["hw_fv_street"] = _gather_arr(
                st_d, np.where(hit, st_c[hidx[hsel]][vfirst][pos_c], -1))
        frames.append(_partial_table(rows, len(st)))

    if not frames:
        return _partial_table({}, 0)
    return pa.concat_tables(frames)
