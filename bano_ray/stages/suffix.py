"""Suffix-zone (hamlet) machinery — reference ``bano/pre_process_suffixe.py``.

- :func:`name_frequency` / :func:`select_suffixes` — A8: count the last 1
  and last 2 words of long normalized street names; keep suffixes seen > 5
  times (two-word suffixes win their component words; pure digits excluded)
  (``bano/pre_process_suffixe.py:47-81``).
- :func:`build_zones` — G6: up to 2 sample address points per selected
  street → 0.0003° buffer circles, unioned per hamlet
  (``bano/pre_process_suffixe.py:19-45``); membership in a circle union is
  an exact distance test (:class:`bano_ray.geo.geomops.CircleUnionZone`).
- :func:`decorate_points` — G7: the point-in-suffix-zone join decorating
  highways/addresses with their hamlet suffix
  (``bano/sql/highway_suffixe_insee_nocache.sql:11-12``).

Run shape: per-zone ``map_groups`` (the reference runs per commune); zones
are small side state held in the group, or broadcast to an actor pool when
decorating a large point stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geo.geomops import CircleUnionZone

BUFFER_DEG = 0.0003
MIN_FREQ = 5
MAX_SAMPLES = 2


def name_frequency(street_keys) -> dict[str, dict]:
    """Suffix frequency over a zone's distinct normalized street names."""
    freq: dict[str, dict] = {}
    for v in street_keys:
        s = v.split()
        if len(s) > 4:
            k = " ".join(s[-2:])
            freq.setdefault(k, {"nombre": 0, "liste": []})
            freq[k]["nombre"] += 1
            freq[k]["liste"].append(v)
        if len(s) > 3:
            k = s[-1]
            freq.setdefault(k, {"nombre": 0, "liste": []})
            freq[k]["nombre"] += 1
            freq[k]["liste"].append(v)
    return freq


def select_suffixes(freq: dict[str, dict]) -> dict[str, dict]:
    """Reference selection: two-word suffixes >5 first; their component
    words are then blocked for the one-word pass; digits excluded."""
    sel: dict[str, dict] = {}
    mots: dict[str, int] = {}
    for k, v in freq.items():
        ks = k.split()
        if v["nombre"] > MIN_FREQ and len(ks) > 1:
            mots[ks[0]] = 1
            mots[ks[1]] = 1
            sel[k] = v
    for k, v in freq.items():
        ks = k.split()
        if v["nombre"] > MIN_FREQ and len(ks) == 1 and not k.isdigit() and k not in mots:
            sel[k] = v
    return sel


def build_zones(selection: dict[str, dict],
                street_points: dict[str, list[tuple[float, float]]]
                ) -> dict[str, CircleUnionZone]:
    """Hamlet → circle-union zone from ≤2 sample points per member street."""
    zones: dict[str, CircleUnionZone] = {}
    for hamlet, info in selection.items():
        centers: list[tuple[float, float]] = []
        for street in info["liste"]:
            pts = street_points.get(street, [])[:MAX_SAMPLES]
            centers.extend(pts)
        if centers:
            zones[hamlet] = CircleUnionZone(np.asarray(centers), radius=BUFFER_DEG)
    return zones


def decorate_points(df: pd.DataFrame, zones: dict[str, CircleUnionZone]) -> pd.DataFrame:
    """LEFT-OUTER point-in-suffix-zone join: first matching hamlet (sorted
    for determinism) or '' — the G7 decoration."""
    out = df.copy()
    suffix = np.full(len(df), "", dtype=object)
    lon = df["lon"].to_numpy()
    lat = df["lat"].to_numpy()
    for hamlet in sorted(zones):
        hit = zones[hamlet].contains(lon, lat)
        empty = suffix == ""
        suffix[hit & empty] = hamlet
    out["suffixe"] = suffix
    return out


def suffix_pipeline_zone(df: pd.DataFrame) -> pd.DataFrame:
    """Whole per-zone flow: frequency → selection → zones → decoration.
    Input: point rows with street_key/lon/lat; output: the decorated rows."""
    keys = df["street_key"].unique()
    sel = select_suffixes(name_frequency(keys))
    pts_by_street: dict[str, list] = {}
    for r in df.itertuples(index=False):
        pts_by_street.setdefault(r.street_key, []).append((r.lon, r.lat))
    zones = build_zones(sel, pts_by_street)
    return decorate_points(df, zones)


# ---------------------------------------------------------------------------
# Distributed integration (the reference runs pre_process_suffixe as a
# per-commune pre-pass before the merge; here the pre-pass is a map-side
# partial + one tiny groupby(insee), and the decoration is a broadcast
# map_batches stage over the point stream).
# ---------------------------------------------------------------------------

MAX_HN_LEN = 11  # same BAN-address condition the merge uses


def suffix_partials(batch) -> "pa.Table":
    """Map-side shrink of the BAN stream for the suffix pre-pass: one
    presence row per distinct (insee, street_key) in the batch plus up to
    ``MAX_SAMPLES`` lowest-doc_id address rows per key.  Shuffle volume is
    O(distinct keys × blocks), not O(rows).

    Arrow-native hot path: keys dictionary-encode to integer codes (C++,
    no per-row Python objects) and both the per-key head-k and the
    distinct-key pick run as numpy argsort/flag passes over the codes —
    the old pandas object-array form paid a Python string materialization
    for EVERY row of the BAN stream and dominated the pre-pass's CPU."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = batch.filter(pc.equal(batch.column("source"), "BAN"))
    empty = pa.table({
        "insee": pa.array([], pa.string()),
        "street_key": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.int64()),
        "lon": pa.array([], pa.float64()),
        "lat": pa.array([], pa.float64()),
        "is_sample": pa.array([], pa.bool_())})
    if t.num_rows == 0:
        return empty
    ins = pc.dictionary_encode(t.column("insee")).combine_chunks()
    key = pc.dictionary_encode(t.column("street_key")).combine_chunks()
    ic = ins.indices.to_numpy().astype(np.int64)
    kc = key.indices.to_numpy().astype(np.int64)
    nk = len(key.dictionary)
    pair = ic * nk + kc
    doc = t.column("doc_id").to_numpy()
    hn_len = pc.utf8_length(t.column("hn")).to_numpy()
    is_sample = (hn_len > 0) & (hn_len <= MAX_HN_LEN)

    # per-key head-MAX_SAMPLES of sample rows by ascending doc_id: one
    # lexsort over (pair, doc) restricted to sample rows, rank-within-key
    si = np.flatnonzero(is_sample)
    order = si[np.lexsort((doc[si], pair[si]))]
    p_sorted = pair[order]
    head = np.ones(len(order), dtype=bool)
    head[1:] = p_sorted[1:] != p_sorted[:-1]
    grp_start = np.repeat(np.flatnonzero(head),
                          np.diff(np.append(np.flatnonzero(head), len(order))))
    rank = np.arange(len(order)) - grp_start
    keep_s = order[rank < MAX_SAMPLES]

    # presence: first occurrence of each distinct pair
    _, first_idx = np.unique(pair, return_index=True)

    idx = pa.array(np.concatenate([keep_s, first_idx]))
    ns = len(keep_s)
    out = t.select(["insee", "street_key", "doc_id", "lon", "lat"]).take(idx)
    return pa.table({
        "insee": out.column("insee"),
        "street_key": out.column("street_key"),
        "doc_id": pa.array(np.where(
            np.arange(ns + len(first_idx)) < ns,
            out.column("doc_id").to_numpy(), -1)),
        "lon": out.column("lon"),
        "lat": out.column("lat"),
        "is_sample": pa.array(np.arange(ns + len(first_idx)) < ns),
    })


def build_centers(df: pd.DataFrame) -> pd.DataFrame:
    """Per-insee reduce: combine partials, run frequency→selection, emit one
    row per (hamlet, sample center).  Output is tiny — only zones with a
    qualifying hamlet produce rows."""
    empty = pd.DataFrame({"insee": pd.Series(dtype=object),
                          "hamlet": pd.Series(dtype=object),
                          "lon": pd.Series(dtype="float64"),
                          "lat": pd.Series(dtype="float64")})
    if len(df) == 0:
        return empty
    insee = str(df["insee"].iloc[0])
    keys = df["street_key"].unique()
    sel = select_suffixes(name_frequency(keys))
    if not sel:
        return empty
    sm = (df[df["is_sample"]]
          .sort_values("doc_id", kind="stable")
          .groupby("street_key", sort=False)
          .head(MAX_SAMPLES))
    pts_by_street = {k: list(zip(g["lon"], g["lat"]))
                     for k, g in sm.groupby("street_key", sort=False)}
    rows = []
    for hamlet, info in sel.items():
        for street in info["liste"]:
            for lo, la in pts_by_street.get(street, [])[:MAX_SAMPLES]:
                rows.append({"insee": insee, "hamlet": hamlet,
                             "lon": lo, "lat": la})
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["insee", "hamlet", "lon", "lat"])


def suffix_centers(pts_ds) -> pd.DataFrame:
    """Distributed pre-pass: BAN point stream → selected hamlet sample
    centers (reference ``bano/pre_process_suffixe.py:process``).  The result
    is dim-sized (selected hamlets only) and safe to collect/broadcast."""
    par = pts_ds.map_batches(suffix_partials, batch_format="pyarrow")
    # same wide-cluster discipline as the merge: the partial stream is tiny
    # but block-count-wide; coalesce before the groupby's all-to-all
    # (blocks² shuffle objects) at EVERY cluster size — the former <16-slot
    # skip was an artifact of ray's operator resource reservation, which
    # runtime._configure_data_context now disables
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 32)) if ray.is_initialized() else 32
    except Exception:
        ncpu = 32
    par = par.repartition(max(8, min(64, 2 * ncpu)))
    ds = par.groupby("insee").map_groups(build_centers, batch_format="pandas")
    return ds.to_pandas()


def make_suffix_decorator(centers_ref, emit_suffix: bool = False):
    """Broadcast decoration stage: OSM highway rows (hn == '') falling in a
    suffix zone get their merge key re-unified with the hamlet-carrying
    sources — street_key := normalize(append_suffixe(street, hamlet)); the
    display name stays raw (reference ``core.py:177`` add_voie(.., name)).

    ``centers_ref`` is a ``ray.put`` handle of the centers DataFrame; the
    zone index is built once per worker process, not per batch."""
    import ray

    from ..functions.normalize import normalize
    from ..functions.validity import append_suffixe

    cache: dict = {}

    def _zones():
        if "z" not in cache:
            centers = ray.get(centers_ref)
            by: dict[str, dict[str, CircleUnionZone]] = {}
            for (insee, hamlet), g in centers.groupby(["insee", "hamlet"], sort=True):
                by.setdefault(str(insee), {})[str(hamlet)] = CircleUnionZone(
                    np.column_stack([g["lon"].to_numpy(), g["lat"].to_numpy()]),
                    radius=BUFFER_DEG)
            cache["z"] = by
        return cache["z"]

    def decorate(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        zones_by_insee = _zones()
        n = batch.num_rows
        cand = np.zeros(n, dtype=bool)
        if zones_by_insee:
            # candidate mask fully in Arrow — strings only materialize for
            # the (tiny) candidate subset below
            mask = pc.and_(
                pc.and_(pc.equal(batch.column("source"), "OSM"),
                        pc.equal(batch.column("hn"), "")),
                pc.is_in(batch.column("insee"),
                         value_set=pa.array(sorted(zones_by_insee))))
            cand = mask.to_numpy(zero_copy_only=False).astype(bool)
        sfx_idx = np.empty(0, dtype=np.int64)
        sfx_vals: list[str] = []
        if cand.any():
            idx = np.flatnonzero(cand)
            take = pa.array(idx)
            insee_sub = np.asarray(
                pc.take(batch.column("insee"), take).to_pylist(), dtype=object)
            street_sub = pc.take(batch.column("street"), take).to_pylist()
            lon = batch.column("lon").to_numpy()
            lat = batch.column("lat").to_numpy()
            assigned = np.full(len(idx), "", dtype=object)
            for insee in np.unique(insee_sub):
                zi = zones_by_insee[insee]
                sel = np.flatnonzero(insee_sub == insee)
                sub_rows = idx[sel]
                got = np.full(len(sel), "", dtype=object)
                for hamlet in sorted(zi):
                    hit = zi[hamlet].contains(lon[sub_rows], lat[sub_rows])
                    got[hit & (got == "")] = hamlet
                assigned[sel] = got
            withsfx = np.flatnonzero(assigned != "")
            if len(withsfx):
                sfx_idx = idx[withsfx]
                sfx_vals = [str(assigned[i]) for i in withsfx]
                new_keys = [normalize(append_suffixe(street_sub[i], assigned[i]))
                            for i in withsfx]
                upd = np.zeros(n, dtype=bool)
                upd[sfx_idx] = True
                key_col = batch.column("street_key")
                if isinstance(key_col, pa.ChunkedArray):
                    key_col = key_col.combine_chunks()
                new_col = pc.replace_with_mask(
                    key_col, pa.array(upd), pa.array(new_keys, pa.string()))
                i = batch.column_names.index("street_key")
                batch = batch.set_column(i, "street_key", new_col)
        if emit_suffix:
            upd = np.zeros(n, dtype=bool)
            upd[sfx_idx] = True
            base = pc.take(pa.array([""], pa.string()),
                           pa.array(np.zeros(n, dtype=np.int32)))
            sfx_col = pc.replace_with_mask(
                base, pa.array(upd), pa.array(sfx_vals, pa.string())) \
                if len(sfx_idx) else base
            batch = batch.append_column("suffixe", sfx_col)
        return batch

    return decorate
