"""Source readers (SURVEY.md §2.1 S-series) on Ray Data natives.

- S1/S2: delimited CSV(.gz) address files → ``ray.data.read_csv`` with
  explicit arrow parse options (gzip inferred from extension)
- S3: GeoJSON FeatureCollection → feature table with WKB geometry
- S4: fixed-width registry records → ``read_text`` + vectorized slicing
- S6-S8: small dimension CSVs → ``read_csv`` then broadcast driver-side

Plus the G8 postal-polygon lookup with the reference's smallest-area-first
tie-break (``bano/sql/export_json_dept_voies_rapprochees.sql:38-42``).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .geo.geomops import shoelace_area
from .geo.pip import PolygonIndex
from .geo.wkb import encode_multipolygon, encode_point, encode_polygon


def read_delimited(path: str, delimiter: str = ";", **kwargs):
    """S1/S2 reader: ``;``-delimited (BAL) or ``,``-delimited (BAN) CSV,
    transparently gunzipped by arrow."""
    from pyarrow import csv as pcsv
    import ray.data

    return ray.data.read_csv(
        path, parse_options=pcsv.ParseOptions(delimiter=delimiter), **kwargs)


def source_fingerprint(path: str) -> str:
    """Freshness fingerprint of a local source file: (mtime_ns, size).
    The HTTP equivalent is the Last-Modified/ETag header pair — the
    reference's If-Modified-Since download gate (``bano/sources/ban.py:38-41``)
    maps onto the same interface."""
    import os

    st = os.stat(path)
    return f"{st.st_mtime_ns}_{st.st_size}"


def read_delimited_fresh(path: str, state: dict | None,
                         delimiter: str = ";", **kwargs):
    """S1 conditional-fetch hook: returns ``(dataset_or_None, new_state)``.

    ``state`` is the previous run's ``{path: fingerprint}`` map (keep it in
    the pipeline's lineage dir).  If the source is unchanged the reader is
    SKIPPED (``None``) — the engine analog of the reference's
    If-Modified-Since 304 path; otherwise the dataset is returned and the
    new fingerprint recorded.  No network in this sandbox: the fingerprint
    is mtime+size; an HTTP deployment substitutes the conditional GET."""
    state = dict(state or {})
    fp = source_fingerprint(path)
    if state.get(path) == fp:
        return None, state
    state[path] = fp
    return read_delimited(path, delimiter=delimiter, **kwargs), state


def geojson_features_to_table(text: str) -> pa.Table:
    """S3: FeatureCollection → (properties..., geom_wkb) rows."""
    fc = json.loads(text)
    names: dict[str, list] = {}
    wkbs: list[bytes] = []
    for feat in fc.get("features", []):
        props = feat.get("properties", {})
        geom = feat.get("geometry", {})
        gtype = geom.get("type")
        coords = geom.get("coordinates")
        if gtype == "Point":
            blob = encode_point(*coords[:2])
        elif gtype == "Polygon":
            blob = encode_polygon([np.asarray(r, dtype=np.float64) for r in coords])
        elif gtype == "MultiPolygon":
            blob = encode_multipolygon(
                [[np.asarray(r, dtype=np.float64) for r in poly] for poly in coords])
        else:
            continue
        for k, v in props.items():
            names.setdefault(k, []).append(v)
        wkbs.append(blob)
    cols = {k: pa.array(v) for k, v in names.items()}
    cols["geom_wkb"] = pa.array(wkbs, type=pa.binary())
    return pa.table(cols)


def read_geojson(path: str) -> pa.Table:
    """Small GeoJSON file → table (driver-side; shard big collections into
    NDJSON and use read_json + map_batches at scale)."""
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return geojson_features_to_table(f.read())


# real FANTOIR record layout (reference sql/load_fantoir.sql:5-34; substr is
# 1-based there, slices here are 0-based)
FANTOIR_SLICES = {
    "code_dir": (2, 3),
    "id_voie": (6, 10),
    "cle_rivoli": (10, 11),
    "nature_voie": (11, 15),
    "libelle_voie": (15, 41),
    "caractere_annul": (73, 74),
    "type_voie": (108, 109),
    "ld_bati": (109, 110),
}


def parse_fixed_width_batch(batch: pa.Table,
                            slices: dict[str, tuple[int, int]] = None) -> pa.Table:
    """S4: FANTOIR fixed-width record slicing with arrow kernels, including
    the composed columns and header-row filters of the reference loader
    (``sql/load_fantoir.sql:5-34``)."""
    slices = slices or FANTOIR_SLICES
    text = batch.column("text")
    # header rows: '______ %' and '___ %' patterns are filtered out
    keep = pc.and_(
        pc.invert(pc.match_substring_regex(text, "^.{6} ")),
        pc.invert(pc.match_substring_regex(text, "^.{3} ")))
    text = pc.filter(text, keep)
    cols = {name: pc.utf8_trim_whitespace(pc.utf8_slice_codeunits(text, a, b))
            for name, (a, b) in slices.items()}
    dept2 = pc.utf8_slice_codeunits(text, 0, 2)
    com3 = pc.utf8_slice_codeunits(text, 3, 6)
    cols["code_dept"] = pc.if_else(pc.equal(dept2, "97"),
                                   pc.binary_join_element_wise(
                                       dept2, pc.utf8_slice_codeunits(text, 3, 4), ""),
                                   dept2)
    insee = pc.binary_join_element_wise(dept2, com3, "")
    cols["code_insee"] = insee
    cols["fantoir10"] = pc.binary_join_element_wise(
        insee, pc.utf8_slice_codeunits(text, 6, 11), "")
    return pa.table(cols)


def read_fixed_width(path: str, slices=None):
    import ray.data

    ds = ray.data.read_text(path)
    return ds.map_batches(lambda b: parse_fixed_width_batch(b, slices),
                          batch_format="pyarrow")


class PostalIndex(PolygonIndex):
    """G8: postal polygon lookup — when polygons nest/overlap, the SMALLEST
    area wins, ties broken by insertion id (reference ORDER BY ST_Area +
    RANK() OVER (ORDER BY id))."""

    def __init__(self, polygons):
        super().__init__(polygons)
        # shell areas (sum over multipolygon parts) for the tie-break rank
        self.areas = np.array([sum(shoelace_area(rings[0]) for rings in polys)
                               for polys in self.polys], dtype=np.float64)
        self.order = np.lexsort((np.arange(len(self.areas)), self.areas))

    def assign_smallest(self, px, py) -> np.ndarray:
        """Per point: key of the smallest containing polygon, or ''."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out = np.full(len(px), "", dtype=object)
        pi, gi = self.assign_all(px, py)
        if len(pi) == 0:
            return out
        rank_of = np.empty(len(self.keys), dtype=np.int64)
        rank_of[self.order] = np.arange(len(self.keys))
        best = {}
        for p, g in zip(pi.tolist(), gi.tolist()):
            if p not in best or rank_of[g] < rank_of[best[p]]:
                best[p] = g
        for p, g in best.items():
            out[p] = self.keys[g]
        return out
