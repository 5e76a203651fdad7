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
