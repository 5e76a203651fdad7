"""Export pipelines: cumul → per-zone export rows (CSV export semantics and
street-JSON importance/packing), as ``groupby(insee).map_groups`` stages.

Zone dims (population, adm_weight, labels) are closed-form functions of the
zone id (``datagen.zone_dims_table``), evaluated in-group — the general path
broadcasts the dims table via ``ray.put`` into an actor-pool stage.
"""

from __future__ import annotations

import pandas as pd

from ..runtime import ensure_worker_importable
from ..stages.export import export_csv_zone, street_json_zone
from .cumul import cumul_dataset


def _dims_for(insee: str) -> dict:
    zone = int(insee) - 1
    dept = insee[0:2]
    return {
        "population": 1000 + (zone * 7919) % 100000,
        "adm_weight": 1 + zone % 6,
        "name": f"Zone {insee}",
        "dept_name": f"Dept {dept}",
        "region_name": f"Region {dept}",
        "min_cp": str((zone + 1) * 10).zfill(5),
    }


def _csv_group(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return export_csv_zone(df, "", "")
    insee = str(df["insee"].iloc[0])
    d = _dims_for(insee)
    return export_csv_zone(df, d["min_cp"], d["name"])


def _json_group(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return street_json_zone(df, {})
    insee = str(df["insee"].iloc[0])
    return street_json_zone(df, {insee: _dims_for(insee)})


def export_csv(sf_dir: str):
    ensure_worker_importable()
    return cumul_dataset(sf_dir).groupby("insee").map_groups(
        _csv_group, batch_format="pandas")


def street_json(sf_dir: str):
    ensure_worker_importable()
    return cumul_dataset(sf_dir).groupby("insee").map_groups(
        _json_group, batch_format="pandas")
