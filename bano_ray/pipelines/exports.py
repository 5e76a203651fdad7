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




# The merge decomposes exactly to (zone, street): every accumulator
# interaction in the reference is street-scoped (SURVEY.md §2.4 ST1-ST3),
# so grouping on (insee, street-hash salt) is semantically identical to
# per-zone grouping while splitting dense urban zones NSALT ways — skew
# splitting with streets kept whole, and per-group pandas overhead bounded
# (a pure (zone, street) key would mean ~50x more tiny group calls).


def export_csv(sf_dir: str, expand: int = 1, assign_concurrency: int = 4):
    """Partial-agg merge + CSV export fused into ONE groupby(insee) shuffle
    of combiner state (the merge and the export group on the same key — a
    second shuffle would be pure waste)."""
    from ..stages.merge_partial import finalize_group
    from .cumul import partial_dataset

    ensure_worker_importable()
    return partial_dataset(sf_dir, expand, assign_concurrency) \
        .groupby(["insee", "salt"]) \
        .map_groups(lambda df: _csv_group(finalize_group(df)), batch_format="pandas")


def street_json(sf_dir: str, expand: int = 1, assign_concurrency: int = 4):
    """Partial-agg merge + street aggregation fused into ONE groupby(insee)
    shuffle of combiner state."""
    from ..stages.merge_partial import finalize_group
    from .cumul import partial_dataset

    ensure_worker_importable()
    return partial_dataset(sf_dir, expand, assign_concurrency) \
        .groupby(["insee", "salt"]) \
        .map_groups(lambda df: _json_group(finalize_group(df)), batch_format="pandas")
