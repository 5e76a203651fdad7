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


def communes_json(sf_dir: str):
    """Communes JSON export records (reference
    ``bano/sql/export_json_dept_communes.sql``): one row per commune with
    the rank-1 postal code (ordered by ``(ligne_5, cp)``), zone-center
    coordinates and the communes importance variant
    ``greatest(0.075, round(log10(adm_weight + log10(population+1)/3), 4))``.

    Dims are dim-sized inputs; the rank-1 postal pick and the dims join run
    as one co-grouped ``groupby(insee)`` (the same shape scales to any
    commune count)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from .. import datagen
    from ..functions.rounding import sql_round

    ensure_worker_importable()
    postal = ray.data.from_arrow(datagen.postal_codes_table())
    dims = ray.data.from_arrow(datagen.zone_dims_table())

    def postal_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({"insee": b.column("insee"), "cp": b.column("cp"),
                         "ligne_5": b.column("ligne_5"),
                         "side": pa.array(["p"] * n)})

    def dim_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({"insee": b.column("insee"),
                         "cp": pa.array([""] * n), "ligne_5": pa.array([""] * n),
                         "side": pa.array(["d"] * n)})

    both = postal.map_batches(postal_rows, batch_format="pyarrow").union(
        dims.map_batches(dim_rows, batch_format="pyarrow"))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["id", "type", "name", "postcode", "lat", "lon", "city",
                "departement", "region", "population", "adm_weight", "importance"]
        p = df[df["side"] == "p"]
        d = df[df["side"] == "d"]
        if len(p) == 0 or len(d) == 0:
            return pd.DataFrame({c: pd.Series(dtype="float64" if c in ("lat", "lon", "importance")
                                              else ("int64" if c in ("population", "adm_weight") else object))
                                 for c in cols})
        insee = str(df["insee"].iloc[0])
        zone = int(insee) - 1
        cp = p.sort_values(["ligne_5", "cp"], kind="stable")["cp"].iloc[0]
        zx, zy = zone // datagen.NZY, zone % datagen.NZY
        lon = datagen.LON0 + datagen.LON_SPAN * (zx + 0.5) / datagen.NZX
        lat = datagen.LAT0 + datagen.LAT_SPAN * (zy + 0.5) / datagen.NZY
        pop = 1000 + (zone * 7919) % 100000
        aw = 1 + zone % 6
        imp = max(0.075, sql_round(float(np.log10(aw + np.log10(pop + 1) / 3.0)), 4))
        dept = insee[0:2]
        return pd.DataFrame([{
            "id": insee,
            "type": datagen.COMMUNE_TYPES[zone % 4],
            "name": f"Zone {insee}",
            "postcode": cp,
            "lat": sql_round(lat, 6), "lon": sql_round(lon, 6),
            "city": f"Zone {insee}",
            "departement": f"Dept {dept}", "region": f"Region {dept}",
            "population": pop, "adm_weight": aw, "importance": imp,
        }], columns=cols)

    return both.groupby("insee").map_groups(combine, batch_format="pandas")
