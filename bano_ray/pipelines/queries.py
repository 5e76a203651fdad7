"""Ray-side implementations of the driver-gate queries (SURVEY.md §2).

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column names match the corresponding ``bano_ray.oracle`` SQL exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import datagen
from ..functions import housenumber as hnf
from ..runtime import ensure_worker_importable
from ..stages.parse import encode_cells, parse_caption
from .cumul import points_dataset


def parsed_dataset(sf_dir: str):
    """Images + caption parse, no zone assignment (cheap base for scalar ops)."""
    ensure_worker_importable()
    return datagen.images_dataset(sf_dir).map_batches(parse_caption, batch_format="pyarrow")


def q_parse_caption(sf_dir: str):
    return parsed_dataset(sf_dir).select_columns(
        ["doc_id", "caption", "hn", "street", "street_key"])


def q_zone_counts(sf_dir: str):
    return (points_dataset(sf_dir)
            .groupby("insee").count()
            .rename_columns({"count()": "n_points"}))


def q_cell_counts(sf_dir: str):
    def add_xy(batch: pa.Table) -> pa.Table:
        from ..geo.cells import lonlat_to_tile
        x, y = lonlat_to_tile(batch.column("lon").to_numpy(),
                              batch.column("lat").to_numpy(), 12)
        return pa.table({"cell_x": x, "cell_y": y})

    ds = datagen.images_dataset(sf_dir).map_batches(add_xy, batch_format="pyarrow")
    return ds.groupby(["cell_x", "cell_y"]).count().rename_columns({"count()": "n_points"})


def q_phash_dups(sf_dir: str):
    """Exact near-dup groups by perceptual hash (the graft's exact-dedup
    role, SURVEY.md §2.8): hash-partition groupby + per-group count/min."""
    from ray.data.aggregate import Count, Min

    ds = datagen.images_dataset(sf_dir).select_columns(["phash", "image_id"])
    agg = ds.groupby("phash").aggregate(Count("image_id", alias_name="n"),
                                        Min("image_id", alias_name="keeper"))
    return agg.filter(expr="n > 1")


def q_hn_canon(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch.column("hn"), ""))
        return pa.table({"doc_id": t.column("doc_id"),
                         "canon": hnf.canonical_num_array(t.column("hn"))})

    return parsed_dataset(sf_dir).map_batches(f, batch_format="pyarrow")


def q_hn_explode(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(batch.column("source"), "OSM"),
                       pc.not_equal(batch.column("hn"), ""))
        t = batch.filter(mask)
        idx, nums = hnf.explode_osm_numbers(t.column("hn").to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": pc.take(t.column("doc_id"), pa.array(idx)),
                         "numero": pa.array(nums, type=pa.string())})

    return parsed_dataset(sf_dir).map_batches(f, batch_format="pyarrow")


def q_hn_ranges(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch.column("hn"), ""))
        idx, nums = hnf.explode_ranges(t.column("hn").to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": pc.take(t.column("doc_id"), pa.array(idx)),
                         "numero": pa.array(nums, type=pa.string())})

    return parsed_dataset(sf_dir).map_batches(f, batch_format="pyarrow")


def q_hn_plausible(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        hn = batch.column("hn")
        mask = pc.and_(pc.not_equal(hn, ""), hnf.plausible_mask(hn))
        t = batch.filter(mask)
        return t.select(["doc_id", "hn"])

    return parsed_dataset(sf_dir).map_batches(f, batch_format="pyarrow")


def q_fixed_width_parse(sf_dir: str):
    """S4 fixed-width registry record parse, vectorized with arrow kernels."""
    def f(batch: pa.Table) -> pa.Table:
        sidx = datagen.street_idx(batch.column("doc_id").to_numpy())
        key = batch.column("street_key")
        insee = batch.column("insee") if "insee" in batch.column_names else None
        # build the 120-char record then slice it back (reference
        # sql/load_fantoir.sql:5-34 substr parsing)
        voie = np.char.zfill(sidx.astype("U"), 4)
        if insee is None:
            raise ValueError("needs insee")
        rec = [f"{i}{v}A{k.upper():<110.110s}"[:120].ljust(120)
               for i, v, k in zip(insee.to_pylist(), voie, key.to_pylist())]
        arr = pa.array(rec)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "code_insee": pc.utf8_slice_codeunits(arr, 0, 5),
            "id_voie": pc.utf8_slice_codeunits(arr, 5, 9),
            "cle_rivoli": pc.utf8_slice_codeunits(arr, 9, 10),
            "libelle": pc.utf8_trim_whitespace(pc.utf8_slice_codeunits(arr, 10, 40)),
        })

    return points_dataset(sf_dir).map_batches(f, batch_format="pyarrow")


CUMUL_OUT_COLS = ["insee", "dept", "source", "street_key", "numero", "lon",
                  "lat", "code_postal", "fantoir", "voie_osm", "voie_fantoir",
                  "voie_bal", "voie_cadastre", "voie_autre"]


def q_cumul_adresses(sf_dir: str):
    from .cumul import cumul_adresses

    return cumul_adresses(sf_dir).select_columns(CUMUL_OUT_COLS)


def q_cumul_voies(sf_dir: str):
    from .cumul import cumul_voies

    return cumul_voies(sf_dir).select_columns(CUMUL_OUT_COLS + ["highway_index"])


def q_export_csv(sf_dir: str):
    from .exports import export_csv

    return export_csv(sf_dir)


def q_street_json(sf_dir: str):
    from .exports import street_json

    return street_json(sf_dir)
