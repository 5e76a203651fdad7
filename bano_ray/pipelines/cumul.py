"""The cumul pipeline: synthesized image rows → parsed/zone-assigned points →
co-shuffled with the registry → per-zone merge (``cumul_adresses`` +
``cumul_voies`` analogs, reference ``bano/core.py:281-323``).

Shape (Ray-Data-first):

    read(documents, columns=[doc_id])            # pruned read
      → map_batches(synthesize)                  # stateless
      → map_batches(parse_caption)               # arrow kernels
      → map_batches(ZoneAssigner, actor pool)    # broadcast polygon index
      → union(registry rows)                     # co-partition the registry
      → groupby(insee).map_groups(merge_zone)    # THE shuffle

Image ``bytes`` never enter this path: the pipeline synthesizes/reads only
metadata columns; bytes re-join by image_id downstream (see
``pipelines.flagship``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import datagen
from ..runtime import ensure_worker_importable
from ..stages.merge import merge_zone
from ..stages.parse import encode_cells, make_zone_assigner, parse_caption

POINT_COLS = ["rec_type", "insee", "salt", "doc_id", "source", "street",
              "street_key", "hn", "lon", "lat", "fantoir_raw", "postcode",
              "pseudo_adresse", "highway_type", "fant_valid", "hn_len"]

NSALT = 8  # skew splitting: streets stay whole, dense zones split NSALT ways


def street_salt(street_key_arr) -> np.ndarray:
    """Deterministic street-level salt — groups (zone, salt) keep every
    street intact while splitting dense urban zones (SURVEY.md §4 skew).
    crc32 runs once per UNIQUE key (street cardinality is far below row
    count); an Arrow column dictionary-encodes in C++ (no per-row Python
    string objects) and a numpy gather broadcasts the per-unique salts."""
    import zlib

    import pyarrow.compute as pc

    if isinstance(street_key_arr, (pa.Array, pa.ChunkedArray)):
        d = pc.dictionary_encode(street_key_arr)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        if len(d) == 0:
            return np.empty(0, dtype=np.int64)
        if d.null_count:
            raise ValueError("null street_key")  # must fail loudly
        inv = d.indices.to_numpy()
        uniq = d.dictionary.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(street_key_arr, dtype=object)
        if len(arr) == 0:
            return np.empty(0, dtype=np.int64)
        # use_na_sentinel=False: a null key must fail loudly in crc32 below
        # (the default -1 sentinel would silently index per_uniq[-1] — the
        # last unique's salt), matching the old per-row loop's None behavior
        inv, uniq = pd.factorize(arr, use_na_sentinel=False)
    per_uniq = np.asarray([zlib.crc32(k.encode()) % NSALT for k in uniq],
                          dtype=np.int64)
    return per_uniq[inv]


def _const_str(n: int, s: str) -> pa.Array:
    """Length-n constant string column built in Arrow C (a take of one
    value) — no n Python string objects."""
    import pyarrow.compute as pc

    return pc.take(pa.array([s], type=pa.string()),
                   pa.array(np.zeros(n, dtype=np.int32)))


def _tag_points(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = batch.num_rows
    batch = batch.append_column("rec_type", _const_str(n, "point"))
    batch = batch.append_column("salt", pa.array(street_salt(batch.column("street_key"))))
    # precompute validity columns with arrow kernels (cheap here, pandas
    # object-string ops downstream are not)
    fr = batch.column("fantoir_raw")
    fant_valid = pc.and_(pc.equal(pc.utf8_length(fr), 10),
                         pc.equal(pc.utf8_slice_codeunits(fr, 0, 5),
                                  batch.column("insee")))
    batch = batch.append_column("fant_valid", fant_valid)
    batch = batch.append_column("hn_len", pc.utf8_length(batch.column("hn")))
    return batch.select(POINT_COLS)


def _labels_as_points_batch(batch: pa.Table) -> pa.Table:
    """Label rows (stages/label.py) in POINT_COLS form (rec_type='label')."""
    n = batch.num_rows
    return pa.table({
        "rec_type": pa.array(["label"] * n),
        "insee": batch.column("insee"),
        "salt": pa.array(street_salt(batch.column("street_key"))),
        "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),
        "source": pa.array([""] * n),
        "street": batch.column("street"),
        "street_key": batch.column("street_key"),
        "hn": pa.array([""] * n),
        "lon": batch.column("lon"),
        "lat": batch.column("lat"),
        "fantoir_raw": pa.array([""] * n),
        "postcode": pa.array([""] * n),
        "pseudo_adresse": pa.array([""] * n),
        "highway_type": pa.array([""] * n),
        "fant_valid": pa.array(np.zeros(n, dtype=bool)),
        "hn_len": pa.array(np.zeros(n, dtype=np.int32)),
    }).select(POINT_COLS)


def _registry_as_points() -> pa.Table:
    reg = datagen.registry_table()
    n = reg.num_rows
    return pa.table({
        "rec_type": pa.array(["registry"] * n),
        "insee": reg.column("insee"),
        "salt": pa.array(street_salt(reg.column("street_key"))),
        "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),
        "source": pa.array([""] * n),
        "street": reg.column("name"),
        "street_key": reg.column("street_key"),
        "hn": pa.array([""] * n),
        "lon": pa.array(np.zeros(n)),
        "lat": pa.array(np.zeros(n)),
        "fantoir_raw": reg.column("fantoir10"),
        "postcode": pa.array([""] * n),
        "pseudo_adresse": pa.array([""] * n),
        "highway_type": pa.array([""] * n),
    })


def points_dataset(sf_dir: str, expand: int = 1, assign_concurrency: int = 4,
                   with_cells: bool = True):
    """Parsed + zone-assigned point rows (no bytes).

    ``with_cells=False`` skips the cell-index column for consumers that
    never read it (the merge path drops it at _tag_points anyway — at the
    1.2B-row bench corpus the encode is pure dead compute + 8 B/row of
    carried column)."""
    import ray

    ensure_worker_importable()
    ds = datagen.images_dataset(sf_dir, expand=expand)
    ds = ds.map_batches(parse_caption, batch_format="pyarrow", batch_size=None)
    if with_cells:
        ds = ds.map_batches(encode_cells, batch_format="pyarrow", batch_size=None)
    zones_ref = ray.put(datagen.zone_boxes_wkb())
    ds = ds.map_batches(make_zone_assigner(zones_ref), batch_format="pyarrow", batch_size=None)
    return ds


# suffix-center pre-pass results per (sf_dir, expand) — the centers table is
# dim-sized; caching avoids re-running the pre-pass for every query that
# builds on the merged stream within one session
_SUFFIX_CENTERS_CACHE: dict = {}


def suffix_centers_ref(sf_dir: str, expand: int = 1):
    """``ray.put`` handle of the suffix-zone sample centers for this corpus
    (reference runs pre_process_suffixe before the merge the same way)."""
    import ray

    from ..stages.suffix import suffix_centers

    key = (sf_dir, expand)
    if key not in _SUFFIX_CENTERS_CACHE:
        # slim pre-pass: only BAN rows (doc_id % 4 == 1) are synthesized —
        # predicate pushdown ahead of the string stages
        ds = datagen.images_dataset(sf_dir, expand=expand, doc_residue=(4, 1))
        ds = ds.map_batches(parse_caption, batch_format="pyarrow", batch_size=None)
        zones_ref = ray.put(datagen.zone_boxes_wkb())
        ds = ds.map_batches(make_zone_assigner(zones_ref), batch_format="pyarrow", batch_size=None)
        centers = suffix_centers(ds)
        _SUFFIX_CENTERS_CACHE[key] = ray.put(centers)
    return _SUFFIX_CENTERS_CACHE[key]


def decorated_points_dataset(sf_dir: str, expand: int = 1,
                             assign_concurrency: int = 4, emit_suffix: bool = False):
    """Point rows with OSM highways re-keyed through suffix-zone decoration
    (reference core.py:159-177 highway_suffixe path).  Two passes over the
    synthesized stream: a pre-pass shrinking BAN rows to hamlet sample
    centers (broadcast), then the decorate map_batches stage inline."""
    from ..stages.suffix import make_suffix_decorator

    ref = suffix_centers_ref(sf_dir, expand=expand)
    pts = points_dataset(sf_dir, expand=expand,
                         assign_concurrency=assign_concurrency,
                         with_cells=False)
    return pts.map_batches(make_suffix_decorator(ref, emit_suffix=emit_suffix),
                           batch_format="pyarrow", batch_size=None)


def _insee_drop_filter(insee_drop):
    """Broadcast membership filter dropping rows of completed zones BEFORE
    any merge compute (the resume path's compute skip): ``insee_drop`` is
    a ray.put handle of a sorted string array."""
    import ray
    import pyarrow.compute as _pc

    def drop(batch: pa.Table) -> pa.Table:
        keys = ray.get(insee_drop)
        return batch.filter(_pc.invert(_pc.is_in(batch.column("insee"),
                                                 value_set=keys)))

    return drop


def partial_dataset(sf_dir: str, expand: int = 1, assign_concurrency: int = 4,
                    insee_drop=None):
    """Map-side combined partial-state rows + registry partials — the input
    to the ONE merge shuffle (see stages/merge_partial.py: shuffle volume is
    O(distinct street×numero), not O(rows)).

    ``insee_drop`` (a ``ray.put`` handle of an Arrow string array): rows of
    those zones are filtered out right after zone assignment, so a RESUME
    run skips the merge COMPUTE for completed partitions, not just their
    writes (pipelines/incremental.run_partitioned passes the lineage-done
    set here)."""
    import ray
    import pyarrow as _pa

    from ..stages.label import street_labels
    from ..stages.merge_partial import (label_partial_arrow,
                                        partial_from_points_fast,
                                        registry_partials)

    ensure_worker_importable()
    pts = decorated_points_dataset(sf_dir, expand=expand,
                                   assign_concurrency=assign_concurrency)
    if insee_drop is not None:
        pts = pts.map_batches(_insee_drop_filter(insee_drop),
                              batch_format="pyarrow", batch_size=None)
    pts = pts.map_batches(_tag_points, batch_format="pyarrow", batch_size=None)
    # arrow-native integer-coded combiner (2.1x the pandas one per row,
    # differential-pinned equal — stages/merge_partial.py)
    par = pts.map_batches(partial_from_points_fast, batch_format="pyarrow", batch_size=None)
    lab = street_labels(sf_dir, expand=expand) \
        .map_batches(label_partial_arrow, batch_format="pandas", batch_size=None)
    par = par.union(lab)
    reg = ray.data.from_arrow(_pa.Table.from_pandas(registry_partials(),
                                                    preserve_index=False))
    # The combined partial stream is O(distinct keys) — tiny next to the
    # input — but it inherits the input's block count, and the downstream
    # sort-based groupby is an all-to-all with blocks² shuffle objects
    # (256 upstream blocks → 66k tiny objects ground the driver: measured
    # 84s job wall for ~13s of remote work at 32 cpus).  Coalesce the
    # partials to O(cluster) blocks first; at multi-node scale this is the
    # "pre-aggregate, then shuffle few fat partitions" discipline.
    # (The former <16-slot gate skipped this coalesce on small clusters;
    # its starvation rationale was an artifact of ray's operator resource
    # reservation, which runtime._configure_data_context now disables.
    # Without the coalesce, an 8-CPU run over 1024 input blocks ground
    # >7 GB of driver block metadata through the sort — strictly worse.)
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 32)) if ray.is_initialized() else 32
    except Exception:
        ncpu = 32
    npart = max(8, min(64, 2 * ncpu))
    return par.union(reg).repartition(npart)


def cumul_dataset(sf_dir: str, expand: int = 1, assign_concurrency: int = 4,
                  insee_drop=None):
    """The merged cumul rows (rec_type ∈ {adresse, voie}) via the
    partial-aggregation path.  ``cumul_dataset_rows`` keeps the raw-row
    shuffle replay (differential reference).  ``insee_drop`` — see
    :func:`partial_dataset` (resume compute skip)."""
    from ..stages.merge_partial import finalize_group

    return partial_dataset(sf_dir, expand=expand,
                           assign_concurrency=assign_concurrency,
                           insee_drop=insee_drop) \
        .groupby(["insee", "salt"]).map_groups(finalize_group, batch_format="pandas")


def cumul_dataset_rows(sf_dir: str, expand: int = 1, assign_concurrency: int = 4):
    """Raw-row shuffle variant of the merge (reference implementation)."""
    import ray

    ensure_worker_importable()
    pts = decorated_points_dataset(sf_dir, expand=expand,
                                   assign_concurrency=assign_concurrency) \
        .map_batches(_tag_points, batch_format="pyarrow", batch_size=None)
    reg = ray.data.from_arrow(_registry_as_points())
    from ..stages.label import street_labels

    labels = street_labels(sf_dir, expand=expand) \
        .map_batches(_labels_as_points_batch, batch_format="pyarrow", batch_size=None)
    both = pts.union(reg).union(labels)
    return both.groupby(["insee", "salt"]).map_groups(merge_zone, batch_format="pandas")


def cumul_adresses(sf_dir: str):
    return cumul_dataset(sf_dir).filter(expr="rec_type == 'adresse'")


def cumul_voies(sf_dir: str):
    return cumul_dataset(sf_dir).filter(expr="rec_type == 'voie'")
