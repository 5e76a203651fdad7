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

    # Deterministic final sort: the output is ~O(streets) rows (87 at
    # sf0.001), so a total-order sort is free and makes the result
    # byte-stable for order-sensitive downstream hashing.
    return (cumul_voies(sf_dir)
            .select_columns(CUMUL_OUT_COLS + ["highway_index"])
            .sort(["insee", "street_key", "source", "fantoir"]))


def q_export_csv(sf_dir: str):
    from .exports import export_csv

    return export_csv(sf_dir)


def q_street_json(sf_dir: str):
    from .exports import street_json

    return street_json(sf_dir)


def q_export_crosscheck(sf_dir: str):
    """Export-format cross-check (reference stats_export.sh:7-25): per zone,
    the CSV export's row count, its distinct-row count (the duplicate-line
    check), and the row count read back from the shapefile sink rendering
    of the same rows (the CSV-vs-SHP parity check, ogrinfo-style).  The
    oracle pins n_shp == n_csv, so a duplicate export line or a row
    dropped/duplicated by the shapefile writer turns the gate red."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow.compute as pc

    from .exports import export_csv
    from ..sources_io_shp import read_point_shapefile, write_point_shapefile

    EXPORT_COLS = ["id", "numero", "voie", "code_post", "ville", "source",
                   "lat", "lon"]

    def add_zone(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "insee", pc.utf8_slice_codeunits(batch.column("id"), 0, 5))

    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        insee = str(df["insee"].iloc[0])
        n_csv = len(df)
        n_unique = len(df[EXPORT_COLS].drop_duplicates())
        with tempfile.TemporaryDirectory() as td:  # render the REAL sink
            base = write_point_shapefile(df[EXPORT_COLS],
                                         os.path.join(td, f"bano-{insee}"),
                                         attr_cols=["id"])
            n_shp = len(read_point_shapefile(base))
        return pd.DataFrame({"insee": [insee], "n_csv": [n_csv],
                             "n_unique": [n_unique], "n_shp": [n_shp]})

    return (export_csv(sf_dir)
            .map_batches(add_zone, batch_format="pyarrow")
            .groupby("insee").map_groups(group_fn, batch_format="pandas")
            .sort("insee"))


# ---------------------------------------------------------------------------
# registry joins / incremental / kNN
# ---------------------------------------------------------------------------


def q_registry_unmatched(sf_dir: str):
    """J9 anti-join: registry streets not matched by any cumul_voies row
    (reference bano/sql/export_json_dept_voies_non_rapprochees.sql:13-21:
    ``fantoir_voie EXCEPT SELECT insee_com, fantoir FROM cumul_voies``),
    expressed as union + groupby(fantoir) keep-unmatched — shuffle-based,
    no driver-side set.  Streets matched only via the point_par_rue label
    load (way-only streets) count as matched — they belong to the J10
    "rapprochées sans adresses" export instead."""
    import ray
    from .cumul import cumul_voies

    reg = ray.data.from_arrow(datagen.registry_table()).map_batches(
        lambda b: pa.table({"fantoir": b.column("fantoir10"),
                            "insee": b.column("insee"),
                            "side": pa.array(["r"] * b.num_rows)}),
        batch_format="pyarrow")
    matched = cumul_voies(sf_dir).map_batches(
        lambda b: pa.table({"fantoir": b.column("fantoir"),
                            "insee": b.column("insee"),
                            "side": pa.array(["m"] * b.num_rows)}),
        batch_format="pyarrow").filter(expr="fantoir != ''")

    def keep_unmatched(df: pd.DataFrame) -> pd.DataFrame:
        if (df["side"] == "m").any():
            return pd.DataFrame({"insee": pd.Series(dtype="string"),
                                 "fantoir": pd.Series(dtype="string")})
        return df[df["side"] == "r"][["insee", "fantoir"]].drop_duplicates()

    return (reg.union(matched).groupby("fantoir")
            .map_groups(keep_unmatched, batch_format="pandas"))


VSA_COLS = ["fantoir", "citycode", "type", "name", "postcode", "lat", "lon",
            "city", "departement", "region", "importance"]


def q_voies_sans_adresses(sf_dir: str):
    """J10 export: registry-matched streets carrying no addresses
    (reference ``export_json_dept_voies_rapprochees_sans_adresses.sql``:
    ``fantoir FROM cumul_voies EXCEPT fantoir FROM cumul_adresses``, then
    postal-polygon + COG enrichment).  The population is exactly the
    point_par_rue-matched way-only streets plus any labeled street whose
    addresses all lack the fantoir.  One groupby(fantoir) co-groups voie
    and adresse rows; enrichment dims are closed-form, the postal index is
    the broadcast G8 lookup."""
    from ..stages.export import _type_weight, get_postal_index, sql_round
    from .cumul import cumul_dataset
    from .exports import _dims_for

    ds = cumul_dataset(sf_dir).filter(expr="fantoir != ''")
    _dt = {"lat": "float64", "lon": "float64", "importance": "float64"}

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=_dt.get(c, "object"))
                             for c in VSA_COLS})

    def per_fantoir(df: pd.DataFrame) -> pd.DataFrame:
        if (df["rec_type"] == "adresse").any():
            return _empty()
        v = df[df["rec_type"] == "voie"]
        if len(v) == 0:
            return _empty()
        dims = [_dims_for(i) for i in v["insee"]]
        cp = pd.Series(get_postal_index().assign_smallest(
            v["lon"].to_numpy(), v["lat"].to_numpy()),
            dtype=object).fillna("").to_numpy(dtype=object)
        name = [s.replace("\t", " ").replace('"', "'").replace("’", "'")
                for s in v["voie_osm"]]
        aw = np.array([d["adm_weight"] for d in dims], dtype=np.float64)
        pop = np.array([d["population"] for d in dims], dtype=np.float64)
        tw = np.array([_type_weight(s) for s in v["voie_osm"]], dtype=np.float64)
        # reference importance with count(p.*) = 1 → log10(1 + 1) term
        imp = (np.log10(aw + np.log10(pop + 1.0) / 3.0)
               * np.log10(1.0 + np.log10(2.0) + np.log10(tw)))
        return pd.DataFrame({
            "fantoir": v["fantoir"].to_numpy(dtype=object),
            "citycode": v["insee"].to_numpy(dtype=object),
            "type": "street",
            "name": pd.Series(name, dtype=object).to_numpy(dtype=object),
            "postcode": cp,
            "lat": [sql_round(float(x), 6) for x in v["lat"]],
            "lon": [sql_round(float(x), 6) for x in v["lon"]],
            "city": [d["name"] for d in dims],
            "departement": [d["dept_name"] for d in dims],
            "region": [d["region_name"] for d in dims],
            "importance": [sql_round(float(x), 4) for x in imp],
        }, columns=VSA_COLS)

    return ds.groupby("fantoir").map_groups(per_fantoir, batch_format="pandas")


def q_ban_pseudo(sf_dir: str):
    """J11: unmatched BAN street names → pseudo registry ids {insee}b{i}bbb
    (reference bano/sources/ban2fantoir.py:18-33; enumeration determinized
    to alphabetical street_key order per zone)."""
    from ..functions.normalize import normalize
    reg_keys = {normalize(g[0]) for g in datagen.STREET_SPELLINGS[:datagen.K_REG]}

    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        insee = str(df["insee"].iloc[0])
        keys = sorted(set(df["street_key"]) - reg_keys)
        return pd.DataFrame({
            "insee": [insee] * len(keys),
            "street_key": keys,
            "pseudo_fantoir": [f"{insee}b{str(i).ljust(4, 'b')}" for i in range(len(keys))],
        })

    ban = points_dataset(sf_dir).filter(expr="source == 'BAN'") \
        .select_columns(["insee", "street_key"])
    return ban.groupby("insee").map_groups(group_fn, batch_format="pandas")


def q_min_cp(sf_dir: str):
    """A6: min postal code per zone over merged addresses."""
    from ray.data.aggregate import Min
    from .cumul import cumul_adresses

    ds = cumul_adresses(sf_dir).filter(expr="code_postal != ''")
    return ds.groupby("insee").aggregate(Min("code_postal", alias_name="min_cp"))


def q_tile_zones(sf_dir: str):
    """G9: expire tiles → impacted zone list (reference bano/models.py:305-360)."""
    from .incremental import impacted_zones

    return impacted_zones()


def q_tile_zones_arm(sf_dir: str):
    """G9 metropolis rule: tile-impact with the arrondissement substitution —
    metro parents' level-8 polygons excluded, their level-9 arrondissement
    boxes take over (reference bano/models.py:330-360: ``NOT IN
    ('13055','69123','75056')`` + the '751__'/'6938_'/'132__' level-9 arm)."""
    from .incremental import impacted_zones

    return impacted_zones(arrondissements=True)


def q_commune_list(sf_dir: str):
    """J12: the per-dept processing commune list (reference
    bano/db_helpers.py:7-15) — typecom COMD excluded, ARM parents excluded
    (Paris/Lyon/Marseille process per arrondissement, never as the parent
    commune).  The ARM-parent set is dim-sized: broadcast is_in mask, no
    shuffle."""
    import pyarrow.compute as pc
    import ray

    ensure_worker_importable()
    tbl = datagen.cog_communes_table()
    parents = pc.unique(
        tbl.filter(pc.equal(tbl.column("typecom"), "ARM")).column("comparent"))

    def f(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.invert(pc.is_in(batch.column("com"), value_set=parents)),
            pc.not_equal(batch.column("typecom"), "COMD"))
        return batch.filter(keep).select(["dep", "com", "ncc"])

    return (ray.data.from_arrow(tbl)
            .map_batches(f, batch_format="pyarrow").sort("com"))


def q_knn_match(sf_dir: str):
    """ST5 graft: cell-local kNN — nearest OSM point for each BAN point
    within (zone, street_key); grid-bucket index on large groups."""
    from ..stages.knn import knn_match

    pts = points_dataset(sf_dir).select_columns(
        ["insee", "street_key", "source", "image_id", "lon", "lat"])
    return knn_match(pts, k=1)


# ---------------------------------------------------------------------------
# text analysis / dedup / ANN / events / relational baseline
# ---------------------------------------------------------------------------


def _docs(sf_dir: str):
    import ray

    ensure_worker_importable()
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def q_langid(sf_dir: str):
    from ..stages.text import langid_batch

    return _docs(sf_dir).map_batches(langid_batch, batch_format="pyarrow")


def q_token_count(sf_dir: str):
    from ..stages.text import token_count_batch

    return _docs(sf_dir).map_batches(token_count_batch, batch_format="pyarrow")


def q_token_bpe(sf_dir: str):
    """BPE-ish subword token count (GPT-2-style pretokenizer regex; RE2 on
    both sides, oracle-gated: oracle.q_token_bpe)."""
    from ..stages.text import bpe_token_count_batch

    return _docs(sf_dir).map_batches(bpe_token_count_batch,
                                     batch_format="pyarrow")


def q_quality(sf_dir: str):
    from ..stages.text import quality_batch

    return _docs(sf_dir).map_batches(quality_batch, batch_format="pyarrow")


def q_fingerprint(sf_dir: str):
    from ..stages.text import fingerprint_batch

    return _docs(sf_dir).map_batches(fingerprint_batch, batch_format="pyarrow")


def q_dedup_exact_docs(sf_dir: str):
    """Exact text dedup: md5 hash-partition groupby, keep-first + group size."""
    from ray.data.aggregate import Count, Min
    from ..stages.dedup import md5_hex_many

    def h(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({"h": pa.array(md5_hex_many(texts), pa.string()),
                         "doc_id": batch.column("doc_id")})

    ds = _docs(sf_dir).map_batches(h, batch_format="pyarrow")
    return ds.groupby("h").aggregate(Count("doc_id", alias_name="n"),
                                     Min("doc_id", alias_name="keeper"))


def q_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs, Jaccard-verified — fully
    oracle-gated: md5 shingle hashes make signatures SQL-replicable
    (oracle.q_minhash_pairs)."""
    from ..stages.dedup import minhash_candidate_pairs

    return minhash_candidate_pairs(_docs(sf_dir), threshold=0.5)


def q_dup_clusters(sf_dir: str):
    """Transitive duplicate clusters from the verified minhash pairs:
    distributed min-label propagation (stages/graph.py) — per-round
    shuffles are label-table-sized; convergence certified by the monotone
    label sum.  Oracle: recursive-CTE transitive closure over the same
    pair SQL."""
    from ..stages.dedup import minhash_candidate_pairs
    from ..stages.graph import connected_components

    pairs = minhash_candidate_pairs(_docs(sf_dir), threshold=0.5)
    return connected_components(pairs, "doc_a", "doc_b")


def q_crossmodal_corr(sf_dir: str):
    """Per-zone Pearson r of (image luminance, caption token count) — the
    multimodal-alignment census (does image content track caption
    richness per region).  x = the PNG thumbnail's total cell sum (exact
    int, all channels), y = token count; moments accumulate as exact
    int64 per-block partials (the q_corr_by_group discipline), ONE
    zone-sized groupby; images decode in the pool, only 5 int moments
    per zone shuffle.  Oracle-gated (oracle.q_crossmodal_corr)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.text import token_count_batch
    from .flagship import ImageThumbSums, _png_pool_pipeline

    ensure_worker_importable()
    thumbs = _png_pool_pipeline(sf_dir, ImageThumbSums)

    def lum(batch: pa.Table) -> pa.Table:
        # 3 rows per doc (one per channel) → one row per doc: sum
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        s = batch.column("thumb_sum").to_numpy().astype(np.int64)
        u, inv = np.unique(d, return_inverse=True)
        tot = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot, inv, s)
        return pa.table({"doc_id": pa.array(u), "x": pa.array(tot)})

    xs = thumbs.map_batches(lum, batch_format="pyarrow")
    toks = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
            .map_batches(token_count_batch, batch_format="pyarrow"))
    # ONE distributed hash join pairs each PNG doc's luminance with its
    # document-text token count (token counts come from the parquet text,
    # not the caption — independent data, hence the join)
    j = xs.join(toks, join_type="inner", num_partitions=8,
                on=("doc_id",), right_on=("doc_id",))

    def moments(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        x = batch.column("x").to_numpy().astype(np.int64)
        y = batch.column("n_tokens").to_numpy().astype(np.int64)
        lon, lat = datagen.lon_lat(d)
        zone = datagen.zone_of(lon, lat)
        insee = np.char.zfill((zone + 1).astype("U"), 5).astype(object)
        df = pd.DataFrame({"insee": insee, "n": 1, "sx": x, "sy": y,
                           "sxy": x * y, "sx2": x * x, "sy2": y * y})
        g = df.groupby("insee", sort=False).sum()
        return pa.table({
            "insee": pa.array(g.index.to_numpy(), pa.string()),
            **{c: pa.array(g[c].to_numpy().astype(np.int64))
               for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")}})

    agg = (j.map_batches(moments, batch_format="pyarrow")
           .groupby("insee")
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")]))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.float64)
        sx = batch.column("sx").to_numpy().astype(np.float64)
        sy = batch.column("sy").to_numpy().astype(np.float64)
        sxy = batch.column("sxy").to_numpy().astype(np.float64)
        sx2 = batch.column("sx2").to_numpy().astype(np.float64)
        sy2 = batch.column("sy2").to_numpy().astype(np.float64)
        corr = np.round((n * sxy - sx * sy)
                        / (np.sqrt(n * sx2 - sx * sx)
                           * np.sqrt(n * sy2 - sy * sy)), 6)
        return pa.table({"insee": batch.column("insee"),
                         "n": pa.array(n.astype(np.int64)),
                         "corr": pa.array(corr)})

    return agg.map_batches(finish, batch_format="pyarrow")


def q_crossmodal_dups(sf_dir: str):
    """Cross-modal consistency census: verified TEXT near-dup pairs
    annotated with whether their IMAGES also match (phash equality) —
    "same caption, different picture" is the mismatch a multimodal
    curation pass flags before training.  Composition: the minhash
    near-dup pairs with both sides' phash attached batch-locally
    (phash is a pure function of doc_id — no extra shuffle).
    Oracle-gated (oracle.q_crossmodal_dups)."""
    from ..stages.dedup import minhash_candidate_pairs

    ensure_worker_importable()
    pairs = minhash_candidate_pairs(_docs(sf_dir), threshold=0.5)

    def attach(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        pha = datagen.phash_of(a)
        phb = datagen.phash_of(b)
        return pa.table({
            "doc_a": batch.column("doc_a"), "doc_b": batch.column("doc_b"),
            "jaccard": batch.column("jaccard"),
            "image_match": pa.array(pha == phb)})

    return pairs.map_batches(attach, batch_format="pyarrow")


def q_dedup_incremental(sf_dir: str):
    """Incremental-ingest dedup (stages/dedup.incremental_dedup): the
    1/5 delta shard matched against the base corpus — cross-side banded
    candidates only, per delta doc the best base match.  Oracle-gated
    (oracle.q_dedup_incremental)."""
    from ..stages.dedup import incremental_dedup

    ensure_worker_importable()
    return incremental_dedup(_docs(sf_dir))


def q_boilerplate(sf_dir: str):
    """Boilerplate/template census: per document the fraction of its
    distinct word-3-gram shingles that occur in at least one OTHER
    document (stages/dedup.boilerplate_census) — headers, footers and
    navigation chrome score high; the curation signal between exact
    dedup and near-dup.  Oracle-gated (oracle.q_boilerplate)."""
    from ..stages.dedup import boilerplate_census

    ensure_worker_importable()
    return boilerplate_census(_docs(sf_dir))


def q_dedup_keep_best(sf_dir: str):
    """Quality-aware dedup representative selection: per transitive
    near-dup cluster keep the HIGHEST-quality member (tie → min doc_id)
    instead of the min-id one — the curation refinement production
    pipelines actually run ("keep the best copy, not the first").
    Labels from the distributed CC over verified minhash pairs; quality
    attaches via ONE distributed hash join (the label table is
    dup-cluster-sized); per-label argmax in a label-keyed groupby.
    Oracle-gated (oracle.q_dedup_keep_best)."""
    import ray

    from ..stages.text import quality_batch

    ensure_worker_importable()
    labels = q_dup_clusters(sf_dir)
    qual = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
            .map_batches(lambda b: quality_batch(b).select(
                ["doc_id", "quality"]), batch_format="pyarrow"))
    j = labels.join(qual, join_type="inner", num_partitions=8,
                    on=("node",), right_on=("doc_id",))

    def best(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["quality", "node"],
                           ascending=[False, True], kind="stable")
        top = d.groupby("label", sort=False).head(1)
        n = df.groupby("label", sort=False).size()
        return pd.DataFrame({
            "label": top["label"].to_numpy().astype(np.int64),
            "keeper": top["node"].to_numpy().astype(np.int64),
            "n_members": n.reindex(top["label"]).to_numpy().astype(np.int64),
            "best_quality": top["quality"].to_numpy()})

    return j.groupby("label").map_groups(best, batch_format="pandas")


def q_jaccard_neardup(sf_dir: str):
    """Exact-recall word-3-gram Jaccard near-dup pairs via prefix filtering
    (no probabilistic banding: every pair with J >= 0.5 is guaranteed to
    surface as a candidate).  Fully oracle-gated — md5 shingle hashes,
    hash-order prefixes, the size filter and the 200-doc skew cap are all
    replicated in closed-form SQL (oracle.q_jaccard_neardup)."""
    from ..stages.dedup import jaccard_neardup

    return jaccard_neardup(_docs(sf_dir), threshold=0.5)


def q_simhash(sf_dir: str):
    """SimHash per document (oracle-gated: oracle.q_simhash)."""
    from ..stages.dedup import simhash_batch

    return _docs(sf_dir).map_batches(simhash_batch, batch_format="pyarrow")


def q_simhash_neardup(sf_dir: str):
    """SimHash Hamming-≤3 near-dup pairs via pigeonhole block banding
    (oracle-gated: oracle.q_simhash_neardup; exact-recall property also
    asserted vs a brute-force reference in tests/test_pipeline.py)."""
    from ..stages.dedup import simhash_neardup

    return simhash_neardup(_docs(sf_dir), k=3).sort(["a", "b"])


def q_phash_neardup(sf_dir: str):
    """Perceptual-hash Hamming-≤3 near-dup IMAGE pairs via pigeonhole
    12-bit block banding over the 48-bit phash (oracle-gated:
    oracle.q_phash_neardup) — the image-payload twin of q_simhash_neardup;
    catches re-encoded / slightly-retouched copies that the exact
    q_phash_dups groupby misses."""
    from ..stages.dedup import phash_neardup

    ds = datagen.images_dataset(sf_dir).select_columns(["doc_id", "phash"])
    return phash_neardup(ds, k=3).sort(["a", "b"])


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs via banded LSH buckets
    (oracle-gated: oracle.q_embedding_neardup).  Runs over the corpus with
    planted perturbed twins (datagen.embeddings_dataset); recall on the
    planted pairs is also asserted by tests/test_pipeline.py against a
    brute-force reference."""
    from ..stages.dedup import embedding_neardup

    return embedding_neardup(datagen.embeddings_dataset(sf_dir),
                             sim_threshold=0.9).sort(["a", "b"])


ANN_QUERY_IDS = list(range(8))
ANN_K = 10


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k (broadcast query matrix, per-batch matmul,
    tiny global reduce)."""
    import ray
    from ..stages.ann import brute_topk

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return brute_topk(ds, ANN_QUERY_IDS, k=ANN_K)


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed ANN variant (oracle-gated: with nprobe >= nbits the
    probe set is closed-form, so oracle.q_ann_lsh replicates it exactly;
    recall vs brute also checked in tests)."""
    import ray
    from ..stages.ann import lsh_topk

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    # near-uniform synthetic embeddings have no cluster structure, so recall
    # tracks bucket coverage — use few bits + wide multi-probe here; real
    # clustered corpora want more bits / fewer probes
    return lsh_topk(ds, ANN_QUERY_IDS, k=ANN_K, nbits=5, nprobe=8)


def q_ann_ivf(sf_dir: str):
    """IVF ANN variant (rows-only; recall vs brute checked in tests):
    hash-sampled k-means training, broadcast centroids, inverted-list
    co-group with multi-probed queries."""
    import ray
    from ..stages.ann import ivf_topk

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    # unclustered synthetic vectors: few lists + wide probing (see q_ann_lsh)
    return ivf_topk(ds, ANN_QUERY_IDS, k=ANN_K, ncentroids=8, nprobe=4)


def q_tfidf(sf_dir: str):
    """Per-document top-3 TF-IDF terms (stages/text.py tfidf_topk):
    vocabulary-sized df aggregate broadcast via ray.put, then a batch-local
    score-and-cut second pass — the row stream never shuffles.  Oracle-gated
    (oracle.q_tfidf)."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.text import tfidf_topk

    ensure_worker_importable()
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return tfidf_topk(ds, n_docs, k=3)


def q_term_postings(sf_dir: str):
    """Truncated inverted index — per-term top-3 postings by tf
    (stages/text.py term_postings_topk): batch-local tf + per-term pre-cut,
    md5-sharded per-term merge.  Oracle-gated (oracle.q_term_postings)."""
    import ray

    from ..stages.text import term_postings_topk

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return term_postings_topk(ds.repartition(8), k=3)


def q_window_funcs(sf_dir: str):
    """Per-user ordered window functions (ROW_NUMBER / LAG / running SUM)
    via the coarse-shard sort-within-group operator (stages/window.py).
    The fixture input arrives as one block, so the read is repartitioned
    to force the multi-block shard path; oracle-gated
    (oracle.q_window_funcs)."""
    import ray

    from ..stages.window import window_user_events

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts", "value"])
    return window_user_events(ds.repartition(8))


def q_sessionize(sf_dir: str):
    """Gap-based sessionization (30-min gap) via the no-global-sort
    combiner shape (stages/sessions.py).  The fixture-sized input arrives
    as one parquet block, so the read is repartitioned to force the
    multi-block partial-segment → per-user-merge path that a 100 TB input
    would take naturally; oracle-gated (oracle.q_sessionize)."""
    import ray

    from ..stages.sessions import sessionize

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])
    return sessionize(ds.repartition(8))


def q_asof_join(sf_dir: str):
    """Distributed AS-OF join: every event attaches the user's most recent
    signup at or before it (one key-hash shuffle + per-key vectorized
    searchsorted; stages/asof.py).  Oracle-gated against DuckDB's native
    ASOF JOIN (oracle.q_asof_join)."""
    import ray

    from ..stages.asof import asof_join

    ensure_worker_importable()
    left = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["user_id", "ts", "event_id"])
    right = (ray.data.read_parquet(
                 f"{sf_dir}/events.parquet",
                 columns=["user_id", "ts", "event_type", "value"])
             .filter(expr="event_type == 'signup'"))
    return asof_join(left, right, key="user_id", ts_col="ts",
                     left_payload="event_id", right_payload="value",
                     out_ts="signup_ts", out_val="rate")


def q_range_join(sf_dir: str):
    """Distributed range join: purchases within 30 min after each error
    event, via interval binning (≤2 covering bins per interval, one
    bin-hash shuffle, per-bin vectorized prefix-sum probes;
    stages/rangejoin.py).  Oracle-gated against a DuckDB range-predicate
    join (oracle.q_range_join)."""
    import ray

    from ..stages.rangejoin import interval_count_join

    ensure_worker_importable()
    points = (ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                    columns=["ts", "event_type", "value"])
              .filter(expr="event_type == 'purchase'"))
    intervals = (ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                       columns=["event_id", "ts", "event_type"])
                 .filter(expr="event_type == 'error'"))
    return interval_count_join(points, intervals,
                               width_us=30 * 60 * 1_000_000)


def q_hll_registers(sf_dir: str):
    """HyperLogLog distinct-count sketch over lineitem.l_orderkey: one row
    per non-empty register (register, max trailing-zero rank).  Map-side
    per-block register maxima merge through a single 256-group aggregate —
    the shuffle moves sketch-sized data regardless of input size.  Fully
    oracle-gated (md5 registers replicate in SQL; the ESTIMATE quality is
    asserted in tests/test_operators.py against the exact distinct)."""
    import ray

    from ..stages.sketch import hll_registers

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"])
    return hll_registers(ds, "l_orderkey")


def q_hll_by_group(sf_dir: str):
    """Per-group HLL distinct-user sketch: one row per (event_type,
    non-empty register).  The map side reduces every block to ≤ groups×256
    rows with one flat scatter-max, so the shuffle is sketch-sized per
    group regardless of how many events hit each type."""
    import ray

    from ..stages.sketch import hll_group_registers

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return hll_group_registers(ds, "event_type", "user_id")


def q_distinct_per_group(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type — the exact twin of the
    q_hll_by_group sketch: per-block (type, user) dedup partials (the
    combiner — the shuffle moves distinct pairs, not events), one pair
    groupby, then a key-sized per-type count.  Oracle-gated
    (oracle.q_distinct_per_group)."""
    import ray

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        d = pd.DataFrame({"event_type": batch.column("event_type").to_pandas(),
                          "user_id": batch.column("user_id").to_numpy()})
        u = d.drop_duplicates()
        return pa.table({"event_type": pa.array(u["event_type"], pa.string()),
                         "user_id": pa.array(u["user_id"].to_numpy(), pa.int64())})

    pairs = (ds.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["event_type", "user_id"]).count())
    return (pairs.groupby("event_type").count()
            .rename_columns({"count()": "n_users"}))


def q_rollup(sf_dir: str):
    """Multi-level ROLLUP(source, lang) aggregate over documents: per-block
    combiner partials → ONE groupby on the finest level, then the coarser
    levels re-aggregate the finest AGGREGATE (key-table-sized, never the
    row stream) — the classic rollup-from-finest identity, so the raw data
    is scanned exactly once at any scale.  Oracle-gated (oracle.q_rollup,
    GROUP BY ROLLUP)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        d = pd.DataFrame({"source": batch.column("source").to_pandas(),
                          "lang": batch.column("lang").to_pandas(),
                          "n_chars": batch.column("n_chars").to_numpy()})
        g = (d.groupby(["source", "lang"], sort=False)
             .agg(n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
             .reset_index())
        return pa.table({"source": pa.array(g["source"], pa.string()),
                         "lang": pa.array(g["lang"], pa.string()),
                         "n_docs": pa.array(g["n_docs"].to_numpy(), pa.int64()),
                         "sum_chars": pa.array(g["sum_chars"].to_numpy(), pa.int64())})

    finest = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["source", "lang"])
              .aggregate(Sum("n_docs", alias_name="n_docs"),
                         Sum("sum_chars", alias_name="sum_chars")))
    f = finest.to_pandas()  # key-table-sized: |sources| × |langs| rows
    l1 = (f.groupby("source", as_index=False)[["n_docs", "sum_chars"]].sum()
          .assign(lang=None))
    l0 = pd.DataFrame({"source": [None], "lang": [None],
                       "n_docs": [f["n_docs"].sum()],
                       "sum_chars": [f["sum_chars"].sum()]})
    out = pd.concat([f, l1, l0], ignore_index=True)
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "n_docs": pa.array(out["n_docs"].to_numpy(dtype=np.int64), pa.int64()),
        "sum_chars": pa.array(out["sum_chars"].to_numpy(dtype=np.int64), pa.int64()),
    })


def _local_topk_cut(ds, cols: list[str], descending: list[bool], k: int):
    """Per-block top-k cut AFTER counts are final: the global top-k of
    per-block top-ks equals the global top-k, so the final sort sees
    blocks×k rows instead of the whole key table — at 100 TB the key
    table (users, vocabulary) is itself huge and sorting it all-to-all
    is the bottleneck this avoids."""
    asc = [not d for d in descending]

    def cut(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        df = batch.to_pandas().sort_values(cols, ascending=asc).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return ds.map_batches(cut, batch_format="pyarrow")


def q_heavy_hitters(sf_dir: str):
    """Exact global top-25 users by event count: per-block np.unique
    partial counts (map-side combiner — the shuffle moves distinct keys,
    not rows) → one groupby sum → per-block top-k cut → sort+limit over
    blocks×k rows (the key table itself never enters the sort).
    Deterministic at the k boundary via the (n DESC, user_id ASC) order."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch.column("user_id").to_numpy().astype(np.int64),
                         return_counts=True)
        return pa.table({"user_id": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("user_id").aggregate(Sum("n", alias_name="n")))
    return (_local_topk_cut(agg, ["n", "user_id"], [True, False], 25)
            .sort(["n", "user_id"], descending=[True, False]).limit(25))


def q_topk_per_group(sf_dir: str):
    """Top-3 users per event_type by count: combiner-shaped double
    aggregate — per-block (type, user) partial counts, one groupby sum,
    then a per-type head-3 (groups are key-table-sized, not row-sized)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        g = pc.dictionary_encode(batch.column("event_type"))
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        gc = g.indices.to_numpy().astype(np.int64)
        u = batch.column("user_id").to_numpy().astype(np.int64)
        if len(u) == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "user_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        key = gc * (int(u.max()) + 1) + u
        _, first, cnt = np.unique(key, return_index=True, return_counts=True)
        return pa.table({
            "event_type": pc.take(g.dictionary, pa.array(gc[first])),
            "user_id": pa.array(u[first]),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def head3(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "user_id"], ascending=[False, True],
                              kind="mergesort").head(3)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "user_id"])
            .aggregate(Sum("n", alias_name="n"))
            .groupby("event_type").map_groups(head3, batch_format="pandas"))


GROUP_QUANTILE_QS = [0.5, 0.9]


def q_group_quantiles(sf_dir: str):
    """Per-event_type discrete quantiles of integer cents (p50/p90):
    per-group np.partition selection at DuckDB quantile_disc ranks.
    Values are integer cents so selection is exact on both sides."""
    import ray

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.round(pc.multiply(batch.column("value"), 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"event_type": batch.column("event_type"),
                         "cents": c})

    def qsel(df: pd.DataFrame) -> pd.DataFrame:
        import math

        v = df["cents"].to_numpy()
        n = len(v)
        rows = []
        for q in GROUP_QUANTILE_QS:
            k = max(1, int(math.ceil(q * n))) - 1
            rows.append((df["event_type"].iloc[0], q,
                         int(np.partition(v, k)[k])))
        return pd.DataFrame(rows, columns=["event_type", "q", "value"])

    return (ds.map_batches(cents, batch_format="pyarrow")
            .groupby("event_type").map_groups(qsel, batch_format="pandas"))


DIST_JOIN_RADIUS = 0.05


def q_distance_selfjoin(sf_dir: str):
    """Spatial distance self-join: all point pairs within
    DIST_JOIN_RADIUS degrees (grid-bucket join, stages/spatial.py) —
    one cell groupby, vectorized native×probe verify per bucket."""
    from ..stages.spatial import distance_selfjoin

    ensure_worker_importable()
    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "lat"])
    return distance_selfjoin(pts, DIST_JOIN_RADIUS)


KMV_K = 128


def q_kmv_overlap(sf_dir: str):
    """K-minimum-values set-overlap sketch between orders.o_custkey and
    customer.c_custkey: the two k-min distinct-hash sketches (side, h) —
    exact-SQL-gated; the union/intersection/Jaccard estimates from
    kmv_estimate are accuracy-asserted in tests."""
    import ray

    from ..stages.sketch import kmv_overlap

    ensure_worker_importable()
    a = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey"])
    b = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"])
    return kmv_overlap(a, b, "o_custkey", "c_custkey", k=KMV_K)


def q_cms_counters(sf_dir: str):
    """Count-Min sketch counters over events.user_id: one row per non-zero
    (row, bucket) counter — mergeable bincount partials, the shuffle moves
    ≤ d×w rows regardless of input size (stages/sketch.py)."""
    import ray

    from ..stages.sketch import cms_counters

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    return cms_counters(ds, "user_id")


def q_sample_per_group(sf_dir: str):
    """Deterministic stratified sample: 20 (md5(event_id), event_id)-
    smallest events per event_type (stages/sketch.py)."""
    import ray

    from ..stages.sketch import hash_sample_per_group

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "event_id"])
    return hash_sample_per_group(ds, "event_type", "event_id", "event_id",
                                 k=20)


def q_hash_sample(sf_dir: str):
    """Deterministic bounded sample: the 100 documents with the smallest
    (md5(text), doc_id) — per-block local top-k, merge sorts only
    blocks×k rows (oracle-gated: oracle.q_hash_sample)."""
    from ..stages.sketch import hash_sample

    return hash_sample(_docs(sf_dir), "text", "doc_id", k=100)


def q_broadcast_join(sf_dir: str):
    """Fact-to-dim enrichment as an explicit BROADCAST join: the dim side
    (customer→nation map + nation names) is built once, ``ray.put`` once,
    and read per actor — never re-shipped per batch and never shuffled; the
    fact stream (orders) reduces to per-nation partials inside each batch
    (np.bincount), so the only all-to-all is the 25-row nation aggregate.
    The partitioning assumption (dim fits a worker heap) is the broadcast
    contract; a dim beyond memory takes the bloom_semijoin / hash-partition
    path instead.  Oracle-gated (oracle.q_broadcast_join)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    cust = (ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                  columns=["c_custkey", "c_nationkey"])
            .to_pandas())          # dim-sized by contract
    nat = (ray.data.read_parquet(f"{sf_dir}/nation.parquet",
                                 columns=["n_nationkey", "n_name"])
           .to_pandas().sort_values("n_nationkey"))
    ckeys = cust["c_custkey"].to_numpy()
    order_c = np.argsort(ckeys)
    ref = ray.put((ckeys[order_c],
                   cust["c_nationkey"].to_numpy().astype(np.int64)[order_c]))

    def partial(batch: pa.Table) -> pa.Table:
        keys, nat_of = ray.get(ref)
        ck = batch.column("o_custkey").to_numpy()
        cents = np.round(batch.column("o_totalprice").to_numpy() * 100.0).astype(np.int64)
        nk = nat_of[np.searchsorted(keys, ck)]
        n_orders = np.bincount(nk)
        sums = np.bincount(nk, weights=cents).astype(np.int64)
        hit = np.flatnonzero(n_orders)
        return pa.table({"n_nationkey": pa.array(hit.astype(np.int64)),
                         "n_orders": pa.array(n_orders[hit].astype(np.int64)),
                         "sum_cents": pa.array(sums[hit])})

    agg = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey", "o_totalprice"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("n_nationkey")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("sum_cents", alias_name="sum_cents"))
           .to_pandas())           # 25 rows
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    agg["n_name"] = agg["n_nationkey"].map(names)
    agg = agg.sort_values("n_name")
    return pa.table({"n_name": pa.array(agg["n_name"], pa.string()),
                     "n_orders": pa.array(agg["n_orders"].to_numpy(), pa.int64()),
                     "sum_cents": pa.array(agg["sum_cents"].to_numpy(), pa.int64())})


ZORDER_BBOX = (-1.0, 44.0, 3.0, 48.0)   # lon_min, lat_min, lon_max, lat_max
ZORDER_Z = 10


def q_zorder_range(sf_dir: str):
    """Bbox query answered the z-order-index way: the bbox becomes a small
    set of CONTIGUOUS MORTON RANGES at z10 (cover_bbox + run coalescing —
    the scan unit of a morton-clustered 100 TB layout, where each range is
    a contiguous key scan instead of a full pass), points prefilter by
    cell-in-range and then exact-verify against the bbox.  The tile mapping
    is monotone in lon / −lat, so covering cells are a superset of the bbox
    — the exact verify makes the result identical to the oracle's plain
    BETWEEN filter (oracle.q_zorder_range)."""
    from ..geo.cells import cell_encode, cover_bbox

    ensure_worker_importable()
    lon0, lat0, lon1, lat1 = ZORDER_BBOX
    cells = np.sort(cover_bbox(lon0, lat0, lon1, lat1, ZORDER_Z))
    brk = np.flatnonzero(np.diff(cells) != 1)
    los = cells[np.r_[0, brk + 1]]
    his = cells[np.r_[brk, len(cells) - 1]]

    def prefilter(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        cell = cell_encode(lon, lat, ZORDER_Z)
        mask = np.zeros(len(cell), dtype=bool)
        for lo, hi in zip(los, his):    # few coalesced ranges, vectorized
            mask |= (cell >= lo) & (cell <= hi)
        mask &= (lon >= lon0) & (lon <= lon1) & (lat >= lat0) & (lat <= lat1)
        t = batch.filter(pa.array(mask))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lon": pa.array(np.round(t.column("lon").to_numpy(), 6)),
            "lat": pa.array(np.round(t.column("lat").to_numpy(), 6)),
        })

    return (datagen.images_dataset(sf_dir)
            .select_columns(["doc_id", "lon", "lat"])
            .map_batches(prefilter, batch_format="pyarrow"))


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sample without replacement (sequential
    Poisson sampling): 100 documents with the smallest md5-uniform/weight
    priority, weight = n_chars — longer documents proportionally likelier.
    Per-block top-k partials; the merge sorts blocks×k rows.  Oracle-gated
    (oracle.q_weighted_sample)."""
    import ray

    from ..stages.sketch import weighted_sample

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "n_chars"])
    return weighted_sample(ds, weight_col="n_chars", hash_col="text",
                           id_col="doc_id", k=100)


BLOOM_PRICE_MIN = 400_000.0


def q_bloom_semijoin(sf_dir: str):
    """Bloom-filtered exact semi-join (stages/bloom.py): lineitem rows whose
    order is high-value (o_totalprice > BLOOM_PRICE_MIN), aggregated per
    order.  The Bloom bitmap (512 KiB regardless of build cardinality)
    prefilters the probe side so the only all-to-all moves survivors; false
    positives are removed by the sharded verification semi-join, so the
    output equals ANSI ``IN (SELECT ...)`` exactly."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..stages.bloom import bloom_semijoin

    ensure_worker_importable()
    big = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey", "l_extendedprice"])
    build = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_totalprice"])
             .filter(expr=f"o_totalprice > {BLOOM_PRICE_MIN}")
             .select_columns(["o_orderkey"])
             .rename_columns({"o_orderkey": "l_orderkey"}))
    kept = bloom_semijoin(big, build, "l_orderkey", m_bits=1 << 20)

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.round(pc.multiply(batch.column("l_extendedprice"), 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "cents": c})

    return (kept.map_batches(cents, batch_format="pyarrow")
            .groupby("l_orderkey")
            .aggregate(Count("cents", alias_name="n_items"),
                       Sum("cents", alias_name="sum_cents")))


QUANTILE_QS = [0.25, 0.5, 0.9, 0.95, 0.99]


def q_quantiles(sf_dir: str):
    """Exact distributed quantiles of lineitem.l_extendedprice via
    iterative histogram selection (stages/quantile.py) — no global sort;
    every shuffle moves histogram-sized data and the driver never holds
    more than final_cap candidate values per quantile."""
    import ray

    from ..stages.quantile import exact_quantiles

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_extendedprice"])
    return exact_quantiles(ds, "l_extendedprice", QUANTILE_QS,
                           bins=1024, final_cap=4096)


CONT_QS = [0.25, 0.5, 0.9, 0.99]


def q_percentile_cont(sf_dir: str):
    """Interpolated (continuous) percentiles of lineitem.l_extendedprice —
    the ``quantile_cont`` sibling of q_quantiles, built on the same
    iterative-histogram rank selection (stages/quantile.select_ranks):
    each q needs the two bracketing order statistics at 1-based ranks
    floor(q·(n−1))+1 and +2, fetched in ONE selection job (shuffles move
    histogram-sized data, never the rows), then interpolated as
    ``lo + (hi − lo) · frac`` — the identical double expression the
    oracle's window-function SQL evaluates, so the value gate is exact
    with no float tolerance.  No global sort anywhere."""
    import math

    import ray

    from ..stages.quantile import column_stats, select_ranks

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_extendedprice"])
    lo0, hi0, n = column_stats(ds, "l_extendedprice")
    pos = [q * (n - 1) for q in CONT_QS]           # double, matches SQL
    ks = [int(math.floor(p)) for p in pos]
    fracs = [p - k for p, k in zip(pos, ks)]
    # bracketing ranks, deduped so the selection job does minimal work
    want = sorted({r for k in ks for r in (k + 1, min(k + 2, n))})
    got = select_ranks(ds, "l_extendedprice", want, lo0, hi0, n,
                       bins=1024, final_cap=4096)
    at = dict(zip(want, got))
    vals = [at[k + 1] + (at[min(k + 2, n)] - at[k + 1]) * f
            for k, f in zip(ks, fracs)]
    return pd.DataFrame({"q": pd.Series(CONT_QS, dtype="float64"),
                         "value": pd.Series(vals, dtype="float64")})


PATH_K = 8   # events per user kept in the path signature


def q_event_paths(sf_dir: str):
    """Ordered string aggregation: each user's first-8-events path
    signature ('view|click|…'), the behavioral-sequence feature behind
    session modeling.  Combiner shape: every block lexsorts once on
    (user, ts, event_id) and keeps ≤8 rows per user (a per-block partial
    top-k — the shuffle carries ≤ 8·users·blocks rows, not the event
    stream), then one coarse-shard groupby re-sorts each shard flat and
    string_agg's per user.  Oracle: window row_number ≤ 8 +
    string_agg(... ORDER BY rn); (ts, event_id) is a total order so the
    path is deterministic on both sides."""
    import ray

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        eid = batch.column("event_id").to_numpy()
        order = np.lexsort((eid, ts, u))
        us = u[order]
        # per-user running index within the sorted block (vectorized)
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        idx = np.arange(len(us)) - np.repeat(starts, np.diff(np.r_[starts, len(us)]))
        keep = order[idx < PATH_K]
        t = batch.take(pa.array(keep, pa.int64()))
        return t.append_column("_shard", pa.array(
            (t.column("user_id").to_numpy() % 509).astype(np.int64)))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        idx = df.groupby("user_id", sort=False).cumcount()
        df = df[idx.to_numpy() < PATH_K]
        g = df.groupby("user_id", sort=False)
        out = g["event_type"].agg("|".join).rename("path").reset_index()
        out["n8"] = g.size().to_numpy().astype(np.int64)
        return out

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(finish, batch_format="pandas")
            .select_columns(["user_id", "path", "n8"]))


def q_events_hourly(sf_dir: str):
    """Windowed aggregate: per-user hourly event counts + value sums."""
    import ray
    from ray.data.aggregate import Count, Max, Min, Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])

    def trunc(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "hour": pc.floor_temporal(batch.column("ts"), unit="hour"),
            "value": batch.column("value"),
        })

    agg = (ds.map_batches(trunc, batch_format="pyarrow")
           .groupby(["user_id", "hour"])
           .aggregate(Count("value", alias_name="n"),
                      Sum("value", alias_name="sum_value"),
                      Min("value", alias_name="min_value"),
                      Max("value", alias_name="max_value")))

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.set_column(
            batch.column_names.index("sum_value"), "sum_value",
            pc.round(batch.column("sum_value"), ndigits=6,
                     round_mode="half_towards_infinity"))
        # timestamp[us] (after the aggregate, which normalizes key dtypes):
        # matches DuckDB's date_trunc pandas rendering for the strict gate
        return batch.set_column(batch.column_names.index("hour"), "hour",
                                pc.cast(batch.column("hour"),
                                        pa.timestamp("us")))

    return agg.map_batches(finish, batch_format="pyarrow")


def q_lineitem_pricing(sf_dir: str):
    """Relational baseline (TPC-H Q1 shape) over lineitem."""
    import ray
    from ray.data.aggregate import Count, Mean, Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])
    agg = (ds.groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("l_extendedprice", alias_name="sum_price"),
                      Mean("l_discount", alias_name="avg_disc"),
                      Count("l_quantity", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        for c in ("sum_qty", "sum_price", "avg_disc"):
            batch = batch.set_column(batch.column_names.index(c), c,
                                     pc.round(batch.column(c), ndigits=4, round_mode="half_towards_infinity"))
        return batch

    return agg.map_batches(finish, batch_format="pyarrow")


def q_places(sf_dir: str):
    """Places (lieux-dits) merge pipeline (reference core_place.py §3.2)."""
    from .places import places_dataset

    return places_dataset(sf_dir)


def q_display_expand(sf_dir: str):
    """M15: abbreviated street-name display expansion over merged voies."""
    from ..functions.display import expand_display_name
    from .cumul import cumul_voies

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "insee": batch.column("insee"),
            "fantoir": batch.column("fantoir"),
            "display_name": expand_display_name(batch.column("voie_osm")),
        })

    return cumul_voies(sf_dir).map_batches(f, batch_format="pyarrow")


def q_image_roundtrip(sf_dir: str):
    """Image payload decode/validate stage (rows-only check: PNG/lossy
    codecs are not SQL-expressible).  Asserts per-row invariants inside the
    stage output: decode_ok must hold for every row."""
    from .flagship import image_roundtrip

    return image_roundtrip(sf_dir).select_columns(
        ["image_id", "fmt", "decode_ok", "psnr_db", "mean_lum"])


def q_frame_sample(sf_dir: str):
    """Multimodal frame-sample stage: the sampler decodes only every 2nd
    frame (skipped frames never leave the container — the point of
    sampling at 100 TB) and emits the exact integer luminance sum per
    sampled frame.  VALUE-gated: frames are lossless PNG over the
    closed-form pixel field, so DuckDB replays each sampled frame's sum
    (oracle.q_frame_sample — the q_scene_cuts machinery restricted to
    fi % 2 = 0)."""
    from .flagship import frame_sample

    return frame_sample(sf_dir, step=2).sort(["video_id", "frame_idx"])


def q_audio_features(sf_dir: str):
    """Multimodal audio feature-extract stage: opaque PCM16 containers →
    per-window (RMS, zero-crossing, peak) rows in an actor pool.  Fully
    oracle-gated — the fake waveform is integer-hash arithmetic, so the
    windowed features replicate in closed-form SQL
    (oracle.q_audio_features)."""
    from .flagship import audio_features

    return audio_features(sf_dir)


def q_image_thumbs(sf_dir: str):
    """Multimodal resize/feature stage: decode → deterministic box-filter
    THUMB×THUMB thumbnail in an actor pool over the opaque binary column.
    VALUE-gated: PNG-only rows (the q_image_patches discipline), exact
    integer per-channel thumbnail-cell sums with the tie-free
    (2s + c) // (2c) box filter — DuckDB replays the whole chain from the
    closed-form pixel field (oracle.q_image_thumbs).  The full
    thumbnail-PNG emit (all formats) stays in flagship.image_thumbs,
    pinned by tests/test_codecs.py."""
    from .flagship import image_thumb_sums

    return image_thumb_sums(sf_dir)


def _addr_tags(df):
    """Per-node OSM tags for the PBF writer (module-level: pickled into
    the distributed write tasks)."""
    return [[("addr:housenumber", h), ("addr:street", s)] if h != ""
            else [("addr:street", s)]
            for h, s in zip(df["hn"], df["street"])]


def q_pbf_nodes(sf_dir: str):
    """S5: OSM PBF import — the corpus's OSM points are written to a real
    ``.osm.pbf`` (DenseNodes, delta/zigzag/packed-varint, zlib blobs) and
    read back through the distributed blob reader; output carries the
    nanodegree-quantized coordinates.  The DuckDB oracle recomputes the
    same rows (including the coordinate quantization) from documents."""
    import hashlib
    import os
    import tempfile

    from ..sources_pbf import read_pbf, write_pbf_dataset

    # Cache key must be stable across interpreter runs (builtin hash() is
    # salted) and must invalidate when the corpus is regenerated — key on
    # the absolute sf_dir plus documents.parquet's (mtime, size) fingerprint.
    doc_path = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(doc_path)
        fp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        fp = "nodoc"
    digest = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|{fp}".encode()).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(),
                        f"bano_ray_pbf_{digest}.osm.pbf")
    if not os.path.exists(path):
        # distributed write: sorted range-partitioned batches each emit
        # self-contained blobs; only part names touch the driver
        pts = (points_dataset(sf_dir).filter(expr="source == 'OSM'")
               .select_columns(["doc_id", "lon", "lat", "hn", "street"])
               .sort("doc_id"))
        write_pbf_dataset(pts, path, id_col="doc_id", tag_fn=_addr_tags)
    return (read_pbf(path)
            .select_columns(["node_id", "lon", "lat",
                             "addr_housenumber", "addr_street"])
            .sort("node_id"))


def q_communes_json(sf_dir: str):
    """Communes JSON export (reference export_json_dept_communes.sql):
    rank-1 postal pick + dims join + communes importance variant."""
    from .exports import communes_json

    return communes_json(sf_dir).sort("id")


def q_suffix_zones(sf_dir: str):
    """G6/G7/A8/M13 end-to-end: suffix-zone (hamlet) selection over BAN
    street names, circle-union zone build from sample address points, and
    the highway decoration that re-unifies the OSM merge key with the
    hamlet-carrying sources (reference bano/pre_process_suffixe.py +
    core.py:159-177).  Output: every decorated OSM highway point with its
    hamlet and the decorated merge key."""
    from .cumul import decorated_points_dataset

    return (decorated_points_dataset(sf_dir, emit_suffix=True)
            .filter(expr="suffixe != ''")
            .select_columns(["doc_id", "insee", "suffixe", "street_key"])
            .sort("doc_id"))


def q_source_counts(sf_dir: str):
    """A11 monitoring metrics: merged address rows per source + matched vs
    unmatched street counts (reference munin/bano_main:21-28,
    munin/bano_rapproche:14-16)."""
    from ray.data.aggregate import Count, Sum
    from .cumul import cumul_dataset

    ds = cumul_dataset(sf_dir)

    def f(batch: pa.Table) -> pa.Table:
        adr = pc.equal(batch.column("rec_type"), "adresse")
        matched = pc.and_(adr, pc.not_equal(batch.column("fantoir"), ""))
        return pa.table({
            "source": batch.column("source"),
            "is_adresse": pc.cast(adr, pa.int64()),
            "is_matched": pc.cast(matched, pa.int64()),
        })

    agg = (ds.map_batches(f, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("is_adresse", alias_name="n_adresses"),
                      Sum("is_matched", alias_name="n_matched")))
    # Deterministic final sort (a handful of rows) so row order can never
    # affect order-sensitive result hashing.
    return agg.filter(expr="n_adresses > 0").sort("source")


RASTER_RES = 14


def q_zone_raster(sf_dir: str):
    """Raster↔vector: rasterize each zone polygon to cells at z14 (center
    sampling) and count — checked against a closed-form arithmetic oracle
    (independent implementation: actual PIP rasterization vs index math)."""
    import ray

    ensure_worker_importable()
    zones = datagen.zone_boxes_wkb()
    ds = ray.data.from_items([{"insee": k, "wkb": w} for k, w in zones])

    def f(batch: pa.Table) -> pa.Table:
        from ..geo.raster import rasterize

        counts = [len(rasterize(w.as_py(), RASTER_RES))
                  for w in batch.column("wkb")]
        return pa.table({"insee": batch.column("insee"),
                         "n_cells": pa.array(counts, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def q_geohash(sf_dir: str):
    """Geohash encoding (geo/cells.geohash6): standard lon-first bit
    interleave → 6-char base32 cell per point, the string-keyed sibling
    of the morton/H3-style integer cells — one stateless vectorized pass.
    Oracle-gated (oracle.q_geohash unrolls the 30-bit interleave)."""
    import ray

    from ..geo.cells import geohash6

    ensure_worker_importable()

    def f(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(d)
        return pa.table({"doc_id": pa.array(d),
                         "gh": pa.array(geohash6(lon, lat), pa.string())})

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id"])
            .map_batches(f, batch_format="pyarrow"))


def q_lambert93(sf_dir: str):
    """CRS projection: WGS84 → Lambert-93 (EPSG:2154, the reference's
    native French cadastre CRS) in integer millimetres — the planar
    reprojection a tiling/rasterizing stage runs first (geo/proj.py;
    reference bano imports Lambert-93 cadastre data).  One stateless
    vectorized pass; exact-integer output so the value gate is
    tolerance-free.  Oracle-gated (oracle.q_lambert93 runs the identical
    sin/tan/ln/exp chain with the same pinned double constants)."""
    import ray

    from ..geo.proj import lambert93_mm

    ensure_worker_importable()

    def f(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(d)
        x_mm, y_mm = lambert93_mm(lon, lat)
        return pa.table({"doc_id": pa.array(d),
                         "x_mm": pa.array(x_mm),
                         "y_mm": pa.array(y_mm)})

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id"])
            .map_batches(f, batch_format="pyarrow"))


def q_phash_clusters(sf_dir: str):
    """Image near-dup cluster spectrum: connected components over the
    Hamming-≤3 phash pairs (stages/dedup.phash_neardup → stages/graph
    min-label propagation) → (label, n_images) per duplicate cluster —
    the image-side how-much-is-duplicated curation census, twin of
    q_dup_cluster_sizes.  Oracle-gated (recursive-CTE closure over the
    exact q_phash_neardup SQL)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.dedup import phash_neardup
    from ..stages.graph import connected_components

    ensure_worker_importable()
    ds = datagen.images_dataset(sf_dir).select_columns(["doc_id", "phash"])
    cc = connected_components(phash_neardup(ds, k=3), "a", "b")

    def size_partial(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy()
        uk, cnt = np.unique(lab, return_counts=True)
        return pa.table({"label": pa.array(uk),
                         "sz": pa.array(cnt.astype(np.int64))})

    return (cc.map_batches(size_partial, batch_format="pyarrow")
            .groupby("label").aggregate(Sum("sz", alias_name="n_images")))


def q_pq_codes(sf_dir: str):
    """Product-quantization code assignment over the embedding corpus
    (stages/quantize.pq_codes): 8 subspaces × 16 closed-form centroids,
    argmin in matched-op-order float64 — the codebook side of an IVF-PQ
    index; embarrassingly parallel (no shuffle).  Oracle-gated
    (oracle.q_pq_codes embeds the codebook as VALUES literals)."""
    from ..stages.quantize import pq_codes

    ensure_worker_importable()
    return pq_codes(sf_dir)


TILE_OVERLAP_Z = 10  # zoom for the zone×tile area join (~30 tiles/zone)


def q_tile_overlap(sf_dir: str):
    """Raster↔vector rectangle-intersection area join: every (zone, z10
    slippy tile) pair with positive overlap, area in Mercator tile
    units² — the coverage-weighting primitive behind tile-pyramid
    mosaicing and zonal statistics.  Computed in TILE-UNIT space so tile
    edges are exact integers; the fractional zone edges use the same
    ln/tan/cos op order as the SQL oracle (bit-equal libm, BASELINE.md
    corpus pins).  Oracle-gated (oracle.q_tile_overlap)."""
    import ray

    ensure_worker_importable()
    n = float(1 << TILE_OVERLAP_Z)
    ds = ray.data.from_items(
        [{"zi": zi, "insee": str(zi + 1).zfill(5)}
         for zi in range(datagen.NZONES)])

    def fy(lat: float) -> float:
        r = lat * (np.pi / 180.0)
        return (1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0 * n

    def f(batch: pa.Table) -> pa.Table:
        o_ins, o_x, o_y, o_a = [], [], [], []
        for zi, insee in zip(batch.column("zi").to_pylist(),
                             batch.column("insee").to_pylist()):
            x0, x1, y0, y1 = datagen.zone_box(zi)
            fx0, fx1 = (x0 + 180.0) / 360.0 * n, (x1 + 180.0) / 360.0 * n
            fya, fyb = fy(y1), fy(y0)        # tile y grows southward
            xs = np.arange(int(np.floor(fx0)), int(np.ceil(fx1)),
                           dtype=np.int64)
            ys = np.arange(int(np.floor(fya)), int(np.ceil(fyb)),
                           dtype=np.int64)
            w = np.minimum(fx1, xs + 1.0) - np.maximum(fx0, xs)
            h = np.minimum(fyb, ys + 1.0) - np.maximum(fya, ys)
            area = np.round(w[:, None] * h[None, :], 9)
            keep = (w[:, None] > 0) & (h[None, :] > 0)
            kx, ky = np.nonzero(keep)
            o_ins.append(np.full(len(kx), insee, dtype=object))
            o_x.append(xs[kx])
            o_y.append(ys[ky])
            o_a.append(area[kx, ky])
        return pa.table({
            "insee": pa.array(np.concatenate(o_ins), pa.string()),
            "tile_x": pa.array(np.concatenate(o_x)),
            "tile_y": pa.array(np.concatenate(o_y)),
            "area": pa.array(np.concatenate(o_a)),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def q_pii_redact(sf_dir: str):
    """PII scan/redaction over documents (stages/text.py pii_redact_batch):
    plant the deterministic contact line on every third doc, then one
    stateless vectorized RE2 pass — counts + redacted length, no shuffle.
    Oracle-gated (oracle.q_pii_redact; same regex literals run in DuckDB)."""
    import ray

    from ..stages.text import pii_plant, pii_redact_batch

    ensure_worker_importable()
    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
            .map_batches(pii_plant, batch_format="pyarrow")
            .map_batches(pii_redact_batch, batch_format="pyarrow"))


def q_group_moments(sf_dir: str):
    """Per-event_type mergeable moments (count, Σcents, Σcents²) — the
    combiner shape for distributed mean/variance: per-block bincount
    partials over dictionary codes, one key-table-sized groupby sum.  All
    integer (exact under any distribution order; Σcents² headroom to
    ~2.9e9 rows/group at max |value| 560.21 before int64 overflow — the
    100 TB form switches to a base-1e9 split of the same partials).
    Oracle-gated (oracle.q_group_moments)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        g = pc.dictionary_encode(batch.column("event_type"))
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = g.indices.to_numpy().astype(np.int64)
        cents = np.round(batch.column("value").to_numpy() * 100.0).astype(np.int64)
        nbins = len(g.dictionary)
        n = np.bincount(codes, minlength=nbins)
        s = np.bincount(codes, weights=cents.astype(np.float64),
                        minlength=nbins).astype(np.int64)
        s2 = np.bincount(codes, weights=(cents * cents).astype(np.float64),
                         minlength=nbins).astype(np.int64)
        return pa.table({"event_type": g.dictionary,
                         "n": pa.array(n.astype(np.int64)),
                         "sum_cents": pa.array(s),
                         "sumsq_cents": pa.array(s2)})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_cents", alias_name="sum_cents"),
                       Sum("sumsq_cents", alias_name="sumsq_cents")))


def q_delta_upsert(sf_dir: str):
    """Snapshot delta-upsert (stages/upsert.py): base = orders as cents
    (version 0), delta = every 7th order repriced +1111 cents (version 1);
    last-wins per o_orderkey via map-side pre-reduce + one coarse-shard
    resolve.  Oracle-gated (oracle.q_delta_upsert = ROW_NUMBER over the
    same union)."""
    import ray

    from ..stages.upsert import upsert_latest

    ensure_worker_importable()

    def base_tag(batch: pa.Table) -> pa.Table:
        cents = np.round(batch.column("o_totalprice").to_numpy() * 100.0).astype(np.int64)
        n = len(cents)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "cents": pa.array(cents),
                         "src": pa.array(np.zeros(n, dtype=np.int64))})

    def delta_tag(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").to_numpy()
        keep = keys % 7 == 0
        cents = np.round(batch.column("o_totalprice").to_numpy() * 100.0).astype(np.int64)
        return pa.table({"o_orderkey": pa.array(keys[keep]),
                         "cents": pa.array(cents[keep] + 1111),
                         "src": pa.array(np.ones(int(keep.sum()), dtype=np.int64))})

    cols = ["o_orderkey", "o_totalprice"]
    base = (ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)
            .map_batches(base_tag, batch_format="pyarrow"))
    delta = (ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)
             .map_batches(delta_tag, batch_format="pyarrow"))
    return upsert_latest(base.union(delta), key="o_orderkey",
                         version="src", payload=["cents"])


def q_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (stages/text.repetition_batch):
    per-doc token count, distinct tokens, top-token fraction, duplicate
    fraction — all batch-local, never shuffles.  Oracle-gated
    (oracle.q_repetition = unnest + per-(doc,tok) groupby)."""
    import ray

    from ..stages.text import repetition_batch

    ensure_worker_importable()
    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
            .map_batches(repetition_batch, batch_format="pyarrow"))


KANON_K = 5
KANON_LEN_BUCKET = 50


DP_EPSILON = 1.0


def q_dp_counts(sf_dir: str):
    """Differential-privacy release harness: per-event-type counts with
    Laplace(1/ε) noise drawn by INVERSE-CDF from a deterministic md5
    seed of the group key — the engine seam where a production release
    swaps in true randomness; the deterministic draw makes the whole
    mechanism value-testable (and is exactly how DP unit tests pin
    their noise).  Combiner count + a stateless finish.  Oracle-gated
    (oracle.q_dp_counts)."""
    import ray
    from ray.data.aggregate import Count

    from ..stages.dedup import _md5_u64_many

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type"])
    agg = ds.groupby("event_type").aggregate(
        Count("event_id", alias_name="n"))

    def finish(batch: pa.Table) -> pa.Table:
        keys = batch.column("event_type").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy().astype(np.int64)
        u = (_md5_u64_many(np.asarray(keys, dtype=object)).astype(np.float64)
             / 18446744073709551616.0)
        b = 1.0 / DP_EPSILON
        c = u - 0.5
        noise = -b * np.sign(c) * np.log(1.0 - 2.0 * np.abs(c))
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": pa.array(n),
            "noise": pa.array(np.round(noise, 6)),
            "noisy_n": pa.array(np.round(n + noise, 6))})

    return agg.map_batches(finish, batch_format="pyarrow")


def q_k_anonymity(sf_dir: str):
    """k-anonymity census over the quasi-identifier tuple
    (lang_pred, source = doc_id % 4, n_chars // 50): group-size spectrum
    (qi_size, n_groups, n_docs) plus the per-size re-identifiable flag
    (size < KANON_K) — the privacy audit a corpus release runs.  Combiner
    shape: per-block distinct-QI partial counts → one QI-sized groupby →
    a count-of-counts groupby (both dim-bounded).  Oracle-gated
    (oracle.q_k_anonymity)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.text import langid_batch

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def qi_partial(batch: pa.Table) -> pa.Table:
        lang = langid_batch(batch).column("lang_pred").to_numpy(
            zero_copy_only=False)
        did = batch.column("doc_id").to_numpy().astype(np.int64)
        nch = pc.utf8_length(batch.column("text")).to_numpy().astype(np.int64)
        src = did % 4
        lb = nch // KANON_LEN_BUCKET
        df = pd.DataFrame({"lang": lang, "source": src, "len_bucket": lb})
        g = df.groupby(["lang", "source", "len_bucket"], sort=False)               .size().reset_index(name="n")
        return pa.table({
            "lang": pa.array(g["lang"], pa.string()),
            "source": pa.array(g["source"].to_numpy().astype(np.int64)),
            "len_bucket": pa.array(g["len_bucket"].to_numpy()
                                   .astype(np.int64)),
            "n": pa.array(g["n"].to_numpy().astype(np.int64))})

    groups = (ds.map_batches(qi_partial, batch_format="pyarrow")
              .groupby(["lang", "source", "len_bucket"])
              .aggregate(Sum("n", alias_name="n")))

    def size_partial(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy().astype(np.int64)
        u, c = np.unique(n, return_counts=True)
        return pa.table({"qi_size": pa.array(u),
                         "n_groups": pa.array(c.astype(np.int64)),
                         "n_docs": pa.array((u * c).astype(np.int64))})

    agg = (groups.map_batches(size_partial, batch_format="pyarrow")
           .groupby("qi_size")
           .aggregate(Sum("n_groups", alias_name="n_groups"),
                      Sum("n_docs", alias_name="n_docs")))

    def finish(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "reidentifiable",
            pc.less(batch.column("qi_size"), KANON_K))

    return agg.map_batches(finish, batch_format="pyarrow").sort("qi_size")


def q_watermark(sf_dir: str):
    """LLM-watermark (greenlist) detection census per document
    (stages/text.watermark_batch): fraction of adjacent-token pairs
    whose md5 is even + the detection z-score — the synthetic-text
    screen a training-data pipeline runs before ingesting web text.
    Stateless vectorized map, md5 once per unique pair.  Oracle-gated
    (oracle.q_watermark)."""
    import ray

    from ..stages.text import watermark_batch

    ensure_worker_importable()
    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
            .map_batches(watermark_batch, batch_format="pyarrow"))


def q_filter_funnel(sf_dir: str):
    """Curation filter CASCADE census — the RefinedWeb/FineWeb-style
    recipe assembled from the standalone signals: language gate
    (lang_pred != 'und') → quality score (> QF_QUALITY_MIN) →
    repetition gate (dup_frac <= QF_DUP_MAX) → PII gate (no
    email/phone matches on the planted text), applied in order, with
    per-stage attrition counts (stage, n_in, n_kept, n_dropped).

    Shape: ONE stateless map_batches pass computes every signal with the
    exact kernels the standalone queries gate; the shuffle moves one
    5-int combiner row per block (Sum aggregate), and the 4-row output
    is assembled from the aggregate — at 100 TB this is a single
    corpus scan.  Oracle-gated (oracle.q_filter_funnel)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.text import FUNNEL_STAGES, funnel_partial

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    agg = (ds.map_batches(funnel_partial, batch_format="pyarrow")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      *[Sum(f"k{i}", alias_name=f"k{i}")
                        for i in (1, 2, 3, 4)]))
    ks = [int(agg["n_docs"])] + [int(agg[f"k{i}"]) for i in (1, 2, 3, 4)]
    return pd.DataFrame({
        "stage_idx": np.arange(len(FUNNEL_STAGES), dtype=np.int64),
        "stage": FUNNEL_STAGES,
        "n_in": np.asarray(ks[:-1], dtype=np.int64),
        "n_kept": np.asarray(ks[1:], dtype=np.int64),
        "n_dropped": np.asarray(ks[:-1], dtype=np.int64)
        - np.asarray(ks[1:], dtype=np.int64),
    })


def q_decontaminate(sf_dir: str):
    """Benchmark n-gram decontamination (stages/text.decontaminate): the
    1/97 doc_id slice plays the benchmark suite; its first-3-token n-grams
    are collected (benchmark-sized, never corpus-sized), broadcast via
    ray.put, and probed per batch with vectorized match_substring.
    Oracle-gated (oracle.q_decontaminate = contains() join)."""
    import ray

    from ..stages.text import DECON_MOD, decontaminate

    ensure_worker_importable()

    def bench_filter(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy()
        return batch.filter(pa.array(did % DECON_MOD == 0))

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    bench = docs.map_batches(bench_filter, batch_format="pyarrow")
    return decontaminate(docs, bench)


def q_salted_join(sf_dir: str):
    """Skew-proof shuffle join (stages/join.salted_repartition_join): the
    fact side is orders with an ARTIFICIALLY hot join key (70% of rows on
    key 1 — `o_orderkey % 10 < 7`), joined per-row to customer.  Salting
    by the fact's unique id spreads the hot key over 16 shards; the dim
    side replicates 16× (bounded).  Oracle-gated (oracle.q_salted_join =
    the plain SQL inner join)."""
    import ray

    from ..stages.join import salted_repartition_join

    ensure_worker_importable()

    def fact_prep(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy()
        ck = batch.column("o_custkey").to_numpy()
        k = np.where(ok % 10 < 7, 1, ck).astype(np.int64)
        cents = np.round(batch.column("o_totalprice").to_numpy() * 100.0
                         ).astype(np.int64)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "k": pa.array(k), "cents": pa.array(cents)})

    fact = (ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(fact_prep, batch_format="pyarrow"))
    dim = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                columns=["c_custkey", "c_nationkey"])
    return salted_repartition_join(fact, dim, key="k", dim_key="c_custkey",
                                   salt_from="o_orderkey",
                                   dim_cols=["c_nationkey"], n_salt=16)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_sliding(sf_dir: str):
    """Hopping-window aggregate (2h windows every 1h): each event lands in
    the window starting at its hour and the one before.  Per-block partial
    (np.unique over window ids) → one window-table-sized groupby — the
    shuffle moves distinct windows, not events.  Exact integer cents.
    Oracle-gated (oracle.q_events_sliding = UNION ALL of the two shifts)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])
    US_H = np.int64(3_600_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        h = batch.column("ts").cast(pa.int64()).to_numpy() // US_H
        cents = np.round(batch.column("value").to_numpy() * 100.0).astype(np.int64)
        win = np.concatenate([h, h - 1])
        c2 = np.concatenate([cents, cents])
        uniq, inv = np.unique(win, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.bincount(inv, weights=c2.astype(np.float64),
                        minlength=len(uniq)).astype(np.int64)
        return pa.table({"win_h": pa.array(uniq), "n": pa.array(n),
                         "sum_cents": pa.array(s)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("win_h")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_cents", alias_name="sum_cents")))

    def finish(batch: pa.Table) -> pa.Table:
        ts = (batch.column("win_h").to_numpy() * US_H)
        return pa.table({
            "win_start": pa.array(ts.astype("datetime64[us]")),
            "n": batch.column("n"),
            "sum_cents": batch.column("sum_cents")})

    return agg.map_batches(finish, batch_format="pyarrow")


def q_pivot(sf_dir: str):
    """Pivot (conditional aggregation): per-day columns <type>_n and
    <type>_cents for the five pinned event types.  Per-block partial:
    one flat bincount over day_code×5+type_code, reshaped — the shuffle
    moves day-table-sized partials.  Unknown types fail loudly.
    Oracle-gated (oracle.q_pivot = SUM(CASE ...) per type)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])
    US_D = np.int64(86_400_000_000)
    k = len(EVENT_TYPES)

    def partial(batch: pa.Table) -> pa.Table:
        day = batch.column("ts").cast(pa.int64()).to_numpy() // US_D
        tcode = pd.Categorical(batch.column("event_type").to_pandas(),
                               categories=EVENT_TYPES).codes.astype(np.int64)
        if (tcode < 0).any():
            raise ValueError("unknown event_type in pivot")
        cents = np.round(batch.column("value").to_numpy() * 100.0).astype(np.int64)
        uniq, inv = np.unique(day, return_inverse=True)
        flat = inv * k + tcode
        n = np.bincount(flat, minlength=len(uniq) * k).reshape(-1, k)
        s = np.bincount(flat, weights=cents.astype(np.float64),
                        minlength=len(uniq) * k).astype(np.int64).reshape(-1, k)
        cols = {"day_idx": pa.array(uniq)}
        for j, t in enumerate(EVENT_TYPES):
            cols[f"{t}_n"] = pa.array(n[:, j].astype(np.int64))
            cols[f"{t}_cents"] = pa.array(s[:, j])
        return pa.table(cols)

    aggs = []
    for t in EVENT_TYPES:
        aggs.append(Sum(f"{t}_n", alias_name=f"{t}_n"))
        aggs.append(Sum(f"{t}_cents", alias_name=f"{t}_cents"))
    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("day_idx").aggregate(*aggs))

    def finish(batch: pa.Table) -> pa.Table:
        ts = batch.column("day_idx").to_numpy() * US_D
        out = {"day": pa.array(ts.astype("datetime64[us]"))}
        for t in EVENT_TYPES:
            out[f"{t}_n"] = batch.column(f"{t}_n")
            out[f"{t}_cents"] = batch.column(f"{t}_cents")
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def q_window_ranks(sf_dir: str):
    """Rank-family windows per user (stages/window.window_ranks): RANK /
    DENSE_RANK / PERCENT_RANK over (user, ORDER BY cents) and NTILE(4)
    over the tie-broken (cents, event_id) order.  Oracle-gated
    (oracle.q_window_ranks)."""
    import ray

    from ..stages.window import window_ranks

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "value"])
    return window_ranks(ds.repartition(8), n_tiles=4)


def q_bigram_lm(sf_dir: str):
    """Bigram-LM quality scoring (stages/text.bigram_lm_score): corpus
    bigram MLE broadcast via ray.put, per-doc mean log-probability in one
    batch-local rescore pass.  Oracle-gated (oracle.q_bigram_lm)."""
    import ray

    from ..stages.text import bigram_lm_score

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return bigram_lm_score(ds)


def q_pagerank(sf_dir: str):
    """PageRank over the bipartite user<->item click graph
    (stages/pagerank.pagerank): each event row yields two directed edges
    user -> item and item -> user (item = props "k" mod 100, offset by
    n_users), so the edge stream is built batch-locally with zero joins;
    rank iterations stream the edge set with node-vector broadcast +
    bincount partials.  Oracle-gated (oracle.q_pagerank unrolls the 3
    iterations as CTEs)."""
    import ray

    from ..stages.pagerank import N_ITEMS, pagerank

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "props"])
    n_users = int(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]).max("user_id")) + 1

    def edges_fn(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        ks = pc.extract_regex(batch.column("props"),
                              pattern='"k": (?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(ks, "k"), pa.int64()).to_numpy()
        item = n_users + (k % N_ITEMS)
        return pa.table({
            "src": pa.array(np.concatenate([u, item]), pa.int64()),
            "dst": pa.array(np.concatenate([item, u]), pa.int64()),
        })

    edges = ds.map_batches(edges_fn, batch_format="pyarrow")
    return pagerank(edges, n_nodes=n_users + N_ITEMS)


BFS_SEED_MOD = 53    # seed users: user_id % 53 == 0 (among users w/ events)
BFS_MAX_DEPTH = 4


def q_bfs_levels(sf_dir: str):
    """Multi-source BFS hop levels over the bipartite user<->item click
    graph (stages/graph.bfs_levels): synchronous Bellman-Ford rounds —
    the edge stream is re-read per round emitting node-sized integer
    min-partials, the level vector broadcasts via ray.put.  Seeds are
    event-observed users with user_id % BFS_SEED_MOD == 0.  Exact-integer;
    oracle-gated (oracle.q_bfs_levels via a recursive UNION-distinct CTE)."""
    import ray

    from ..stages.graph import bfs_levels
    from ..stages.pagerank import N_ITEMS

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "props"])
    n_users = int(ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]).max("user_id")) + 1

    def edges_fn(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        ks = pc.extract_regex(batch.column("props"),
                              pattern='"k": (?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(ks, "k"), pa.int64()).to_numpy()
        item = n_users + (k % N_ITEMS)
        return pa.table({
            "src": pa.array(np.concatenate([u, item]), pa.int64()),
            "dst": pa.array(np.concatenate([item, u]), pa.int64()),
        })

    edges = ds.map_batches(edges_fn, batch_format="pyarrow")

    # seed mask: users OBSERVED in events (deg > 0) with id % mod == 0 —
    # one tiny distinct-users aggregate, node-table-sized
    def users_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column("user_id").to_numpy())
        return pa.table({"user_id": pa.array(u)})

    seen = (ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                  columns=["user_id"])
            .map_batches(users_partial, batch_format="pyarrow")
            .groupby("user_id").count().to_pandas()["user_id"].to_numpy())
    seed_mask = np.zeros(n_users + N_ITEMS, dtype=bool)
    seed_mask[seen[seen % BFS_SEED_MOD == 0]] = True
    return bfs_levels(edges, seed_mask, max_depth=BFS_MAX_DEPTH)


def q_fuzzy_streets(sf_dir: str):
    """Blocked edit-distance fuzzy street-key matching
    (stages/fuzzy.fuzzy_key_pairs): pairs of DISTINCT normalized street
    keys sharing a 4-char block with Levenshtein distance <= 5 — the fuzzy
    tier of the reference's street-name linkage (its exact tier is the
    normalize()-key merge, reference bano/models.py AdressesDept match
    loops).  Distinct keys via per-block unique partials + one groupby;
    pair generation + vectorized Wagner-Fischer inside coarse shards.
    Oracle-gated (oracle.q_fuzzy_streets uses DuckDB levenshtein())."""
    from ..stages.fuzzy import fuzzy_key_pairs

    def key_partial(batch: pa.Table) -> pa.Table:
        ks = batch.column("street_key")
        ks = ks.drop_null().unique()
        return pa.table({"key": ks})

    keys = (parsed_dataset(sf_dir).select_columns(["street_key"])
            .map_batches(key_partial, batch_format="pyarrow")
            .groupby("key").count().select_columns(["key"]))
    return fuzzy_key_pairs(keys, k=5, prefix=4).sort(["a", "b"])


def q_group_outliers(sf_dir: str):
    """Per-group z-score outliers (|value − μ_g| > 2σ_g) over events —
    the canonical two-phase broadcast shape: phase 1 is the mergeable
    moments combiner of q_group_moments (count/Σcents/Σcents² per
    event_type — a key-table-sized shuffle), phase 2 broadcasts that tiny
    stats table via ``ray.put`` and flags rows in one stateless
    ``map_batches`` pass — the row stream is never shuffled.

    Determinism without float tolerance: both sides evaluate the SAME
    double expression tree over EXACTLY equal integers (n, Σ, Σ² are
    order-independent int sums): flag iff (n·x − S)² > 4·(n·S2 − S²),
    every operand cast to double in the same order, so engine and oracle
    round identically bit for bit.  Oracle-gated (oracle.q_group_outliers).
    """
    import ray

    ensure_worker_importable()
    stats = q_group_moments(sf_dir).to_pandas()   # key-table-sized
    stats_ref = ray.put({
        r.event_type: (float(r.n), float(r.sum_cents), float(r.sumsq_cents))
        for r in stats.itertuples()})

    class Flag:
        def __init__(self, ref):
            self.stats = ray.get(ref) if not isinstance(ref, dict) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            g = batch.column("event_type").to_numpy(zero_copy_only=False)
            cents = np.round(
                batch.column("value").to_numpy() * 100.0).astype(np.int64)
            n = np.empty(len(g)); s = np.empty(len(g)); s2 = np.empty(len(g))
            for grp, (gn, gs, gs2) in self.stats.items():
                m = g == grp
                n[m], s[m], s2[m] = gn, gs, gs2
            a = n * cents.astype(np.float64) - s
            d = n * s2 - s * s
            hit = (a * a) > (4.0 * d)
            return pa.table({
                "event_id": batch.column("event_id").filter(pa.array(hit)),
                "event_type": batch.column("event_type").filter(pa.array(hit)),
                "cents": pa.array(cents[hit]),
            })

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type", "value"])
    return ds.map_batches(Flag, batch_format="pyarrow", concurrency=(1, 8),
                          fn_constructor_kwargs={"ref": stats_ref})


def q_outer_join(sf_dir: str):
    """Distributed FULL OUTER join of two aggregate streams in ONE shuffle
    (tagged-union co-aggregation): orders grouped by o_custkey vs events
    grouped by user_id*11 (the ×11 spreads the event keys past the
    customer domain so all three outer cases — left-only, right-only,
    both — occur).  Each side emits per-block combiner partials into one
    UNIFIED schema with the other side's measures null; a single
    groupby(key) Sum merges partials AND performs the outer join, because
    Sum over an all-null group is null — exactly outer semantics.  No
    row-level shuffle, no driver materialization beyond the key table.
    Oracle-gated (oracle.q_outer_join = plain FULL OUTER JOIN)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()

    def orders_partial(batch: pa.Table) -> pa.Table:
        k = batch.column("o_custkey").to_numpy()
        cents = np.round(
            batch.column("o_totalprice").to_numpy() * 100.0).astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        n = np.bincount(inv)
        s = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        m = len(uk)
        return pa.table({
            "key": pa.array(uk.astype(np.int64)),
            "n_orders": pa.array(n.astype(np.int64)),
            "total_cents": pa.array(s),
            "n_events": pa.nulls(m, pa.int64()),
            "value_cents": pa.nulls(m, pa.int64()),
        })

    def events_partial(batch: pa.Table) -> pa.Table:
        k = batch.column("user_id").to_numpy() * 11
        cents = np.round(
            batch.column("value").to_numpy() * 100.0).astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        n = np.bincount(inv)
        s = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        m = len(uk)
        return pa.table({
            "key": pa.array(uk.astype(np.int64)),
            "n_orders": pa.nulls(m, pa.int64()),
            "total_cents": pa.nulls(m, pa.int64()),
            "n_events": pa.array(n.astype(np.int64)),
            "value_cents": pa.array(s),
        })

    a = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])
         .map_batches(orders_partial, batch_format="pyarrow"))
    b = (ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])
         .map_batches(events_partial, batch_format="pyarrow"))
    agg = (a.union(b).groupby("key")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("total_cents", alias_name="total_cents"),
                      Sum("n_events", alias_name="n_events"),
                      Sum("value_cents", alias_name="value_cents")))

    def finish(batch: pa.Table) -> pa.Table:
        # float64-with-NaN: matches the pandas rendering of the oracle's
        # nullable FULL OUTER measures (dtype-strict gate); counts are
        # < 2^53 so the float64 widening is exact
        cols = {"key": batch.column("key")}
        for c in ("n_orders", "total_cents", "n_events", "value_cents"):
            cols[c] = pc.cast(batch.column(c), pa.float64())
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


def q_train_split(sf_dir: str):
    """Deterministic train/val/test split — the ML-pipeline staple: every
    doc hashes to a split by md5(doc_id) % 100 (< 80 train, < 90 val, else
    test), so assignment is stable across runs, machines and partitionings
    (no RNG state, no coordination).  The query returns per-(split, lang)
    counts via per-block combiner partials; the row-level assignment
    itself is the reusable part (a writer fans the three streams to
    partitioned parquet).  Oracle-gated (oracle.q_train_split uses the
    same DuckDB md5_number_lower convention as the dedup family)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.dedup import _md5_u64_ints

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        h = _md5_u64_ints(batch.column("doc_id").to_numpy()) % np.uint64(100)
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(split.astype("U8"), "|"),
                          lang.astype("U8"))
        uk, counts = np.unique(key, return_counts=True)
        sp = np.array([k.split("|")[0] for k in uk])
        lg = np.array([k.split("|")[1] for k in uk])
        return pa.table({"split": pa.array(sp), "lang": pa.array(lg),
                         "n_docs": pa.array(counts.astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["split", "lang"])
            .aggregate(Sum("n_docs", alias_name="n_docs")))


def q_char_entropy(sf_dir: str):
    """Per-doc character Shannon entropy (stages/text.char_entropy_batch):
    stateless vectorized map_batches, no shuffle — the distribution-quality
    twin of q_quality/q_repetition.  Oracle-gated (oracle.q_char_entropy:
    same H = log2(n) − Σc·log2(c)/n over exact counts, rounded to 6)."""
    import ray

    from ..stages.text import char_entropy_batch

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(char_entropy_batch, batch_format="pyarrow")


def q_cube(sf_dir: str):
    """CUBE(source, lang) aggregate from finest-level partials — the
    rollup-family completion: the raw stream is scanned ONCE into the
    finest (source, lang) aggregate (per-block combiner partials, one
    key-table-sized shuffle); all 2² grouping sets re-aggregate that tiny
    table driver-side.  Oracle-gated (oracle.q_cube, GROUP BY CUBE)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        d = pd.DataFrame({"source": batch.column("source").to_pandas(),
                          "lang": batch.column("lang").to_pandas(),
                          "n_chars": batch.column("n_chars").to_numpy()})
        g = (d.groupby(["source", "lang"], sort=False)
             .agg(n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
             .reset_index())
        return pa.table({"source": pa.array(g["source"], pa.string()),
                         "lang": pa.array(g["lang"], pa.string()),
                         "n_docs": pa.array(g["n_docs"].to_numpy(), pa.int64()),
                         "sum_chars": pa.array(g["sum_chars"].to_numpy(),
                                               pa.int64())})

    finest = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["source", "lang"])
              .aggregate(Sum("n_docs", alias_name="n_docs"),
                         Sum("sum_chars", alias_name="sum_chars"))
              .to_pandas())          # key-table-sized
    agg_cols = ["n_docs", "sum_chars"]
    by_src = (finest.groupby("source", as_index=False)[agg_cols].sum()
              .assign(lang=None))
    by_lang = (finest.groupby("lang", as_index=False)[agg_cols].sum()
               .assign(source=None))
    grand = pd.DataFrame({"source": [None], "lang": [None],
                          "n_docs": [finest["n_docs"].sum()],
                          "sum_chars": [finest["sum_chars"].sum()]})
    out = pd.concat([finest, by_src, by_lang, grand], ignore_index=True)
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "n_docs": pa.array(out["n_docs"].to_numpy(np.int64)),
        "sum_chars": pa.array(out["sum_chars"].to_numpy(np.int64))})


def q_histogram(sf_dir: str):
    """Fixed-bin histogram of order totals ($25k bins over exact cents):
    per-block ``np.bincount`` partials → one bin-table-sized groupby —
    the O(1)-shuffle profile primitive every data-quality pass needs.
    Oracle-gated (oracle.q_histogram; integer floor-div on cents is exact
    on both sides)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    width = 2_500_000   # cents = $25,000
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.round(
            batch.column("o_totalprice").to_numpy() * 100.0).astype(np.int64)
        b = cents // width
        nb = int(b.max()) + 1 if len(b) else 0
        c = np.bincount(b, minlength=nb)
        nz = np.flatnonzero(c)
        return pa.table({"bin": pa.array(nz.astype(np.int64)),
                         "n": pa.array(c[nz].astype(np.int64))})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bin").aggregate(Sum("n", alias_name="n")))

    def lo(batch: pa.Table) -> pa.Table:
        b = batch.column("bin").to_numpy()
        return batch.append_column("lo_cents", pa.array(b * width))

    return out.map_batches(lo, batch_format="pyarrow")


def q_corr_by_group(sf_dir: str):
    """Per-group Pearson correlation (quantity vs discount per
    l_returnflag) from EXACT bilinear moments: per-block bincount partials
    of (n, Σx, Σy, Σxy, Σx², Σy²) over integer cents — order-independent
    exact ints (bounded domain: qty ≤ 50·100, disc ≤ 10 cents, so Σ
    headroom is ~3.7e11 rows/group) — then one key-table-sized shuffle and
    a SHARED double expression for r (same cast order both sides, rounded
    to 6).  Oracle-gated (oracle.q_corr_by_group uses the explicit
    formula, not corr(), to pin the float path)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        g = pc.dictionary_encode(batch.column("l_returnflag"))
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = g.indices.to_numpy().astype(np.int64)
        x = np.round(batch.column("l_quantity").to_numpy() * 100.0
                     ).astype(np.int64)
        y = np.round(batch.column("l_discount").to_numpy() * 100.0
                     ).astype(np.int64)
        nb = len(g.dictionary)

        def bc(w):
            return np.bincount(codes, weights=w.astype(np.float64),
                               minlength=nb).astype(np.int64)

        return pa.table({
            "grp": g.dictionary,
            "n": pa.array(np.bincount(codes, minlength=nb).astype(np.int64)),
            "sx": pa.array(bc(x)), "sy": pa.array(bc(y)),
            "sxy": pa.array(bc(x * y)),
            "sx2": pa.array(bc(x * x)), "sy2": pa.array(bc(y * y))})

    m = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("grp")
         .aggregate(*[Sum(c, alias_name=c)
                      for c in ["n", "sx", "sy", "sxy", "sx2", "sy2"]])
         .to_pandas())
    n = m["n"].to_numpy(np.float64)
    sx = m["sx"].to_numpy(np.float64); sy = m["sy"].to_numpy(np.float64)
    sxy = m["sxy"].to_numpy(np.float64)
    sx2 = m["sx2"].to_numpy(np.float64); sy2 = m["sy2"].to_numpy(np.float64)
    r = (n * sxy - sx * sy) / (np.sqrt(n * sx2 - sx * sx)
                               * np.sqrt(n * sy2 - sy * sy))
    return pd.DataFrame({"grp": m["grp"], "n": m["n"].astype(np.int64),
                         "corr": np.round(r, 6)}).sort_values("grp")


def q_embed_centroids(sf_dir: str):
    """Per-label embedding centroid — the k-means/cluster-profile building
    block as a VECTOR-VALUED combiner: each block stacks its (64-dim
    float32) vectors once and emits per-(label, dim) partial sums via a
    single bincount over label·64+dim keys; the shuffle carries
    labels×64 rows.  Output one row per (label, dim) so the driver gate
    compares scalars.  Oracle-gated (oracle.q_embed_centroids; both sides
    sum exact float32→float64 casts, order drift ≪ the 1e-6 rounding)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    dim = 64
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy().astype(np.int64)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy().astype(np.float64)  # (n*dim,)
        ul, inv = np.unique(lab, return_inverse=True)
        nl = len(ul)
        key = np.repeat(inv * dim, dim) + np.tile(np.arange(dim), len(lab))
        s = np.bincount(key, weights=flat, minlength=nl * dim)
        cnt = np.bincount(inv, minlength=nl)
        return pa.table({
            "label": pa.array(np.repeat(ul, dim)),
            "idx": pa.array(np.tile(np.arange(dim, dtype=np.int64), nl)),
            "s": pa.array(s),
            "n": pa.array(np.repeat(cnt, dim).astype(np.int64))})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["label", "idx"])
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
           .to_pandas())              # labels×64 rows
    out["mean_val"] = np.round(out["s"].to_numpy() / out["n"].to_numpy(), 6)
    return out[["label", "idx", "mean_val"]].sort_values(["label", "idx"])


def q_vocab_topk(sf_dir: str):
    """Vocabulary building — the BPE-merge-step primitive: global top-100
    word BIGRAMS by count over the corpus.  Per-block factorized bigram
    partials (stages/text.bigram_count_partial — the shuffle moves the
    distinct-bigram table, never token streams) → one groupby sum →
    per-block top-k cut → sort+limit over blocks×k rows (the vocab table
    itself never enters the final sort); the (c DESC, bg ASC) order pins
    the k boundary.  Oracle-gated (oracle.q_vocab_topk)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.text import bigram_count_partial

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    agg = (ds.map_batches(bigram_count_partial, batch_format="pyarrow")
           .groupby("bg").aggregate(Sum("c", alias_name="c")))
    return (_local_topk_cut(agg, ["c", "bg"], [True, False], 100)
            .sort(["c", "bg"], descending=[True, False]).limit(100))


def q_chunk_dedup(sf_dir: str):
    """Corpus-level exact duplicated-chunk removal (stages/chunkdedup.py):
    every 16-word chunk that occurs in >= 2 distinct documents keeps only
    its global first occurrence; documents are re-assembled from their
    surviving chunks.  The ExactSubstr-style boilerplate cleaner a
    training-data pipeline runs AFTER doc-level dedup — oracle-gated
    (oracle.q_chunk_dedup is the literal windowed-SQL twin)."""
    from ..stages.chunkdedup import chunk_dedup

    return chunk_dedup(_docs(sf_dir))


def q_spatial_clusters(sf_dir: str):
    """Spatial single-linkage clustering (DBSCAN with minPts=1): points
    chained by <= DIST_JOIN_RADIUS hops share a cluster label.  Composes
    the grid-bucket distance self-join (stages/spatial.py) with
    distributed connected components (stages/graph.py); singleton points
    enter as self-edges so every point is labeled.  Oracle: recursive-CTE
    min-label closure over the identical pair SQL."""
    from ..stages.graph import connected_components
    from ..stages.spatial import distance_selfjoin

    ensure_worker_importable()
    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "lat"])
    pairs = distance_selfjoin(pts, DIST_JOIN_RADIUS).select_columns(["a", "b"])

    def self_pairs(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch.column("doc_id"),
                         "b": batch.column("doc_id")})

    nodes = pts.map_batches(self_pairs, batch_format="pyarrow")
    return connected_components(pairs.union(nodes), "a", "b")


DBSCAN_MINPTS = 3


def q_idw_grid(sf_dir: str):
    """IDW raster interpolation census (stages/spatial.idw_grid): exact
    INTEGER inverse-distance weights (W_SCALE // d2, µ°² distances to
    cell centers) so the per-cell weighted sums are order-independent
    BIGINTs at any partitioning — the float-summation nondeterminism
    classic IDW hits in distributed runs is designed out.  Oracle-gated
    (oracle.q_idw_grid)."""
    from ..stages.spatial import idw_grid

    ensure_worker_importable()
    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "lat"])
    return idw_grid(pts)


def q_dbscan(sf_dir: str):
    """Full DBSCAN over the geotagged points (eps = DIST_JOIN_RADIUS,
    minPts = DBSCAN_MINPTS, self included): core / border / noise roles
    plus min-core-id cluster labels (noise = -1).  Composes the
    grid-bucket distance self-join, tagged-union coarse-shard flag joins
    and the distributed star-contraction CC — see stages/dbscan.py for
    the scale shapes.  Oracle-gated (oracle.q_dbscan: the identical pair
    predicate + recursive min-label closure over core-core edges)."""
    from ..stages.dbscan import dbscan
    from ..stages.spatial import distance_selfjoin

    ensure_worker_importable()
    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "lat"])
    pairs = distance_selfjoin(pts, DIST_JOIN_RADIUS)
    return dbscan(pts.select_columns(["doc_id"]), pairs,
                  minpts=DBSCAN_MINPTS)


def q_image_dims(sf_dir: str):
    """Image-container metadata from RAW BYTES (stages/imagemeta.py):
    vectorized PNG IHDR reads over the Arrow binary buffers + a real JPEG
    SOF marker walk for the jpeg minority — the catalog/validate pass a
    multimodal ingest runs before it can afford decodes.  Value-gated:
    oracle.q_image_dims replays the generative dims closed-form, so the
    driver checks byte-level parsing of real encoded files against
    independent SQL (the decode stages q_image_* stay rows-only)."""
    from ..stages.imagemeta import image_dims_batch

    ds = datagen.images_dataset(sf_dir, with_bytes=True) \
        .select_columns(["doc_id", "bytes"])
    return ds.map_batches(image_dims_batch, batch_format="pyarrow")


def q_dedup_corpus(sf_dir: str):
    """End-to-end near-dup REMOVAL: MinHash pairs → connected components
    → keep each cluster's min-id representative plus every unpaired doc.
    The composition that actually shrinks a training corpus (pairs and
    clusters are diagnostics; this is the filter).  The drop side joins
    back by ONE (doc_id, flag) groupby-sum — no driver-side set, no
    broadcast of the (at 100 TB potentially corpus-sized) dup list."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import minhash_candidate_pairs
    from ..stages.graph import connected_components

    pairs = minhash_candidate_pairs(_docs(sf_dir), threshold=0.5)
    labels = connected_components(pairs, "doc_a", "doc_b")

    def drops(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy()
        lab = batch.column("label").to_numpy()
        keep = node != lab
        return pa.table({"doc_id": pa.array(node[keep]),
                         "drop": pa.array(np.ones(int(keep.sum()), np.int64))})

    def keeps(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "drop": pa.array(np.zeros(batch.num_rows, np.int64))})

    tagged = (_docs(sf_dir).select_columns(["doc_id"])
              .map_batches(keeps, batch_format="pyarrow")
              .union(labels.map_batches(drops, batch_format="pyarrow")))
    agg = tagged.groupby("doc_id").aggregate(Sum("drop", alias_name="d"))
    return agg.filter(expr="d == 0").select_columns(["doc_id"])


def q_funnel(sf_dir: str):
    """Ordered conversion funnel signup → click → purchase (strictly
    increasing ts, greedy earliest-reach) via the filtered-shuffle +
    user-whole-shard operator (stages/analytics.funnel).  Oracle-gated
    against the chained min-after-join CTE form (oracle.q_funnel)."""
    import ray

    from ..stages.analytics import funnel

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])
    return funnel(ds.repartition(8))


def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention (cohort = epoch-week of first event, users
    active per week offset) via distinct-(user, week) pre-reduction +
    user-whole shards (stages/analytics.cohort_retention).  Oracle-gated
    (oracle.q_cohort_retention)."""
    import ray

    from ..stages.analytics import cohort_retention

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    return cohort_retention(ds.repartition(8))


def q_lift_cooccur(sf_dir: str):
    """Item co-occurrence lift over click events (exact integer ppm, pairs
    with ≥2 co-clicking users) via per-block distinct pre-reduction,
    user-whole pair generation, one union-typed multi-key sum, and an
    n_items²-bounded finish (stages/analytics.lift_cooccur).  Oracle-gated
    (oracle.q_lift_cooccur)."""
    import ray

    from ..stages.analytics import lift_cooccur

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "props"])
    return lift_cooccur(ds.repartition(8))


def q_profile(sf_dir: str):
    """One-pass column profiler over documents (lang, source, n_chars):
    row/null/exact-distinct counts plus min/max rendered as strings, via
    per-block distinct pre-reduction and one (col, val) sum-groupby
    (stages/analytics.profile).  Oracle-gated (oracle.q_profile)."""
    import ray

    from ..stages.analytics import profile

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "source", "n_chars"])
    return profile(ds.repartition(8), columns=("lang", "source", "n_chars"),
                   int_cols=frozenset({"n_chars"}))


def q_pct_rank(sf_dir: str):
    """Exact PERCENT_RANK over the per-language length distribution as
    integer ppm — the huge-partition window case, solved by a
    domain-bounded (key, value) count-combiner + broadcast lookup instead
    of a distributed sort per partition (stages/analytics.pct_rank).
    Oracle-gated (oracle.q_pct_rank)."""
    import ray

    from ..stages.analytics import pct_rank

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    return pct_rank(ds.repartition(8), key="lang", val="n_chars",
                    id_col="doc_id")


def q_key_spectrum(sf_dir: str):
    """Key-frequency spectrum (count-of-counts) over lineitem.l_orderkey —
    the skew diagnostic behind salting decisions; two sub-linear
    sum-groupbys (stages/analytics.key_spectrum).  Oracle-gated
    (oracle.q_key_spectrum)."""
    import ray

    from ..stages.analytics import key_spectrum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"])
    return key_spectrum(ds, "l_orderkey")


def q_triangles(sf_dir: str):
    """Per-node triangle counts on the co-click item graph (edges = lift
    survivors with ≥2 co-clicking users) — distributed edge construction,
    n_items²-bounded adjacency finish (stages/analytics.triangles).
    Oracle-gated against the SQL triple self-join (oracle.q_triangles)."""
    import ray

    from ..stages.analytics import triangles

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "props"])
    return triangles(ds.repartition(8))


def q_feature_hash(sf_dir: str):
    """Hashing-trick vectorizer over documents: per-doc md5 % 4096 feature
    counts — one stateless map_batches, zero shuffles (a doc's tokens are
    block-local); md5 runs only on the block's unique tokens
    (stages/text.feature_hash_batch).  Oracle-gated against DuckDB
    string_split + md5_number_lower (oracle.q_feature_hash)."""
    import ray

    from ..stages.text import feature_hash_batch

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(feature_hash_batch, batch_format="pyarrow")


def q_winsorize(sf_dir: str):
    """Winsorized per-event-type aggregate (clip at p05/p95 discrete
    quantiles, integer cents): the robust-mean building block via the
    domain-bounded count-combiner + broadcast-threshold shape
    (stages/analytics.winsorize_sum).  Oracle-gated against DuckDB
    quantile_disc (oracle.q_winsorize)."""
    import ray

    from ..stages.analytics import winsorize_sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def cents(batch: pa.Table) -> np.ndarray:
        return pc.round(pc.multiply(batch.column("value"), 100.0),
                        round_mode="half_towards_infinity") \
            .cast(pa.int64()).to_numpy()

    return winsorize_sum(ds.repartition(8), key="event_type",
                         val_cents=cents)


def q_transitions(sf_dir: str):
    """First-order Markov transition counts over each user's event stream
    (from_type, to_type, cnt): the sequence-model building block.  One
    user-hash-shard shuffle + in-shard vectorized sort/pair
    (stages/sessions.transitions — consecutive-pair semantics cannot be
    recovered block-locally, so the single shuffle is the honest shape).
    Oracle-gated against DuckDB lead() (oracle.q_transitions)."""
    import ray

    from ..stages.sessions import transitions

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    return transitions(ds.repartition(8))


def q_interval_cover(sf_dir: str):
    """Gaps-and-islands interval union per user: each event spans
    [ts, ts + (event_id % 7 + 1)·5 min); overlaps merge; output
    (user_id, n_islands, covered_us).  Block-local exact-composition
    combiner + one O(islands) shuffle (stages/sessions.interval_cover).
    Oracle-gated against the DuckDB running-max window form
    (oracle.q_interval_cover)."""
    import ray

    from ..stages.sessions import interval_cover

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])

    def to_iv(batch: pa.Table) -> pa.Table:
        s = batch.column("ts").cast(pa.int64()).to_numpy()
        dur = (batch.column("event_id").to_numpy() % 7 + 1) * 300_000_000
        return pa.table({"user_id": batch.column("user_id"),
                         "s": pa.array(s), "e": pa.array(s + dur)})

    return interval_cover(ds.repartition(8).map_batches(
        to_iv, batch_format="pyarrow"))


def q_skyline(sf_dir: str):
    """Per-returnflag 2-D Pareto frontier over (quantity, extendedprice)
    cents — the multi-objective top-set operator.  Block-local frontier
    (skyline is a semilattice) → candidate-only shuffle → tiny per-key
    finish (stages/analytics.skyline).  Oracle-gated against the DuckDB
    double-window NOT-EXISTS-free form (oracle.q_skyline)."""
    import ray

    from ..stages.analytics import skyline

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_quantity",
                                        "l_extendedprice"])

    def xy(batch: pa.Table):
        q = pc.round(pc.multiply(batch.column("l_quantity"), 100.0),
                     round_mode="half_towards_infinity") \
            .cast(pa.int64()).to_numpy()
        p = pc.round(pc.multiply(batch.column("l_extendedprice"), 100.0),
                     round_mode="half_towards_infinity") \
            .cast(pa.int64()).to_numpy()
        return q, p

    out = skyline(ds.repartition(8), key="l_returnflag", xy=xy)
    # rename via an Arrow batch map — Dataset.rename_columns plants a
    # Project that chokes on map_groups' pandas blocks
    return out.map_batches(
        lambda b: b.rename_columns(["l_returnflag", "qty_c", "price_c"]),
        batch_format="pyarrow")


def q_cell_smooth(sf_dir: str):
    """3×3 k-ring smoothed tile counts at z12 over the geotagged image
    points — the raster-convolution primitive (geo/cells.ring_smooth:
    per-block partial counts scatter to their 9 neighbors inside the same
    map_batches; ONE groupby-sum, no self-join).  Oracle-gated against the
    offsets-cross-join SQL (oracle.q_cell_smooth)."""
    from ..geo.cells import ring_smooth

    ensure_worker_importable()
    ds = datagen.images_dataset(sf_dir).select_columns(["lon", "lat"])
    return ring_smooth(ds, 12)


def q_scd2(sf_dir: str):
    """Type-2 SCD snapshot from the event stream: per user, one row per
    state change with [valid_from, valid_to) µs validity (open rows carry
    the int64-max sentinel) — the CDC/dimension-history building block.
    Same honest one-shuffle user-shard shape as q_transitions
    (stages/sessions.scd2).  Oracle-gated against DuckDB lag/lead windows
    (oracle.q_scd2)."""
    import ray

    from ..stages.sessions import scd2

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    return scd2(ds.repartition(8))


def q_weighted_median(sf_dir: str):
    """Per-returnflag lower weighted median of extendedprice cents,
    weighted by quantity — integer-exact via the shared 2·cum ≥ tot rank
    test (stages/analytics.weighted_median: the pct_rank/winsorize
    domain-bounded count-combiner; the all-to-all moves O(distinct
    (flag, price)) rows).  Oracle-gated against the DuckDB cumulative-sum
    window form (oracle.q_weighted_median)."""
    import ray

    from ..stages.analytics import weighted_median

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_quantity",
                                        "l_extendedprice"])

    def price_c(batch: pa.Table) -> np.ndarray:
        return pc.round(pc.multiply(batch.column("l_extendedprice"), 100.0),
                        round_mode="half_towards_infinity") \
            .cast(pa.int64()).to_numpy()

    def qty(batch: pa.Table) -> np.ndarray:
        return pc.round(batch.column("l_quantity"),
                        round_mode="half_towards_infinity") \
            .cast(pa.int64()).to_numpy()

    return weighted_median(ds.repartition(8), key="l_returnflag",
                           val_cents=price_c, weight=qty)


def q_embed_gram(sf_dir: str):
    """Gram matrix of the embedding corpus (Σ over vectors of eᵢ·eⱼ,
    upper triangle) — the covariance/PCA building block as a DENSE
    LINEAR-ALGEBRA combiner: each block stacks its vectors once and runs
    ONE float64 BLAS matmul (Xᵀ X), emitting 64·65/2 partial rows; the
    all-to-all carries O(blocks·2080) rows, never O(vectors).  Output
    (i, j, g) rounded to 1e-6 — products are identical float64 on both
    sides, summation-order drift ≪ the rounding (the q_embed_centroids
    float discipline).  Oracle-gated (oracle.q_embed_gram)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    dim = 64
    iu, ju = np.triu_indices(dim)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        x = emb.flatten().to_numpy().astype(np.float64).reshape(-1, dim)
        g = x.T @ x
        return pa.table({"i": pa.array(iu), "j": pa.array(ju),
                         "s": pa.array(g[iu, ju])})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["i", "j"]).aggregate(Sum("s", alias_name="s"))
           .to_pandas())                       # 2080 rows
    out["g"] = np.round(out["s"].to_numpy(), 6)
    return out[["i", "j", "g"]].sort_values(["i", "j"])


def q_tile_pyramid(sf_dir: str):
    """Tile-count pyramid z8..z12 over the geotagged image points — the
    map-rendering aggregation (geo/cells.tile_pyramid: one combiner pass,
    ancestor scatter in-map, ONE groupby-sum for ALL zoom levels).
    Oracle-gated against per-level integer right-shifts in SQL
    (oracle.q_tile_pyramid)."""
    from ..geo.cells import tile_pyramid

    ensure_worker_importable()
    ds = datagen.images_dataset(sf_dir).select_columns(["lon", "lat"])
    return tile_pyramid(ds, z_hi=12, z_lo=8)


def q_track_length(sf_dir: str):
    """Per-(zone, street) polyline length in integer micro-degree units
    (stages/tracks.track_length): pruned doc_id read, coarse-shard + ONE
    flat lexsort, exact BIGINT segment sums — the per-entity geometry
    metric the reference only approximates via hull diameter (reference
    bano/models.py point_par_rue / diameter).  Oracle-gated
    (oracle.q_track_length)."""
    from ..stages.tracks import track_length

    ensure_worker_importable()
    return track_length(sf_dir)


def q_track_simplify(sf_dir: str):
    """One-pass Visvalingam polyline thinning per track
    (stages/tracks.track_simplify): endpoints + interior vertices whose
    int64 neighbor-triangle area clears the threshold.  Oracle-gated
    (oracle.q_track_simplify via LAG/LEAD windows)."""
    from ..stages.tracks import track_simplify

    ensure_worker_importable()
    return track_simplify(sf_dir)


def q_bearing_sectors(sf_dir: str):
    """Per-zone 8-sector segment-heading histogram
    (stages/tracks.bearing_sectors): sectors from pure integer
    sign/magnitude comparisons, shard partials + one zone×8-sized
    groupby sum.  Oracle-gated (oracle.q_bearing_sectors)."""
    from ..stages.tracks import bearing_sectors

    ensure_worker_importable()
    return bearing_sectors(sf_dir)


def q_stay_points(sf_dir: str):
    """Trajectory dwell detection (stages/tracks.stay_points): maximal
    runs of consecutive track points with step² < STAY_T2 and ≥
    STAY_MIN_PTS points — the stop/stay primitive of GPS-trace curation.
    Exact int64 comparisons, vectorized gaps-and-islands.  Oracle-gated
    (oracle.q_stay_points)."""
    from ..stages.tracks import stay_points

    ensure_worker_importable()
    return stay_points(sf_dir)


def q_snap_points(sf_dir: str):
    """Map-matching lite (stages/tracks.snap_points): snap every point to
    the nearest segment of a DIFFERENT street in its zone — the
    Ray-native analog of the reference's address→voie rapprochement
    (reference bano/models.py point_par_rue).  Zone-co-located shards,
    vectorized point×segment distance slabs, exact-branch float64
    distances with a deterministic (d2, sidx, sdoc) argmin.  Oracle-gated
    (oracle.q_snap_points)."""
    from ..stages.tracks import snap_points

    ensure_worker_importable()
    return snap_points(sf_dir)


def q_track_turns(sf_dir: str):
    """Per-track signed-cross turn census (stages/tracks.track_turns):
    left / right / exactly-collinear interior-vertex counts.
    Oracle-gated (oracle.q_track_turns)."""
    from ..stages.tracks import track_turns

    ensure_worker_importable()
    return track_turns(sf_dir)


def q_track_length_m(sf_dir: str):
    """Geodesic (haversine) per-track polyline length in exact integer
    millimetres (stages/tracks.track_length_m) — the meters-true variant
    of q_track_length; per-segment BIGINT rounding makes the distributed
    SUM order-free.  Oracle-gated (oracle.q_track_length_m)."""
    from ..stages.tracks import track_length_m

    ensure_worker_importable()
    return track_length_m(sf_dir)


def q_wds_export(sf_dir: str):
    """WebDataset-style multimodal shard export
    (pipelines/sinks.write_wds_shards): tar shards of (image bytes, JSON
    metadata) under /tmp, bytes synthesized+encoded AFTER the id-only
    shuffle so blobs never transit the object store.  Returns the shard
    index; oracle-gated on (shard_id, shard_name, n_samples)
    (oracle.q_wds_export); shard CONTENT is pytest-verified
    (tests/test_wds.py: tar roundtrip, byte determinism, resume)."""
    import os

    from .sinks import write_wds_shards

    ensure_worker_importable()
    out_dir = os.path.join("/tmp/bano_ray_wds", os.path.basename(sf_dir))
    return write_wds_shards(sf_dir, out_dir)


def q_cell_mode(sf_dir: str):
    """Per-z12-cell modal source (stages/analytics.grouped_mode): exact
    grouped mode — map-side (cell, source) pre-count so the shuffle moves
    distinct pairs, then coarse-shard argmax with a min-value tiebreak.
    Oracle-gated (oracle.q_cell_mode)."""
    from ..geo.cells import lonlat_to_tile
    from ..stages.analytics import grouped_mode

    ensure_worker_importable()

    def add_xy(batch: pa.Table) -> pa.Table:
        x, y = lonlat_to_tile(batch.column("lon").to_numpy(),
                              batch.column("lat").to_numpy(), 12)
        return pa.table({"cell_x": x, "cell_y": y,
                         "source": batch.column("source")})

    ds = datagen.images_dataset(sf_dir).map_batches(add_xy,
                                                    batch_format="pyarrow")
    return grouped_mode(ds, ["cell_x", "cell_y"], "source")


# fixed scoring anchor: 2024-02-01T00:00:00Z (the synthetic event stream
# spans January 2024) — a pinned "now" keeps the decay deterministic with
# no corpus pre-pass
DECAY_ANCHOR_US = 1706745600000000
DECAY_HALF_LIFE_DAYS = 7


def q_decay_score(sf_dir: str):
    """Recency-decayed engagement score per user: Σ cents >> (age_days //
    half_life) — exponential half-life decay kept EXACT by integer right
    shifts (cents are non-negative, so floor-div and >> agree with the
    oracle's `// (1 << shift)`).  One stateless map-side per-user partial
    (np.unique + bincount), one user-table-sized groupby sum.
    Oracle-gated (oracle.q_decay_score)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        cents = np.round(batch.column("value").to_numpy() * 100.0).astype(np.int64)
        shift = ((DECAY_ANCHOR_US - ts) // 86400000000) // DECAY_HALF_LIFE_DAYS
        w = cents >> shift
        uu, inv = np.unique(u, return_inverse=True)
        s = np.bincount(inv, weights=w).astype(np.int64)
        return pa.table({"user_id": pa.array(uu), "score_c": pa.array(s)})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id").aggregate(Sum("score_c",
                                              alias_name="score_c")))


def q_window_selfjoin(sf_dir: str):
    """Stream-stream interval self-join (stages/sessions.window_selfjoin):
    per purchase, the same-user view count in the preceding 30 minutes —
    the attribution join, output one row per right event (pairs are never
    materialized; two searchsorted probes per shard).  Oracle-gated
    (oracle.q_window_selfjoin)."""
    import ray

    from ..stages.sessions import window_selfjoin

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts",
                                        "event_type"])
    return window_selfjoin(ds)


def q_cusum_days(sf_dir: str):
    """Daily-volume drift curve (CUSUM): per day, the exact integer
    deviation ``cum_d·D − rank_d·total`` (cross-multiplied so no float
    mean is ever formed) — the monitoring primitive for ingest-volume
    drift.  Distributed day-count partials; the day table (≤ stream span)
    finishes driver-side like the other dim-sized results.  Oracle-gated
    (oracle.q_cusum_days)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = batch.column("ts").cast(pa.int64()).to_numpy() // 86400000000
        ud, cnt = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(ud),
                         "n": pa.array(cnt.astype(np.int64))})

    days = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("n", alias_name="n"))
            .to_pandas().sort_values("day").reset_index(drop=True))
    n = days["n"].to_numpy()
    D = np.int64(len(days))
    total = np.int64(n.sum())
    rank = np.arange(1, len(days) + 1, dtype=np.int64)
    days["dev"] = np.cumsum(n) * D - rank * total
    return days


def q_missing_slots(sf_dir: str):
    """Stream-coverage gap detection: 10-minute slots between the stream's
    first and last slot with NO events — the backfill monitor.
    Distributed distinct-slot partials (the shuffle carries ≤ span/10min
    rows); the calendar anti-join runs on the slot table driver-side.
    Oracle-gated (oracle.q_missing_slots)."""
    import ray

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        slot = batch.column("ts").cast(pa.int64()).to_numpy() // 600000000
        return pa.table({"slot": pa.array(np.unique(slot))})

    seen = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("slot").count().select_columns(["slot"])
            .to_pandas()["slot"].to_numpy())
    cal = np.arange(seen.min(), seen.max() + 1, dtype=np.int64)
    missing = np.setdiff1d(cal, seen)
    import pandas as pd

    return pd.DataFrame({"slot": missing})


def q_zone_digest_diff(sf_dir: str):
    """Per-zone Merkle-style content digest + snapshot diff
    (stages/digest.zone_digest_diff): order-insensitive mod-P fingerprint
    sums for the base corpus and a deterministically perturbed next
    snapshot, reporting which partitions an incremental rebuild must
    touch (generalizes reference stats_export.sh:7-25's cross-check from
    counts to content).  Oracle-gated (oracle.q_zone_digest_diff)."""
    from ..stages.digest import zone_digest_diff

    ensure_worker_importable()
    return zone_digest_diff(sf_dir)


def q_seq_pack(sf_dir: str):
    """LLM sequence packing: cut each language's doc_id-ordered token
    stream into fixed-CAP context chunks (stages/packing.seq_pack) — the
    global ordered prefix sum done as bucket partials + driver prefix
    carry + ONE range exchange that never moves text.  Oracle-gated
    (oracle.q_seq_pack via a running-SUM window)."""
    from ..stages.packing import seq_pack

    ensure_worker_importable()
    return seq_pack(sf_dir)


def q_vec_quantize(sf_dir: str):
    """Embedding compression: global-min/max uint8 scalar quantization
    (stages/quantize.vec_quantize) — two streaming passes (dim-sized
    min/max reduce, broadcast, vectorized encode) with exact-integer code
    signatures.  Oracle-gated (oracle.q_vec_quantize)."""
    from ..stages.quantize import vec_quantize

    ensure_worker_importable()
    return vec_quantize(sf_dir)


def q_street_crossings(sf_dir: str):
    """Exact segment-intersection join: which street pairs properly cross,
    per zone (stages/crossings.street_crossings) — grid-cell bucketed
    candidates with a canonical-cell local dedup (no distinct shuffle),
    strict int64 orientation tests.  Oracle-gated
    (oracle.q_street_crossings)."""
    from ..stages.crossings import street_crossings

    ensure_worker_importable()
    return street_crossings(sf_dir)


def q_mad_outliers(sf_dir: str):
    """Robust outliers: per-event-type lower median + MAD (exact integer
    rank selection, stages/analytics.mad_outliers) and the |v−med|>3·MAD
    census — the 50%-breakdown companion to q_group_outliers' z-scores.
    Oracle-gated (oracle.q_mad_outliers)."""
    from ..stages.analytics import mad_outliers

    ensure_worker_importable()
    return mad_outliers(sf_dir)


_Q3_DATE_US = 883_612_800_000_000  # 1998-01-01 in timestamp[us] ticks
_Q3_SEGMENT = "BUILDING"


def q_top_orders(sf_dir: str):
    """TPC-H Q3 shape in ONE shuffle: top-10 open orders of one market
    segment by line revenue.  The segment's custkeys broadcast once
    (``ray.put`` + searchsorted membership — the q_broadcast_join
    contract); lineitem (shipped after D) pre-aggregates revenue cents
    per orderkey map-side and orders (placed before D) emit their dim row
    into the SAME tagged-union schema, so the single groupby(key) Sum/Min
    merges partials AND performs the inner join (both-sides-present =
    non-null rev and date — the q_outer_join discipline); the final
    top-10 runs through the per-block pre-cut so the orderkey table never
    enters a global sort.  Oracle-gated (oracle.q_top_orders)."""
    import ray
    from ray.data.aggregate import Min, Sum

    ensure_worker_importable()
    seg = (ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
           .filter(expr=f"c_mktsegment == '{_Q3_SEGMENT}'")
           .to_pandas())          # segment custkeys: dim-sized by contract
    ckeys = ray.put(np.sort(seg["c_custkey"].to_numpy().astype(np.int64)))

    def line_partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        m = ship > _Q3_DATE_US
        k = batch.column("l_orderkey").to_numpy()[m]
        p = batch.column("l_extendedprice").to_numpy()[m]
        d = batch.column("l_discount").to_numpy()[m]
        # floor(x+0.5), not round(): the product CAN land exactly on *.5
        # (discount is a 2-decimal double), and numpy rounds half-even
        # while DuckDB rounds half-away — floor(+0.5) is tie-free and
        # bit-identical on both sides
        cents = np.floor(p * (1.0 - d) * 100.0 + 0.5).astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        n = len(uk)
        return pa.table({
            "key": pa.array(uk.astype(np.int64)),
            "rev_c": pa.array(s),
            "odate": pa.nulls(n, pa.int64()),
            "prio": pa.nulls(n, pa.string()),
        })

    def order_row(batch: pa.Table) -> pa.Table:
        keys = ray.get(ckeys)
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        ck = batch.column("o_custkey").to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, ck)
        pos[pos >= len(keys)] = 0
        m = (od < _Q3_DATE_US) & (keys[pos] == ck) if len(keys) else \
            np.zeros(len(ck), dtype=bool)
        n = int(m.sum())
        return pa.table({
            "key": batch.column("o_orderkey").filter(pa.array(m)),
            "rev_c": pa.nulls(n, pa.int64()),
            "odate": pa.array(od[m]),
            "prio": batch.column("o_orderpriority").filter(pa.array(m)),
        })

    li = (ray.data.read_parquet(
              f"{sf_dir}/lineitem.parquet",
              columns=["l_orderkey", "l_extendedprice", "l_discount",
                       "l_shipdate"])
          .map_batches(line_partial, batch_format="pyarrow"))
    od = (ray.data.read_parquet(
              f"{sf_dir}/orders.parquet",
              columns=["o_orderkey", "o_custkey", "o_orderdate",
                       "o_orderpriority"])
          .map_batches(order_row, batch_format="pyarrow"))
    def both_sides(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(pc.is_valid(batch.column("rev_c")),
                       pc.is_valid(batch.column("odate")))
        return batch.filter(keep)

    joined = (li.union(od).groupby("key")
              .aggregate(Sum("rev_c", alias_name="rev_c"),
                         Min("odate", alias_name="odate"),
                         Min("prio", alias_name="prio"))
              .map_batches(both_sides, batch_format="pyarrow"))
    top = _local_topk_cut(joined, ["rev_c", "key"], [True, False], 10)
    res = (top.sort(["rev_c", "key"], descending=[True, False]).limit(10)
           .to_pandas())
    # keep [us] resolution: matches DuckDB's timestamp rendering
    # (datetime64[us]) so the dtype-strict gate agrees
    res["o_orderdate"] = pd.to_datetime(
        res["odate"], unit="us").astype("datetime64[us]")
    return (res.rename(columns={"key": "o_orderkey",
                                "prio": "o_orderpriority"})
            [["o_orderkey", "o_orderdate", "o_orderpriority", "rev_c"]])


def q_image_patches(sf_dir: str):
    """ViT-style patchification over REAL decoded PNG bytes
    (pipelines/flagship.image_patches): actor-pool decode, one row per
    8×8 patch with exact integer channel sums — the first VALUE-gated
    image query (the codec stages are rows-only; here PNG losslessness +
    the closed-form pixel field let DuckDB replay the whole chain).
    Oracle-gated (oracle.q_image_patches)."""
    from .flagship import image_patches

    ensure_worker_importable()
    return image_patches(sf_dir)


def q_frame_diff(sf_dir: str):
    """Inter-frame change census over REAL decoded video frames
    (pipelines/flagship.FrameDiff): per consecutive frame pair the exact
    changed-value count (|diff| > T) and the exact |diff| sum — the
    motion-estimation pass of a video-curation pipeline.  Oracle-gated
    (oracle.q_frame_diff self-joins the frame pixel replay at fi−1)."""
    from .flagship import frame_diff

    ensure_worker_importable()
    return frame_diff(sf_dir)


def q_image_equalize(sf_dir: str):
    """Histogram-equalization census over REAL decoded PNG pixels
    (pipelines/flagship.ImageEqualize): the classic integer remap
    round(255·(cdf−cdf_min)/(N−cdf_min)) realized tie-free as
    (2·255·(cdf−m)+(N−m)) // (2·(N−m)), exact integer summaries.
    Oracle-gated (oracle.q_image_equalize replays histogram → window
    cumsum → remap from the closed-form pixel field)."""
    from .flagship import image_equalize

    ensure_worker_importable()
    return image_equalize(sf_dir)


def q_cell_image_mosaic(sf_dir: str):
    """Geo × image fusion: per z12 tile the image count and the exact
    per-channel thumbnail-sum totals of the PNG images inside it — the
    mosaic/choropleth aggregation a map-serving pipeline runs (decode in
    the actor pool, cell assignment from the row's own coordinates, ONE
    cell-sized groupby; pixels never shuffle — only 3 int sums per image
    do).  Composes ImageThumbSums with the q_cell_counts tile math.
    Oracle-gated (oracle.q_cell_image_mosaic)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.parse import CELL_RES
    from .flagship import ImageThumbSums, _png_pool_pipeline

    ensure_worker_importable()
    thumbs = _png_pool_pipeline(sf_dir, ImageThumbSums)
    n = np.int64(1 << CELL_RES)

    def attach_cell(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(d)
        cx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        cy = np.floor((1.0 - np.log(np.tan(np.radians(lat))
                                    + 1.0 / np.cos(np.radians(lat)))
                       / np.pi) / 2.0 * n).astype(np.int64)
        return pa.table({
            "cell_x": pa.array(cx), "cell_y": pa.array(cy),
            "ch": batch.column("ch"),
            "thumb_sum": batch.column("thumb_sum")})

    from ray.data.aggregate import Count

    # every image contributes exactly one row per channel, so the group's
    # row count IS its image count
    return (thumbs.map_batches(attach_cell, batch_format="pyarrow")
            .groupby(["cell_x", "cell_y", "ch"])
            .aggregate(Count("thumb_sum", alias_name="n_img"),
                       Sum("thumb_sum", alias_name="thumb_sum")))


def q_quadtree_leaves(sf_dir: str):
    """Adaptive quadtree leaves z8..z12 over the geotagged points
    (geo/cells.quadtree_leaves): split-while-overfull spatial index tiles
    via a LOCAL leaf rule (count monotonicity collapses the ancestor
    recursion to one parent join on a coarse shard).  Oracle-gated
    (oracle.q_quadtree_leaves)."""
    from ..geo.cells import quadtree_leaves

    ensure_worker_importable()
    ds = datagen.images_dataset(sf_dir).select_columns(["lon", "lat"])
    return quadtree_leaves(ds, z_hi=12, z_lo=8)


def q_zone_manifest(sf_dir: str):
    """Partition manifest: per-zone statistics a table format keeps for
    file skipping (row count, doc_id range, distinct streets, micro-degree
    bbox) — the Iceberg/Delta manifest shape over the geo partitioning.
    Map-side per-zone partials + ONE zone-sized groupby; the distinct
    street count rides a (zone, sidx)-pair pre-dedup (shuffle carries
    distinct pairs, not rows).  Oracle-gated (oracle.q_zone_manifest)."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(d)
        zone = datagen.zone_of(lon, lat)
        ix = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        iy = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        uz, inv = np.unique(zone, return_inverse=True)
        nz = len(uz)

        def seg(arr, red):
            out = np.empty(nz, dtype=np.int64)
            order = np.argsort(inv, kind="stable")
            so = arr[order]
            starts = np.searchsorted(inv[order], np.arange(nz))
            ends = np.append(starts[1:], len(so))
            for i in range(nz):
                out[i] = red(so[starts[i]:ends[i]])
            return out

        insee = np.char.zfill((uz + 1).astype("U"), 5).astype(object)
        return pa.table({
            "insee": pa.array(insee, pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "min_doc": pa.array(seg(d, np.min)),
            "max_doc": pa.array(seg(d, np.max)),
            "min_ix": pa.array(seg(ix, np.min)),
            "max_ix": pa.array(seg(ix, np.max)),
            "min_iy": pa.array(seg(iy, np.min)),
            "max_iy": pa.array(seg(iy, np.max)),
        })

    stats = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("insee")
             .aggregate(Sum("n", alias_name="n"),
                        Min("min_doc", alias_name="min_doc"),
                        Max("max_doc", alias_name="max_doc"),
                        Min("min_ix", alias_name="min_ix"),
                        Max("max_ix", alias_name="max_ix"),
                        Min("min_iy", alias_name="min_iy"),
                        Max("max_iy", alias_name="max_iy")))

    def pair_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(d)
        zone = datagen.zone_of(lon, lat)
        sidx = datagen.street_idx(d)
        pairs = np.unique(zone * 10_000 + sidx)
        return pa.table({"pair": pa.array(pairs)})

    pairs = (ds.map_batches(pair_partial, batch_format="pyarrow")
             .groupby("pair").count().to_pandas())
    zcnt = (pairs["pair"] // 10_000).value_counts()
    street_map = {str(z + 1).zfill(5): int(c) for z, c in zcnt.items()}

    def attach(batch: pa.Table) -> pa.Table:
        ks = batch.column("insee").to_numpy(zero_copy_only=False)
        return batch.append_column("n_streets", pa.array(
            np.asarray([street_map[k] for k in ks], np.int64)))

    return stats.map_batches(attach, batch_format="pyarrow")


HUB_MOD = 4  # zones with zone % 4 == 0 host a hub facility


def q_nearest_hub(sf_dir: str):
    """Nearest-facility assignment: every point routes to the closest hub
    (hubs sit at the centers of zones with ``zone % HUB_MOD == 0``), with
    exact integer micro-degree distance² and min-zone tiebreak — the
    logistics/routing primitive.  Hubs broadcast once via ``ray.put``;
    each batch computes one points×hubs distance matrix and reduces to
    per-hub partials (count + Σd²); one hub-sized groupby.  Oracle-gated
    (oracle.q_nearest_hub)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    zones = np.arange(datagen.NZONES, dtype=np.int64)
    hubs = zones[zones % HUB_MOD == 0]
    zx, zy = hubs // datagen.NZY, hubs % datagen.NZY
    cx = np.floor((datagen.LON0 + (zx + 0.5) * datagen.LON_SPAN
                   / datagen.NZX) * 1e6 + 0.5).astype(np.int64)
    cy = np.floor((datagen.LAT0 + (zy + 0.5) * datagen.LAT_SPAN
                   / datagen.NZY) * 1e6 + 0.5).astype(np.int64)
    ref = ray.put((hubs, cx, cy))

    def partial(batch: pa.Table) -> pa.Table:
        hz, hx, hy = ray.get(ref)
        d = batch.column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(d)
        ix = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        iy = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        dx = ix[:, None] - hx[None, :]
        dy = iy[:, None] - hy[None, :]
        d2 = dx * dx + dy * dy
        best = np.argmin(d2, axis=1)  # first minimum = smallest hub zone
        bd2 = d2[np.arange(len(d)), best]
        nh = len(hz)
        # exact Σd²: d² < 2^49, so a float64 bincount of the raw values
        # would lose bits past 2^53 — bincount 25-bit halves (each sum
        # ≤ 2^46 for any batch ≤ 2^21 rows) and recombine in Python ints
        lo = np.bincount(best, minlength=nh,
                         weights=(bd2 & 0x1FFFFFF).astype(np.float64))
        hi = np.bincount(best, minlength=nh,
                         weights=(bd2 >> 25).astype(np.float64))
        sum_d2 = np.fromiter(((int(h) << 25) + int(l)
                              for h, l in zip(hi, lo)),
                             dtype=np.int64, count=nh)
        return pa.table({
            "hub_zone": pa.array(hz),
            "n_points": pa.array(np.bincount(best, minlength=nh)
                                 .astype(np.int64)),
            "sum_d2": pa.array(sum_d2),
        })

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("hub_zone")
            .aggregate(Sum("n_points", alias_name="n_points"),
                       Sum("sum_d2", alias_name="sum_d2"))
            .filter(expr="n_points > 0"))


def q_late_events(sf_dir: str):
    """Streaming watermark simulation (stages/packing.late_events): an
    event is late iff it arrives (deterministic hash-jitter processing
    time) more than 5 min after the running-max watermark of everything
    processed before it — the global running MAX done with the seq_pack
    two-pass range carry.  Oracle-gated (oracle.q_late_events)."""
    from ..stages.packing import late_events

    ensure_worker_importable()
    return late_events(sf_dir)


def q_dup_cluster_sizes(sf_dir: str):
    """Curation QA: the duplicate-cluster size spectrum — how much of the
    corpus is duplicated and in what clump sizes.  CC labels from the
    verified minhash pairs (stages/graph.py) → per-label size partials →
    count-of-counts (the q_key_spectrum shape, one more tiny groupby).
    Oracle-gated (oracle.q_dup_cluster_sizes over the recursive closure)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.dedup import minhash_candidate_pairs
    from ..stages.graph import connected_components

    ensure_worker_importable()
    pairs = minhash_candidate_pairs(_docs(sf_dir), threshold=0.5)
    cc = connected_components(pairs, "doc_a", "doc_b")

    def size_partial(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy()
        uk, cnt = np.unique(lab, return_counts=True)
        return pa.table({"label": pa.array(uk),
                         "sz": pa.array(cnt.astype(np.int64))})

    sizes = (cc.map_batches(size_partial, batch_format="pyarrow")
             .groupby("label").aggregate(Sum("sz", alias_name="sz")))

    def spectrum_partial(batch: pa.Table) -> pa.Table:
        sz = batch.column("sz").to_numpy()
        uk, cnt = np.unique(sz, return_counts=True)
        return pa.table({"cluster_size": pa.array(uk),
                         "n_clusters": pa.array(cnt.astype(np.int64))})

    return (sizes.map_batches(spectrum_partial, batch_format="pyarrow")
            .groupby("cluster_size")
            .aggregate(Sum("n_clusters", alias_name="n_clusters")))


def q_ann_recall(sf_dir: str):
    """Index-quality evaluation as a first-class op: recall@k of the LSH
    ANN against the brute-force exact top-k, per query — the curation
    metric that decides whether an approximate index is shippable.  Both
    sides run their existing distributed pipelines; the intersection is
    a tiny (queries×k) pandas join.  recall_ppm is an exact integer
    (matches·10⁶ // k).  Oracle-gated (oracle.q_ann_recall joins the two
    existing closed-form SQLs)."""
    ensure_worker_importable()
    brute = q_ann_topk(sf_dir).to_pandas()[["query_id", "vec_id"]]
    lsh = q_ann_lsh(sf_dir)
    lsh = (lsh if isinstance(lsh, pd.DataFrame)
           else lsh.to_pandas())[["query_id", "vec_id"]]
    hit = brute.merge(lsh, on=["query_id", "vec_id"])
    n = hit.groupby("query_id").size()
    qids = sorted(ANN_QUERY_IDS)
    matches = np.asarray([int(n.get(q, 0)) for q in qids], np.int64)
    return pd.DataFrame({
        "query_id": np.asarray(qids, np.int64),
        "n_hits": matches,
        "recall_ppm": matches * 1_000_000 // ANN_K,
    })


def q_scene_cuts(sf_dir: str):
    """Video scene-cut detection over REAL container decode
    (pipelines/flagship.SceneCuts): per-frame exact luminance sums,
    consecutive-frame jumps above SCENE_CUT_T — the second value-gated
    multimodal query (oracle.q_scene_cuts replays the pixel field and
    the LAG diffs in SQL)."""
    from .flagship import scene_cuts

    ensure_worker_importable()
    return scene_cuts(sf_dir)


def q_dhash(sf_dir: str):
    """Content difference-hash over REAL decoded PNG pixels
    (pipelines/flagship.ImageDhash): 9×8 box means compared by exact
    cross-multiplication, packed to a signed 64-bit fingerprint — the
    decoded-content twin of the synthetic phash column.  Oracle-gated
    (oracle.q_dhash)."""
    from .flagship import image_dhash

    ensure_worker_importable()
    return image_dhash(sf_dir)


def q_image_hist(sf_dir: str):
    """Per-image luminance histogram over REAL decoded PNG pixels
    (pipelines/flagship.ImageHist): exact channel-sum luminance binned
    into 16 integer-width bins, one row per present (doc_id, bin) — the
    exposure census an image-curation pipeline cuts over.  Oracle-gated
    (oracle.q_image_hist)."""
    from .flagship import image_hist

    ensure_worker_importable()
    return image_hist(sf_dir)


def q_image_mips(sf_dir: str):
    """Mip-pyramid census over REAL decoded PNG pixels
    (pipelines/flagship.ImageMips): per (doc, level) cell count + exact
    integer sum of per-cell floor-averaged luminance for 2×2 and 4×4
    boxes — the downsample-correctness signature.  Oracle-gated
    (oracle.q_image_mips)."""
    from .flagship import image_mips

    ensure_worker_importable()
    return image_mips(sf_dir)


def q_sobel_energy(sf_dir: str):
    """Per-image gradient energy over REAL decoded PNG pixels
    (pipelines/flagship.ImageSobel): exact integer Σ|Δluminance| along x
    and y — the cheap sharpness/blur filter signal.  Oracle-gated
    (oracle.q_sobel_energy)."""
    from .flagship import image_sobel

    ensure_worker_importable()
    return image_sobel(sf_dir)


def q_time_weighted(sf_dir: str):
    """Time-weighted aggregation over irregular samples: per user, the
    exact integer numerator Σ cents·Δms and total duration of the
    value step-function between consecutive events — the
    billing/telemetry TWA primitive a plain AVG gets wrong.  Consecutive
    pairs can't compose block-locally, so rows take ONE user-shard
    shuffle and each shard resolves with a flat lexsort + diff (the
    stages/sessions.transitions shape).  All-integer (half-away cents ×
    floor-div milliseconds) — tolerance-free gate.  Oracle:
    oracle.q_time_weighted via LEAD windows."""
    import ray

    ensure_worker_importable()
    C = np.int64(509)
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "value"])

    def shard(batch: pa.Table) -> pa.Table:
        c = pc.round(pc.multiply(batch.column("value"), 100.0),
                     round_mode="half_towards_infinity").cast(pa.int64())
        u = batch.column("user_id").to_numpy()
        return pa.table({"user_id": batch.column("user_id"),
                         "t": batch.column("ts").cast(pa.int64()),
                         "event_id": batch.column("event_id"),
                         "c": c,
                         "_shard": pa.array(u % C)})

    def twa(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        order = np.lexsort((eid, t, u))
        u, t, c = u[order], t[order], c[order]
        same = u[1:] == u[:-1]              # interval (i, i+1) within user
        dms = (t[1:] - t[:-1]) // 1000
        num = c[:-1] * dms
        uk, inv = np.unique(u[:-1][same], return_inverse=True)
        # int64 scatter-adds (not float bincount): Σ cents·ms can pass
        # 2^53 at scale, and the gate is exact-integer
        s_num = np.zeros(len(uk), dtype=np.int64)
        s_dur = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s_num, inv, num[same])
        np.add.at(s_dur, inv, dms[same])
        return pd.DataFrame({
            "user_id": uk,
            "num_c_ms": s_num,
            "dur_ms": s_dur,
            "n_iv": np.bincount(inv).astype(np.int64),
        })

    return (ds.map_batches(shard, batch_format="pyarrow")
            .groupby("_shard").map_groups(twa, batch_format="pandas")
            .select_columns(["user_id", "num_c_ms", "dur_ms", "n_iv"]))


RESAMPLE_M = 5   # points per resampled track (fractions k/M, k=0..M-1)


def q_track_resample(sf_dir: str):
    """Uniform arc-length polyline resampling: every track re-sampled at
    fractions k/5 of its total integer micro-degree length — the
    fixed-size geometry embedding a track-similarity / map-matching
    stage consumes (stages/tracks.resample_group).  Exact-integer
    parameterization (the q_track_length segment metric); the
    interpolated coordinate is ``ix0 + floor(num/len)`` where the float64
    quotient is provably exact-floored (|num| ≤ 4.4e12, quotients ≥4e-7
    from integers unless divisible).  Oracle-gated
    (oracle.q_track_resample)."""
    from ..stages.tracks import track_resample

    ensure_worker_importable()
    return track_resample(sf_dir)


SSSP_ROUNDS = 3
SSSP_SEED_MOD = 25
SSSP_W_NUM = 1_000_000


def q_sssp(sf_dir: str):
    """Weighted single-source shortest paths (multi-source, 3-round
    Bellman-Ford) over the co-click item graph — the weighted sibling of
    q_bfs_levels.  Edges come out of the fully distributed lift pipeline
    (pairs co-clicked by ≥2 distinct users); the weight is the exact
    integer ``1_000_000 // c_ab`` (rarer co-click = longer edge), so the
    whole relaxation is integer arithmetic and the gate tolerance-free.
    Each round re-reads the edge stream emitting node-table-sized min
    partials (stages/graph.sssp); seeds are items ≡ 0 (mod 25).
    Oracle-gated (oracle.q_sssp unrolls the 3 relaxations as CTEs over
    the exact lift-pair SQL)."""
    import ray

    from ..stages.analytics import lift_cooccur
    from ..stages.graph import sssp
    from ..stages.pagerank import N_ITEMS

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "props"])
    pairs = lift_cooccur(ds, n_items=N_ITEMS)
    i = pairs["i"].to_numpy(np.int64)
    j = pairs["j"].to_numpy(np.int64)
    w = (SSSP_W_NUM // pairs["c_ab"].to_numpy(np.int64)).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(np.concatenate([i, j])),
        "dst": pa.array(np.concatenate([j, i])),
        "w": pa.array(np.concatenate([w, w])),
    }))
    seeds = (np.arange(N_ITEMS) % SSSP_SEED_MOD) == 0
    out = sssp(edges, seeds, rounds=SSSP_ROUNDS)
    return out.rename(columns={"node": "item"})


def q_unpivot(sf_dir: str):
    """Distributed UNPIVOT (wide→long melt): lineitem's three measures
    (quantity, extended price, discounted revenue — all integer cents)
    become (l_returnflag, measure, value_c) rows.  The melt happens
    INSIDE the combiner pass — each block emits 3 partial rows per
    present flag, so the shuffle carries flags×3 rows and the long
    format never materializes per row.  Oracle: UNION ALL of the three
    aggregates (the SQL UNPIVOT of the same wide aggregate)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_quantity",
                                        "l_extendedprice", "l_discount"])

    def melt_partial(batch: pa.Table) -> pa.Table:
        fl = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        q = batch.column("l_quantity").to_numpy()
        p = batch.column("l_extendedprice").to_numpy()
        d = batch.column("l_discount").to_numpy()
        uf, inv = np.unique(fl, return_inverse=True)
        mats = {
            "qty_c": np.floor(q * 100.0 + 0.5).astype(np.int64),
            "price_c": np.floor(p * 100.0 + 0.5).astype(np.int64),
            "rev_c": np.floor(p * (1.0 - d) * 100.0 + 0.5).astype(np.int64),
        }
        flags, meas, vals = [], [], []
        for mname, cents in mats.items():
            s = (np.bincount(inv, weights=cents.astype(np.float64))
                 .astype(np.int64))
            flags.append(uf)
            meas.append(np.full(len(uf), mname, dtype=object))
            vals.append(s)
        return pa.table({
            "l_returnflag": pa.array(np.concatenate(flags), pa.string()),
            "measure": pa.array(np.concatenate(meas), pa.string()),
            "value_c": pa.array(np.concatenate(vals)),
        })

    return (ds.map_batches(melt_partial, batch_format="pyarrow")
            .groupby(["l_returnflag", "measure"])
            .aggregate(Sum("value_c", alias_name="value_c")))


_Q5_REGION = "ASIA"
_Q5_D0_US = 820_454_400_000_000   # 1996-01-01 in timestamp[us] ticks
_Q5_D1_US = 852_076_800_000_000   # 1997-01-01


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5 shape — per-nation revenue where the customer's and the
    supplier's nation coincide inside one region — the multi-dim star
    join over TWO big-big exchanges, each combiner-reduced:

    1. orders (date window) ⋈ customer (region's nations) resolve each
       order's customer nation in one tagged-union groupby on a custkey
       coarse shard (orders emit (custkey, orderkey); customers emit
       (custkey, nation) — dim row count per shard, never a cross
       product);
    2. lineitem pre-aggregates revenue cents per (orderkey, supplier
       nation) map-side (supplier→nation broadcast via ``ray.put`` —
       suppliers are fact/10⁴; at 100 TB this side would become a third
       tagged-union exchange, same shape) and meets stage 1's
       (orderkey, cust-nation) rows in an orderkey-shard groupby where
       cnation == snation pairs fold into per-nation partials.

    Revenue follows the tie-free ``floor(x·100+0.5)`` integer-cents
    convention of q_top_orders, so sums are order-free and the oracle
    gate exact.  Oracle: oracle.q_tpch_q5 (plain five-table SQL)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    C = np.int64(509)

    # region → nation keys (tiny dims, driver-side by contract)
    nat = ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    reg = ray.data.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    rk = int(reg.loc[reg["r_name"] == _Q5_REGION, "r_regionkey"].iloc[0])
    nat_in = nat[nat["n_regionkey"] == rk]
    nkeys = np.sort(nat_in["n_nationkey"].to_numpy().astype(np.int64))
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    # supplier → nation (broadcast; see docstring for the 100 TB shape)
    sup = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey", "s_nationkey"]
                                ).to_pandas()
    smap_keys = np.sort(sup["s_suppkey"].to_numpy().astype(np.int64))
    smap_nat = (sup.sort_values("s_suppkey")["s_nationkey"]
                .to_numpy().astype(np.int64))
    sup_ref = ray.put((smap_keys, smap_nat))
    nk_ref = ray.put(nkeys)

    # ---- stage 1: orderkey → customer nation ----------------------------
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey",
                                            "o_orderdate"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])

    def o_rows(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        m = (od >= _Q5_D0_US) & (od < _Q5_D1_US)
        ck = batch.column("o_custkey").to_numpy().astype(np.int64)[m]
        ok = batch.column("o_orderkey").to_numpy().astype(np.int64)[m]
        return pa.table({"ck": pa.array(ck), "ok": pa.array(ok),
                         "nk": pa.nulls(len(ck), pa.int64()),
                         "_shard": pa.array(ck % C)})

    def c_rows(batch: pa.Table) -> pa.Table:
        keys = ray.get(nk_ref)
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)
        nk = batch.column("c_nationkey").to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, nk)
        pos[pos >= len(keys)] = 0
        m = keys[pos] == nk if len(keys) else np.zeros(len(ck), bool)
        return pa.table({"ck": pa.array(ck[m]),
                         "ok": pa.nulls(int(m.sum()), pa.int64()),
                         "nk": pa.array(nk[m]),
                         "_shard": pa.array(ck[m] % C)})

    def resolve_cnation(df: pd.DataFrame) -> pd.DataFrame:
        dim = df[df["nk"].notna()][["ck", "nk"]]
        fact = df[df["ok"].notna()][["ck", "ok"]]
        j = fact.merge(dim, on="ck", how="inner")
        return pd.DataFrame({"ok": j["ok"].astype(np.int64),
                             "cnat": j["nk"].astype(np.int64)})

    onat = (orders.map_batches(o_rows, batch_format="pyarrow")
            .union(cust.map_batches(c_rows, batch_format="pyarrow"))
            .groupby("_shard")
            .map_groups(resolve_cnation, batch_format="pandas"))

    # ---- stage 2: lineitem revenue per (orderkey, supplier nation) ------
    line = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                 columns=["l_orderkey", "l_suppkey",
                                          "l_extendedprice", "l_discount"])

    def l_partial(batch: pa.Table) -> pa.Table:
        sk_keys, sk_nat = ray.get(sup_ref)
        ok = batch.column("l_orderkey").to_numpy().astype(np.int64)
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        p = batch.column("l_extendedprice").to_numpy()
        d = batch.column("l_discount").to_numpy()
        pos = np.searchsorted(sk_keys, sk)
        pos[pos >= len(sk_keys)] = 0
        snat = sk_nat[pos]
        cents = np.floor(p * (1.0 - d) * 100.0 + 0.5).astype(np.int64)
        key = ok * np.int64(64) + snat          # nationkey < 64 by schema
        uk, inv = np.unique(key, return_inverse=True)
        s = (np.bincount(inv, weights=cents.astype(np.float64))
             .astype(np.int64))
        uok = uk // np.int64(64)
        return pa.table({"ok": pa.array(uok),
                         "snat": pa.array(uk % np.int64(64)),
                         "rev_c": pa.array(s),
                         "cnat": pa.nulls(len(uk), pa.int64()),
                         "_shard": pa.array(uok % C)})

    def tag_cnat(batch: pa.Table) -> pa.Table:
        ok = batch.column("ok").to_numpy().astype(np.int64)
        return pa.table({"ok": pa.array(ok),
                         "snat": pa.nulls(len(ok), pa.int64()),
                         "rev_c": pa.nulls(len(ok), pa.int64()),
                         "cnat": batch.column("cnat").cast(pa.int64()),
                         "_shard": pa.array(ok % C)})

    def fold_nation(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["cnat"].notna()][["ok", "cnat"]]
        right = df[df["rev_c"].notna()][["ok", "snat", "rev_c"]]
        j = right.merge(left, on="ok", how="inner")
        j = j[j["snat"].astype(np.int64) == j["cnat"].astype(np.int64)]
        if not len(j):
            return pd.DataFrame({"nk": pd.Series([], dtype=np.int64),
                                 "rev_c": pd.Series([], dtype=np.int64)})
        g = (j.groupby(j["snat"].astype(np.int64))["rev_c"].sum()
             .astype(np.int64))
        return pd.DataFrame({"nk": g.index.to_numpy(np.int64),
                             "rev_c": g.to_numpy(np.int64)})

    per_nat = (line.map_batches(l_partial, batch_format="pyarrow")
               .union(onat.map_batches(tag_cnat, batch_format="pyarrow"))
               .groupby("_shard")
               .map_groups(fold_nation, batch_format="pandas")
               .groupby("nk").aggregate(Sum("rev_c", alias_name="rev_c"))
               .to_pandas())
    per_nat["n_name"] = per_nat["nk"].map(nname)
    per_nat = (per_nat.sort_values(["rev_c", "n_name"],
                                   ascending=[False, True])
               .reset_index(drop=True))
    return per_nat[["n_name", "rev_c"]]


_Q7_NATIONS = ("NATION_3", "NATION_7")
_Q7_Y0, _Q7_Y1 = 1996, 1999


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7 shape (volume shipping): revenue between two nations per
    (supp_nation, cust_nation, year), shipped within [Y0, Y1].

    Shape: the supplier→nation and customer→nation sides broadcast once
    (``ray.put`` sorted key arrays + searchsorted — supplier is
    dim-bounded; the customer map is customer-table-sized, the
    q_top_orders-documented bound, and would become a hash join at a
    scale where customers outgrow worker heaps); lineitem pre-filters and
    pre-reduces per (orderkey, supp_nation, year) map-side; the ONE real
    exchange is the orderkey hash join against the filtered orders
    stream; the final groupby is nations²×years-sized.  Oracle-gated
    (oracle.q_tpch_q7)."""
    import ray

    ensure_worker_importable()
    nat = ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    sup = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey", "s_nationkey"]).to_pandas()
    cus = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                columns=["c_custkey", "c_nationkey"]).to_pandas()
    wanted = set(_Q7_NATIONS)
    skeys = np.sort(sup.loc[[nmap[int(k)] in wanted
                             for k in sup["s_nationkey"]],
                            "s_suppkey"].to_numpy().astype(np.int64))
    snat = {int(r.s_suppkey): nmap[int(r.s_nationkey)]
            for r in sup.itertuples() if nmap[int(r.s_nationkey)] in wanted}
    ckeys_df = cus.loc[[nmap[int(k)] in wanted for k in cus["c_nationkey"]]]
    cmap = {int(r.c_custkey): nmap[int(r.c_nationkey)]
            for r in ckeys_df.itertuples()}
    s_ref = ray.put((skeys, np.asarray([snat[int(k)] for k in skeys],
                                       dtype=object)))
    c_ref = ray.put(cmap)

    def line_part(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(s_ref)
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, sk)
        pos[pos >= len(keys)] = 0
        hit = (keys[pos] == sk) if len(keys) else np.zeros(len(sk), bool)
        yr = pc.year(batch.column("l_shipdate")).to_numpy()
        hit &= (yr >= _Q7_Y0) & (yr <= _Q7_Y1)
        t = batch.filter(pa.array(hit))
        p = t.column("l_extendedprice").to_numpy()
        d = t.column("l_discount").to_numpy()
        cents = np.floor(p * (1.0 - d) * 100.0 + 0.5).astype(np.int64)
        sk2 = t.column("l_suppkey").to_numpy().astype(np.int64)
        pos2 = np.searchsorted(keys, sk2)
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "supp_nation": pa.array(names[pos2], pa.string()),
            "year": pa.array(pc.year(t.column("l_shipdate")).to_numpy()
                             .astype(np.int64)),
            "rev_c": pa.array(cents)})

    def order_part(batch: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        ck = batch.column("o_custkey").to_numpy().astype(np.int64)
        nat_col = np.asarray([cm.get(int(k), "") for k in ck], dtype=object)
        keep = nat_col != ""
        t = batch.filter(pa.array(keep))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "cust_nation": pa.array(nat_col[keep], pa.string())})

    li = (ray.data.read_parquet(
              f"{sf_dir}/lineitem.parquet",
              columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                       "l_discount", "l_shipdate"])
          .map_batches(line_part, batch_format="pyarrow"))
    od = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
          .map_batches(order_part, batch_format="pyarrow"))
    joined = li.join(od, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def cross_part(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("supp_nation"),
                            batch.column("cust_nation"))
        t = batch.filter(keep)
        return pa.table({"supp_nation": t.column("supp_nation"),
                         "cust_nation": t.column("cust_nation"),
                         "year": t.column("year"),
                         "rev_c": t.column("rev_c")})

    from ray.data.aggregate import Sum

    return (joined.map_batches(cross_part, batch_format="pyarrow")
            .groupby(["supp_nation", "cust_nation", "year"])
            .aggregate(Sum("rev_c", alias_name="rev_c"))
            .sort(["supp_nation", "cust_nation", "year"]))


_Q9_TYPE = "PROMO"


def q_tpch_q9(sf_dir: str):
    """TPC-H Q9 shape (product profit): revenue of PROMO-type parts per
    (supp_nation, year) — ONE lineitem scan with BOTH dim sides
    broadcast (supplier→nation and the filtered part-key set are
    dim-bounded; searchsorted membership), map-side exact-cents
    pre-reduce per (nation, year), nations×years final groupby.  No
    row-level shuffle at all — the Q7 sibling demonstrates the
    fact-fact join; this one demonstrates the pure broadcast-star.
    Oracle-gated (oracle.q_tpch_q9)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    nat = ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    sup = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey", "s_nationkey"]).to_pandas()
    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_type"]).to_pandas()
    skeys = np.sort(sup["s_suppkey"].to_numpy().astype(np.int64))
    snames = np.asarray(
        [nmap[int(k)] for k in sup.set_index("s_suppkey")
         .loc[skeys, "s_nationkey"]], dtype=object)
    pkeys = np.sort(part.loc[part["p_type"] == _Q9_TYPE, "p_partkey"]
                    .to_numpy().astype(np.int64))
    refs = ray.put((skeys, snames, pkeys))

    def line_part(batch: pa.Table) -> pa.Table:
        sk_arr, sn_arr, pk_arr = ray.get(refs)
        pk = batch.column("l_partkey").to_numpy().astype(np.int64)
        pos = np.searchsorted(pk_arr, pk)
        pos[pos >= len(pk_arr)] = 0
        keep = (pk_arr[pos] == pk) if len(pk_arr) else             np.zeros(len(pk), bool)
        t = batch.filter(pa.array(keep))
        sk = t.column("l_suppkey").to_numpy().astype(np.int64)
        spos = np.searchsorted(sk_arr, sk)
        p = t.column("l_extendedprice").to_numpy()
        d = t.column("l_discount").to_numpy()
        cents = np.floor(p * (1.0 - d) * 100.0 + 0.5).astype(np.int64)
        yr = pc.year(t.column("l_shipdate")).to_numpy().astype(np.int64)
        df = pd.DataFrame({"supp_nation": sn_arr[spos], "year": yr,
                           "cents": cents})
        g = df.groupby(["supp_nation", "year"], sort=False)["cents"].sum()
        idx = g.index.to_frame(index=False)
        return pa.table({
            "supp_nation": pa.array(idx["supp_nation"], pa.string()),
            "year": pa.array(idx["year"].to_numpy().astype(np.int64)),
            "rev_c": pa.array(g.to_numpy().astype(np.int64))})

    li = (ray.data.read_parquet(
              f"{sf_dir}/lineitem.parquet",
              columns=["l_partkey", "l_suppkey", "l_extendedprice",
                       "l_discount", "l_shipdate"])
          .map_batches(line_part, batch_format="pyarrow"))
    return (li.groupby(["supp_nation", "year"])
            .aggregate(Sum("rev_c", alias_name="rev_c"))
            .sort(["supp_nation", "year"]))


def q_json_props(sf_dir: str):
    """Semi-structured ETL: extract the integer ``k`` from the events
    JSON ``props`` column with ONE vectorized RE2 pass
    (pyarrow.compute.extract_regex — no per-row json.loads) and fold
    per-event-type stats map-side; the shuffle carries one partial row
    per (block, event_type).  Oracle: DuckDB json_extract on the same
    column (independent parser — a regex bug shows up as a mismatch)."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch.column("props"), r'"k": (?P<k>\d+)')
        k = pc.struct_field(ex, "k").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        ue, inv = np.unique(et, return_inverse=True)
        cnt = np.bincount(inv)
        ks = k[np.argsort(inv, kind="stable")]
        starts = np.r_[0, np.cumsum(cnt)[:-1]]
        return pa.table({
            "event_type": pa.array(ue),
            "n": pa.array(cnt.astype(np.int64)),
            "sum_k": pa.array(np.bincount(
                inv, weights=k.astype(np.float64)).astype(np.int64)),
            "min_k": pa.array(np.minimum.reduceat(ks, starts)),
            "max_k": pa.array(np.maximum.reduceat(ks, starts)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_k", alias_name="sum_k"),
                       Min("min_k", alias_name="min_k"),
                       Max("max_k", alias_name="max_k")))


def q_image_entropy(sf_dir: str):
    """Per-image Shannon entropy of the 16-bin luminance histogram over
    REAL decoded PNG pixels (pipelines/flagship.ImageEntropy) — the
    flat/synthetic-image detector.  Exact integer bin counts; the float
    entropy is a fixed-order left-fold rounded to 6 dp on both sides.
    Oracle-gated (oracle.q_image_entropy)."""
    from .flagship import image_entropy

    ensure_worker_importable()
    return image_entropy(sf_dir)


# BM25 retrieval scoring: fixed 3-term query, Okapi constants
BM25_TERMS = ["hash", "window", "vector"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def q_bm25(sf_dir: str):
    """BM25 retrieval: score every document against the fixed 3-term
    query and return the global top-20 — the lexical-retrieval sibling of
    the ANN family.  Two streaming passes, no row-stream shuffle:

    1. one combiner pass emits a single row per block (n_docs, Σ token
       count, per-term distinct-doc df — exact, a document is atomic in
       its row) → a Sum aggregate → the corpus stats broadcast via
       ``ray.put``;
    2. a second pass tokenizes batch-locally (single-space split, the
       q_tfidf convention), computes the Okapi score as the identical
       fixed-order double expression the oracle evaluates
       (``(s1 + s2) + s3``; ln/÷ per term), rounds to 6 dp, and pre-cuts
       a per-block top-20 so the driver finish sorts blocks×20 rows.

    Ties at the k boundary are pinned by (score DESC, doc_id ASC) on
    both sides.  Oracle: oracle.q_bm25."""
    import ray

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    terms = BM25_TERMS

    def _term_tfs(batch: pa.Table):
        """Vectorized (dl, [tf per query term]) via ONE Arrow split —
        no per-row Python in the hot path."""
        lists = pc.split_pattern(batch.column("text"), " ")
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        flat = pc.list_flatten(lists)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        tfs = []
        for term in terms:
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tfs.append(np.bincount(doc_idx[m], minlength=len(lens))
                       .astype(np.int64))
        return lens, tfs

    def stats_partial(batch: pa.Table) -> pa.Table:
        dl, tfs = _term_tfs(batch)
        row = {"n_docs": pa.array([len(dl)], pa.int64()),
               "sum_dl": pa.array([int(dl.sum())], pa.int64())}
        for j, tf in enumerate(tfs):
            row[f"df{j}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(row)

    from ray.data.aggregate import Sum

    st = (ds.map_batches(stats_partial, batch_format="pyarrow")
          .aggregate(Sum("n_docs", alias_name="n_docs"),
                     Sum("sum_dl", alias_name="sum_dl"),
                     *[Sum(f"df{j}", alias_name=f"df{j}")
                       for j in range(len(terms))]))
    n_docs = float(st["n_docs"])
    avgdl = float(st["sum_dl"]) / n_docs
    dfs = [float(st[f"df{j}"]) for j in range(len(terms))]
    # idf_t = ln(1 + (N - df + 0.5)/(df + 0.5)) — same expression in SQL
    idfs = [float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
            for df in dfs]
    k1, b = BM25_K1, BM25_B

    def score_cut(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").to_numpy()
        dl_i, tfs = _term_tfs(batch)
        dl = dl_i.astype(np.float64)
        denom_tail = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(len(dids), dtype=np.float64)
        any_tf = np.zeros(len(dids), dtype=bool)
        for tf_i, idf in zip(tfs, idfs):       # left-fold == SQL s1+s2+s3
            tf = tf_i.astype(np.float64)
            score = score + idf * (tf * (k1 + 1.0)) / (tf + denom_tail)
            any_tf |= tf_i > 0
        score = np.round(score, 6)
        keep = np.flatnonzero(any_tf)
        order = keep[np.lexsort((dids[keep], -score[keep]))][:BM25_TOPK]
        return pa.table({"doc_id": pa.array(dids[order]),
                         "score": pa.array(score[order])})

    got = ds.map_batches(score_cut, batch_format="pyarrow").to_pandas()
    got = (got.sort_values(["score", "doc_id"], ascending=[False, True],
                           kind="stable")
           .head(BM25_TOPK).reset_index(drop=True))
    return got


RRF_K = 60
RRF_TOPK = 10


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of two retrieval rankers — the standard
    multi-signal retrieval combiner (RRF, Cormack et al.): the BM25
    top-20 for the fixed query (q_bm25's exact chain) fused with a
    quality-prior top-20 (q_quality's exact score), rrf(d) =
    1/(K + r_bm25) + 1/(K + r_quality) with absent ranks contributing 0,
    top-RRF_TOPK by (rrf DESC, doc_id).

    Shape: both rankers are per-block pre-cut streams (blocks×20 rows
    reach the driver — never the corpus); the fusion itself is a
    40-row driver step.  Oracle-gated (oracle.q_rrf_fusion wraps the two
    standalone oracles with ROW_NUMBER + FULL OUTER JOIN)."""
    import ray

    from ..stages.text import quality_batch

    ensure_worker_importable()
    bm = q_bm25(sf_dir)                      # pandas top-20 (doc_id, score)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def qual_cut(batch: pa.Table) -> pa.Table:
        t = quality_batch(batch)
        q = t.column("quality").to_numpy()
        d = t.column("doc_id").to_numpy()
        order = np.lexsort((d, -q))[:BM25_TOPK]
        return pa.table({"doc_id": pa.array(d[order]),
                         "quality": pa.array(q[order])})

    qual = (ds.map_batches(qual_cut, batch_format="pyarrow").to_pandas()
            .sort_values(["quality", "doc_id"], ascending=[False, True],
                         kind="stable").head(BM25_TOPK))
    ranks: dict[int, list[int]] = {}
    for j, side in enumerate((bm, qual)):
        for r, d in enumerate(side["doc_id"].to_numpy(), start=1):
            ranks.setdefault(int(d), [0, 0])[j] = r
    dids = np.asarray(sorted(ranks), dtype=np.int64)
    rb = np.asarray([ranks[int(d)][0] for d in dids], dtype=np.int64)
    rq = np.asarray([ranks[int(d)][1] for d in dids], dtype=np.int64)
    # fixed evaluation order (bm25 term + quality term) == the oracle's
    # COALESCE(a, 0) + COALESCE(b, 0)
    rrf = np.round(np.where(rb > 0, 1.0 / (RRF_K + rb), 0.0)
                   + np.where(rq > 0, 1.0 / (RRF_K + rq), 0.0), 9)
    order = np.lexsort((dids, -rrf))[:RRF_TOPK]
    return pd.DataFrame({"doc_id": dids[order], "rrf": rrf[order],
                         "r_bm25": rb[order], "r_quality": rq[order]})


def q_containment_pairs(sf_dir: str):
    """Asymmetric containment (|A∩B|/|A|, |A∩B|/|B|) for every banded
    MinHash candidate pair — the quote/subset signal Jaccard misses
    (stages/dedup.containment_pairs).  Oracle-gated
    (oracle.q_containment_pairs extends the minhash-est machinery)."""
    import ray

    from ..stages.dedup import containment_pairs

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return containment_pairs(ds)


def q_bpe_first_merge(sf_dir: str):
    """Tokenizer training, step 1: the global top-20 adjacent character
    pairs inside words (the first BPE merge candidates).  Per-block
    combiner partials over unique words → ONE alphabet²-bounded pair
    groupby → driver top-k cut.  Oracle-gated (oracle.q_bpe_first_merge
    = unnest word windows + substr pairs)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.text import BPE_MERGE_TOPK, bpe_pair_partial

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    agg = (ds.map_batches(bpe_pair_partial, batch_format="pyarrow")
           .groupby("pair").aggregate(Sum("c", alias_name="c"))
           .to_pandas())          # alphabet²-bounded by construction
    return (agg.sort_values(["c", "pair"], ascending=[False, True],
                            kind="stable")
            .head(BPE_MERGE_TOPK).reset_index(drop=True))


def q_matryoshka(sf_dir: str):
    """Matryoshka prefix-energy census (stages/quantize.mrl_census_batch):
    squared norms of each embedding's 8/16/32/64-dim prefixes — the
    truncation-quality check run before serving shortened embeddings.
    Stateless vectorized map.  Oracle-gated (oracle.q_matryoshka with
    explicit left-associated chains)."""
    import ray

    from ..stages.quantize import mrl_census_batch

    ensure_worker_importable()
    return (ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                  columns=["vec_id", "embedding"])
            .map_batches(mrl_census_batch, batch_format="pyarrow"))


def q_jl_distortion(sf_dir: str):
    """Johnson-Lindenstrauss sketch-quality census: per vector the exact
    squared norm and the mean squared norm of its ±1 sign projection
    (64 → 16) — the norm-preservation check run before trusting a
    projected index (stages/quantize.jl_project_batch).  Stateless
    vectorized map, no shuffle.  Oracle-gated (oracle.q_jl_distortion
    embeds the sign matrix as explicit left-associated term chains)."""
    import ray

    from ..stages.quantize import jl_project_batch

    ensure_worker_importable()
    return (ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                  columns=["vec_id", "embedding"])
            .map_batches(jl_project_batch, batch_format="pyarrow"))


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic dedup over embeddings: one representative
    per coarse PQ bucket (stages/quantize.semantic_dedup).  Oracle-gated
    (oracle.q_semantic_dedup re-derives the packed argmin codes)."""
    from ..stages.quantize import semantic_dedup

    ensure_worker_importable()
    return semantic_dedup(sf_dir)


MMR_LAMBDA = 0.7
MMR_TOPK = 10


def q_mmr_rerank(sf_dir: str):
    """Maximal-marginal-relevance re-ranking of the BM25 top-20:
    greedily pick argmax of λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)
    (sim = exact word-3-gram Jaccard, unrounded — IEEE division of exact
    integer counts is bit-identical on both sides), ties by doc_id —
    the retrieval-diversification step between retrieval and context
    assembly.  Candidates are top-k-bounded, so the greedy loop is k²
    driver work at ANY corpus scale; the pairwise sims come from ONE
    vectorized _pair_jaccard_counts call.  Oracle-gated
    (oracle.q_mmr_rerank = recursive-CTE greedy selection)."""
    import ray

    from ..stages.dedup import _pair_jaccard_counts

    ensure_worker_importable()
    bm = q_bm25(sf_dir)                      # top-20 (doc_id, score)
    cand = bm["doc_id"].to_numpy().astype(np.int64)
    rel = dict(zip(cand, bm["score"].to_numpy()))
    ids_ref = ray.put(pa.array(cand))

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("doc_id"),
                                     value_set=ray.get(ids_ref)))

    texts = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])
             .map_batches(pick, batch_format="pyarrow").to_pandas())
    tmap = dict(zip(texts["doc_id"].astype(np.int64), texts["text"]))
    k = len(cand)
    ta, tb, keys = [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            ta.append(tmap[cand[i]])
            tb.append(tmap[cand[j]])
            keys.append((int(min(cand[i], cand[j])),
                         int(max(cand[i], cand[j]))))
    num, den, _, _ = _pair_jaccard_counts(ta, tb)
    sim = {key: (num[i] / den[i] if den[i] else 1.0)
           for i, key in enumerate(keys)}
    selected: list[int] = []
    remaining = set(int(c) for c in cand)
    for _ in range(min(MMR_TOPK, k)):
        best = None
        for c in sorted(remaining):
            ms = max((sim[(min(c, s), max(c, s))] for s in selected),
                     default=0.0)
            sc = MMR_LAMBDA * rel[c] - (1 - MMR_LAMBDA) * ms
            if best is None or sc > best[0]:
                best = (sc, c)
        selected.append(best[1])
        remaining.discard(best[1])
    return pd.DataFrame({
        "rank": np.arange(1, len(selected) + 1, dtype=np.int64),
        "doc_id": np.asarray(selected, dtype=np.int64)})


def q_langid_confusion(sf_dir: str):
    """Classifier QA: confusion matrix of the n-gram language-ID heuristic
    against the labeled lang column — (lang, lang_pred, n).  One stateless
    vectorized pass + a (langs×preds)-sized groupby.  Oracle-gated
    (oracle.q_langid_confusion reuses the q_langid marker expression)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.text import langid_batch

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        pred = langid_batch(batch).column("lang_pred")
        df = pd.DataFrame({
            "lang": batch.column("lang").to_numpy(zero_copy_only=False),
            "lang_pred": pred.to_numpy(zero_copy_only=False)})
        g = (df.groupby(["lang", "lang_pred"], sort=False)
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "lang_pred"])
            .aggregate(Sum("n", alias_name="n")))


def q_od_matrix(sf_dir: str):
    """Origin→destination flow matrix over the per-(zone, street) tracks
    (stages/tracks.od_matrix): per-track endpoints resolve inside the
    coarse shards, so the only post-shard shuffle moves the sparse
    (o_cell, d_cell) support — the mobility-flow primitive (where do
    trips start and end).  Exact-integer 64×64 grid cells from the
    micro-degree coordinates.  Oracle-gated (oracle.q_od_matrix via
    arg_min/arg_max endpoint windows)."""
    from ..stages.tracks import od_matrix

    ensure_worker_importable()
    return od_matrix(sf_dir)


def q_speed_spikes(sf_dir: str):
    """GPS implausible-jump census (stages/tracks.speed_spikes): per
    track, the count of steps longer than SPIKE_LEN_U plus the max
    integer step length — the trace-cleaning signal that decides whether
    a trajectory is usable.  Exact int64 squared-step comparisons; same
    shard/lexsort scaffold as the other geometry kernels.  Oracle-gated
    (oracle.q_speed_spikes via LAG windows)."""
    from ..stages.tracks import speed_spikes

    ensure_worker_importable()
    return speed_spikes(sf_dir)


def q_hex_cells(sf_dir: str):
    """H3-style axial hex binning (geo/cells.hex_qr): pointy-top hexagons
    of 0.25° circumradius, cube rounding with the tie-free floor(v+0.5)
    convention — the north-star's hex-cell partitioning primitive (hexes
    have uniform neighbor distance, unlike square tiles).  One stateless
    vectorized pass + a hex-support-sized groupby.  Oracle-gated
    (oracle.q_hex_cells mirrors the double chain op-for-op)."""
    import ray
    from ray.data.aggregate import Sum

    from ..geo.cells import hex_qr

    ensure_worker_importable()

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(d)
        hq, hr = hex_qr(lon, lat)
        key = hq * 1_000_000 + hr     # |q|,|r| < 500k: collision-free pack
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"hexq": pa.array(uk // 1_000_000),
                         "hexr": pa.array(uk - (uk // 1_000_000) * 1_000_000),
                         "n": pa.array(cnt.astype(np.int64))})

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["hexq", "hexr"]).aggregate(Sum("n", alias_name="n_points")))


_Q18_MIN_QTY = 150   # HAVING cut: orders with > 150 total units


def q_big_orders(sf_dir: str):
    """TPC-H Q18 shape — large-volume orders: lineitem pre-aggregates
    quantity per order map-side (bincount partials), ONE groupby merges
    them, the HAVING cut (> _Q18_MIN_QTY units) leaves an
    orderkey set bounded by the cut's selectivity which broadcasts via
    ``ray.put`` (the q_broadcast_join contract) to filter the orders
    stream; the customer dim attaches driver-free via the same broadcast
    discipline.  Quantities are integral doubles → exact int64 sums.
    Oracle-gated (oracle.q_big_orders)."""
    import ray

    ensure_worker_importable()

    def qty_partial(batch: pa.Table) -> pa.Table:
        k = batch.column("l_orderkey").to_numpy()
        q = batch.column("l_quantity").to_numpy().astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.bincount(inv, weights=q.astype(np.float64)).astype(np.int64)
        return pa.table({"l_orderkey": pa.array(uk), "q": pa.array(s)})

    from ray.data.aggregate import Sum

    big = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                 columns=["l_orderkey", "l_quantity"])
           .map_batches(qty_partial, batch_format="pyarrow")
           .groupby("l_orderkey").aggregate(Sum("q", alias_name="sum_qty"))
           .filter(expr=f"sum_qty > {_Q18_MIN_QTY}")
           .to_pandas())   # bounded by the HAVING selectivity by contract
    qty_map = dict(zip(big["l_orderkey"].astype(np.int64), big["sum_qty"]))
    keys_ref = ray.put(np.sort(big["l_orderkey"].to_numpy().astype(np.int64)))
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name"]).to_pandas()
    cust_ref = ray.put(dict(zip(cust["c_custkey"].astype(np.int64),
                                cust["c_name"])))
    qty_ref = ray.put(qty_map)

    def attach(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        ok = batch.column("o_orderkey").to_numpy()
        pos = np.searchsorted(keys, ok)
        pos = np.minimum(pos, len(keys) - 1) if len(keys) else pos
        m = (len(keys) > 0) & (keys[pos] == ok) if len(keys) else \
            np.zeros(len(ok), dtype=bool)
        sub = batch.filter(pa.array(m))
        ok2 = sub.column("o_orderkey").to_numpy()
        ck = sub.column("o_custkey").to_numpy().astype(np.int64)
        cmap, qmap = ray.get(cust_ref), ray.get(qty_ref)
        price = sub.column("o_totalprice").to_numpy()
        return pa.table({
            "c_name": pa.array([cmap[c] for c in ck], pa.string()),
            "c_custkey": pa.array(ck),
            "o_orderkey": pa.array(ok2),
            "o_orderdate": sub.column("o_orderdate"),
            "total_c": pa.array(np.floor(price * 100.0 + 0.5).astype(np.int64)),
            "sum_qty": pa.array(np.asarray([qmap[k] for k in ok2], np.int64)),
        })

    return (ray.data.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_custkey", "o_orderdate",
                         "o_totalprice"])
            .map_batches(attach, batch_format="pyarrow"))


# power-of-two padding buckets up to 64k tokens (CASE chain in the oracle)
_PAD_MAX_POW = 16


def q_pad_waste(sf_dir: str):
    """LLM batch-packing efficiency census: bucket every document by the
    next power of two of its whitespace token count, and report per
    bucket the doc count, true token sum and the padding waste a
    pad-to-bucket-max batcher would pay (n_docs·bucket − sum_tokens) —
    the measurement that motivates q_seq_pack.  Stateless token counting
    (stages/text.token_count_batch) + per-batch np.unique partials; the
    shuffle moves ≤ 17 bucket rows per block.  Oracle-gated
    (oracle.q_pad_waste)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.text import token_count_batch

    ensure_worker_importable()
    # exact next-pow2 lookup (clamped to 2^_PAD_MAX_POW)
    lut_max = 1 << _PAD_MAX_POW

    def partial(batch: pa.Table) -> pa.Table:
        n = token_count_batch(batch).column("n_tokens").to_numpy() \
            .astype(np.int64)
        b = np.maximum(n, 1)
        # next-pow2 via frexp (exact: bit_length(b-1) = frexp exponent)
        _, e = np.frexp((b - 1).astype(np.float64))
        bucket = np.minimum(np.int64(1) << e.astype(np.int64), lut_max)
        uk, inv = np.unique(bucket, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        tok = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        return pa.table({"bucket": pa.array(uk), "n_docs": pa.array(cnt),
                         "sum_tokens": pa.array(tok)})

    agg = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("bucket")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("sum_tokens", alias_name="sum_tokens")))

    def waste(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy()
        nd = batch.column("n_docs").to_numpy()
        st = batch.column("sum_tokens").to_numpy()
        return batch.append_column(
            "pad_waste", pa.array((b * nd - st).astype(np.int64)))

    return agg.map_batches(waste, batch_format="pyarrow")


KNN_GRAPH_R_U = 100_000   # bounded kNN radius: 0.1° in micro-degrees
KNN_GRAPH_K = 3


def q_knn_graph(sf_dir: str):
    """Bounded-radius exact kNN graph (stages/spatial.knn_graph): every
    point's 3 nearest other points within 0.1° — the neighborhood-graph
    primitive under spatial smoothing / local outlier detection.  Grid
    cells at the radius + 3×3 probe fan-out make each point's candidate
    set cell-local, so the per-point top-k finishes inside the one cell
    groupby.  Exact int64 µ° distances, (d2, nbr_id) tie-break.
    Oracle-gated (oracle.q_knn_graph ROW_NUMBER)."""
    import ray

    from ..stages.spatial import knn_graph

    ensure_worker_importable()

    def to_u(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(d)
        return pa.table({
            "doc_id": pa.array(d),
            "ix": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "iy": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
        })

    pts = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
           .map_batches(to_u, batch_format="pyarrow"))
    return knn_graph(pts, KNN_GRAPH_R_U, k=KNN_GRAPH_K)


def q_rolling_window(sf_dir: str):
    """Bounded window-frame aggregate (stages/window.rolling_frame):
    SUM(cents) OVER (... ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) per
    user — the frame member of the window family (running sums are the
    UNBOUNDED PRECEDING case, q_window_funcs).  Coarse-shard + one flat
    lexsort; the frame sum is a clamped cumsum difference.  Oracle-gated
    (oracle.q_rolling_window)."""
    import ray

    from ..stages.window import rolling_frame

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "value"])
    return rolling_frame(ds)


def q_pmi_assoc(sf_dir: str):
    """Categorical association census: pointwise mutual information of
    (lang, source) over documents — pmi = ln(n·N / (n_lang·n_src)),
    rounded to 6 places.  One contingency combiner (per-block np.unique
    partials → a langs×sources-sized groupby) + a margins broadcast-free
    finish: the contingency IS the margins source, so the finish is a
    single in-batch normalization over the tiny aggregate.  Oracle-gated
    (oracle.q_pmi_assoc evaluates the identical double expression)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch.column("lang").to_numpy(zero_copy_only=False),
            "source": batch.column("source").to_numpy(zero_copy_only=False)})
        g = (df.groupby(["lang", "source"], sort=False)
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["lang", "source"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["lang", "source"]).aggregate(Sum("n", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        # the contingency is category²-sized: margins resolve in-batch
        df = batch.to_pandas()
        N = float(df["n"].sum())
        nl = df.groupby("lang")["n"].transform("sum").to_numpy().astype(np.float64)
        ns = df.groupby("source")["n"].transform("sum").to_numpy().astype(np.float64)
        n = df["n"].to_numpy().astype(np.float64)
        pmi = np.round(np.log((n * N) / (nl * ns)), 6)
        return pa.table({"lang": pa.array(df["lang"], pa.string()),
                         "source": pa.array(df["source"], pa.string()),
                         "n": pa.array(df["n"].to_numpy()),
                         "pmi": pa.array(pmi)})

    # one block by construction (category² rows) → the finish sees the
    # whole contingency
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def q_compress_ratio(sf_dir: str):
    """Compressibility quality signal (rows-only: no SQL zlib): per-doc
    DEFLATE-compressed length over raw length — the standard
    low-information-content filter in corpus curation (highly repetitive
    boilerplate compresses far below natural text).  zlib level 6, ratio
    in exact integer permille (comp·1000 // raw) so the output is
    deterministic across platforms; the per-row C call is the same
    per-row-hash shape as md5 — no Python-level inner loop beyond the
    dispatch.  Round-trip + planted-ordering tests carry correctness
    (tests/test_round4_late.py)."""
    import zlib

    import ray

    ensure_worker_importable()

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        raw = np.fromiter((len(t.encode("utf-8")) for t in texts),
                          dtype=np.int64, count=len(texts))
        comp = np.fromiter(
            (len(zlib.compress(t.encode("utf-8"), 6)) for t in texts),
            dtype=np.int64, count=len(texts))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "raw_len": pa.array(raw),
            "comp_len": pa.array(comp),
            "ratio_pm": pa.array(np.where(raw > 0, (comp * 1000) // np.maximum(raw, 1),
                                          1000).astype(np.int64)),
        })

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
            .map_batches(f, batch_format="pyarrow"))


def q_range_frame(sf_dir: str):
    """RANGE (value-window) frame aggregate (stages/window.range_frame):
    per event, COUNT(*) OVER (PARTITION BY user ORDER BY ts RANGE 1 HOUR
    PRECEDING) — the burst-rate signal, and the window-family member ROWS
    frames can't express (peer rows with equal ts are all in-frame, per
    SQL RANGE semantics).  Both frame bounds come from two global
    searchsorteds over a composite monotone key — no per-user loop.
    Oracle-gated (oracle.q_range_frame)."""
    import ray

    from ..stages.window import range_frame

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])
    return range_frame(ds)


def q_knn_classify(sf_dir: str):
    """kNN majority-vote classifier over the spatial neighbor graph:
    predict each point's zone as the modal zone of its ≤3 bounded-radius
    nearest neighbors (ties → smallest insee), and flag agreement with
    the point's own zone — the label-spreading / geo-imputation
    primitive.  Neighbor zones derive closed-form from neighbor ids (no
    corpus-side join); the vote is one np.unique over (doc, insee) codes
    inside a knn-output-sized coarse-shard groupby.  Oracle-gated
    (oracle.q_knn_classify)."""
    from ..stages.dedup import _coarse_groups
    from ..stages.spatial import knn_graph

    ensure_worker_importable()
    import ray

    def to_u(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(d)
        return pa.table({
            "doc_id": pa.array(d),
            "ix": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "iy": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
        })

    pts = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
           .map_batches(to_u, batch_format="pyarrow"))
    knn = knn_graph(pts, KNN_GRAPH_R_U, k=KNN_GRAPH_K)
    C = _coarse_groups()

    def shard(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        nbr = batch.column("nbr_id").to_numpy()
        nz = datagen.zone_of(*datagen.lon_lat(nbr))
        return pa.table({
            "doc_id": pa.array(d),
            "nbr_zone": pa.array(nz),
            "_shard": pa.array((d.astype(np.uint64)
                                % np.uint64(C)).astype(np.int64)),
        })

    def vote(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        z = df["nbr_zone"].to_numpy()
        key = d * 1000 + z            # zones < 1000: collision-free pack
        uk, cnt = np.unique(key, return_counts=True)
        ud, uz = uk // 1000, uk % 1000
        # per doc: max count, tie → smallest zone ⇒ lexsort on
        # (zone asc, -cnt, doc) and take first per doc
        order = np.lexsort((uz, -cnt, ud))
        ud, uz, cnt = ud[order], uz[order], cnt[order]
        firsts = np.ones(len(ud), dtype=bool)
        firsts[1:] = ud[1:] != ud[:-1]
        n_nbrs = np.bincount(
            np.cumsum(firsts) - 1, weights=cnt.astype(np.float64)
        ).astype(np.int64)
        d_out = ud[firsts]
        z_pred = uz[firsts]
        own = datagen.zone_of(*datagen.lon_lat(d_out))
        return pd.DataFrame({
            "doc_id": d_out,
            "pred_insee": datagen.insee_of_zone(z_pred).astype(object),
            "n_nbrs": n_nbrs,
            "self_match": (own == z_pred).astype(np.int64),
        })

    return (knn.map_batches(shard, batch_format="pyarrow")
            .groupby("_shard").map_groups(vote, batch_format="pandas"))


def q_ab_ztest(sf_dir: str):
    """Two-sample Welch z-test census: for every event_type (treatment)
    vs all other events (control), the z statistic of the mean-cents
    difference — the A/B-readout primitive, computed entirely from the
    q_group_moments mergeable integer partials (count, Σcents, Σcents²),
    so the row stream shuffles nothing but the key-table-sized moment
    rows.  The double chain (m = s/n; v = s2/n − m·m;
    z = (m1 − m2)/sqrt(v1/n1 + v2/n2)) is pinned op-for-op on both
    sides, inputs exact ints.  Oracle-gated (oracle.q_ab_ztest)."""
    import ray
    from ray.data.aggregate import Sum

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        g = pc.dictionary_encode(batch.column("event_type"))
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = g.indices.to_numpy().astype(np.int64)
        cents = np.floor(batch.column("value").to_numpy() * 100.0
                         + 0.5).astype(np.int64)
        nbins = len(g.dictionary)
        n = np.bincount(codes, minlength=nbins)
        s = np.bincount(codes, weights=cents.astype(np.float64),
                        minlength=nbins).astype(np.int64)
        s2 = np.bincount(codes, weights=(cents * cents).astype(np.float64),
                         minlength=nbins).astype(np.int64)
        return pa.table({"event_type": g.dictionary,
                         "n": pa.array(n.astype(np.int64)),
                         "s": pa.array(s), "s2": pa.array(s2)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                      Sum("s2", alias_name="s2")))

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n1 = df["n"].to_numpy().astype(np.float64)
        s1 = df["s"].to_numpy().astype(np.float64)
        q1 = df["s2"].to_numpy().astype(np.float64)
        n2 = float(df["n"].sum()) - n1
        s2_ = float(df["s"].sum()) - s1
        q2 = float(df["s2"].sum()) - q1
        m1, m2 = s1 / n1, s2_ / n2
        v1 = q1 / n1 - m1 * m1
        v2 = q2 / n2 - m2 * m2
        z = (m1 - m2) / np.sqrt(v1 / n1 + v2 / n2)
        return pa.table({
            "event_type": pa.array(df["event_type"], pa.string()),
            "n": pa.array(df["n"].to_numpy()),
            "mean_c": pa.array(np.round(m1, 6)),
            "z": pa.array(np.round(z, 6)),
        })

    # event-type table is tiny: the finish sees the whole moment table
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def q_track_hausdorff(sf_dir: str):
    """Stride-sampled symmetric Hausdorff similarity between adjacent
    street tracks per zone (stages/tracks.hausdorff_pairs): exact int64
    squared-distance reductions, rounding applied once after min/max
    (they commute with the monotone floor(sqrt+0.5)).  Value-gated:
    oracle.q_track_hausdorff replays the pair join + reductions in SQL."""
    from ..stages.tracks import hausdorff_pairs

    return hausdorff_pairs(sf_dir)


def q_geofence(sf_dir: str):
    """Geofence enter/exit transition extraction per track
    (stages/tracks.geofence_events): exact int64 circle membership
    against the zone-center fence, LAG-style transition detection in one
    flat vectorized pass per shard (oracle.q_geofence via LAG)."""
    from ..stages.tracks import geofence_events

    return geofence_events(sf_dir)


def q_aspect_buckets(sf_dir: str):
    """Aspect-ratio bucketing for batched vision training
    (stages/imagemeta.aspect_buckets): dims parsed from the REAL encoded
    bytes (PNG IHDR / JPEG SOF walk), bucket snap by the exact integer
    cross-multiplication distance, batch-local bincount partials + one
    bucket-table-sized groupby.  The oracle replays the generative dims
    closed-form, so the driver value-checks the byte parsing too."""
    from ..stages.imagemeta import aspect_buckets, image_dims_batch

    ds = (datagen.images_dataset(sf_dir, with_bytes=True)
          .select_columns(["doc_id", "bytes"])
          .map_batches(image_dims_batch, batch_format="pyarrow"))
    return aspect_buckets(ds)


def q_raster_components(sf_dir: str):
    """Raster → vector blob extraction (stages/rastervec.py): occupancy
    grid from bincount partials (ONE grid-bounded shuffle), 4-connected
    adjacency, distributed min-label connected components, per-component
    bbox/count aggregate.  The inverse of q_zone_raster's vector→raster
    direction.  Oracle: recursive-CTE min-label closure over the same
    closed-form grid arithmetic."""
    from ..stages.rastervec import raster_components

    ensure_worker_importable()
    return raster_components(sf_dir)


def q_map_match(sf_dir: str):
    """HMM (Viterbi) map-matching per track (stages/mapmatch.py): integer
    emission (squared distance to candidate-street centroid) + uniform
    integer switch penalty; the DP loop runs over track ordinals with
    every (track × state) lane vectorized.  Value-gated:
    oracle.q_map_match replays the DP as a recursive CTE over per-state
    cost LISTS (the uniform penalty collapses the inner min to
    least(stay, list_min + P), so one self-reference suffices)."""
    from ..stages.mapmatch import map_match

    return map_match(sf_dir)


def q_source_diversity(sf_dir: str):
    """Per-zone source-mix diversity census — the curation-QA signal for
    a multi-source corpus (is a region dominated by one provider?).  All
    metrics are EXACT integers: gini_ppm = floor((n² − Σnₛ²)·10⁶ / n²)
    (Gini impurity in parts-per-million), top_share_ppm = floor(max nₛ ·
    10⁶ / n).  Shape: per-batch (zone, src) bincount partials → ONE
    (zones×4)-bounded groupby sum → dim-bounded driver-style finish in
    arbitrary-precision Python ints (matching SQL HUGEINT — int64 n²
    would overflow past ~3e9 points per zone).  Oracle:
    oracle.q_source_diversity."""
    from ray.data.aggregate import Sum

    from ..stages.tracks import _doc_ids

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(d)
        key = datagen.zone_of(lon, lat) * 4 + (d % 4)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (_doc_ids(sf_dir)
           .map_batches(partial, batch_format="pyarrow")
           .groupby("k").aggregate(Sum("n", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["zone"] = df["k"] // 4
        rows = []
        for zone, g in df.groupby("zone"):
            cs = [int(x) for x in g["n"]]          # Python ints: no overflow
            n = sum(cs)
            sq = sum(c * c for c in cs)
            rows.append({
                "insee": str(int(zone) + 1).zfill(5),
                "n_points": n,
                "n_sources": len(cs),
                "gini_ppm": (n * n - sq) * 1_000_000 // (n * n),
                "top_share_ppm": max(cs) * 1_000_000 // n,
            })
        out = pd.DataFrame(rows).sort_values("insee")
        return pa.table({
            "insee": pa.array(out["insee"], pa.string()),
            "n_points": pa.array(out["n_points"].astype(np.int64)),
            "n_sources": pa.array(out["n_sources"].astype(np.int64)),
            "gini_ppm": pa.array(out["gini_ppm"].astype(np.int64)),
            "top_share_ppm": pa.array(out["top_share_ppm"].astype(np.int64)),
        })

    # zones×4 rows total: the finish sees the whole (dim-bounded) table
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


# deterministic synthetic detection boxes (exact ints; oracle replays them)
IOU_GRID = 200


def _iou_boxes(d: np.ndarray):
    """Per-image GT and predicted boxes as pure hash functions of doc_id
    (x0, y0, w, h); the pred box is the GT box jittered by ±10 px.
    Constants sized so the corpus carries a real mix (~38% of pairs pass
    the IoU ≥ 0.5 gate)."""
    s = datagen.stream
    x0g, y0g = s(d, 11) % IOU_GRID, s(d, 12) % IOU_GRID
    wg, hg = 20 + s(d, 13) % 30, 20 + s(d, 14) % 30
    x0p = x0g + s(d, 15) % 21 - 10
    y0p = y0g + s(d, 16) % 21 - 10
    wp, hp = 20 + s(d, 17) % 30, 20 + s(d, 18) % 30
    return (x0g, y0g, wg, hg), (x0p, y0p, wp, hp)


def q_iou_eval(sf_dir: str):
    """Detection-eval census: per zone, bbox IoU between each image's
    ground-truth and predicted box — n_images, n_match (IoU ≥ 0.5, tested
    EXACTLY as 2·inter ≥ union on ints), sum_iou_milli (floor(inter·1000
    / union)).  The evaluation primitive a vision-training pipeline runs
    over a labeled corpus; boxes here are deterministic synthetic columns
    (the decode seam carries real payloads elsewhere — q_image_*).  One
    stateless vectorized pass + a zone-bounded groupby sum."""
    from ray.data.aggregate import Sum

    from ..stages.tracks import _doc_ids

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(d)
        zone = datagen.zone_of(lon, lat)
        (xg, yg, wg, hg), (xp, yp, wp, hp) = _iou_boxes(d)
        iw = np.maximum(0, np.minimum(xg + wg, xp + wp) - np.maximum(xg, xp))
        ih = np.maximum(0, np.minimum(yg + hg, yp + hp) - np.maximum(yg, yp))
        inter = iw * ih
        union = wg * hg + wp * hp - inter
        match = (2 * inter >= union).astype(np.int64)
        iou_milli = inter * 1000 // union
        nz = datagen.NZONES
        n = np.bincount(zone, minlength=nz)
        nm = np.bincount(zone, weights=match.astype(np.float64),
                         minlength=nz).astype(np.int64)
        si = np.bincount(zone, weights=iou_milli.astype(np.float64),
                         minlength=nz).astype(np.int64)
        keep = n > 0
        zidx = np.flatnonzero(keep)
        return pa.table({
            "insee": pa.array(np.char.zfill((zidx + 1).astype("U"), 5)
                              .astype(object), pa.string()),
            "n_images": pa.array(n[keep].astype(np.int64)),
            "n_match": pa.array(nm[keep]),
            "sum_iou_milli": pa.array(si[keep]),
        })

    return (_doc_ids(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .groupby("insee")
            .aggregate(Sum("n_images", alias_name="n_images"),
                       Sum("n_match", alias_name="n_match"),
                       Sum("sum_iou_milli", alias_name="sum_iou_milli")))


def q_track_frechet(sf_dir: str):
    """Discrete Fréchet distance between adjacent street tracks
    (stages/tracks.frechet_pairs): the order-aware trajectory-similarity
    join (Hausdorff's sibling), exact int64 squared-distance DP with one
    final rounding.  Value-gated: oracle.q_track_frechet replays the DP
    as a recursive CTE whose rows carry the Fréchet table row as a LIST,
    advanced with list_reduce (DuckDB's sequential fold mirrors the
    in-row recurrence the engine prefix-scans)."""
    from ..stages.tracks import frechet_pairs

    return frechet_pairs(sf_dir)


def q_track_lcss(sf_dir: str):
    """LCSS track-pair similarity (stages/tracks.lcss_pairs): tolerant-
    match longest-common-subsequence length between adjacent street
    tracks on the stride sample — the noise-robust trajectory-similarity
    member (outlier points cost nothing, unlike DTW's cumulative sums).
    Oracle-gated (oracle.q_track_lcss: the Fréchet list recursion with
    the identical running-max recurrence)."""
    from ..stages.tracks import lcss_pairs

    ensure_worker_importable()
    return lcss_pairs(sf_dir)


def q_track_dtw(sf_dir: str):
    """DTW alignment cost between adjacent street tracks
    (stages/tracks.dtw_pairs): exact int64 min-plus DP — the ordered
    CUMULATIVE member of the trajectory-similarity suite.  Value-gated:
    oracle.q_track_dtw advances the DP row as a LIST via list_reduce,
    exactly like q_track_frechet but with addition in place of max."""
    from ..stages.tracks import dtw_pairs

    return dtw_pairs(sf_dir)


def q_minhash_est_err(sf_dir: str):
    """MinHash sketch-quality census (stages/dedup.minhash_est_err): per
    banded candidate pair the estimator's evidence (equal signature
    components of 64) next to the exact integer Jaccard num/den — the
    dedup twin of q_ann_recall.  Oracle: oracle.q_minhash_est_err (the
    q_minhash_pairs CTEs, finished with a per-permutation match count
    instead of the threshold cut)."""
    from ..stages.dedup import minhash_est_err

    return minhash_est_err(_docs(sf_dir))


def q_embed_drift(sf_dir: str):
    """Embedding-stream lag-similarity census (stages/ann.embed_drift):
    per label the cosine between consecutive vectors (vec_id order) with
    a negative-similarity drift flag — ingest monitoring for embedding
    pipelines.  Oracle: oracle.q_embed_drift via LAG windows +
    list_inner_product (round-6 convention of the q_ann family)."""
    import ray

    from ..stages.ann import embed_drift

    ensure_worker_importable()
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])
    return embed_drift(ds)


def q_image_pool(sf_dir: str):
    """4×4 grid-pooled luminance features from REAL decoded PNG pixels
    (pipelines/flagship.ImagePool): exact integer block sums — the
    spatial-layout (exposure-map) feature extraction stage.  Value-gated
    like q_image_hist: the oracle replays the generative pixel field and
    the block index math closed-form, so the driver checks the real
    decode path against independent SQL."""
    from .flagship import image_pool

    return image_pool(sf_dir)
