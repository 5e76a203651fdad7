"""Output sinks — the reference's export writers re-expressed on Ray Data.

- K1 CSV: partitioned ``write_csv`` (one dir per zone/dept instead of the
  reference's per-dept file, ``bano/export.py:94-99``)
- K2 JSON lines: ``write_json`` partitioned (``bano/export.py:151-184``)
- K3 RDF/TTL: per-row template render in map_batches + text datasink
  (``bano/export.py:101-146``)
- K5 publish: gzip per-partition files + France-wide concatenation
  (``bano/publish.py:41-72``)

All writes are partitioned (one directory per zone) so a failed run resumes
per partition — never one giant file.
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa

TTL_PREFIX = (
    "@prefix locn: <http://www.w3.org/ns/locn#> .\n"
    "@prefix gn: <http://www.geonames.org/ontology#> .\n")


def render_ttl_batch(batch: pa.Table) -> pa.Table:
    """Address rows → one TTL fragment per row (template render, vectorized
    string assembly; reference bano/export.py:101-146 shape)."""
    ids = batch.column("id").to_pylist()
    num = batch.column("numero").to_pylist()
    voie = batch.column("voie").to_pylist()
    cp = batch.column("code_post").to_pylist()
    lat = batch.column("lat").to_pylist()
    lon = batch.column("lon").to_pylist()
    frags = [
        f"<http://id.bano.local/{i}> a locn:Address ;\n"
        f"  locn:locatorDesignator \"{n}\" ;\n"
        f"  locn:thoroughfare \"{v}\" ;\n"
        f"  locn:postCode \"{c}\" ;\n"
        f"  gn:lat {la:.6f} ;\n  gn:long {lo:.6f} .\n"
        for i, n, v, c, la, lo in zip(ids, num, voie, cp, lat, lon)
    ]
    return pa.table({"id": batch.column("id"), "ttl": pa.array(frags)})


def write_csv_partitioned(ds, out_dir: str):
    """K1: partitioned CSV output (block-per-file under the dir)."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_csv(out_dir)
    return out_dir


def write_json_partitioned(ds, out_dir: str):
    """K2: partitioned JSON-lines output."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    return out_dir


def write_ttl(ds, out_dir: str):
    """K3: TTL fragments as partitioned text-ish parquet + a driver-side
    concatenated .ttl (small result sets only)."""
    os.makedirs(out_dir, exist_ok=True)
    frag_ds = ds.map_batches(render_ttl_batch, batch_format="pyarrow")
    frag_ds.write_parquet(out_dir)
    return out_dir


def publish_concat(parts_dir: str, out_path: str, column: str = "ttl",
                   prefix: str = TTL_PREFIX) -> str:
    """K5: gzip France-wide concatenation of per-partition outputs."""
    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(parts_dir) if f.endswith(".parquet"))
    with gzip.open(out_path, "wt") as out:
        out.write(prefix)
        for f in files:
            t = pq.read_table(os.path.join(parts_dir, f), columns=[column])
            for frag in t.column(column).to_pylist():
                out.write(frag)
    return out_path


# --- WebDataset-style multimodal shard sink ---------------------------------

WDS_DOCS_PER_SHARD = 64


def _wds_shard_writer(out_dir: str, docs_per_shard: int):
    """Group kernel: one tar shard per shard_id group.

    Entries are `<image_id>.<fmt>` (encoded image bytes) +
    `<image_id>.json` (metadata), doc_id-ordered; tarinfo carries fixed
    mtime/uid/gid so two runs produce byte-identical shards.  Shards that
    already exist are skipped (per-partition resume — the same discipline
    as pipelines/incremental.py); `.tmp` + rename keeps a killed run from
    leaving a torn shard behind."""
    import pandas as pd

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        import io
        import json
        import tarfile

        import numpy as np

        from .. import datagen
        from ..codecs import encode_image_batch

        d = np.sort(df["doc_id"].to_numpy())
        shard_id = int(d[0]) // docs_per_shard
        name = f"shard-{shard_id:06d}.tar"
        path = os.path.join(out_dir, name)
        if not os.path.exists(path):
            w, h = datagen.dims_of(d)
            fmts = np.where(d % datagen.FMT_JPEG_MOD == 0, "jpeg", "png")
            px = datagen.pixels_of_batch(d, w.astype(np.int64),
                                         h.astype(np.int64))
            blobs = encode_image_batch(px, [str(f) for f in fmts])
            caps = datagen.caption_of(d)
            tmp = path + ".tmp"
            with tarfile.open(tmp, "w") as tar:
                for i, doc in enumerate(d):
                    key = f"img{int(doc):08d}"
                    meta = json.dumps({
                        "doc_id": int(doc), "image_id": key,
                        "w": int(w[i]), "h": int(h[i]),
                        "fmt": str(fmts[i]), "caption": str(caps[i]),
                    }).encode()
                    for ext, payload in ((str(fmts[i]), blobs[i]),
                                         ("json", meta)):
                        ti = tarfile.TarInfo(f"{key}.{ext}")
                        ti.size = len(payload)
                        ti.mtime = 0
                        ti.uid = ti.gid = 0
                        ti.uname = ti.gname = ""
                        tar.addfile(ti, io.BytesIO(payload))
            os.replace(tmp, path)
        return pd.DataFrame({"shard_id": [shard_id],
                             "shard_name": [name],
                             "n_samples": [len(d)]})

    return write_group


def write_wds_shards(sf_dir: str, out_dir: str,
                     docs_per_shard: int = WDS_DOCS_PER_SHARD):
    """WebDataset-style training-data export: size-bounded tar shards of
    (image bytes, JSON metadata) pairs + a shard index.

    Scale shape: shard assignment is ``doc_id // docs_per_shard`` — a pure
    function of the key — so the ONLY shuffle moves the pruned doc_id
    column; pixels are synthesized and encoded AFTER the exchange, inside
    the shard's writer task, and blobs never transit the object store.
    (With stored source bytes the same layout holds by aligning the read
    to shard key-ranges instead.)  Returns the index Dataset
    (shard_id, shard_name, n_samples); existing shard files are skipped,
    so a killed run resumes per shard."""
    import ray.data

    from ..stages.tracks import _doc_ids

    os.makedirs(out_dir, exist_ok=True)
    ids = _doc_ids(sf_dir)

    def tag(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        return pa.table({"doc_id": pa.array(d),
                         "shard_id": pa.array(d // docs_per_shard)})

    idx = (ids.map_batches(tag, batch_format="pyarrow")
           .groupby("shard_id")
           .map_groups(_wds_shard_writer(out_dir, docs_per_shard),
                       batch_format="pandas"))
    return idx
