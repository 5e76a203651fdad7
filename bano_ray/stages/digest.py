"""Order-insensitive per-partition content digests and snapshot diffing.

At 100 TB the incremental pipeline (``pipelines/incremental.py``) needs to
VERIFY partitions across snapshots / replicas without moving the data: a
per-zone Merkle-style digest any worker can compute over its own blocks
that merges by modular addition — order- and partitioning-insensitive, so
block boundaries and shuffle layout cannot perturb it.  This generalizes
the reference's export cross-check (reference ``stats_export.sh:7-25``
compares duplicate-line counts between export formats) from row counts to
content, which is what an incremental rebuild actually needs: "which
partitions changed since the last snapshot?".

``zone_digest_diff`` digests the current corpus AND a deterministically
perturbed "next snapshot" (docs with ``doc_id % DIFF_MOD == DIFF_RESIDUE``
get one char prepended to their text) in a single pass, then reports per
zone both digests and whether they differ — exactly the audit a resume
run would use to skip untouched partitions.

Exactness (value-replicable in DuckDB HUGEINT — ``oracle.q_zone_digest_diff``):
the per-doc term ``(fp·A + doc_id·B + 1) mod P`` (P = 2^61-1) stays below
2^61; batch partials split each term into 32-bit halves and bincount the
halves in float64 (sums ≤ 2^53 for any batch ≤ 2^21 rows), recombining
mod P in Python ints per zone (≤ NZONES recombines per batch).  The final
per-zone merge sums Python ints, so partial count never overflows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import datagen
from .text import FP_LEN, FP_MOD, _FP_MULTS_U64, cp_matrix

P = (1 << 61) - 1          # Mersenne prime — digest modulus
TERM_A = 2654435761        # Knuth multiplicative constant
TERM_B = 40503
DIFF_MOD = 37              # perturbed snapshot: doc_id % 37 == 3 docs change
DIFF_RESIDUE = 3
PREFIX_CP = 126            # '~' prepended to changed docs' text


def _digest_partials(batch: pa.Table) -> pa.Table:
    """documents block → per-zone partial digests (both snapshots)."""
    d = batch.column("doc_id").to_numpy()
    if len(d) == 0:
        return pa.table({"insee": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "n_changed": pa.array([], pa.int64()),
                         "part_a": pa.array([], pa.int64()),
                         "part_b": pa.array([], pa.int64())})
    lon, lat = datagen.lon_lat(d)
    zone = datagen.zone_of(lon, lat)
    cp = cp_matrix(batch.column("text")).astype(np.uint64)
    fp_a = (cp @ _FP_MULTS_U64) % np.uint64(FP_MOD)
    # fingerprint of '~' || text without building the string: prepending
    # shifts every codepoint one multiplier to the right
    fp_m = (np.uint64(PREFIX_CP) * _FP_MULTS_U64[0]
            + cp[:, :FP_LEN - 1] @ _FP_MULTS_U64[1:]) % np.uint64(FP_MOD)
    changed = (d % DIFF_MOD) == DIFF_RESIDUE
    fp_b = np.where(changed, fp_m, fp_a)
    du = d.astype(np.uint64)
    pP = np.uint64(P)
    # fp < 1e9 so fp·A < 2.66e18; doc_id·B negligible — no uint64 overflow
    term_a = (fp_a * np.uint64(TERM_A) + du * np.uint64(TERM_B)
              + np.uint64(1)) % pP
    term_b = (fp_b * np.uint64(TERM_A) + du * np.uint64(TERM_B)
              + np.uint64(1)) % pP
    uz, zidx = np.unique(zone, return_inverse=True)
    nz = len(uz)

    def modsum(term: np.ndarray) -> np.ndarray:
        lo = np.bincount(zidx, minlength=nz,
                         weights=(term & np.uint64(0xFFFFFFFF))
                         .astype(np.float64))
        hi = np.bincount(zidx, minlength=nz,
                         weights=(term >> np.uint64(32)).astype(np.float64))
        return np.fromiter(
            (((int(h) << 32) + int(l)) % P for h, l in zip(hi, lo)),
            dtype=np.int64, count=nz)

    insee = np.char.zfill((uz + 1).astype("U"), 5).astype(object)
    return pa.table({
        "insee": pa.array(insee, pa.string()),
        "n_docs": pa.array(np.bincount(zidx, minlength=nz)
                           .astype(np.int64)),
        "n_changed": pa.array(np.bincount(zidx[changed], minlength=nz)
                              .astype(np.int64)),
        "part_a": pa.array(modsum(term_a)),
        "part_b": pa.array(modsum(term_b)),
    })


def _merge_zone(df: pd.DataFrame) -> pd.DataFrame:
    """Per-zone final merge — Python-int modular sums (partial values are
    < 2^61; pandas int64 sums would overflow at ≥ 4 partials)."""
    da = sum(int(x) for x in df["part_a"]) % P
    db = sum(int(x) for x in df["part_b"]) % P
    return pd.DataFrame({
        "insee": [df["insee"].iloc[0]],
        "n_docs": np.array([df["n_docs"].sum()], dtype=np.int64),
        "n_changed": np.array([df["n_changed"].sum()], dtype=np.int64),
        "digest_a": np.array([da], dtype=np.int64),
        "digest_b": np.array([db], dtype=np.int64),
        "differs": np.array([int(da != db)], dtype=np.int64),
    })


def zone_digest_diff(sf_dir: str):
    """(insee, n_docs, n_changed, digest_a, digest_b, differs): mergeable
    mod-P content digest per zone for the base and perturbed snapshots.
    One streaming pass + a NZONES-sized groupby — nothing wide moves."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    parts = ds.map_batches(_digest_partials, batch_format="pyarrow")
    return parts.groupby("insee").map_groups(_merge_zone,
                                             batch_format="pandas")
