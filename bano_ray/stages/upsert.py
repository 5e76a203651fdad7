"""Snapshot delta-upsert (LSM-style compaction): resolve a base snapshot
plus a change stream to one last-wins row per key.

The reference engine rebuilds each département from scratch per run
(reference ``bano/cumul.py`` drops and refills its tables); at 100 TB a
pipeline cannot afford full rebuilds, so this is the §2 "custom operator"
a large-scale ingest needs: ``final(key) = argmax_version(base ∪ delta)``.

Shape: tag each stream with its version, then
  1. a map-side PRE-REDUCE keeps only the max-version row per key within
     every block (one lexsort — at 100 TB this collapses the hot-path
     volume before any data moves, since most blocks carry one version
     of a key), then
  2. one coarse-shard groupby (``_coarse_groups`` discipline —
     ~256 shards/CPU, a pure function of the key, so a key's survivors
     co-locate) resolves the cross-block winner with a single vectorized
     lexsort per shard — no per-key dispatch, no global sort.

The ONLY all-to-all moves ≤ one row per (key, distinct version-in-block),
not the input streams.  Determinism: version ties break toward the larger
payload column tuple via the stable lexsort order; the driver query uses
strictly distinct versions (0 = base, 1 = delta) so ties cannot occur.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _coarse_groups


def upsert_latest(tagged_ds, key: str, version: str, payload: list[str]):
    """union-of-streams Dataset → one last-wins row per key.

    ``tagged_ds`` rows carry ``key``, ``version`` (int; larger wins) and
    ``payload`` columns.  Returns (key, *payload, version) resolved rows.
    """
    C = _coarse_groups()
    cols = [key, *payload, version]

    def prereduce(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy()
        v = batch.column(version).to_numpy()
        order = np.lexsort((v, k))
        last = np.ones(len(k), dtype=bool)
        last[:-1] = k[order][1:] != k[order][:-1]
        take = order[last]
        out = batch.take(pa.array(take))
        shard = (out.column(key).to_numpy().astype(np.uint64)
                 % np.uint64(C)).astype(np.int64)
        return out.append_column("_shard", pa.array(shard))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        arr = {c: df[c].to_numpy() for c in (key, version)}
        order = np.lexsort((arr[version], arr[key]))
        last = np.ones(len(order), dtype=bool)
        last[:-1] = arr[key][order][1:] != arr[key][order][:-1]
        return df.iloc[order[last]][cols]

    return (tagged_ds.map_batches(prereduce, batch_format="pyarrow")
            .groupby("_shard").map_groups(resolve, batch_format="pandas"))
