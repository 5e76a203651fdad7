"""Salted repartition join: a shuffle hash join that survives hot keys.

When NEITHER side fits a broadcast (``q_broadcast_join`` covers the small-dim
case) the classic failure mode at 100 TB is key skew: one join key carrying a
large fraction of the fact rows sends that fraction to a single partition.
The standard fix — the one the brief calls "salt hot keys" — is implemented
here for the per-row-output case where a map-side combiner cannot shrink the
fact stream first:

  1. every fact row gets ``salt = salt_from % n_salt`` (any per-row value
     that is NOT a function of the join key — here the fact's unique id),
  2. every dim row is replicated ``n_salt`` times, once per salt value
     (dim growth is bounded: |dim| × n_salt rows, key+payload columns only),
  3. both sides shard on ``(key, salt)`` via the coarse-shard discipline
     (~256 groups/CPU) and a per-shard vectorized pandas merge emits the
     joined rows.

A key carrying p of the fact stream now lands on ``n_salt`` shards at p/n_salt
each.  Determinism: the merge is a pure function of shard contents; output
order is irrelevant (the driver gate sorts).  Duplicate dim keys multiply
rows exactly as SQL JOIN does (the pandas merge reproduces it); salts never
collide into one shard because the shard count (~256/CPU) far exceeds
``n_salt``, so no dim replica meets another replica of itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _coarse_groups


def salted_repartition_join(fact_ds, dim_ds, key: str, dim_key: str,
                            salt_from: str, dim_cols: list[str],
                            n_salt: int = 16):
    """fact ⋈ dim on ``fact[key] == dim[dim_key]`` with salted sharding.

    Returns fact rows enriched with ``dim_cols``; inner-join semantics
    (fact rows without a dim match are dropped).
    """
    C = _coarse_groups()
    S = np.int64(n_salt)
    fact_schema = fact_ds.schema()
    dim_schema = dim_ds.schema()
    fact_cols = list(fact_schema.names)
    fact_types = dict(zip(fact_schema.names, fact_schema.types))
    dim_types = dict(zip(dim_schema.names, dim_schema.types))
    # one unified block schema so the two streams union cleanly
    out_fields = ([(c, fact_types[c]) for c in fact_cols]
                  + [(c, dim_types[c]) for c in dim_cols])

    def _unified(n, present: pa.Table, shard, side) -> pa.Table:
        cols = {}
        for name, typ in out_fields:
            cols[name] = (present.column(name) if name in present.column_names
                          else pa.nulls(n, typ))
        cols["_shard"] = pa.array(shard)
        cols["_side"] = pa.array(np.full(n, side, np.int8))
        return pa.table(cols)

    def fact_prep(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy().astype(np.int64)
        salt = (batch.column(salt_from).to_numpy().astype(np.int64) % S)
        shard = ((k * S + salt) % np.int64(C)).astype(np.int64)
        return _unified(len(k), batch, shard, 0)

    def dim_prep(batch: pa.Table) -> pa.Table:
        n = len(batch)
        rep = batch.take(pa.array(np.repeat(np.arange(n), n_salt)))
        k = rep.column(dim_key).to_numpy().astype(np.int64)
        salt = np.tile(np.arange(n_salt, dtype=np.int64), n)
        shard = ((k * S + salt) % np.int64(C)).astype(np.int64)
        # ship the join key through the key slot plus the payload columns
        rep = rep.rename_columns(
            [key if c == dim_key else c for c in rep.column_names])
        return _unified(len(k), rep, shard, 1)

    # the unified block carries nulls for the absent side, so the pandas
    # rendering widens ints to float64; the inner join has no nulls, so
    # cast back to the source Arrow dtypes (dtype-strict oracle gate)
    out_dtypes = {name: np.dtype(typ.to_pandas_dtype())
                  for name, typ in out_fields
                  if pa.types.is_integer(typ) or pa.types.is_floating(typ)}

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        f = df[df["_side"] == 0]
        d = df[df["_side"] == 1]
        out = f[fact_cols].merge(d[[key, *dim_cols]], on=key, how="inner")
        return out[[*fact_cols, *dim_cols]].astype(out_dtypes)

    fact = fact_ds.map_batches(fact_prep, batch_format="pyarrow")
    dim = dim_ds.map_batches(dim_prep, batch_format="pyarrow")
    return (fact.union(dim)
            .groupby("_shard").map_groups(resolve, batch_format="pandas"))
