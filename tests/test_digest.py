"""Zone digest diff (stages/digest.py): modular-merge exactness and the
prefix-shift fingerprint identity."""
import numpy as np
import pandas as pd
import pyarrow as pa

from bano_ray.stages.digest import (DIFF_MOD, DIFF_RESIDUE, P, PREFIX_CP,
                                    TERM_A, TERM_B, _digest_partials,
                                    _merge_zone, zone_digest_diff)
from bano_ray.stages.text import FP_LEN, FP_MOD, FP_MULTS


def _ref_fp(t: str) -> int:
    return sum(ord(c) * FP_MULTS[j] for j, c in enumerate(t[:FP_LEN])) % FP_MOD


def _ref_digest(rows) -> int:
    return sum((_ref_fp(t) * TERM_A + d * TERM_B + 1) % P
               for d, t in rows) % P


def test_partials_match_scalar_reference():
    ids = np.arange(0, 4000, 7, dtype=np.int64)
    texts = [f"doc {i} — Rue des Érables n°{i % 97}" for i in ids]
    out = _digest_partials(pa.table({"doc_id": pa.array(ids),
                                     "text": pa.array(texts)}))
    from bano_ray import datagen
    lon, lat = datagen.lon_lat(ids)
    zone = datagen.zone_of(lon, lat)
    df = out.to_pandas().set_index("insee")
    for z in np.unique(zone):
        insee = str(z + 1).zfill(5)
        sel = zone == z
        rows_a = list(zip(ids[sel].tolist(),
                          [texts[k] for k in np.flatnonzero(sel)]))
        rows_b = [(d, ("~" + t) if d % DIFF_MOD == DIFF_RESIDUE else t)
                  for d, t in rows_a]
        assert df.loc[insee, "part_a"] == _ref_digest(rows_a)
        assert df.loc[insee, "part_b"] == _ref_digest(rows_b)
        assert df.loc[insee, "n_changed"] == sum(
            1 for d, _ in rows_a if d % DIFF_MOD == DIFF_RESIDUE)


def test_prefix_shift_identity():
    # fp('~' + t) must equal the shifted-multiplier form used in the kernel
    t = "abcdefghijklmnopqr"  # longer than FP_LEN
    want = _ref_fp("~" + t)
    got = (PREFIX_CP * FP_MULTS[0]
           + sum(ord(c) * FP_MULTS[j + 1]
                 for j, c in enumerate(t[:FP_LEN - 1]))) % FP_MOD
    assert got == want


def test_merge_zone_overflow_safe():
    # 100 partials each near P would overflow int64 sums by ~50x — the
    # Python-int merge must stay exact
    n = 100
    df = pd.DataFrame({
        "insee": ["00001"] * n,
        "n_docs": np.ones(n, dtype=np.int64),
        "n_changed": np.zeros(n, dtype=np.int64),
        "part_a": np.full(n, P - 1, dtype=np.int64),
        "part_b": np.full(n, P - 2, dtype=np.int64),
    })
    out = _merge_zone(df)
    assert out["digest_a"].iloc[0] == (n * (P - 1)) % P
    assert out["digest_b"].iloc[0] == (n * (P - 2)) % P
    assert out["differs"].iloc[0] == 1


def test_end_to_end_block_invariance(ray_session, sf_dir):
    # digest must not depend on block layout: same answer from a
    # single-block read (order-insensitive modular merge)
    import ray.data

    base = zone_digest_diff(sf_dir).to_pandas().sort_values("insee")
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]).repartition(1)
    one = (ds.map_batches(_digest_partials, batch_format="pyarrow")
           .groupby("insee").map_groups(_merge_zone, batch_format="pandas")
           .to_pandas().sort_values("insee"))
    pd.testing.assert_frame_equal(base.reset_index(drop=True),
                                  one.reset_index(drop=True))
