"""MAD outlier census (stages/analytics.mad_outliers) vs a brute-force
pandas reference at sf0.001."""
import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def _lower_median(v: np.ndarray) -> int:
    v = np.sort(v)
    return int(v[(len(v) + 1) // 2 - 1])


def test_mad_outliers_brute(ray_session, sf_dir):
    from bano_ray.stages.analytics import mad_outliers

    got = (mad_outliers(sf_dir).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev["c"] = np.round(ev["value"].to_numpy() * 100.0).astype(np.int64)
    rows = []
    for et, g in ev.groupby("event_type"):
        c = g["c"].to_numpy()
        med = _lower_median(c)
        dv = np.abs(c - med)
        mad = _lower_median(dv)
        rows.append({"event_type": et, "n": len(c),
                     "n_outliers": int((dv > 3 * mad).sum()),
                     "med_c": med, "mad_c": mad})
    want = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_type", "n", "n_outliers", "med_c", "mad_c"]].astype(
            {"n": np.int64, "n_outliers": np.int64}),
        want.astype({"n": np.int64, "n_outliers": np.int64}))
