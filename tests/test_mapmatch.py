"""HMM Viterbi map-matching (stages/mapmatch.py): differential against a
plain-Python Viterbi, edge cases, and DuckDB oracle parity."""

import numpy as np
import pandas as pd

from bano_ray.stages.mapmatch import MM_OFF, MM_SWITCH_P, mapmatch_group


def _df(zid, doc, ix, iy):
    return pd.DataFrame({
        "zid": np.asarray(zid, dtype=np.int64),
        "doc_id": np.asarray(doc, dtype=np.int64),
        "ix": np.asarray(ix, dtype=np.int64),
        "iy": np.asarray(iy, dtype=np.int64),
        "_shard": np.zeros(len(zid), dtype=np.int64),
    })


def _brute_viterbi(points, centroids):
    """Reference implementation: explicit DP over (t, state)."""
    S = len(centroids)
    prev = None
    for (px, py) in points:
        emis = [(px - cx) ** 2 + (py - cy) ** 2 for cx, cy in centroids]
        if prev is None:
            prev = emis
        else:
            m = min(prev)
            prev = [e + min(p, m + MM_SWITCH_P)
                    for e, p in zip(emis, prev)]
    best = min(prev)
    return best, prev.index(best)


class TestKernel:
    def test_matches_brute_force_on_random_world(self):
        rng = np.random.RandomState(7)
        zids, docs, xs, ys = [], [], [], []
        doc = 0
        for zone in [3, 4]:
            for s in [0, 2, 5]:
                for _ in range(rng.randint(2, 6)):
                    zids.append(zone * 1000 + s)
                    docs.append(doc); doc += 1
                    xs.append(int(rng.randint(-4_000_000, 4_000_000)))
                    ys.append(int(rng.randint(41_000_000, 45_000_000)))
        df = _df(zids, docs, xs, ys)
        got = mapmatch_group(df).set_index(["insee", "sidx"])

        t = df.assign(zone=df["zid"] // 1000, s=df["zid"] % 1000,
                      ux=df["ix"] + MM_OFF, uy=df["iy"] + MM_OFF)
        for zone, zg in t.groupby("zone"):
            cen = [(int(g["ux"].sum()) // len(g), int(g["uy"].sum()) // len(g))
                   for _, g in zg.groupby("s")]
            states = sorted(zg["s"].unique())
            for s, g in zg.groupby("s"):
                pts = list(zip(g.sort_values("doc_id")["ux"],
                               g.sort_values("doc_id")["uy"]))
                cost, arg = _brute_viterbi(pts, cen)
                insee = str(zone + 1).zfill(5)
                row = got.loc[(insee, s)]
                assert row["best_cost"] == cost
                assert row["match_sidx"] == states[arg]
                assert row["n_pts"] == len(pts)

    def test_switch_beats_stay_when_far(self):
        # track on street 0 sits exactly on street 1's centroid after the
        # first point → Viterbi pays one switch instead of repeated
        # emission to its own centroid
        big = 1_000_000
        df = _df([7000, 7000, 7000, 7001, 7001], [1, 2, 3, 10, 11],
                 [0, big, big, big, big], [0, 0, 0, 0, 0])
        got = mapmatch_group(df).set_index("sidx")
        # street 1's centroid is (big, 0): staying there is free for the
        # two later points of track 0 once switched
        assert got.loc[0, "match_sidx"] == 1

    def test_single_point_single_street_zone(self):
        df = _df([8000], [1], [123], [456])
        got = mapmatch_group(df)
        assert len(got) == 1
        assert got.iloc[0]["match_sidx"] == 0
        assert got.iloc[0]["n_pts"] == 1
        # emission to its own (only) centroid = 0
        assert got.iloc[0]["best_cost"] == 0


class TestEndToEnd:
    def test_matches_duckdb(self, ray_session):
        import duckdb

        from bano_ray import oracle
        from bano_ray.pipelines.queries import q_map_match

        sf = "/root/testdata/sf0.001"
        got = q_map_match(sf).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
        want = con.sql(oracle.q_map_match()).df()
        cols = sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        assert a.astype(str).equals(b.astype(str))
        # the matcher is non-trivial: some tracks match a different street
        assert (got["match_sidx"] != got["sidx"]).any()
