"""Round-4 late operators: stride-sampled Hausdorff track-pair join,
geofence enter/exit extraction, aspect-ratio bucketing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bano_ray.stages.tracks import geofence_group, hausdorff_group


def _df(zid, doc, ix, iy):
    return pd.DataFrame({
        "zid": np.asarray(zid, dtype=np.int64),
        "doc_id": np.asarray(doc, dtype=np.int64),
        "ix": np.asarray(ix, dtype=np.int64),
        "iy": np.asarray(iy, dtype=np.int64),
        "_shard": np.zeros(len(zid), dtype=np.int64),
    })


class TestHausdorffKernel:
    def test_hand_case_symmetric(self):
        # zone 5, streets 1 and 2: A = {(0,0), (10,0)}, B = {(0,3), (10,4)}
        # h(A→B): a1→min 3, a2→min 4 → max 4; h(B→A): b1→3, b2→4 → 4
        df = _df([5001, 5001, 5002, 5002], [1, 2, 3, 4],
                 [0, 10, 0, 10], [0, 0, 3, 4])
        got = hausdorff_group(df, stride=1)
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["insee"], r["sidx_a"], r["sidx_b"]) == ("00006", 1, 2)
        assert (r["h_ab_u"], r["h_ba_u"], r["haus_u"]) == (4, 4, 4)

    def test_no_pair_across_zones(self):
        df = _df([5001, 6001], [1, 2], [0, 0], [0, 0])
        assert len(hausdorff_group(df, stride=1)) == 0

    def test_adjacent_chain_and_rounding(self):
        # streets 0,1,2 in one zone → pairs (0,1) and (1,2); dx=1,dy=1
        # between 0 and 1 → sqrt(2) rounds to 1
        df = _df([9000, 9001, 9002], [1, 2, 3],
                 [0, 1, 100], [0, 1, 1])
        got = hausdorff_group(df, stride=1).sort_values("sidx_a")
        assert got["sidx_a"].tolist() == [0, 1]
        assert got["haus_u"].tolist() == [1, 99]

    def test_stride_samples_every_kth(self):
        # stride 2 keeps ordinals 0 and 2 of street 0; street 1 singleton
        # far point at ordinal 1 is dropped → distance measured to kept pts
        df = _df([1000, 1000, 1000, 1001], [1, 2, 3, 9],
                 [0, 1_000_000, 10, 0], [0, 0, 0, 5])
        got = hausdorff_group(df, stride=2)
        assert got.iloc[0]["h_ba_u"] == 5  # not 1e6: middle vertex sampled out
        assert got.iloc[0]["h_ab_u"] == 11  # (10,0)→(0,5): √125 rounds to 11


class TestGeofenceKernel:
    def test_transitions(self):
        from bano_ray.stages.tracks import _zone_centers_u

        cx, cy = _zone_centers_u(np.asarray([0]))
        cx, cy = int(cx[0]), int(cy[0])
        # inside → outside → inside → inside: exit at doc 2, enter at doc 3
        df = _df([1, 1, 1, 1], [1, 2, 3, 4],
                 [cx, cx + 700_000, cx + 1, cx + 2], [cy, cy, cy, cy])
        got = geofence_group(df)
        assert got["doc_id"].tolist() == [2, 3]
        assert got["event"].tolist() == ["exit", "enter"]

    def test_first_point_emits_nothing_and_boundary_inclusive(self):
        from bano_ray.stages.tracks import GEOFENCE_R_U, _zone_centers_u

        cx, cy = _zone_centers_u(np.asarray([0]))
        cx, cy = int(cx[0]), int(cy[0])
        # first point outside emits nothing; exactly-on-circle is inside
        df = _df([1, 1], [1, 2], [cx + GEOFENCE_R_U + 1, cx + GEOFENCE_R_U],
                 [cy, cy])
        got = geofence_group(df)
        assert got["doc_id"].tolist() == [2]
        assert got["event"].tolist() == ["enter"]


class TestAspectBuckets:
    def test_tie_goes_to_lowest_id(self):
        from bano_ray.stages.imagemeta import aspect_partial

        # w = h makes the metric w·|bh−bw| = w for EVERY bucket in the
        # table (all |bh−bw| = 1) — a full 5-way tie must resolve to
        # bucket 0, matching the oracle's ORDER BY metric, bucket_id
        batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                          "fmt_parsed": pa.array(["png"]),
                          "width": pa.array([15], pa.int64()),
                          "height": pa.array([15], pa.int64())})
        got = aspect_partial(batch).to_pydict()
        assert got["bucket_id"] == [0]

    def test_all_buckets_populated_on_generative_dims(self):
        from bano_ray import datagen as dg
        from bano_ray.stages.imagemeta import (ASPECT_BUCKETS,
                                               aspect_partial)

        d = np.arange(5000, dtype=np.int64)
        w, h = dg.dims_of(d)
        batch = pa.table({"doc_id": pa.array(d),
                          "fmt_parsed": pa.array(["png"] * len(d)),
                          "width": pa.array(w.astype(np.int64)),
                          "height": pa.array(h.astype(np.int64))})
        got = aspect_partial(batch)
        assert set(got.column("bucket_id").to_pylist()) == \
            {b[0] for b in ASPECT_BUCKETS}
        assert int(pa.compute.sum(got.column("n_images")).as_py()) == 5000


class TestEndToEnd:
    @pytest.mark.parametrize("qname", ["q_track_hausdorff", "q_geofence",
                                       "q_aspect_buckets"])
    def test_matches_duckdb(self, ray_session, qname):
        import duckdb

        from bano_ray import oracle
        from bano_ray.pipelines import queries as Q

        sf = "/root/testdata/sf0.001"
        got = getattr(Q, qname)(sf).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
        want = con.sql(getattr(oracle, qname)()).df()
        assert len(got) == len(want) and len(got) > 0
        cols = sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert a.astype(str).equals(b.astype(str))


class TestFrechet:
    def test_matches_brute_force_dp(self):
        from bano_ray.stages.tracks import frechet_group

        def brute(A, B):
            m, n = len(A), len(B)
            d = [[(A[i][0] - B[j][0]) ** 2 + (A[i][1] - B[j][1]) ** 2
                  for j in range(n)] for i in range(m)]
            c = [[0] * n for _ in range(m)]
            for i in range(m):
                for j in range(n):
                    if i == 0 and j == 0:
                        c[i][j] = d[0][0]
                    elif i == 0:
                        c[i][j] = max(c[0][j - 1], d[0][j])
                    elif j == 0:
                        c[i][j] = max(c[i - 1][0], d[i][0])
                    else:
                        c[i][j] = max(d[i][j], min(c[i - 1][j],
                                                   c[i - 1][j - 1],
                                                   c[i][j - 1]))
            return int(np.floor(np.sqrt(float(c[-1][-1])) + 0.5))

        rng = np.random.RandomState(11)
        zids, docs, xs, ys, tracks = [], [], [], [], {}
        doc = 0
        for zone in [2, 9]:
            for s in [0, 1, 4]:
                pts = []
                for _ in range(rng.randint(1, 9)):
                    x = int(rng.randint(-2_000_000, 2_000_000))
                    y = int(rng.randint(41_000_000, 43_000_000))
                    zids.append(zone * 1000 + s)
                    docs.append(doc); doc += 1
                    xs.append(x); ys.append(y); pts.append((x, y))
                tracks[(zone, s)] = pts
        df = _df(zids, docs, xs, ys)
        got = frechet_group(df, stride=1).set_index(
            ["insee", "sidx_a", "sidx_b"])
        for zone in [2, 9]:
            for a, b in [(0, 1), (1, 4)]:
                insee = str(zone + 1).zfill(5)
                assert int(got.loc[(insee, a, b)]["frechet_u"]) == \
                    brute(tracks[(zone, a)], tracks[(zone, b)])

    def test_order_sensitivity_vs_hausdorff(self):
        from bano_ray.stages.tracks import frechet_group, hausdorff_group

        # B = A reversed: Hausdorff is 0, Fréchet must pay the traversal
        pts = [(0, 0), (100, 0), (200, 0)]
        zids = [5000] * 3 + [5001] * 3
        docs = list(range(6))
        xs = [p[0] for p in pts] + [p[0] for p in reversed(pts)]
        ys = [p[1] for p in pts] + [p[1] for p in reversed(pts)]
        df = _df(zids, docs, xs, ys)
        h = hausdorff_group(df, stride=1)
        f = frechet_group(df, stride=1)
        assert h.iloc[0]["haus_u"] == 0
        assert f.iloc[0]["frechet_u"] == 200

    def test_frechet_endtoend_matches_duckdb(self, ray_session):
        import duckdb

        from bano_ray import oracle
        from bano_ray.pipelines.queries import q_track_frechet

        sf = "/root/testdata/sf0.001"
        got = q_track_frechet(sf).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
        want = con.sql(oracle.q_track_frechet()).df()
        cols = sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        assert a.astype(str).equals(b.astype(str))


class TestDTW:
    def test_matches_brute_force_dp(self):
        from bano_ray.stages.tracks import dtw_group

        def brute(A, B):
            m, n = len(A), len(B)
            d = [[(A[i][0] - B[j][0]) ** 2 + (A[i][1] - B[j][1]) ** 2
                  for j in range(n)] for i in range(m)]
            c = [[0] * n for _ in range(m)]
            for i in range(m):
                for j in range(n):
                    if i == 0 and j == 0:
                        c[i][j] = d[0][0]
                    elif i == 0:
                        c[i][j] = d[0][j] + c[0][j - 1]
                    elif j == 0:
                        c[i][j] = d[i][0] + c[i - 1][0]
                    else:
                        c[i][j] = d[i][j] + min(c[i - 1][j],
                                                c[i - 1][j - 1],
                                                c[i][j - 1])
            return c[-1][-1]

        rng = np.random.RandomState(23)
        zids, docs, xs, ys, tracks = [], [], [], [], {}
        doc = 0
        for zone in [3, 12]:
            for s in [0, 2, 6]:
                pts = []
                for _ in range(rng.randint(1, 9)):
                    x = int(rng.randint(-2_000_000, 2_000_000))
                    y = int(rng.randint(41_000_000, 43_000_000))
                    zids.append(zone * 1000 + s)
                    docs.append(doc); doc += 1
                    xs.append(x); ys.append(y); pts.append((x, y))
                tracks[(zone, s)] = pts
        df = _df(zids, docs, xs, ys)
        got = dtw_group(df, stride=1).set_index(
            ["insee", "sidx_a", "sidx_b"])
        for zone in [3, 12]:
            for a, b in [(0, 2), (2, 6)]:
                insee = str(zone + 1).zfill(5)
                assert int(got.loc[(insee, a, b)]["dtw_cost"]) == \
                    brute(tracks[(zone, a)], tracks[(zone, b)])

    def test_identical_tracks_cost_zero(self):
        from bano_ray.stages.tracks import dtw_group

        pts = [(0, 0), (50, 0), (100, 10)]
        df = _df([4000] * 3 + [4001] * 3, list(range(6)),
                 [p[0] for p in pts] * 2, [p[1] for p in pts] * 2)
        got = dtw_group(df, stride=1)
        assert got.iloc[0]["dtw_cost"] == 0

    def test_dtw_endtoend_matches_duckdb(self, ray_session):
        import duckdb

        from bano_ray import oracle
        from bano_ray.pipelines.queries import q_track_dtw

        sf = "/root/testdata/sf0.001"
        got = q_track_dtw(sf).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
        want = con.sql(oracle.q_track_dtw()).df()
        cols = sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        assert a.astype(str).equals(b.astype(str))
