"""Track-geometry kernels (stages/tracks.py): length, Visvalingam
simplification, bearing sectors, turn census."""

import numpy as np
import pandas as pd
import pytest

from bano_ray.stages.tracks import (lengths_group, sectors_partial,
                                    simplify_group, turns_group)


def _df(zid, doc, ix, iy):
    return pd.DataFrame({
        "zid": np.asarray(zid, dtype=np.int64),
        "doc_id": np.asarray(doc, dtype=np.int64),
        "ix": np.asarray(ix, dtype=np.int64),
        "iy": np.asarray(iy, dtype=np.int64),
        "_shard": np.zeros(len(zid), dtype=np.int64),
    })


class TestLength:
    def test_hand_case(self):
        # one 3-4-5 triangle leg pair plus a second singleton track
        df = _df([5001, 5001, 5001, 7002],
                 [1, 2, 3, 9],
                 [0, 3, 3, 100],
                 [0, 4, 104, 7])
        got = lengths_group(df).sort_values("insee").reset_index(drop=True)
        # track 5001: segments (0,0)-(3,4) len 5 and (3,4)-(3,104) len 100
        want = pd.DataFrame({"insee": ["00006", "00008"],
                             "sidx": [1, 2],
                             "n_pts": [3, 1],
                             "len_u": [105, 0]})
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=False)

    def test_rounds_half_up(self):
        # dx=1, dy=1 → sqrt(2)=1.414… → 1; dx=1, dy=2 → sqrt(5)=2.236… → 2
        df = _df([0, 0, 0], [1, 2, 3], [0, 1, 2], [0, 1, 3])
        got = lengths_group(df)
        assert got["len_u"].tolist() == [1 + 2]

    def test_unsorted_input_and_boundary(self):
        # rows arrive interleaved across tracks; the boundary segment
        # between tracks must not contribute
        df = _df([2, 1, 2, 1], [10, 5, 11, 6], [1000, 0, 1003, 30], [0, 0, 4, 40])
        got = lengths_group(df).sort_values("sidx").reset_index(drop=True)
        assert got["len_u"].tolist() == [50, 5]  # track1: 30-40-50; track2: 3-4-5


class TestSimplify:
    def test_drops_small_triangle(self):
        # interior vertex with |cross| = 2 < threshold 10 dropped; the
        # big-deviation vertex kept
        df = _df([0] * 4, [0, 1, 2, 3], [0, 1, 2, 3], [0, 1, 0, 1])
        # vertex1: cross = (1-0)*(0-0) - (2-0)*(1-0) = -2 → |2| < 10 → drop
        # vertex2: cross = (2-1)*(1-1) - (3-1)*(0-1) = 2 → drop too
        got = simplify_group(df, area2_min=10)
        assert got["doc_id"].tolist() == [0, 3]
        assert got["area2"].isna().all()

    def test_keeps_large_triangle_with_area(self):
        df = _df([0] * 3, [0, 1, 2], [0, 1, 2], [0, 100, 0])
        # cross = (1-0)*(0-0) - (2-0)*(100-0) = -200
        got = simplify_group(df, area2_min=10)
        assert got["doc_id"].tolist() == [0, 1, 2]
        assert got["area2"].tolist()[1] == 200

    def test_short_tracks_all_kept(self):
        df = _df([3, 3, 9], [1, 2, 3], [0, 5, 7], [0, 5, 7])
        got = simplify_group(df, area2_min=1)
        assert len(got) == 3


class TestSectors:
    @pytest.mark.parametrize("dx,dy,sector", [
        (5, 0, 0), (5, 4, 0), (4, 5, 1), (0, 5, 1),
        (-4, 5, 2), (-5, 4, 3), (-5, 0, 3),
        (-5, -4, 4), (-5, -5, 4), (-4, -5, 5),
        (0, -5, 6), (4, -5, 6), (5, -4, 7), (5, -5, 7),
    ])
    def test_octants(self, dx, dy, sector):
        df = _df([0, 0], [0, 1], [0, dx], [0, dy])
        got = sectors_partial(df)
        assert got["sector"].tolist() == [sector]

    def test_zero_segment_skipped_and_counts(self):
        df = _df([0, 0, 0], [0, 1, 2], [0, 0, 9], [0, 0, 0])
        got = sectors_partial(df)
        assert got["n_segs"].tolist() == [1]
        assert got["sector"].tolist() == [0]


class TestTurns:
    def test_left_right_straight(self):
        # square-wave: up, right, down = right turn then left turn;
        # then a collinear run
        df = _df([0] * 6, list(range(6)),
                 [0, 0, 5, 5, 10, 15],
                 [0, 5, 5, 0, 0, 0])
        got = turns_group(df)
        assert got[["n_left", "n_right", "n_straight"]].values.tolist() == \
            [[1, 2, 1]]

    def test_tracks_without_interior_report_zeros(self):
        df = _df([1, 1, 2], [0, 1, 2], [0, 1, 5], [0, 1, 5])
        got = turns_group(df).sort_values("sidx").reset_index(drop=True)
        assert got["n_left"].tolist() == [0, 0]
        assert got["n_right"].tolist() == [0, 0]
        assert got["n_straight"].tolist() == [0, 0]


class TestEndToEnd:
    def test_track_length_matches_duckdb(self, ray_session):
        import duckdb

        from bano_ray import oracle
        from bano_ray.pipelines.queries import q_track_length

        sf = "/root/testdata/sf0.001"
        got = (q_track_length(sf).to_pandas()
               .sort_values(["insee", "sidx"]).reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
        want = con.sql(oracle.q_track_length()).df()
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                      check_dtype=False)


class TestGeodesic:
    def test_known_distance(self):
        from bano_ray.stages.tracks import geodesic_group

        # one degree of latitude along a meridian ≈ 111.195 km
        df = pd.DataFrame({
            "zid": np.array([0, 0], dtype=np.int64),
            "doc_id": np.array([0, 1], dtype=np.int64),
            "lon": [2.0, 2.0], "lat": [48.0, 49.0],
            "_shard": np.zeros(2, dtype=np.int64),
        })
        got = geodesic_group(df)
        km = got["len_mm"].iloc[0] / 1e6
        assert abs(km - 111.195) < 0.01

    def test_matches_duckdb(self, ray_session):
        import duckdb

        from bano_ray import oracle
        from bano_ray.pipelines.queries import q_track_length_m

        sf = "/root/testdata/sf0.001"
        got = (q_track_length_m(sf).to_pandas()
               .sort_values(["insee", "sidx"]).reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
        want = con.sql(oracle.q_track_length_m()).df()
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                      check_dtype=False)


class TestSnap:
    def _brute(self, df):
        """O(P·S) python reference: nearest other-street segment."""
        rows = []
        pts = df.to_dict("records")
        segs = []
        by_track = {}
        for r in sorted(pts, key=lambda r: (r["zid"], r["doc_id"])):
            by_track.setdefault(r["zid"], []).append(r)
        for zid, seq in by_track.items():
            for a, b in zip(seq, seq[1:]):
                segs.append((zid, b["doc_id"], a["ix"], a["iy"],
                             b["ix"], b["iy"]))
        segs.sort()
        for p in pts:
            best = None
            for (szid, sdoc, ax, ay, bx, by) in segs:
                if szid // 1000 != p["zid"] // 1000 or szid == p["zid"]:
                    continue
                dx, dy = bx - ax, by - ay
                dpx, dpy = p["ix"] - ax, p["iy"] - ay
                len2 = dx * dx + dy * dy
                dot = dx * dpx + dy * dpy
                if len2 == 0 or dot <= 0:
                    d2 = float(dpx * dpx + dpy * dpy)
                elif dot >= len2:
                    d2 = float((p["ix"] - bx) ** 2 + (p["iy"] - by) ** 2)
                else:
                    cr = float(dx * dpy - dy * dpx)
                    d2 = cr * cr / float(len2)
                key = (d2, szid % 1000, sdoc)
                if best is None or key < best[0]:
                    best = (key, szid, sdoc, d2)
            if best is not None:
                rows.append((p["doc_id"], best[1] % 1000, best[2],
                             int(np.floor(best[3] + 0.5))))
        return sorted(rows)

    def test_matches_brute_force(self):
        from bano_ray.stages.tracks import snap_group

        rng = np.random.RandomState(7)
        n = 120
        zid = rng.randint(0, 2, n) * 1000 + rng.randint(0, 4, n)  # 2 zones
        doc = np.arange(n)
        ix = rng.randint(0, 2_000_000, n)
        iy = rng.randint(0, 2_000_000, n)
        df = _df(zid, doc, ix, iy)
        got = snap_group(df)
        got_rows = sorted(zip(got["doc_id"].astype(int),
                              got["snap_sidx"].astype(int),
                              got["snap_doc"].astype(int),
                              got["d2_u"].astype(int)))
        assert got_rows == self._brute(df)

    def test_projection_branches(self):
        from bano_ray.stages.tracks import snap_group

        # one horizontal segment (street 0), three probes on street 1:
        # beyond A (clamps to A), interior (perpendicular), beyond B
        df = _df([1000, 1000, 1001, 1001, 1001],
                 [0, 1, 10, 11, 12],
                 [100, 200, 50, 150, 260],
                 [0, 0, 30, 40, 25])
        got = snap_group(df).set_index("doc_id")
        assert got.loc[10, "d2_u"] == 50 * 50 + 30 * 30   # clamp to A
        assert got.loc[11, "d2_u"] == 40 * 40             # interior drop
        assert got.loc[12, "d2_u"] == 60 * 60 + 25 * 25   # clamp to B
        # street-0 points snap to street-1 segments symmetrically
        assert set(got.index) == {0, 1, 10, 11, 12}


class TestStay:
    def test_runs_and_boundaries(self):
        from bano_ray.stages.tracks import stay_group

        # track 1000: 4 tight points (one stay), jump, 3 tight points
        # (second stay); track 1001: 2 tight points only (below min)
        ix = [0, 100, 220, 300, 900000, 900100, 900150,
              0, 50]
        iy = [0] * 7 + [0, 0]
        zid = [1000] * 7 + [1001] * 2
        doc = list(range(7)) + [10, 11]
        got = stay_group(_df(zid, doc, ix, iy))
        rows = sorted(zip(got["sidx"].astype(int),
                          got["start_doc"].astype(int),
                          got["end_doc"].astype(int),
                          got["n_pts"].astype(int)))
        assert rows == [(0, 0, 3, 4), (0, 4, 6, 3)]

    def test_threshold_is_strict(self):
        from bano_ray.stages.tracks import STAY_T2, stay_group

        t = int(np.sqrt(STAY_T2))  # step == threshold → NOT close
        got = stay_group(_df([1000] * 3, [0, 1, 2], [0, t, 2 * t], [0, 0, 0]))
        assert len(got) == 0
        got = stay_group(_df([1000] * 3, [0, 1, 2],
                             [0, t - 1, 2 * (t - 1)], [0, 0, 0]))
        assert len(got) == 1 and int(got["n_pts"].iloc[0]) == 3
