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
