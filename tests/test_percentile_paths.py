"""Interpolated percentiles (select_ranks reuse) + ordered string-agg
path signatures, added round 4."""

import numpy as np
import pandas as pd
import pytest


class TestSelectRanks:
    def test_order_stats_exact(self, ray_session):
        import ray

        from bano_ray.stages.quantile import column_stats, select_ranks

        rng = np.random.default_rng(7)
        x = rng.normal(1000.0, 50.0, 5000)
        ds = ray.data.from_pandas(
            [pd.DataFrame({"x": c}) for c in np.array_split(x, 7)])
        lo, hi, n = column_stats(ds, "x")
        ranks = [1, 2, 17, 2500, 4999, 5000]
        got = select_ranks(ds, "x", ranks, lo, hi, n,
                           bins=64, final_cap=128)
        xs = np.sort(x)
        assert got == [float(xs[r - 1]) for r in ranks]

    def test_exact_quantiles_still_disc(self, ray_session):
        """The refactor must not change exact_quantiles semantics."""
        import duckdb
        import ray

        from bano_ray.stages.quantile import exact_quantiles

        rng = np.random.default_rng(11)
        x = np.round(rng.exponential(100.0, 4000), 2)
        ds = ray.data.from_pandas(
            [pd.DataFrame({"x": c}) for c in np.array_split(x, 5)])
        got = exact_quantiles(ds, "x", [0.1, 0.5, 0.99],
                              bins=32, final_cap=64)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"x": x}))
        for q, v in zip(got["q"], got["value"]):
            w = con.sql(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
            assert v == w


class TestPercentileCont:
    def test_matches_duckdb_oracle(self, ray_session, tmp_path):
        """Engine vs the oracle SQL on a small synthetic lineitem."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from bano_ray.oracle import q_percentile_cont as osql
        from bano_ray.pipelines.queries import q_percentile_cont

        rng = np.random.default_rng(3)
        df = pd.DataFrame({"l_extendedprice":
                           np.round(rng.uniform(900.0, 105000.0, 3777), 2)})
        pq.write_table(pa.Table.from_pandas(df),
                       tmp_path / "lineitem.parquet")
        got = q_percentile_cont(str(tmp_path)).sort_values("q")
        con = duckdb.connect()
        con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
        want = con.sql(osql()).df().sort_values("q")
        # identical double expression on both sides: bit-equal, no tolerance
        assert list(got["value"]) == list(want["value"])

    def test_frac_zero_hits_order_stat(self, ray_session, tmp_path):
        """q·(n−1) integral → result is exactly that order statistic."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import bano_ray.pipelines.queries as Q

        x = np.arange(1.0, 102.0)          # n=101 → 0.25·100 = 25 exactly
        pq.write_table(pa.Table.from_pandas(
            pd.DataFrame({"l_extendedprice": x})),
            tmp_path / "lineitem.parquet")
        got = Q.q_percentile_cont(str(tmp_path)).set_index("q")["value"]
        assert got[0.25] == 26.0 and got[0.5] == 51.0


class TestEventPaths:
    def _write(self, tmp_path, df):
        import pyarrow as pa
        import pyarrow.parquet as pq

        df = df.assign(value=0.0, props="")
        pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")

    def test_hand_case_cap_and_order(self, ray_session, tmp_path):
        from bano_ray.pipelines.queries import PATH_K, q_event_paths

        n = PATH_K + 3
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            # reversed ts: path must follow ts order, not row order
            "ts": np.arange(n)[::-1].astype("datetime64[us]"),
            "user_id": np.int64(1),
            "event_type": [f"e{i}" for i in range(n)],
        })
        self._write(tmp_path, df)
        got = q_event_paths(str(tmp_path)).to_pandas()
        assert len(got) == 1 and got["n8"].iloc[0] == PATH_K
        want = "|".join(f"e{i}" for i in range(n - 1, n - 1 - PATH_K, -1))
        assert got["path"].iloc[0] == want

    def test_matches_duckdb(self, ray_session, tmp_path):
        import duckdb

        from bano_ray.oracle import q_event_paths as osql
        from bano_ray.pipelines.queries import q_event_paths

        rng = np.random.default_rng(19)
        n = 2000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            # coarse ts so equal-ts ties exercise the event_id tiebreak
            "ts": (rng.integers(0, 50, n) * 1000).astype("datetime64[us]"),
            "user_id": rng.integers(0, 37, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "buy", "share"], n),
        })
        self._write(tmp_path, df)
        got = (q_event_paths(str(tmp_path)).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
        want = con.sql(osql()).df().sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["user_id", "path", "n8"]],
                                      want[["user_id", "path", "n8"]],
                                      check_dtype=False)
