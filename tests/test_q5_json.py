"""TPC-H Q5 star join + JSON props extraction (round 4)."""

import numpy as np
import pandas as pd


def _write(tmp_path, name, df):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df), tmp_path / f"{name}.parquet")


class TestTpchQ5:
    def test_matches_duckdb_synthetic_world(self, ray_session, tmp_path):
        import duckdb

        from bano_ray.oracle import q_tpch_q5 as osql
        from bano_ray.pipelines.queries import (_Q5_D0_US, _Q5_D1_US,
                                                q_tpch_q5)

        rng = np.random.default_rng(31)
        nnat, ncust, nsup, nord = 6, 80, 25, 400
        _write(tmp_path, "region", pd.DataFrame({
            "r_regionkey": np.arange(2, dtype=np.int64),
            "r_name": ["ASIA", "EUROPE"]}))
        _write(tmp_path, "nation", pd.DataFrame({
            "n_nationkey": np.arange(nnat, dtype=np.int64),
            "n_name": [f"NATION_{i}" for i in range(nnat)],
            "n_regionkey": (np.arange(nnat) % 2).astype(np.int64)}))
        _write(tmp_path, "customer", pd.DataFrame({
            "c_custkey": np.arange(ncust, dtype=np.int64),
            "c_nationkey": rng.integers(0, nnat, ncust).astype(np.int64)}))
        _write(tmp_path, "supplier", pd.DataFrame({
            "s_suppkey": np.arange(nsup, dtype=np.int64),
            "s_nationkey": rng.integers(0, nnat, nsup).astype(np.int64)}))
        # order dates straddle the window boundary on both sides
        span = _Q5_D1_US - _Q5_D0_US
        od = (_Q5_D0_US - span // 2
              + rng.integers(0, 2 * span, nord)).astype("datetime64[us]")
        _write(tmp_path, "orders", pd.DataFrame({
            "o_orderkey": np.arange(nord, dtype=np.int64),
            "o_custkey": rng.integers(0, ncust, nord).astype(np.int64),
            "o_orderdate": od}))
        nline = 1500
        _write(tmp_path, "lineitem", pd.DataFrame({
            "l_orderkey": rng.integers(0, nord, nline).astype(np.int64),
            "l_suppkey": rng.integers(0, nsup, nline).astype(np.int64),
            "l_extendedprice": np.round(rng.uniform(900, 90000, nline), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, nline), 2)}))
        got = q_tpch_q5(str(tmp_path))
        con = duckdb.connect()
        for t in ("region", "nation", "customer", "supplier", "orders",
                  "lineitem"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
        want = con.sql(osql()).df()
        pd.testing.assert_frame_equal(got[["n_name", "rev_c"]],
                                      want[["n_name", "rev_c"]],
                                      check_dtype=False)
        assert len(got) > 0        # the window actually selects orders


class TestJsonProps:
    def test_matches_duckdb_json_parser(self, ray_session, tmp_path):
        import duckdb

        from bano_ray.oracle import q_json_props as osql
        from bano_ray.pipelines.queries import q_json_props

        rng = np.random.default_rng(41)
        n = 3000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.zeros(n, dtype="datetime64[us]"),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": rng.choice(["view", "click", "buy"], n),
            "value": 0.0,
            "props": [f'{{"k": {v}}}' for v in
                      rng.integers(0, 10**6, n)],
        })
        _write(tmp_path, "events", df)
        got = (q_json_props(str(tmp_path)).to_pandas()
               .sort_values("event_type").reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
        want = con.sql(osql()).df()
        pd.testing.assert_frame_equal(
            got[["event_type", "n", "sum_k", "min_k", "max_k"]],
            want[["event_type", "n", "sum_k", "min_k", "max_k"]],
            check_dtype=False)
