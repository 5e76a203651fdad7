"""Weighted shortest paths (stages/graph.sssp) + distributed unpivot."""

import numpy as np
import pandas as pd


class TestSSSP:
    def test_hand_graph(self, ray_session):
        """Chain 0-1-2-3 with weights; 3 rounds reach exactly 3 hops."""
        import pyarrow as pa
        import ray

        from bano_ray.stages.graph import sssp

        e = pd.DataFrame({
            "src": np.array([0, 1, 2, 3, 0], dtype=np.int64),
            "dst": np.array([1, 2, 3, 4, 4], dtype=np.int64),
            "w": np.array([5, 7, 1, 1, 100], dtype=np.int64)})
        sym = pd.concat([e, e.rename(columns={"src": "dst", "dst": "src"})])
        ds = ray.data.from_arrow(pa.Table.from_pandas(
            sym, preserve_index=False))
        seeds = np.zeros(5, dtype=bool)
        seeds[0] = True
        got = sssp(ds, seeds, rounds=3).set_index("node")["dist"]
        # 0→1→2→3 = 13 (3 hops); 0→4 direct = 100, via 3 needs 4 hops
        assert got[0] == 0 and got[1] == 5 and got[2] == 12
        assert got[3] == 13 and got[4] == 100

    def test_fixpoint_early_exit_matches_rounds(self, ray_session):
        import pyarrow as pa
        import ray

        from bano_ray.stages.graph import sssp

        e = pd.DataFrame({"src": np.array([0, 1], dtype=np.int64),
                          "dst": np.array([1, 0], dtype=np.int64),
                          "w": np.array([3, 3], dtype=np.int64)})
        ds = ray.data.from_arrow(pa.Table.from_pandas(
            e, preserve_index=False))
        seeds = np.array([True, False])
        a = sssp(ds, seeds, rounds=2)
        b = sssp(ds, seeds, rounds=10)   # fixpoint after round 1
        pd.testing.assert_frame_equal(a, b)


class TestUnpivot:
    def test_matches_duckdb(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from bano_ray.oracle import q_unpivot as osql
        from bano_ray.pipelines.queries import q_unpivot

        rng = np.random.default_rng(13)
        n = 4000
        df = pd.DataFrame({
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_quantity": rng.integers(1, 50, n).astype(float),
            "l_extendedprice": np.round(rng.uniform(900, 90000, n), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, n), 2)})
        pq.write_table(pa.Table.from_pandas(df),
                       tmp_path / "lineitem.parquet")
        got = (q_unpivot(str(tmp_path)).to_pandas()
               .sort_values(["l_returnflag", "measure"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
        want = (con.sql(osql()).df()
                .sort_values(["l_returnflag", "measure"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["l_returnflag", "measure", "value_c"]],
            want[["l_returnflag", "measure", "value_c"]],
            check_dtype=False)
        assert len(got) == 9          # 3 flags × 3 measures
