"""Raster→vector connected-component extraction (stages/rastervec.py)."""

import numpy as np
import pandas as pd

from bano_ray.stages.rastervec import (RV_GY, _adjacency_edges, cell_of)


class TestAdjacency:
    def test_right_and_down_edges(self):
        # cells (0,0),(0,1),(1,0) in (gx,gy): L-shape — two edges
        cells = np.asarray([0, 1, RV_GY], dtype=np.int64)
        e = _adjacency_edges(cells)
        got = set(zip(e["a"].tolist(), e["b"].tolist()))
        assert got == {(0, 1), (0, RV_GY)}

    def test_no_wrap_across_column_stripe(self):
        # gy = RV_GY-1 and gy = 0 of the next gx are id-adjacent but NOT
        # grid-adjacent — the stripe guard must drop that edge
        cells = np.asarray([RV_GY - 1, RV_GY], dtype=np.int64)
        e = _adjacency_edges(cells)
        assert len(e) == 0

    def test_isolated_cells_produce_no_edges(self):
        cells = np.asarray([5, 500, 1000], dtype=np.int64)
        assert len(_adjacency_edges(cells)) == 0


class TestCellOf:
    def test_clips_to_grid(self):
        from bano_ray import datagen as dg

        lon = np.asarray([dg.LON0 - 1.0, dg.LON0 + dg.LON_SPAN + 1.0])
        lat = np.asarray([dg.LAT0 - 1.0, dg.LAT0 + dg.LAT_SPAN + 1.0])
        c = cell_of(lon, lat)
        assert c[0] == 0
        assert c[1] == 64 * RV_GY - 1


class TestEndToEnd:
    def test_matches_duckdb_and_partitions_are_disjoint(self, ray_session):
        import duckdb

        from bano_ray import oracle
        from bano_ray.pipelines.queries import q_raster_components

        sf = "/root/testdata/sf0.001"
        got = q_raster_components(sf).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
        want = con.sql(oracle.q_raster_components()).df()
        cols = sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert a.astype(str).equals(b.astype(str))
        # every occupied cell belongs to exactly one component: total cell
        # count equals the distinct-cell count of the raw raster
        n_cells = con.sql(oracle.q_raster_components().split("SELECT label")[0]
                          + "SELECT CAST(COUNT(*) AS BIGINT) FROM occ").df()
        assert int(got["n_cells"].sum()) == int(n_cells.iloc[0, 0])
        # labels are component minima — each label is one of its own cells
        assert (got["label"] // RV_GY).between(
            got["gx_min"], got["gx_max"]).all()
