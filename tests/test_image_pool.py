"""Grid-pooled decoded-content features (pipelines/flagship.ImagePool)."""

import numpy as np
import pyarrow as pa


class TestKernel:
    def test_block_sums_on_known_image(self, ray_session):
        from bano_ray import datagen
        from bano_ray.codecs import encode_png
        from bano_ray.pipelines.flagship import POOL_G, ImagePool

        did = 1  # PNG doc (1 % FMT_JPEG_MOD != 0)
        w, h = [int(x[0]) for x in datagen.dims_of(np.asarray([did]))]
        px = datagen.pixels_of(did, w, h)
        blob = encode_png(px)
        batch = pa.table({"doc_id": pa.array([did], pa.int64()),
                          "fmt": pa.array(["png"]),
                          "bytes": pa.array([blob], pa.binary())})
        got = ImagePool()(batch).to_pandas().set_index(["gy", "gx"])
        lum = px.reshape(-1, 3).astype(np.int64).sum(axis=1)
        pix = np.arange(w * h)
        bx = (pix % w) * POOL_G // w
        by = (pix // w) * POOL_G // h
        for gy in range(POOL_G):
            for gx in range(POOL_G):
                m = (bx == gx) & (by == gy)
                assert got.loc[(gy, gx)]["n_px"] == int(m.sum())
                assert got.loc[(gy, gx)]["sum_lum"] == int(lum[m].sum())
        # 4×4 partition covers every pixel exactly once
        assert int(got["n_px"].sum()) == w * h


class TestEndToEnd:
    def test_matches_duckdb(self, ray_session):
        import duckdb

        from bano_ray import oracle
        from bano_ray.pipelines.queries import q_image_pool

        sf = "/root/testdata/sf0.001"
        got = q_image_pool(sf).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
        want = con.sql(oracle.q_image_pool()).df()
        cols = sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        assert a.astype(str).equals(b.astype(str))
