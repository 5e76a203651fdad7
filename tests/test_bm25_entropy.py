"""BM25 retrieval scoring + decoded-content histogram entropy (round 4)."""

import numpy as np
import pandas as pd


class TestBM25:
    def _write(self, tmp_path, texts):
        import pyarrow as pa
        import pyarrow.parquet as pq

        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en", "source": "s",
            "n_chars": [len(t) for t in texts],
        })
        pq.write_table(pa.Table.from_pandas(df),
                       tmp_path / "documents.parquet")

    def test_matches_duckdb(self, ray_session, tmp_path):
        import duckdb

        from bano_ray.oracle import q_bm25 as osql
        from bano_ray.pipelines.queries import q_bm25

        rng = np.random.default_rng(23)
        vocab = ["hash", "window", "vector", "table", "scan", "the", "a"]
        texts = [" ".join(rng.choice(vocab, rng.integers(3, 40)))
                 for _ in range(300)]
        self._write(tmp_path, texts)
        got = q_bm25(str(tmp_path))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
        want = con.sql(osql()).df()
        pd.testing.assert_frame_equal(
            got[["doc_id", "score"]], want[["doc_id", "score"]],
            check_dtype=False)

    def test_ranking_sanity(self, ray_session, tmp_path):
        """A doc stuffed with query terms must outrank term-free docs."""
        from bano_ray.pipelines.queries import q_bm25

        texts = (["hash window vector hash window vector"]
                 + ["table scan the a"] * 50
                 + ["hash the a table"] * 3)
        self._write(tmp_path, texts)
        got = q_bm25(str(tmp_path))
        assert got["doc_id"].iloc[0] == 0          # the stuffed doc wins
        assert len(got) == 4                        # only term-bearing docs


class TestImageEntropy:
    def test_entropy_matches_histogram(self, ray_session):
        """ImageEntropy == entropy recomputed from ImageHist's exact bins
        on the same corpus (decoded-content self-consistency)."""
        from bano_ray.pipelines.queries import q_image_entropy, q_image_hist

        sf = "/root/testdata/sf0.001"
        hist = q_image_hist(sf).to_pandas()
        ent = (q_image_entropy(sf).to_pandas()
               .set_index("doc_id")["entropy"])
        for did, g in hist.groupby("doc_id"):
            g = g.sort_values("bin")
            c = g["n"].to_numpy().astype(np.float64)
            n = c.sum()
            p = c / n
            e = 0.0
            for pi in p:                      # same left-fold order
                e = e + (-(pi * np.log2(pi)))
            assert round(e, 6) == ent[did]

    def test_flat_image_zero_entropy_shape(self):
        """Pure-math check of the fold: a 1-bin histogram → entropy 0."""
        c = np.array([100.0])
        p = c / c.sum()
        assert -(p * np.log2(p)).sum() == 0.0
