"""Source-diversity and IoU-eval censuses (pipelines/queries.py)."""

import numpy as np
import pandas as pd
import pytest


class TestIouBoxes:
    def test_known_iou_values(self):
        from bano_ray.pipelines.queries import _iou_boxes

        d = np.arange(2000, dtype=np.int64)
        (xg, yg, wg, hg), (xp, yp, wp, hp) = _iou_boxes(d)
        # boxes are valid and the jitter stays in ±20
        assert (wg >= 20).all() and (wg < 50).all()
        assert (np.abs(xp - xg) <= 10).all()
        # the IoU≥0.5 test 2·inter ≥ union is exactly inter/union ≥ 0.5
        iw = np.maximum(0, np.minimum(xg + wg, xp + wp) - np.maximum(xg, xp))
        ih = np.maximum(0, np.minimum(yg + hg, yp + hp) - np.maximum(yg, yp))
        inter = iw * ih
        union = wg * hg + wp * hp - inter
        lhs = 2 * inter >= union
        rhs = inter / union >= 0.5
        assert (lhs == rhs).all()
        # the distribution is non-degenerate: both matches and misses occur
        assert lhs.any() and (~lhs).any()


class TestGiniExactness:
    def test_closed_form_on_hand_counts(self, ray_session):
        # zone with counts (3, 1): gini = 1 − (9+1)/16 = 6/16 → 375000 ppm
        n, sq = 4, 10
        assert (n * n - sq) * 1_000_000 // (n * n) == 375000


class TestEndToEnd:
    @pytest.mark.parametrize("qname", ["q_source_diversity", "q_iou_eval"])
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
        cols = sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        assert a.astype(str).equals(b.astype(str))


class TestMinhashEstErr:
    def test_matches_duckdb_and_estimator_sane(self, ray_session):
        import duckdb

        from bano_ray import oracle
        from bano_ray.pipelines.queries import q_minhash_est_err
        from bano_ray.stages.dedup import MINHASH_PERMS

        sf = "/root/testdata/sf0.001"
        got = q_minhash_est_err(sf).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
        want = con.sql(oracle.q_minhash_est_err()).df()
        cols = sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        assert a.astype(str).equals(b.astype(str))
        # estimator sanity on the surfaced candidates: the banded pairs
        # skew high-similarity, and estimate tracks truth within ~0.35
        est = got["sig_match"] / MINHASH_PERMS
        tru = got["jac_num"] / got["jac_den"]
        assert (abs(est - tru) < 0.35).all()
        # census supersets the thresholded pair query
        pairs = con.sql(oracle.q_minhash_pairs()).df()
        have = set(zip(got["doc_a"], got["doc_b"]))
        assert set(zip(pairs["doc_a"], pairs["doc_b"])) <= have


class TestEmbedDrift:
    def test_matches_duckdb_and_pairs_complete(self, ray_session):
        import duckdb

        from bano_ray import oracle
        from bano_ray.pipelines.queries import q_embed_drift

        sf = "/root/testdata/sf0.001"
        got = q_embed_drift(sf).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
        want = con.sql(oracle.q_embed_drift()).df()
        cols = sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        assert a.astype(str).equals(b.astype(str))
        # exactly one pair per consecutive same-label step: rows = N - labels
        n = con.sql("SELECT COUNT(*), COUNT(DISTINCT label) FROM embeddings").fetchone()
        assert len(got) == n[0] - n[1]
        # drift flag fires on this corpus (random vectors anticorrelate ~half)
        assert got["drift"].any() and (~got["drift"]).any()
