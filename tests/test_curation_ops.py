"""Round-5 curation operators: filter funnel, RRF fusion, BPE first-merge
census, semantic dedup.  Each is also oracle-gated end-to-end by
scripts/parity_check.py; the tests here pin the kernel-level invariants."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


class TestFilterFunnel:
    def test_cascade_is_monotone_and_consistent(self, ray_session):
        from bano_ray.pipelines.queries import q_filter_funnel

        out = q_filter_funnel(SF).sort_values("stage_idx")
        assert list(out["stage"]) == ["langid", "quality", "repetition",
                                      "pii"]
        # chained: each stage's n_in is the previous stage's n_kept
        n_in = out["n_in"].to_numpy()
        n_kept = out["n_kept"].to_numpy()
        assert (n_in[1:] == n_kept[:-1]).all()
        assert (out["n_dropped"].to_numpy() == n_in - n_kept).all()
        assert (n_kept <= n_in).all() and n_kept[-1] > 0
        assert n_in[0] == 500          # sf0.001 corpus size

    def test_partial_matches_standalone_kernels(self):
        from bano_ray.stages.text import (QF_DUP_MAX, QF_QUALITY_MIN,
                                          funnel_partial, langid_batch,
                                          pii_plant, pii_redact_batch,
                                          quality_batch, repetition_batch)

        batch = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([
                "the cat and the hat of the mat to go",
                "le chat et la table des une le la",
                "word word word word word word",
                "the mix le of et and la unique tokens here now",
            ])})
        p = funnel_partial(batch)
        lang = langid_batch(batch)
        s1 = (lang.column("en_hits").to_numpy()
              != lang.column("fr_hits").to_numpy())
        s2 = s1 & (quality_batch(batch).column("quality").to_numpy()
                   > QF_QUALITY_MIN)
        s3 = s2 & (repetition_batch(batch).column("dup_frac").to_numpy()
                   <= QF_DUP_MAX)
        pii = pii_redact_batch(pii_plant(batch))
        s4 = s3 & ((pii.column("n_emails").to_numpy()
                    + pii.column("n_phones").to_numpy()) == 0)
        assert p.column("n_docs")[0].as_py() == 4
        for i, s in enumerate((s1, s2, s3, s4), start=1):
            assert p.column(f"k{i}")[0].as_py() == int(s.sum())


class TestRrfFusion:
    def test_topk_shape_and_rank_arithmetic(self, ray_session):
        from bano_ray.pipelines.queries import RRF_K, RRF_TOPK, q_rrf_fusion

        out = q_rrf_fusion(SF)
        assert len(out) == RRF_TOPK
        # every row must come from at least one ranker
        rb = out["r_bm25"].to_numpy()
        rq = out["r_quality"].to_numpy()
        assert ((rb > 0) | (rq > 0)).all()
        expect = (np.where(rb > 0, 1.0 / (RRF_K + rb), 0.0)
                  + np.where(rq > 0, 1.0 / (RRF_K + rq), 0.0))
        assert np.allclose(out["rrf"].to_numpy(), np.round(expect, 9))
        # descending rrf with doc_id tiebreak
        r = out["rrf"].to_numpy()
        d = out["doc_id"].to_numpy()
        for i in range(len(out) - 1):
            assert (r[i] > r[i + 1]
                    or (r[i] == r[i + 1] and d[i] < d[i + 1]))


class TestBpeFirstMerge:
    def test_partial_matches_naive_count(self):
        from bano_ray.stages.text import bpe_pair_partial

        texts = ["abba abba cd", "abba", "x yz  yz", ""]
        batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                          "text": pa.array(texts)})
        got = bpe_pair_partial(batch).to_pandas().set_index("pair")["c"]
        naive: dict[str, int] = {}
        for t in texts:
            for w in t.split(" "):
                for i in range(len(w) - 1):
                    naive[w[i:i + 2]] = naive.get(w[i:i + 2], 0) + 1
        assert dict(got) == naive

    def test_global_topk(self, ray_session):
        from bano_ray.pipelines.queries import q_bpe_first_merge
        from bano_ray.stages.text import BPE_MERGE_TOPK

        out = q_bpe_first_merge(SF)
        assert len(out) == BPE_MERGE_TOPK
        c = out["c"].to_numpy()
        assert (c[:-1] >= c[1:]).all() and (c > 0).all()
        assert all(len(p) == 2 for p in out["pair"])


class TestSemanticDedup:
    def test_buckets_partition_the_corpus(self, ray_session):
        import pyarrow.parquet as pq

        from bano_ray.pipelines.queries import q_semantic_dedup

        out = q_semantic_dedup(SF).to_pandas()
        n_vecs = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
        assert out["n_members"].sum() == n_vecs
        assert out["bucket"].is_unique
        assert (out["n_members"] >= 1).all()
        # keeper is a member: min id can never exceed any member's id,
        # and with 4096 coarse buckets real multi-member clusters exist
        assert (out["n_members"] > 1).any()

    def test_bucket_is_prefix_of_pq_codes(self, ray_session):
        """The coarse bucket must equal the packed first-SD_SUBS codes of
        the full PQ coder on the same vectors."""
        import ray

        from bano_ray.stages.quantize import (SD_SUBS, _pq_pass,
                                              sd_bucket_partial)

        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                   columns=["vec_id", "embedding"]).limit(64)
        tbl = pa.Table.from_pandas(ds.to_pandas())
        got = sd_bucket_partial(tbl).to_pandas().set_index("vec_id")["bucket"]
        full = _pq_pass(tbl).to_pandas()
        packed = (full[full["sub"] < SD_SUBS]
                  .assign(term=lambda d: d["code"] * (16 ** d["sub"]))
                  .groupby("vec_id")["term"].sum())
        assert dict(got) == dict(packed)


class TestDbscan:
    def test_roles_and_labels(self, ray_session):
        """DBSCAN invariants vs a brute-force numpy reference at sf0.001."""
        import pyarrow.parquet as pq

        from bano_ray import datagen
        from bano_ray.pipelines.queries import (DBSCAN_MINPTS,
                                                DIST_JOIN_RADIUS, q_dbscan)

        out = (q_dbscan(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        d = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id"]).column("doc_id").to_numpy()
        lon, lat = datagen.lon_lat(np.sort(d))
        dx = lon[:, None] - lon[None, :]
        dy = lat[:, None] - lat[None, :]
        close = dx * dx + dy * dy <= DIST_JOIN_RADIUS * DIST_JOIN_RADIUS
        deg = close.sum(axis=1)           # includes self
        core = deg >= DBSCAN_MINPTS
        # self is non-core for these rows, so any() over core neighbors
        # needs no self-exclusion
        border = ~core & ((close & core[None, :]).any(axis=1))
        assert len(out) == len(d)
        assert (out["role"].to_numpy() == np.where(
            core, "core", np.where(border, "border", "noise"))).all()
        # labels: noise = -1; core labels = component min over core graph
        assert (out.loc[out["role"] == "noise", "label"] == -1).all()
        lab = out.set_index("doc_id")["label"]
        ids = np.sort(d)
        core_ids = ids[core]
        # every core's label is a core id <= itself, same component
        for i in np.flatnonzero(core)[:50]:
            assert lab[ids[i]] <= ids[i] and lab[ids[i]] in set(core_ids)
        # border label = min label among adjacent cores
        for i in np.flatnonzero(border):
            neigh = ids[close[i] & core]
            assert lab[ids[i]] == min(lab[j] for j in neigh)


class TestContainmentMmr:
    def test_containment_bounds_and_jaccard_relation(self, ray_session):
        from bano_ray.pipelines.queries import q_containment_pairs

        out = q_containment_pairs(SF).to_pandas()
        assert len(out) > 0
        n, na, nb = (out["n_inter"].to_numpy(), out["n_a"].to_numpy(),
                     out["n_b"].to_numpy())
        assert (n <= np.minimum(na, nb)).all()
        assert ((out["cont_ab"] <= 1.0) & (out["cont_ab"] >= 0)).all()
        # containment dominates resemblance: max(cont) >= jaccard
        jac = n / (na + nb - n)
        assert (np.maximum(out["cont_ab"], out["cont_ba"]) >= jac - 1e-9).all()

    def test_mmr_is_permutation_of_bm25_candidates(self, ray_session):
        from bano_ray.pipelines.queries import MMR_TOPK, q_bm25, q_mmr_rerank

        out = q_mmr_rerank(SF)
        bm = q_bm25(SF)
        assert len(out) == MMR_TOPK
        assert list(out["rank"]) == list(range(1, MMR_TOPK + 1))
        assert set(out["doc_id"]) <= set(bm["doc_id"])
        # rank 1 is the pure-relevance argmax (no diversity term yet)
        assert out.iloc[0]["doc_id"] == bm.iloc[0]["doc_id"]


class TestImageEqualize:
    def test_kernel_matches_numpy_reference(self, ray_session):
        """Per-image remap invariants + a direct-decode cross-check."""
        from bano_ray import datagen
        from bano_ray.pipelines.queries import q_image_equalize

        out = (q_image_equalize(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert (out["eq_min"] == 0).all()          # lowest value maps near 0
        assert (out["eq_max"] <= 255).all()
        # cross-check one image against a from-source reference
        row = out.iloc[0]
        did = int(row["doc_id"])
        w, h = datagen.dims_of(np.asarray([did]))
        px = datagen.pixels_of(did, int(w[0]), int(h[0]))
        v = px.reshape(-1).astype(np.int64)
        hist = np.bincount(v, minlength=256)
        cdf = np.cumsum(hist)
        m = int(cdf[(hist > 0).argmax()])
        N = v.size
        ov = (2 * 255 * (cdf - m) + (N - m)) // (2 * (N - m))
        assert int(row["eq_sum"]) == int((hist * ov).sum())
        assert int(row["n_vals"]) == N


class TestRound5SignalOps:
    def test_watermark_null_distribution(self, ray_session):
        """Un-watermarked text: green fraction ~0.5, z-scores centered."""
        from bano_ray.pipelines.queries import q_watermark

        out = q_watermark(SF).to_pandas()
        assert len(out) == 500
        has = out[out["n_pairs"] > 0]
        frac = has["n_green"].sum() / has["n_pairs"].sum()
        assert 0.4 < frac < 0.6
        assert (out.loc[out["n_pairs"] == 0, "z_score"] == 0).all()

    def test_k_anonymity_accounts_every_doc(self, ray_session):
        from bano_ray.pipelines.queries import q_k_anonymity

        out = q_k_anonymity(SF).to_pandas()
        assert out["n_docs"].sum() == 500
        assert (out["n_docs"] == out["qi_size"] * out["n_groups"]).all()
        from bano_ray.pipelines.queries import KANON_K
        assert (out["reidentifiable"] == (out["qi_size"] < KANON_K)).all()

    def test_jl_distortion_is_bounded(self, ray_session):
        """JL sanity: E[proj_msq] = orig_sq, so the aggregate ratio is
        ~1.  Per-vector spread is WIDE here by construction — the
        synthetic embedding dims are affinely correlated (datagen stream
        design), which inflates the projection variance far past the
        iid-Gaussian chi-square band — so only positivity is asserted
        per vector."""
        from bano_ray.pipelines.queries import q_jl_distortion

        out = q_jl_distortion(SF).to_pandas()
        r = out["proj_msq"] / out["orig_sq"]
        assert (r >= 0).all() and (out["orig_sq"] > 0).all()
        assert 0.8 < r.mean() < 1.25


class TestFrameDiff:
    def test_matches_direct_decode(self, ray_session):
        from bano_ray import datagen
        from bano_ray.pipelines.flagship import (FRAME_DIFF_T, FRAME_H,
                                                 FRAME_W, FRAMES_PER_VIDEO)
        from bano_ray.pipelines.queries import q_frame_diff

        out = (q_frame_diff(SF).to_pandas()
               .sort_values(["video_id", "frame_idx"]).reset_index(drop=True))
        assert len(out) == 500 * (FRAMES_PER_VIDEO - 1)
        row = out.iloc[7]
        vid, fi = int(row["video_id"]), int(row["frame_idx"])
        a = datagen.pixels_of(vid * FRAMES_PER_VIDEO + fi,
                              FRAME_W, FRAME_H).astype(np.int64).ravel()
        b = datagen.pixels_of(vid * FRAMES_PER_VIDEO + fi - 1,
                              FRAME_W, FRAME_H).astype(np.int64).ravel()
        d = np.abs(a - b)
        assert int(row["n_changed"]) == int((d > FRAME_DIFF_T).sum())
        assert int(row["sum_absdiff"]) == int(d.sum())


class TestTrackLcss:
    def test_lcss_bounds_and_reference(self, ray_session):
        """LCSS ≤ min(m, n); spot-check one pair against a brute DP."""
        from bano_ray.pipelines.queries import q_track_lcss
        from bano_ray.stages.tracks import LCSS_EPS_U

        out = q_track_lcss(SF).to_pandas()
        assert len(out) > 0
        assert (out["lcss_len"]
                <= np.minimum(out["m_pts"], out["n_pts"])).all()
        assert (out["lcss_len"] >= 0).all() and (out["lcss_len"] > 0).any()

    def test_kernel_vs_brute_dp(self):
        from bano_ray.stages.tracks import _ZID_MULT, lcss_group
        import pandas as pd

        rng = np.random.default_rng(3)
        rows = []
        for sidx, npts in ((1, 9), (2, 7), (3, 5)):
            base = rng.integers(0, 500_000, 2)
            for k in range(npts):
                rows.append({"zid": 5 * _ZID_MULT + sidx, "doc_id": k,
                             "ix": int(base[0] + k * 40_000
                                       + rng.integers(-30_000, 30_000)),
                             "iy": int(base[1] + k * 40_000
                                       + rng.integers(-30_000, 30_000))})
        df = pd.DataFrame(rows)
        out = lcss_group(df, stride=1, eps=150_000)

        def brute(a, b, eps):
            m, n = len(a), len(b)
            f = np.zeros((m + 1, n + 1), dtype=int)
            for i in range(1, m + 1):
                for j in range(1, n + 1):
                    if (abs(a[i - 1][0] - b[j - 1][0]) <= eps
                            and abs(a[i - 1][1] - b[j - 1][1]) <= eps):
                        f[i][j] = f[i - 1][j - 1] + 1
                    else:
                        f[i][j] = max(f[i - 1][j], f[i][j - 1])
            return f[m][n]

        pts = {s: [(r["ix"], r["iy"]) for _, r in
                   df[df["zid"] == 5 * _ZID_MULT + s]
                   .sort_values("doc_id").iterrows()]
               for s in (1, 2, 3)}
        expect = {(1, 2): brute(pts[1], pts[2], 150_000),
                  (2, 3): brute(pts[2], pts[3], 150_000)}
        got = {(int(r["sidx_a"]), int(r["sidx_b"])): int(r["lcss_len"])
               for _, r in out.iterrows()}
        assert got == expect


class TestIdwGrid:
    def test_partials_merge_invariantly(self, ray_session):
        """The census must be identical under any block split (integer
        sums are order/partition independent)."""
        import ray

        from bano_ray.pipelines.cumul import points_dataset
        from bano_ray.stages.spatial import idw_grid

        pts = points_dataset(SF).select_columns(["doc_id", "lon", "lat"])
        a = (idw_grid(pts).to_pandas()
             .sort_values(["cx", "cy"]).reset_index(drop=True))
        b = (idw_grid(pts.repartition(13)).to_pandas()
             .sort_values(["cx", "cy"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        assert (a["sw"] > 0).all() and (a["n_pts"] > 0).all()
