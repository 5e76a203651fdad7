"""Ordered-scan + frontier operators added late round 4: transitions,
interval_cover, skyline, ring_smooth."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(rng, n, n_users=20):
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (rng.integers(0, 10**9, n) * 1000).astype("datetime64[us]"),
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "buy"], n),
    })


class TestTransitions:
    def test_hand_case(self, ray_session):
        import ray

        from bano_ray.stages.sessions import transitions

        df = pd.DataFrame({
            "event_id": [0, 1, 2, 3, 4],
            "ts": np.array([10, 20, 30, 10, 20], "datetime64[us]"),
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["a", "b", "a", "a", "a"],
        })
        got = (transitions(ray.data.from_pandas([df.iloc[:2], df.iloc[2:]]),
                           n_shards=4)
               .to_pandas().sort_values(["from_type", "to_type"])
               .reset_index(drop=True))
        want = pd.DataFrame({"from_type": ["a", "a", "b"],
                             "to_type": ["a", "b", "a"],
                             "cnt": [1, 1, 1]})
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=False)

    def test_equal_ts_tiebreak_and_duckdb(self, ray_session):
        """Equal timestamps within a user must pair in event_id order —
        the oracle's ORDER BY ts, event_id."""
        import ray

        from bano_ray.oracle import q_transitions
        from bano_ray.stages.sessions import transitions

        rng = np.random.default_rng(5)
        df = _events(rng, 3000)
        # force heavy ts collisions
        df["ts"] = (rng.integers(0, 50, 3000) * 1_000_000) \
            .astype("datetime64[us]")
        got = (transitions(
            ray.data.from_pandas([df.iloc[:1000], df.iloc[1000:]]),
            n_shards=8)
            .to_pandas().sort_values(["from_type", "to_type"])
            .reset_index(drop=True))
        con = duckdb.connect()
        con.register("events", df)
        want = con.sql(q_transitions()).df()
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=False)


class TestIntervalCover:
    def test_hand_case(self, ray_session):
        """[0,10) ∪ [5,12) ∪ [20,25) → 2 islands, 17 µs covered; the
        overlapping pair arrives in DIFFERENT blocks."""
        import ray

        from bano_ray.stages.sessions import interval_cover

        df = pd.DataFrame({"user_id": [7, 7, 7],
                           "s": np.array([0, 5, 20], np.int64),
                           "e": np.array([10, 12, 25], np.int64)})
        got = interval_cover(
            ray.data.from_pandas([df.iloc[:1], df.iloc[1:]]),
            n_shards=4).to_pandas()
        assert got.values.tolist() == [[7, 2, 17]]

    def test_contained_interval(self, ray_session):
        """An interval fully inside another adds no coverage."""
        import ray

        from bano_ray.stages.sessions import interval_cover

        df = pd.DataFrame({"user_id": [1, 1],
                           "s": np.array([0, 3], np.int64),
                           "e": np.array([100, 5], np.int64)})
        got = interval_cover(ray.data.from_pandas(df),
                             n_shards=2).to_pandas()
        assert got.values.tolist() == [[1, 1, 100]]

    def test_matches_duckdb(self, ray_session):
        import ray

        from bano_ray.oracle import q_interval_cover
        from bano_ray.stages.sessions import interval_cover

        rng = np.random.default_rng(9)
        ev = _events(rng, 4000, n_users=30)
        ds = ray.data.from_pandas([ev.iloc[i::7].reset_index(drop=True)
                                   for i in range(7)])

        def to_iv(batch: pa.Table) -> pa.Table:
            s = batch.column("ts").cast(pa.int64()).to_numpy()
            dur = (batch.column("event_id").to_numpy() % 7 + 1) * 300_000_000
            return pa.table({"user_id": batch.column("user_id"),
                             "s": pa.array(s), "e": pa.array(s + dur)})

        got = (interval_cover(ds.map_batches(to_iv, batch_format="pyarrow"),
                              n_shards=8)
               .to_pandas().sort_values("user_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("events", ev)
        want = con.sql(q_interval_cover()).df()
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=False)


class TestSkyline:
    def test_hand_case_ties_and_duplicates(self, ray_session):
        """Duplicate frontier points both survive; equal-x dominated-y
        drops; a point dominated only by a DIFFERENT key survives."""
        import ray

        from bano_ray.stages.analytics import skyline

        df = pd.DataFrame({
            "k": ["a", "a", "a", "a", "a", "b"],
            "x": np.array([5, 5, 5, 3, 6, 9], np.int64),
            "y": np.array([9, 9, 7, 10, 2, 1], np.int64),
        })
        got = (skyline(ray.data.from_pandas([df.iloc[:3], df.iloc[3:]]),
                       key="k", xy=lambda b: (b.column("x").to_numpy(),
                                              b.column("y").to_numpy()))
               .to_pandas().sort_values(["k", "x", "y"])
               .reset_index(drop=True))
        # a: (5,9)x2 kept (dupes), (5,7) dominated by (5,9), (3,10) kept,
        #    (6,2) kept; b: (9,1) kept (other key can't dominate)
        want = [["a", 3, 10], ["a", 5, 9], ["a", 5, 9], ["a", 6, 2],
                ["b", 9, 1]]
        assert got[["k", "x", "y"]].values.tolist() == want

    def test_matches_brute_force(self, ray_session):
        import ray

        from bano_ray.stages.analytics import skyline

        rng = np.random.default_rng(13)
        n = 5000
        df = pd.DataFrame({
            "k": rng.choice(["p", "q"], n),
            "x": rng.integers(0, 80, n).astype(np.int64),
            "y": rng.integers(0, 80, n).astype(np.int64),
        })
        got = (skyline(ray.data.from_pandas(
            [df.iloc[i::9].reset_index(drop=True) for i in range(9)]),
            key="k", xy=lambda b: (b.column("x").to_numpy(),
                                   b.column("y").to_numpy()))
            .to_pandas().sort_values(["k", "x", "y"]).reset_index(drop=True))
        keep = []
        for _, r in df.iterrows():
            dom = ((df["k"] == r["k"]) & (df["x"] >= r["x"])
                   & (df["y"] >= r["y"])
                   & ((df["x"] > r["x"]) | (df["y"] > r["y"])))
            if not dom.any():
                keep.append((r["k"], r["x"], r["y"]))
        want = sorted(keep)
        assert [tuple(v) for v in got[["k", "x", "y"]].values.tolist()] == want


class TestRingSmooth:
    def test_single_point_scatters_to_nine(self, ray_session):
        import ray

        from bano_ray.geo.cells import lonlat_to_tile, ring_smooth

        ds = ray.data.from_pandas(pd.DataFrame({"lon": [2.35], "lat": [48.85]}))
        out = ring_smooth(ds, 12).to_pandas()
        cx, cy = lonlat_to_tile([2.35], [48.85], 12)
        assert len(out) == 9 and (out["n_ring"] == 1).all()
        assert set(map(tuple, out[["cell_x", "cell_y"]].values)) == {
            (cx[0] + dx, cy[0] + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)}

    def test_two_adjacent_cells_overlap(self, ray_session):
        """Points in horizontally adjacent cells: the shared 2×3 band sums
        to 2, the outer flanks to 1."""
        import ray

        from bano_ray.geo.cells import ring_smooth

        # z=1: cells are 180° wide — lon -90 → x0, lon 90 → x1, same y
        ds = ray.data.from_pandas(pd.DataFrame(
            {"lon": [-90.0, 90.0], "lat": [0.01, 0.01]}))
        out = ring_smooth(ds, 1).to_pandas()
        m = {(r.cell_x, r.cell_y): r.n_ring for r in out.itertuples()}
        assert m[(0, 0)] == 2 and m[(1, 0)] == 2       # shared band
        assert m[(-1, 0)] == 1 and m[(2, 0)] == 1      # flanks


class TestScd2:
    def test_hand_case(self, ray_session):
        """Consecutive equal states collapse; change rows chain validity;
        the last state per user stays open (int64-max sentinel)."""
        import ray

        from bano_ray.stages.sessions import SCD2_OPEN_END, scd2

        df = pd.DataFrame({
            "event_id": [0, 1, 2, 3, 4],
            "ts": np.array([10, 20, 30, 40, 5], "datetime64[us]"),
            "user_id": [1, 1, 1, 1, 2],
            "event_type": ["a", "a", "b", "a", "z"],
        })
        got = (scd2(ray.data.from_pandas([df.iloc[:2], df.iloc[2:]]),
                    n_shards=4)
               .to_pandas().sort_values(["user_id", "valid_from"])
               .reset_index(drop=True))
        assert got.values.tolist() == [
            [1, "a", 10, 30], [1, "b", 30, 40], [1, "a", 40, SCD2_OPEN_END],
            [2, "z", 5, SCD2_OPEN_END]]

    def test_matches_duckdb(self, ray_session):
        import ray

        from bano_ray.oracle import q_scd2
        from bano_ray.stages.sessions import scd2

        rng = np.random.default_rng(21)
        df = _events(rng, 3000)
        df["ts"] = (rng.integers(0, 40, 3000) * 1_000_000) \
            .astype("datetime64[us]")   # heavy ts collisions
        got = (scd2(ray.data.from_pandas([df.iloc[:1000], df.iloc[1000:]]),
                    n_shards=8)
               .to_pandas().sort_values(["user_id", "valid_from", "state"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("events", df)
        want = (con.sql(q_scd2()).df()
                .sort_values(["user_id", "valid_from", "state"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got[want.columns], want,
                                      check_dtype=False)


class TestWeightedMedian:
    @staticmethod
    def _v(batch: pa.Table):
        return batch.column("v").to_numpy(zero_copy_only=False)

    @staticmethod
    def _w(batch: pa.Table):
        return batch.column("w").to_numpy(zero_copy_only=False)

    def test_hand_case(self, ray_session):
        """Weights pull the median off the unweighted middle: values
        1,2,3 with weights 1,1,4 → median 3; equal-split case picks the
        LOWER value (2·cum == tot counts)."""
        import ray

        from bano_ray.stages.analytics import weighted_median

        df = pd.DataFrame({
            "g": ["a"] * 3 + ["b"] * 2,
            "v": np.array([1, 2, 3, 10, 20], np.int64),
            "w": np.array([1, 1, 4, 1, 1], np.int64),
        })
        got = weighted_median(
            ray.data.from_pandas([df.iloc[:2], df.iloc[2:]]),
            key="g", val_cents=self._v, weight=self._w)
        assert got.values.tolist() == [["a", 3], ["b", 10]]

    def test_matches_duckdb_random(self, ray_session):
        import ray

        from bano_ray.stages.analytics import weighted_median

        rng = np.random.default_rng(17)
        n = 4000
        df = pd.DataFrame({
            "g": rng.choice(["x", "y", "z"], n),
            "v": rng.integers(-300, 300, n).astype(np.int64),
            "w": rng.integers(1, 9, n).astype(np.int64),
        })
        got = weighted_median(
            ray.data.from_pandas([df.iloc[:1500], df.iloc[1500:]]),
            key="g", val_cents=self._v, weight=self._w)
        con = duckdb.connect()
        con.register("t", df)
        want = con.sql("""
            WITH g AS (SELECT g, v, SUM(w) w FROM t GROUP BY 1,2),
            c AS (SELECT g, v, SUM(w) OVER (PARTITION BY g ORDER BY v) cum,
                         SUM(w) OVER (PARTITION BY g) tot FROM g)
            SELECT g, MIN(v) AS wmedian_c FROM c WHERE 2*cum >= tot
            GROUP BY 1 ORDER BY 1""").df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)

    def test_histogram_rounds_wide_domain(self, ray_session):
        """Domain >> final_cap forces ≥2 histogram rounds; equality vs
        DuckDB proves the rank/range bookkeeping across rounds."""
        import ray

        from bano_ray.stages.analytics import weighted_median

        rng = np.random.default_rng(23)
        n = 20000
        df = pd.DataFrame({
            "g": rng.choice(["x", "y"], n),
            "v": rng.integers(-10**9, 10**9, n).astype(np.int64),
            "w": rng.integers(1, 5, n).astype(np.int64),
        })
        got = weighted_median(
            ray.data.from_pandas([df.iloc[:7000], df.iloc[7000:]]),
            key="g", val_cents=self._v, weight=self._w,
            bins=64, final_cap=256)
        con = duckdb.connect()
        con.register("t", df)
        want = con.sql("""
            WITH g AS (SELECT g, v, SUM(w) w FROM t GROUP BY 1,2),
            c AS (SELECT g, v, SUM(w) OVER (PARTITION BY g ORDER BY v) cum,
                         SUM(w) OVER (PARTITION BY g) tot FROM g)
            SELECT g, MIN(v) AS wmedian_c FROM c WHERE 2*cum >= tot
            GROUP BY 1 ORDER BY 1""").df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)


class TestEmbedGram:
    def test_matches_numpy(self, ray_session, sf_dir):
        import pyarrow.parquet as pq

        from bano_ray.pipelines.queries import q_embed_gram

        got = q_embed_gram(sf_dir).reset_index(drop=True)
        t = pq.read_table(f"{sf_dir}/embeddings.parquet")
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        x = emb.flatten().to_numpy().astype(np.float64).reshape(-1, 64)
        g = x.T @ x
        iu, ju = np.triu_indices(64)
        want = pd.DataFrame({"i": iu, "j": ju, "g": np.round(g[iu, ju], 6)})
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestTilePyramid:
    def test_parent_sums_and_hand_case(self, ray_session):
        import ray

        from bano_ray.geo.cells import lonlat_to_tile, tile_pyramid

        # two points in different z2 tiles that share a z1 parent
        ds = ray.data.from_pandas(pd.DataFrame(
            {"lon": [-170.0, -60.0, 100.0], "lat": [10.0, 10.0, 10.0]}))
        out = tile_pyramid(ds, z_hi=2, z_lo=0).to_pandas()
        by_z = {z: g for z, g in out.groupby("z")}
        assert by_z[0]["n_points"].sum() == 3       # root holds everything
        assert len(by_z[0]) == 1 and by_z[0]["n_points"].iloc[0] == 3
        # z2: three distinct tiles of 1
        assert len(by_z[2]) == 3 and (by_z[2]["n_points"] == 1).all()
        # every z1 parent equals the sum of its z2 children
        z2 = by_z[2].copy()
        z2["px"], z2["py"] = z2["x"] // 2, z2["y"] // 2
        rolled = (z2.groupby(["px", "py"], as_index=False)["n_points"].sum()
                  .rename(columns={"px": "x", "py": "y"}))
        got1 = (by_z[1][["x", "y", "n_points"]]
                .sort_values(["x", "y"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got1, rolled.sort_values(["x", "y"]).reset_index(drop=True),
            check_dtype=False)
