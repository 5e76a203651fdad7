"""Lambert-93 projection (geo/proj.py) + image phash cluster census."""

import numpy as np


class TestLambert93:
    def test_known_cities(self):
        """Real-world EPSG:2154 anchors (IGN published grids, ±1 m)."""
        from bano_ray.geo.proj import lambert93

        # (lon, lat, X, Y): Paris, Lyon, Marseille town halls (approx)
        pts = [(2.3522, 48.8566, 652469.0, 6862035.3),
               (4.8357, 45.7640, 842666.7, 6519924.4)]
        for lon, lat, X, Y in pts:
            x, y = lambert93(np.array([lon]), np.array([lat]))
            assert abs(x[0] - X) < 2.0 and abs(y[0] - Y) < 2.0

    def test_mm_rounding_and_monotonicity(self):
        from bano_ray.geo.proj import lambert93, lambert93_mm

        lon = np.linspace(-4.5, 8.0, 100)
        lat = np.linspace(42.0, 51.0, 100)
        x, y = lambert93(lon, lat)
        xm, ym = lambert93_mm(lon, lat)
        assert np.all(np.abs(xm - x * 1000.0) <= 0.5 + 1e-6)
        # x grows with lon at fixed lat inside the projection's validity
        x2, _ = lambert93(lon + 0.01, lat)
        assert np.all(x2 > x)

    def test_matches_duckdb_oracle_chain(self):
        """The SQL chain on raw lon/lat literals == the numpy chain —
        the libm/op-order contract, independent of the pts CTE."""
        import duckdb
        import pandas as pd

        from bano_ray.geo import proj

        rng = np.random.default_rng(2)
        lon = rng.uniform(-5.0, 9.0, 5000)
        lat = rng.uniform(41.0, 51.0, 5000)
        xm, ym = proj.lambert93_mm(lon, lat)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"lon": lon, "lat": lat}))
        E, N, AF, R0 = proj.E, proj.N, proj.AF, proj.R0
        X0, Y0, LON0 = proj.X0, proj.Y0, proj.LON0
        q = f"""WITH tr AS (
  SELECT radians(lat) AS latr, radians(lon) AS lonr FROM t),
tt AS (
  SELECT lonr, tan(pi() / 4.0 - latr / 2.0)
         / exp(({E!r} / 2.0)
               * ln((1.0 - {E!r} * sin(latr)) / (1.0 + {E!r} * sin(latr))))
         AS t FROM tr),
rt AS (
  SELECT {AF!r} * exp({N!r} * ln(t)) AS r,
         {N!r} * (lonr - {LON0!r}) AS theta FROM tt)
SELECT CAST(floor(({X0!r} + r * sin(theta)) * 1000.0 + 0.5) AS BIGINT) AS x_mm,
       CAST(floor(({Y0!r} + {R0!r} - r * cos(theta)) * 1000.0 + 0.5) AS BIGINT) AS y_mm
FROM rt"""
        got = con.sql(q).df()
        assert np.array_equal(got["x_mm"].to_numpy(), xm)
        assert np.array_equal(got["y_mm"].to_numpy(), ym)


class TestPhashClusters:
    def test_cluster_sizes_vs_brute(self, ray_session):
        """CC sizes over phash pairs == brute-force union-find on the
        same pair list (sf0.001)."""
        from bano_ray import datagen
        from bano_ray.pipelines.queries import q_phash_clusters
        from bano_ray.stages.dedup import phash_neardup

        sf = "/root/testdata/sf0.001"
        pairs = (phash_neardup(
            datagen.images_dataset(sf).select_columns(["doc_id", "phash"]),
            k=3).to_pandas())
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pairs["a"], pairs["b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        from collections import Counter

        want = Counter(find(x) for x in parent)
        got = q_phash_clusters(sf).to_pandas()
        assert dict(zip(got["label"], got["n_images"])) == dict(want)
