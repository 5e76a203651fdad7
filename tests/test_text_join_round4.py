"""Behavior tests: repetition signals, decontamination probe, salted join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bano_ray.stages.text import (DECON_N, Decontaminate, decon_ngram_batch,
                                  repetition_batch)


class TestRepetition:
    def test_hand_cases(self):
        batch = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a a a a", "a b c d", "x"]),
        })
        out = repetition_batch(batch).to_pandas()
        assert out["n_tokens"].tolist() == [4, 4, 1]
        assert out["n_distinct"].tolist() == [1, 4, 1]
        assert out["top_frac"].tolist() == [1.0, 0.25, 1.0]
        assert out["dup_frac"].tolist() == [0.75, 0.0, 0.0]

    def test_matches_python_reference(self):
        rng = np.random.default_rng(7)
        vocab = ["w%d" % i for i in range(9)]
        texts = [" ".join(rng.choice(vocab, rng.integers(1, 30)))
                 for _ in range(200)]
        batch = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                          "text": pa.array(texts)})
        out = repetition_batch(batch).to_pandas()
        for i, t in enumerate(texts):
            toks = t.split(" ")
            from collections import Counter
            c = Counter(toks)
            assert out["n_tokens"][i] == len(toks)
            assert out["n_distinct"][i] == len(c)
            assert out["top_frac"][i] == pytest.approx(
                round(max(c.values()) / len(toks), 6))

    def test_empty_string_counts_one_empty_token(self):
        # DuckDB string_split('', ' ') = [''] — mirrored here
        batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                          "text": pa.array([""])})
        out = repetition_batch(batch).to_pandas()
        assert out["n_tokens"][0] == 1 and out["n_distinct"][0] == 1


class TestDecontaminate:
    def test_ngram_extract(self):
        batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                          "text": pa.array(["a b c d e", "x y"])})
        ngs = decon_ngram_batch(batch).column("ng").to_pylist()
        # second doc has < DECON_N tokens -> contributes nothing
        assert ngs == ["a b c"] and DECON_N == 3

    def test_probe_counts_duplicate_ngrams(self):
        probe = Decontaminate(["b c", "b c", "zz"])
        batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                          "text": pa.array(["a b c d", "nothing here"])})
        out = probe(batch).to_pandas()
        assert out["n_hits"].tolist() == [2, 0]
        assert out["contaminated"].tolist() == [True, False]


class TestSaltedJoin:
    def test_matches_pandas_merge_with_hot_key(self, ray_session):
        import ray

        from bano_ray.stages.join import salted_repartition_join

        rng = np.random.default_rng(3)
        n = 2000
        # 70% of fact rows on key 1 — the skew the salt must spread
        k = np.where(rng.random(n) < 0.7, 1,
                     rng.integers(0, 50, n)).astype(np.int64)
        fact = pd.DataFrame({"fid": np.arange(n, dtype=np.int64),
                             "k": k,
                             "v": rng.integers(0, 100, n).astype(np.int64)})
        dim = pd.DataFrame({"dk": np.arange(0, 40, dtype=np.int64),
                            "payload": np.arange(100, 140, dtype=np.int64)})
        got = salted_repartition_join(
            ray.data.from_pandas([fact.iloc[:900], fact.iloc[900:]]),
            ray.data.from_pandas(dim),
            key="k", dim_key="dk", salt_from="fid",
            dim_cols=["payload"], n_salt=8,
        ).to_pandas().sort_values(["fid"]).reset_index(drop=True)
        ref = (fact.merge(dim, left_on="k", right_on="dk")
               [["fid", "k", "v", "payload"]]
               .sort_values("fid").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["fid", "k", "v", "payload"]], ref, check_dtype=False)
        # keys >= 40 were dropped (inner join)
        assert (got["k"] < 40).all() and len(got) < n

    def test_duplicate_dim_keys_multiply_like_sql(self, ray_session):
        import ray

        from bano_ray.stages.join import salted_repartition_join

        fact = pd.DataFrame({"fid": [0, 1], "k": [5, 5]})
        dim = pd.DataFrame({"dk": [5, 5], "payload": [1, 2]})
        got = salted_repartition_join(
            ray.data.from_pandas(fact), ray.data.from_pandas(dim),
            key="k", dim_key="dk", salt_from="fid",
            dim_cols=["payload"], n_salt=4).to_pandas()
        assert len(got) == 4  # 2 fact rows x 2 dim rows


class TestFeatureHash:
    def test_hand_case(self):
        from bano_ray.stages.dedup import _md5_u64_many
        from bano_ray.stages.text import FEATURE_HASH_DIM, feature_hash_batch

        batch = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b a", "a  b"]),   # doc2: empty token kept
        })
        out = feature_hash_batch(batch).to_pandas()
        # NB: uint64 % python-int silently yields float64 — keep the
        # modulus a np.uint64 exactly as the engine kernel does
        f = lambda t: int(_md5_u64_many(np.asarray([t], dtype=object))[0]
                          % np.uint64(FEATURE_HASH_DIM))
        want = sorted([(1, f("a"), 2), (1, f("b"), 1),
                       (2, f("a"), 1), (2, f("b"), 1), (2, f(""), 1)])
        got = sorted(map(tuple, out[["doc_id", "feat", "cnt"]].values.tolist()))
        assert got == want

    def test_matches_duckdb(self, ray_session):
        import duckdb

        from bano_ray.oracle import q_feature_hash
        from bano_ray.stages.text import feature_hash_batch

        rng = np.random.default_rng(11)
        vocab = np.array(["lor", "ips", "dol", "sit", "am", ""])
        texts = [" ".join(rng.choice(vocab, rng.integers(1, 12)))
                 for _ in range(400)]
        df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64),
                           "text": texts})
        got = (feature_hash_batch(pa.Table.from_pandas(df))
               .to_pandas().sort_values(["doc_id", "feat"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", df)
        want = con.sql(q_feature_hash()).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestWindowSelfjoin:
    def test_hand_case(self, ray_session):
        import ray

        from bano_ray.stages.sessions import window_selfjoin

        m = 60 * 1000000
        df = pd.DataFrame({
            "event_id": [0, 1, 2, 3, 4, 5],
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": np.array([0, 10 * m, 29 * m, 30 * m, 0, 40 * m],
                           "datetime64[us]"),
            "event_type": ["view", "view", "purchase", "purchase",
                           "view", "purchase"],
        })
        got = (window_selfjoin(ray.data.from_pandas([df.iloc[:3], df.iloc[3:]]),
                               gap_us=30 * m)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        # buy@29m sees views at 0,10m (both within [−30m, 29m)); buy@30m
        # sees view@10m only (view@0 is exactly gap-distant → included:
        # a.ts >= b.ts - gap); user 2's buy@40m sees nothing (view 40m ago
        # is outside the strict window? no: 40m > 30m gap → excluded)
        want = pd.DataFrame({"event_id": [2, 3, 5], "user_id": [1, 1, 2],
                             "n_prior": [2, 2, 0]})
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                      check_dtype=False)

    def test_boundary_semantics(self, ray_session):
        """Left event exactly gap before: included; at the same instant:
        excluded."""
        import ray

        from bano_ray.stages.sessions import window_selfjoin

        df = pd.DataFrame({
            "event_id": [0, 1, 2],
            "user_id": [1, 1, 1],
            "ts": np.array([0, 30, 30], "datetime64[us]"),
            "event_type": ["view", "view", "purchase"],
        })
        got = window_selfjoin(ray.data.from_pandas([df]), gap_us=30).to_pandas()
        assert got["n_prior"].tolist() == [1]
