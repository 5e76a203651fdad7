"""Behavior tests for the round-4 tail operators: delta-upsert last-wins
compaction, PII scan/redaction kernels, and the mergeable-moments partial."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bano_ray.stages.text import (EMAIL_RE, PHONE_RE, pii_plant,
                                  pii_redact_batch)
from bano_ray.stages.upsert import upsert_latest


class TestUpsertLatest:
    def _run(self, frames):
        import ray

        ds = ray.data.from_pandas(frames)
        out = upsert_latest(ds, key="k", version="v", payload=["p"])
        return out.to_pandas().sort_values("k").reset_index(drop=True)

    def test_last_wins_across_blocks(self, ray_session):
        # key 1: versions 0 (block A) and 2 (block B) -> 2 wins
        # key 2: only base            -> survives untouched
        # key 3: three versions split across blocks -> max (5) wins
        a = pd.DataFrame({"k": [1, 2, 3], "v": [0, 0, 1], "p": [10, 20, 31]})
        b = pd.DataFrame({"k": [1, 3, 3], "v": [2, 5, 3], "p": [12, 35, 33]})
        got = self._run([a, b])
        exp = pd.DataFrame({"k": [1, 2, 3], "p": [12, 20, 35], "v": [2, 0, 5]})
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_duplicate_versions_in_one_block_keep_one_row(self, ray_session):
        # same (key, version) twice in a block: exactly one survivor
        a = pd.DataFrame({"k": [7, 7], "v": [1, 1], "p": [70, 71]})
        got = self._run([a])
        assert len(got) == 1 and got["k"].iloc[0] == 7 and got["v"].iloc[0] == 1

    def test_matches_pandas_reference_random(self, ray_session):
        rng = np.random.default_rng(42)
        n = 500
        df = pd.DataFrame({
            "k": rng.integers(0, 80, n).astype(np.int64),
            "v": rng.integers(0, 4, n).astype(np.int64),
            "p": rng.integers(0, 10**6, n).astype(np.int64),
        })
        # strictly resolve ties like the stage: lexsort is stable, so among
        # equal (k, v) the LAST occurrence in block order survives — make
        # versions unique per key to keep the reference well-defined.
        df = df.drop_duplicates(["k", "v"], keep="last")
        frames = [df.iloc[i::3].reset_index(drop=True) for i in range(3)]
        got = self._run(frames)
        ref = (df.sort_values(["k", "v"]).groupby("k").tail(1)
               .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["k", "v", "p"]], ref[["k", "v", "p"]], check_dtype=False)


class TestPiiRedact:
    def test_counts_and_redaction(self):
        batch = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                "mail me at jo.doe+x@mail.example.org or a@b.co thanks",
                "call +33 612345678 and +1 5551234567 now",
                "nothing sensitive here",
            ]),
        })
        out = pii_redact_batch(batch)
        assert out.column("n_emails").to_pylist() == [2, 0, 0]
        assert out.column("n_phones").to_pylist() == [0, 2, 0]
        # redacted length: replacements applied before measuring
        import re
        t0 = batch.column("text").to_pylist()[0]
        red = re.sub(EMAIL_RE, "<EMAIL>", t0)
        assert out.column("red_len").to_pylist()[0] == len(red)
        t1 = batch.column("text").to_pylist()[1]
        red1 = re.sub(PHONE_RE, "<PHONE>", t1)
        assert out.column("red_len").to_pylist()[1] == len(red1)

    def test_plant_every_third(self):
        batch = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a", "b", "c", "d"]),
        })
        out = pii_plant(batch)
        texts = out.column("text").to_pylist()
        assert texts[1] == "b" and texts[2] == "c"
        assert texts[0].startswith("a contact user0") and "@example.com" in texts[0]
        assert "tel +33 612345678" in texts[3]
        # planted rows then redact to exactly one email + one phone each
        red = pii_redact_batch(out)
        assert red.column("n_emails").to_pylist() == [1, 0, 0, 1]
        assert red.column("n_phones").to_pylist() == [1, 0, 0, 1]

    def test_email_regex_is_re2_safe_and_matches_duckdb(self):
        import duckdb
        texts = ["x a.b-c_d%e+f@ex-ample.co.uk y", "no match", "a@b.c",
                 "two a@b.io b@c.io"]
        con = duckdb.connect()
        for t in texts:
            n_sql = con.sql(
                "SELECT len(regexp_extract_all(?, ?))",
                params=[t, EMAIL_RE]).fetchone()[0]
            batch = pa.table({"doc_id": pa.array([0], pa.int64()),
                              "text": pa.array([t])})
            n_ray = pii_redact_batch(batch).column("n_emails").to_pylist()[0]
            assert n_ray == n_sql, t


class TestGroupMoments:
    def test_partial_matches_pandas(self, ray_session, sf_dir):
        from bano_ray.pipelines.queries import q_group_moments

        got = (q_group_moments(sf_dir).to_pandas()
               .sort_values("event_type").reset_index(drop=True))
        ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "value"])
        cents = np.round(ev["value"].to_numpy() * 100.0).astype(np.int64)
        ref = (pd.DataFrame({"event_type": ev["event_type"],
                             "n": 1, "sum_cents": cents,
                             "sumsq_cents": cents * cents})
               .groupby("event_type", as_index=False).sum()
               .sort_values("event_type").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["event_type", "n", "sum_cents", "sumsq_cents"]],
            ref, check_dtype=False)
        # variance recoverable from the mergeable partials
        g0 = got.iloc[0]
        var = g0.sumsq_cents / g0.n - (g0.sum_cents / g0.n) ** 2
        assert var >= 0
