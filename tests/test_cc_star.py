"""Star-contraction connected components (stages/graph.py) vs the
push+jump differential reference, including the adversarial monotone-id
chains that defeat plain min-star contraction and slow push+jump to
O(diameter)."""

import numpy as np
import pandas as pd
import pytest


def _cc_pair(ds, **kw):
    from bano_ray.stages.graph import (connected_components,
                                       connected_components_pushjump)

    new = connected_components(ds, **kw).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    old = connected_components_pushjump(ds).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    return new, old


class TestStarContraction:
    def test_mixed_world_matches_reference(self, ray_session):
        import ray

        a, b = [], []
        for i in range(60):
            for j in range(i + 1, 60, 7):
                a.append(i); b.append(j)
        for i in range(1000, 1150):      # ascending-id chain (adversarial)
            a.append(i); b.append(i + 1)
        for i in range(5000, 5020):      # star
            a.append(5000); b.append(i)
        a.append(9000); b.append(9000)   # self-loop singleton
        ds = ray.data.from_pandas(pd.DataFrame({"a": a, "b": b}))
        new, old = _cc_pair(ds)
        assert new.equals(old)

    def test_distributed_only_handles_monotone_chains(self, ray_session):
        import ray

        # both orientations of a monotone chain, pure-distributed path
        for flip in (False, True):
            a = list(range(3000, 3100))
            b = [x + 1 for x in a]
            if flip:
                a, b = b, a
            ds = ray.data.from_pandas(pd.DataFrame({"a": a, "b": b}))
            new, old = _cc_pair(ds, finish_edges=0)
            assert new.equals(old)
            assert set(new["label"]) == {3000}

    def test_distributed_only_multi_round_local_minima(self, ray_session):
        """Regression: the canonical (lo, hi) edge orientation after round
        1 made star() a no-op (s(v) = v for every node) because min(dst)
        > src always and hi-only nodes got no s row — any graph that
        needs >= 2 contraction rounds spun to RuntimeError under
        finish_edges=0.  The path 1-0-3-2 has two local minima, so one
        s-forest closure cannot collapse it."""
        import ray

        ds = ray.data.from_pandas(
            pd.DataFrame({"a": [1, 0, 3], "b": [0, 3, 2]}))
        new, old = _cc_pair(ds, finish_edges=0)
        assert new.equals(old)
        assert set(new["label"]) == {0}
        assert len(new) == 4

    def test_distributed_only_shuffled_random_graphs(self, ray_session):
        """finish_edges=0 over shuffled-id sparse random graphs: many
        components with interleaved local minima, forcing multiple
        contraction rounds through the re-symmetrized star path."""
        import ray

        rng = np.random.default_rng(7)
        perm = rng.permutation(400)
        a, b = [], []
        for comp in range(8):                      # 8 paths of 50 nodes
            ids = perm[comp * 50:(comp + 1) * 50]
            a.extend(ids[:-1]); b.extend(ids[1:])
        ds = ray.data.from_pandas(pd.DataFrame(
            {"a": np.array(a, dtype=np.int64),
             "b": np.array(b, dtype=np.int64)}))
        # ground truth analytically (push+jump needs O(diameter/2) rounds
        # on 50-node paths, past its default cap — star is the one under test)
        from bano_ray.stages.graph import connected_components

        new = (connected_components(ds, finish_edges=0).to_pandas()
               .sort_values("node").reset_index(drop=True))
        expect = {}
        for comp in range(8):
            ids = perm[comp * 50:(comp + 1) * 50]
            m = int(ids.min())
            for i in ids:
                expect[int(i)] = m
        assert len(new) == 400
        assert all(expect[int(n)] == int(l)
                   for n, l in zip(new["node"], new["label"]))

    def test_empty_and_label_is_component_min(self, ray_session):
        import ray

        from bano_ray.stages.graph import connected_components

        empty = ray.data.from_pandas(pd.DataFrame({"a": pd.Series(dtype="int64"),
                                                   "b": pd.Series(dtype="int64")}))
        assert connected_components(empty).count() == 0
        ds = ray.data.from_pandas(pd.DataFrame({"a": [7, 3], "b": [9, 7]}))
        lab = connected_components(ds).to_pandas()
        assert set(lab["label"]) == {3}
        assert len(lab) == 3
