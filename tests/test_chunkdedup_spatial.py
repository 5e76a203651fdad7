"""Behavior tests: duplicated-chunk removal and spatial clustering."""

import numpy as np
import pandas as pd
import pyarrow as pa

from bano_ray.stages.chunkdedup import _chunk_rows, chunk_dedup


def _mkdocs(texts):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))


def _reference(texts, w):
    """Brute-force python reference of the chunk-dedup semantics."""
    chunks = []   # (doc, c, chunk)
    for d, t in enumerate(texts):
        words = t.split(" ")
        for c in range(0, (len(words) + w - 1) // w):
            chunks.append((d, c, " ".join(words[w * c:w * (c + 1)])))
    first, ndocs = {}, {}
    for d, c, ch in sorted(chunks):
        first.setdefault(ch, (d, c))
        ndocs.setdefault(ch, set()).add(d)
    out = {}
    for d, t in enumerate(texts):
        out[d] = {"n": 0, "kept": []}
    for d, c, ch in sorted(chunks):
        out[d]["n"] += 1
        if len(ndocs[ch]) == 1 or first[ch] == (d, c):
            out[d]["kept"].append(ch)
    return pd.DataFrame({
        "doc_id": list(out),
        "n_chunks": [out[d]["n"] for d in out],
        "kept_chunks": [len(out[d]["kept"]) for d in out],
        "text_clean": [" ".join(out[d]["kept"]) for d in out]})


class TestChunkRows:
    def test_chunker_vectorized_matches_split(self, ray_session):
        rng = np.random.default_rng(3)
        vocab = ["w%d" % i for i in range(20)]
        texts = [" ".join(rng.choice(vocab, rng.integers(1, 70)))
                 for _ in range(50)]
        batch = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                          "text": pa.array(texts)})
        out = _chunk_rows(batch, 16, 64).to_pandas()
        for d, t in enumerate(texts):
            words = t.split(" ")
            mine = out[out.doc_id == d].sort_values("c")["chunk"].tolist()
            want = [" ".join(words[16 * c:16 * (c + 1)])
                    for c in range(0, (len(words) + 15) // 16)]
            assert mine == want

    def test_single_word_and_exact_multiple(self, ray_session):
        batch = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                          "text": pa.array(["solo", " ".join(["x"] * 32)])})
        out = _chunk_rows(batch, 16, 8).to_pandas()
        assert out[out.doc_id == 0]["chunk"].tolist() == ["solo"]
        assert out[out.doc_id == 1]["chunk"].tolist() == [
            " ".join(["x"] * 16)] * 2


class TestChunkDedup:
    def test_hand_case(self, ray_session):
        boiler = " ".join(["b%d" % i for i in range(16)])
        u1 = " ".join(["p%d" % i for i in range(16)])
        u2 = " ".join(["q%d" % i for i in range(16)])
        texts = [boiler + " " + u1,      # doc0: keeps boiler (first) + u1
                 boiler + " " + u2,      # doc1: loses boiler, keeps u2
                 boiler]                 # doc2: loses everything
        out = (chunk_dedup(_mkdocs(texts)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["n_chunks"].tolist() == [2, 2, 1]
        assert out["kept_chunks"].tolist() == [2, 1, 0]
        assert out["text_clean"].tolist() == [boiler + " " + u1, u2, ""]

    def test_within_doc_repeat_of_unique_chunk_kept(self, ray_session):
        rep = " ".join(["r%d" % i for i in range(16)])
        out = chunk_dedup(_mkdocs([rep + " " + rep])).to_pandas()
        assert out["kept_chunks"].tolist() == [2]
        assert out["text_clean"].tolist() == [rep + " " + rep]

    def test_matches_python_reference(self, ray_session):
        rng = np.random.default_rng(11)
        vocab = ["t%d" % i for i in range(6)]   # tiny vocab → real collisions
        texts = [" ".join(rng.choice(vocab, rng.integers(1, 60)))
                 for _ in range(120)]
        out = (chunk_dedup(_mkdocs(texts), n_words=4).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        ref = _reference(texts, 4)
        pd.testing.assert_frame_equal(out, ref, check_dtype=False)


class TestSpatialClusters:
    def test_planted_clusters_and_singletons(self, ray_session):
        import ray

        from bano_ray.stages.graph import connected_components
        from bano_ray.stages.spatial import distance_selfjoin

        # two tight clusters (chained, not all-pairs-close) + 1 singleton
        lon = np.array([0.0, 0.04, 0.08,    1.0, 1.04,   5.0])
        lat = np.zeros(6)
        pts = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(6), pa.int64()),
            "lon": pa.array(lon), "lat": pa.array(lat)}))
        pairs = distance_selfjoin(pts, 0.05).select_columns(["a", "b"])

        def selfp(b):
            return pa.table({"a": b.column("doc_id"),
                             "b": b.column("doc_id")})

        nodes = pts.map_batches(selfp, batch_format="pyarrow")
        out = (connected_components(pairs.union(nodes), "a", "b")
               .to_pandas().sort_values("node"))
        assert out["label"].tolist() == [0, 0, 0, 3, 3, 5]


class TestDedupCorpusFilter:
    def test_keeps_representative_and_singletons(self, ray_session):
        import ray
        from ray.data.aggregate import Sum

        from bano_ray.stages.dedup import minhash_candidate_pairs
        from bano_ray.stages.graph import connected_components

        twin = " ".join("dup%d" % i for i in range(40))
        texts = [twin, twin, twin,
                 " ".join("a%d" % i for i in range(40)),
                 " ".join("b%d" % i for i in range(40))]
        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts)}))
        pairs = minhash_candidate_pairs(docs, threshold=0.5)
        labels = connected_components(pairs, "doc_a", "doc_b")

        def drops(b):
            node = b.column("node").to_numpy()
            lab = b.column("label").to_numpy()
            keep = node != lab
            return pa.table({
                "doc_id": pa.array(node[keep]),
                "drop": pa.array(np.ones(int(keep.sum()), np.int64))})

        def keeps(b):
            return pa.table({
                "doc_id": b.column("doc_id"),
                "drop": pa.array(np.zeros(b.num_rows, np.int64))})

        tagged = (docs.select_columns(["doc_id"])
                  .map_batches(keeps, batch_format="pyarrow")
                  .union(labels.map_batches(drops, batch_format="pyarrow")))
        out = (tagged.groupby("doc_id").aggregate(Sum("drop", alias_name="d"))
               .filter(expr="d == 0").select_columns(["doc_id"]).to_pandas())
        assert sorted(out["doc_id"]) == [0, 3, 4]


class TestBfsLevels:
    def _run(self, edges, seed_ids, n_nodes, max_depth=4):
        import ray

        from bano_ray.stages.graph import bfs_levels

        ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges]
                                 + [{"src": b, "dst": a} for a, b in edges])
        mask = np.zeros(n_nodes, dtype=bool)
        mask[seed_ids] = True
        out = bfs_levels(ds, mask, max_depth=max_depth)
        return dict(zip(out["node"].astype(int), out["lvl"].astype(int)))

    def test_chain_and_cap(self, ray_session):
        # chain 0-1-2-3-4-5-6: levels cap at max_depth
        got = self._run([(i, i + 1) for i in range(6)], [0], 7, max_depth=4)
        assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}

    def test_multi_source_min(self, ray_session):
        # seeds at both ends of a chain: levels meet in the middle
        got = self._run([(i, i + 1) for i in range(4)], [0, 4], 5)
        assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 0}

    def test_disconnected_and_early_exit(self, ray_session):
        got = self._run([(0, 1), (5, 6)], [0], 7, max_depth=4)
        assert got == {0: 0, 1: 1}
