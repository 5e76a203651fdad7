"""Connected components over a pair stream — duplicate CLUSTERS from the
dedup family's verified pairs (minhash/simhash/embedding emit pairs; a
real 100 TB dedup keeps one representative per transitive cluster, not
per pair).

Algorithm: distributed min-label propagation + pointer jumping.  Labels
start as each node's own id; every round

1. pushes labels one hop across the symmetric edge list (co-partitioned
   by source node) and takes the per-node min, then
2. pointer-jumps ``label(x) ← label(label(x))`` (a self-co-partition of
   the label table), halving label-chain length —

so convergence takes O(log diameter) rounds, not O(diameter).  Labels
are monotone non-increasing node ids, so the global label sum is a
convergence certificate: the loop stops the first round the sum is
unchanged (no diff join needed).  The hard cap raises on pathological
inputs rather than silently emitting a half-converged labeling.

Shuffle discipline: both co-partitions group on a COARSE SHARD of the
key (``key % 256·CPUs``) and resolve per-key work with vectorized pandas
merges inside the shard — Ray's per-group dispatch is never paid per
node (per-node map_groups measured ~10× the whole round's useful work on
a 41-node chain).  Per-round shuffle volume is O(nodes + edges) —
label-table-sized, never raw-corpus-sized; edges are materialized once
and re-streamed per round (at 100 TB the edge list is the dedup output,
orders of magnitude smaller than the corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _coarse_groups


def connected_components(pairs_ds, a_col: str = "a", b_col: str = "b",
                         max_rounds: int = 25):
    """Pairs Dataset → (node, label) with label = min node id reachable.

    Only nodes appearing in some pair are labeled (callers union in
    singletons if they need total coverage).  Node ids must be ≥ 0
    (-1 is the internal record/query sentinel).
    """
    import ray
    from ray.data.aggregate import Min, Sum

    C = np.int64(_coarse_groups())

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy().astype(np.int64)
        b = batch.column(b_col).to_numpy().astype(np.int64)
        if (len(a) and a.min() < 0) or (len(b) and b.min() < 0):
            raise ValueError("connected_components requires node ids >= 0")
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    edges = pairs_ds.map_batches(
        symmetrize, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64())}))

    # initial labels: label(x) = min(x, min direct neighbor) — one groupby,
    # and already the fixpoint for the clique-shaped dedup clusters

    def self_edges(batch: pa.Table) -> pa.Table:
        s = batch.column("src")
        return pa.table({"src": s, "dst": s})

    nparts = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2) \
        if ray.is_initialized() else 8
    labels = (edges.union(edges.map_batches(self_edges,
                                            batch_format="pyarrow"))
              .groupby("src").aggregate(Min("dst", alias_name="label"))
              .rename_columns({"src": "node"})
              .repartition(nparts).materialize())
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    # ---- shard-grouped one-hop push: records (key=node, lab) answer edge
    # rows (key=src, dst); per-key resolution is one pandas merge ----

    def tag_label(batch: pa.Table) -> pa.Table:
        k = batch.column("node").to_numpy()
        return pa.table({"key": batch.column("node"),
                         "other": pa.array(
                             np.full(len(k), -1, dtype=np.int64)),
                         "lab": batch.column("label"),
                         "_shard": pa.array(k % C)})

    def tag_edge(batch: pa.Table) -> pa.Table:
        k = batch.column("src").to_numpy()
        return pa.table({"key": batch.column("src"),
                         "other": batch.column("dst"),
                         "lab": pa.array(np.full(len(k), -1, dtype=np.int64)),
                         "_shard": pa.array(k % C)})

    def push(df: pd.DataFrame) -> pd.DataFrame:
        recs = df.loc[df["other"] == -1, ["key", "lab"]]
        es = df.loc[df["other"] != -1, ["key", "other"]]
        m = es.merge(recs, on="key", how="left")
        return pd.concat([
            recs.rename(columns={"key": "node", "lab": "label"}),
            m[["other", "lab"]].rename(columns={"other": "node",
                                                "lab": "label"}),
        ], ignore_index=True)

    # ---- shard-grouped pointer jump: queries keyed by label value ask the
    # label's own record for label(label(x)) ----

    def tag_rec(batch: pa.Table) -> pa.Table:
        k = batch.column("node").to_numpy()
        return pa.table({"key": batch.column("node"),
                         "qnode": pa.array(
                             np.full(len(k), -1, dtype=np.int64)),
                         "lab": batch.column("label"),
                         "_shard": pa.array(k % C)})

    def tag_query(batch: pa.Table) -> pa.Table:
        k = batch.column("label").to_numpy()
        return pa.table({"key": batch.column("label"),
                         "qnode": batch.column("node"),
                         "lab": pa.array(np.full(len(k), -1, dtype=np.int64)),
                         "_shard": pa.array(k % C)})

    def jump(df: pd.DataFrame) -> pd.DataFrame:
        recs = df.loc[df["qnode"] == -1, ["key", "lab"]]
        qs = df.loc[df["qnode"] != -1, ["key", "qnode"]]
        m = qs.merge(recs, on="key", how="left")
        # every queried key is some node's label, hence has a record row
        return pd.concat([
            recs.rename(columns={"key": "node", "lab": "label"}),
            m[["qnode", "lab"]].rename(columns={"qnode": "node",
                                                "lab": "label"}),
        ], ignore_index=True).astype({"label": np.int64})

    for _ in range(max_rounds):
        msgs = (labels.map_batches(tag_label, batch_format="pyarrow")
                .union(edges.map_batches(tag_edge, batch_format="pyarrow"))
                .groupby("_shard").map_groups(push, batch_format="pandas"))
        # materialize between push and jump: the jump consumes the label
        # table through TWO branches (records + queries); unmaterialized,
        # Ray re-executes the whole push pipeline once per branch
        # repartition: the sort-based aggregate fans the tiny label table
        # out to ~200 blocks, and every later stage pays per-task overhead
        # per block (measured 20s/round on a 41-node chain); the table is
        # O(nodes) — coalesce it to O(cluster) blocks
        labels = (msgs.groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .repartition(nparts).materialize())
        labels = (labels.map_batches(tag_rec, batch_format="pyarrow")
                  .union(labels.map_batches(tag_query,
                                            batch_format="pyarrow"))
                  .groupby("_shard").map_groups(jump, batch_format="pandas")
                  .groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .repartition(nparts).materialize())
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if s == prev_sum:        # monotone labels: unchanged sum == fixpoint
            return labels
        prev_sum = s
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(raise max_rounds)")


# ---------------------------------------------------------------------------
# Multi-source BFS hop levels
# ---------------------------------------------------------------------------

_BFS_INF = np.iinfo(np.int64).max


class _HopPass:
    """Actor-pool pass: edge batches → per-block dst min-level partials
    (synchronous Bellman-Ford step over the broadcast level vector)."""

    def __init__(self, state_ref):
        import ray

        self.lvl = (ray.get(state_ref)
                    if not isinstance(state_ref, np.ndarray) else state_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy()
        dst = batch.column("dst").to_numpy()
        cand = np.full(len(self.lvl), _BFS_INF, dtype=np.int64)
        m = self.lvl[src] < _BFS_INF
        np.minimum.at(cand, dst[m], self.lvl[src[m]] + 1)
        nz = np.flatnonzero(cand < _BFS_INF)
        return pa.table({"node": pa.array(nz.astype(np.int64)),
                         "lvl": pa.array(cand[nz])})


def bfs_levels(edges_ds, seed_mask: np.ndarray, max_depth: int = 4,
               concurrency: int | None = None):
    """edges Dataset (src, dst int64 in [0, n_nodes)) + boolean seed mask
    → pandas (node, lvl) with lvl = BFS hop distance from the seed SET,
    capped at ``max_depth``.

    Same regime split as :func:`~bano_ray.stages.pagerank.pagerank`: the
    EDGE stream is the big thing and is read once per round in streaming
    ``map_batches`` passes emitting node-table-sized min partials; the
    level vector is node-sized and broadcast via ``ray.put``.  All-integer
    min-scatter — exact, no float pinning needed.  Early exit when a round
    changes nothing."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Min

    if concurrency is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        concurrency = max(1, min(8, cpus - 1))

    edges = edges_ds.materialize()   # iterative: read the stream once
    lvl = np.where(seed_mask, 0, _BFS_INF).astype(np.int64)
    for _ in range(max_depth):
        ref = ray.put(lvl)
        agg = (edges.map_batches(_HopPass, batch_format="pyarrow",
                                 concurrency=concurrency,
                                 fn_constructor_kwargs={"state_ref": ref})
               .groupby("node").aggregate(Min("lvl", alias_name="l"))
               .to_pandas())
        nodes = agg["node"].to_numpy()
        nxt = np.minimum(lvl[nodes], agg["l"].to_numpy())
        if (nxt == lvl[nodes]).all():
            break
        lvl[nodes] = nxt
    reached = np.flatnonzero(lvl < _BFS_INF)
    return pd.DataFrame({"node": reached.astype(np.int64),
                         "lvl": lvl[reached]})


class _RelaxPass:
    """Actor-pool pass: weighted edge batches → per-block dst min-distance
    partials (one synchronous Bellman-Ford relaxation over the broadcast
    distance vector) — the weighted twin of :class:`_HopPass`."""

    def __init__(self, state_ref):
        import ray

        self.dist = (ray.get(state_ref)
                     if not isinstance(state_ref, np.ndarray) else state_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy()
        dst = batch.column("dst").to_numpy()
        w = batch.column("w").to_numpy()
        cand = np.full(len(self.dist), _BFS_INF, dtype=np.int64)
        m = self.dist[src] < _BFS_INF
        np.minimum.at(cand, dst[m], self.dist[src[m]] + w[m])
        nz = np.flatnonzero(cand < _BFS_INF)
        return pa.table({"node": pa.array(nz.astype(np.int64)),
                         "dist": pa.array(cand[nz])})


def sssp(edges_ds, seed_mask: np.ndarray, rounds: int = 3,
         concurrency: int | None = None):
    """edges Dataset (src, dst, w — int64, node ids in [0, n_nodes),
    w ≥ 0) + boolean seed mask → pandas (node, dist) after EXACTLY
    ``rounds`` synchronous Bellman-Ford relaxations (≤ ``rounds``-hop
    shortest paths from the seed set — the semantics the oracle's
    unrolled-CTE relaxation chain replays; a reached fixpoint may exit
    early, which cannot change the round-``rounds`` state).

    Same regime split as :func:`bfs_levels`: the edge stream is read once
    per round in streaming ``map_batches`` passes emitting
    node-table-sized min partials; the distance vector is node-sized and
    broadcast via ``ray.put``.  All-integer — exact, no float pinning."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Min

    if concurrency is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        concurrency = max(1, min(8, cpus - 1))

    edges = edges_ds.materialize()   # iterative: read the stream once
    dist = np.where(seed_mask, 0, _BFS_INF).astype(np.int64)
    for _ in range(rounds):
        ref = ray.put(dist)
        agg = (edges.map_batches(_RelaxPass, batch_format="pyarrow",
                                 concurrency=concurrency,
                                 fn_constructor_kwargs={"state_ref": ref})
               .groupby("node").aggregate(Min("dist", alias_name="d"))
               .to_pandas())
        nodes = agg["node"].to_numpy()
        nxt = np.minimum(dist[nodes], agg["d"].to_numpy())
        if len(nodes) and (nxt == dist[nodes]).all():
            break
        if len(nodes):
            dist[nodes] = nxt
    reached = np.flatnonzero(dist < _BFS_INF)
    return pd.DataFrame({"node": reached.astype(np.int64),
                         "dist": dist[reached]})
