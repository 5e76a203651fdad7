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



def _detach(mds):
    """Re-wrap a materialized dataset's blocks as a FRESH dataset.

    Iterative algorithms that chain ``materialize()`` rounds otherwise
    accumulate every prior round's execution lineage in the dataset's
    stats object, and Ray's per-dataset stats summarization
    (``stats.py to_summary`` over all ancestor block metadata) grows
    quadratically with rounds — measured as MINUTES of driver CPU per
    round by round ~10 on a 5k-node CC (the executions themselves took
    seconds).  ``to_arrow_refs`` hands over the same object-store blocks
    (no data copy); ``from_arrow_refs`` starts a clean lineage."""
    import ray

    return ray.data.from_arrow_refs(mds.to_arrow_refs())




def connected_components(pairs_ds, a_col: str = "a", b_col: str = "b",
                         max_rounds: int = 40,
                         finish_edges: int = 500_000):
    """Pairs Dataset → (node, label) with label = min node id reachable.

    Distributed STAR CONTRACTION: every round computes the min-star map
    s(v) = min(v, neighbors), composes it into the node→super mapping,
    CONTRACTS each edge to (s(u), s(v)) and drops self-loops +
    duplicates.  Ids only decrease and a component's min never maps
    away, so each component contracts to exactly its min id; a
    geometric component's hop diameter roughly halves per round, giving
    O(log diameter) rounds where min-label propagation is
    O(diameter) (the push+jump reference above measured 133 rounds on
    the sf0.1 urban disk graph; this form takes 7).

    When the contracted edge set falls below ``finish_edges`` rows the
    remainder resolves with one driver union-find — a BOUNDED finish
    (≤ finish_edges rows driver-side, ~8 MB at the default), the same
    discipline as the other dim-bounded reduces; pass finish_edges=0 to
    force full distribution.  Only nodes appearing in some pair are
    labeled (callers union in singletons).  Node ids must be ≥ 0 (-1 is
    the record sentinel in the tagged unions).
    """
    import ray
    from ray.data.aggregate import Count, Min

    C = np.int64(_coarse_groups())

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy().astype(np.int64)
        b = batch.column(b_col).to_numpy().astype(np.int64)
        if (len(a) and a.min() < 0) or (len(b) and b.min() < 0):
            raise ValueError("connected_components requires node ids >= 0")
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    edges = _detach(pairs_ds.map_batches(
        symmetrize, batch_format="pyarrow").materialize())
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64())}))

    nparts = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2) \
        if ray.is_initialized() else 8

    def self_edges(batch: pa.Table) -> pa.Table:
        s = batch.column("src")
        return pa.table({"src": s, "dst": s})

    def resym(batch: pa.Table) -> pa.Table:
        a = batch.column("src").to_numpy()
        b = batch.column("dst").to_numpy()
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    def star(e):
        """(node, s): min of self and neighbors over the current edges.

        The edge stream is RE-SYMMETRIZED first: after round 1 `edges`
        holds only the canonical (lo, hi) orientation from canon_dedup,
        under which min(dst) > src for every src and hi-side nodes get
        no row at all — s(v) = v everywhere and contraction stalls
        (40 no-op shuffle rounds then RuntimeError on any graph whose
        contracted remainder exceeds finish_edges).  Round 1's already
        symmetric input just carries duplicate orientations, which the
        Min aggregate ignores."""
        sym = e.map_batches(resym, batch_format="pyarrow")
        return (sym.union(sym.map_batches(self_edges, batch_format="pyarrow"))
                .groupby("src").aggregate(Min("dst", alias_name="s"))
                .rename_columns({"src": "node"})
                .repartition(nparts))

    def tag_sq(batch: pa.Table) -> pa.Table:
        k = batch.column("s").to_numpy()
        return pa.table({"key": batch.column("s"),
                         "other": batch.column("node"),
                         "s": pa.array(np.full(len(k), -1, dtype=np.int64)),
                         "_shard": pa.array(k % C)})

    def squared(df: pd.DataFrame) -> pd.DataFrame:
        """s'(x) = s(s(x)) — one pointer-doubling step on the s-forest."""
        recs = df.loc[df["s"] != -1, ["key", "s"]]
        qs = df.loc[df["s"] == -1, ["key", "other"]]
        m = qs.merge(recs, on="key", how="left")
        return pd.DataFrame({
            "node": m["other"].to_numpy(),
            "s": m["s"].fillna(m["key"]).astype(np.int64)})

    def closure(S):
        """Compress the s-forest to its roots: square s until fixpoint
        (chains halve per step, so ≤ log(longest chain) shuffles; the sum
        of s is a monotone convergence certificate).  This is the
        compress half of classic hook-and-compress CC — without it a
        monotone-ascending id chain contracts by ONE node per round
        (measured: the planted 150-node path needs 150 rounds; with
        closure the whole chain collapses in one outer round)."""
        from ray.data.aggregate import Sum

        prev = S.aggregate(Sum("s", alias_name="t"))["t"]
        for _ in range(64):
            S = (S.map_batches(tag_srec, batch_format="pyarrow")
                 .union(S.map_batches(tag_sq, batch_format="pyarrow"))
                 .groupby("_shard").map_groups(squared,
                                               batch_format="pandas")
                 .repartition(nparts).materialize())
            S = _detach(S)
            t = S.aggregate(Sum("s", alias_name="t"))["t"]
            if t == prev:
                return S
            prev = t
        raise RuntimeError("s-forest closure did not stabilize")

    # messages for the tagged-union resolve: records carry (key, s),
    # queries carry (key, other) with s = -1 as the record discriminator
    def tag_srec(batch: pa.Table) -> pa.Table:
        k = batch.column("node").to_numpy()
        return pa.table({"key": batch.column("node"),
                         "other": pa.array(
                             np.full(len(k), -1, dtype=np.int64)),
                         "s": batch.column("s"),
                         "_shard": pa.array(k % C)})

    def tag_edge_by(col, other):
        def tag(batch: pa.Table) -> pa.Table:
            k = batch.column(col).to_numpy()
            return pa.table({"key": batch.column(col),
                             "other": batch.column(other),
                             "s": pa.array(
                                 np.full(len(k), -1, dtype=np.int64)),
                             "_shard": pa.array(k % C)})
        return tag

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        """Replace each query row's key by s(key); output (src=s, dst=other)."""
        recs = df.loc[df["s"] != -1, ["key", "s"]]
        qs = df.loc[df["s"] == -1, ["key", "other"]]
        m = qs.merge(recs, on="key", how="left")
        s = m["s"].fillna(m["key"]).astype(np.int64)   # identity fallback
        return pd.DataFrame({"src": s, "dst": m["other"].to_numpy()})

    def mapping_update(df: pd.DataFrame) -> pd.DataFrame:
        """super ← s(super); supers without an s row (already-finished
        roots) keep their value."""
        recs = df.loc[df["s"] != -1, ["key", "s"]]
        qs = df.loc[df["s"] == -1, ["key", "other"]]
        m = qs.merge(recs, on="key", how="left")
        sup = m["s"].fillna(m["key"]).astype(np.int64)
        return pd.DataFrame({"node": m["other"].to_numpy(), "super": sup})

    def tag_map(batch: pa.Table) -> pa.Table:
        k = batch.column("super").to_numpy()
        return pa.table({"key": batch.column("super"),
                         "other": batch.column("node"),
                         "s": pa.array(np.full(len(k), -1, dtype=np.int64)),
                         "_shard": pa.array(k % C)})

    def canon_dedup(batch: pa.Table) -> pa.Table:
        a = batch.column("src").to_numpy()
        b = batch.column("dst").to_numpy()
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        if len(lo) and max(int(lo.max()), int(hi.max())) < 2**32:
            # fast batch-local pre-dedup (packed 64-bit key); ids past
            # 32 bits skip it — the global (src, dst) groupby below is
            # the authoritative dedup either way
            u = np.unique(lo.astype(np.uint64) << np.uint64(32)
                          | hi.astype(np.uint64))
            lo = (u >> np.uint64(32)).astype(np.int64)
            hi = (u & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return pa.table({"src": pa.array(lo), "dst": pa.array(hi)})

    # initial mapping: identity over the nodes of E
    mapping = (edges.groupby("src").aggregate(Count())
               .rename_columns({"src": "node"})
               .map_batches(lambda t: pa.table({
                   "node": t.column("node"),
                   "super": t.column("node")}), batch_format="pyarrow")
               .repartition(nparts).materialize())
    mapping = _detach(mapping)

    def driver_finish(edge_ds):
        """Bounded driver union-find over a canonical-deduped edge set
        (≤ finish_edges rows by the caller's gate), mapped back over the
        node table distributed — the same discipline as the in-loop
        finish."""
        e = edge_ds.to_pandas()
        nodes = np.unique(np.concatenate(
            [e["src"].to_numpy(), e["dst"].to_numpy()])).astype(np.int64)
        pos = {int(nd): i for i, nd in enumerate(nodes)}
        par = np.arange(len(nodes))

        def find(i):
            while par[i] != i:
                par[i] = par[par[i]]
                i = par[i]
            return i

        for a, b in zip(e["src"].to_numpy(), e["dst"].to_numpy()):
            ra, rb = find(pos[int(a)]), find(pos[int(b)])
            if ra != rb:
                par[max(ra, rb)] = min(ra, rb)
        roots = np.fromiter((find(i) for i in range(len(nodes))),
                            dtype=np.int64, count=len(nodes))
        lab = np.full(len(nodes), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(lab, roots, nodes)
        fin_ref = ray.put((nodes, lab[roots]))

        def final_map(batch: pa.Table) -> pa.Table:
            keys, vals = ray.get(fin_ref)
            sup = batch.column("super").to_numpy()
            p = np.searchsorted(keys, sup)
            p = np.clip(p, 0, len(keys) - 1)
            hit = keys[p] == sup
            out = np.where(hit, vals[p], sup)
            return pa.table({"node": batch.column("node"),
                             "label": pa.array(out.astype(np.int64))})

        return mapping.map_batches(final_map, batch_format="pyarrow")

    if finish_edges:
        # round-0 gate on the CANONICAL-DEDUPED pair count: the symmetric
        # stream is 2× the true edge count, so gating on it forced a full
        # (10+ s) distributed round on inputs the driver finish absorbs
        # outright (262k-pair DBSCAN at sf0.1: 10.5 → ~1 s)
        e0 = _detach((edges.map_batches(canon_dedup, batch_format="pyarrow")
                      .groupby(["src", "dst"]).aggregate(Count())
                      .select_columns(["src", "dst"])
                      .repartition(nparts).materialize()))
        if e0.count() <= finish_edges:
            return driver_finish(e0)
        edges = e0          # deduped canonical form feeds round 1 anyway

    for _ in range(max_rounds):
        S = closure(_detach(star(edges).materialize()))
        # compose s into the mapping
        mapping = (S.map_batches(tag_srec, batch_format="pyarrow")
                   .union(mapping.map_batches(tag_map, batch_format="pyarrow"))
                   .groupby("_shard").map_groups(mapping_update,
                                                 batch_format="pandas")
                   .repartition(nparts).materialize())
        mapping = _detach(mapping)
        # contract both endpoints, drop loops, canonical dedup
        e1 = (S.map_batches(tag_srec, batch_format="pyarrow")
              .union(edges.map_batches(tag_edge_by("src", "dst"),
                                       batch_format="pyarrow"))
              .groupby("_shard").map_groups(resolve, batch_format="pandas"))
        e2 = (S.map_batches(tag_srec, batch_format="pyarrow")
              .union(e1.map_batches(tag_edge_by("dst", "src"),
                                    batch_format="pyarrow"))
              .groupby("_shard").map_groups(resolve, batch_format="pandas"))
        # e2 rows are (src=s(dst), dst=s(src)); canonicalize + global dedup
        edges = (e2.map_batches(canon_dedup, batch_format="pyarrow")
                 .groupby(["src", "dst"]).aggregate(Count())
                 .select_columns(["src", "dst"])
                 .repartition(nparts).materialize())
        edges = _detach(edges)
        n_edges = edges.count()
        if n_edges == 0:
            return mapping.rename_columns({"super": "label"})
        if finish_edges and n_edges <= finish_edges:
            return driver_finish(edges)
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(raise max_rounds)")



def connected_components_pushjump(pairs_ds, a_col: str = "a",
                                  b_col: str = "b", max_rounds: int = 25):
    """Min-label push + pointer-jump variant — kept as the DIFFERENTIAL
    REFERENCE for :func:`connected_components` (tests pin both equal).
    Converges fast on clique-shaped dedup clusters but only ~2 hops per
    round on geometric (disk-graph) components — measured 133 rounds on
    the sf0.1 urban cluster, because label pointers stay local — so the
    star-contraction form below is the live implementation.

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

    edges = _detach(pairs_ds.map_batches(
        symmetrize, batch_format="pyarrow").materialize())
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
    labels = _detach(labels)
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
        labels = _detach(msgs.groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .repartition(nparts).materialize())
        labels = (labels.map_batches(tag_rec, batch_format="pyarrow")
                  .union(labels.map_batches(tag_query,
                                            batch_format="pyarrow"))
                  .groupby("_shard").map_groups(jump, batch_format="pandas")
                  .groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .repartition(nparts).materialize())
        labels = _detach(labels)
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

    edges = _detach(edges_ds.materialize())  # iterative: read once, fresh lineage
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

    edges = _detach(edges_ds.materialize())  # iterative: read once, fresh lineage
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
