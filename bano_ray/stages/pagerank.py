"""Distributed PageRank (fixed-iteration, simplified-dangling variant).

The iterative-algorithms family next to connected components
(``stages/graph.py``): rank flows along a directed edge stream,
``r'(v) = (1-d)/N + d · Σ_{(u,v)∈E} r(u)/outdeg(u)`` with d = 0.85 and a
FIXED iteration count so the result is closed-form and SQL-replicable
(oracle unrolls the iterations as CTEs).  Dangling mass (nodes without
out-edges) evaporates rather than redistributing — the simplified variant;
both sides compute the same recurrence.

Scale shape: the EDGE stream is the big thing and is only ever read in
streaming ``map_batches`` passes (one per iteration) that emit per-block
``bincount`` partials over destination nodes; the shuffle per iteration
moves node-table-sized partials, never edges.  The rank and out-degree
vectors are NODE-sized and broadcast via ``ray.put`` (read once per actor
per iteration).  This is the web-graph regime (edges ≫ nodes, node vector
fits a worker); if the node table outgrew workers the iteration becomes the
co-partitioned carry used by ``stages/graph.py`` connected components —
same pass structure, keyed state instead of a vector.

Float determinism: per-block partial sums are doubles, so distribution
order could drift bits; both sides round the rank vector to 10 decimals
per iteration (drift per iteration ≪ 5e-11) and to 6 on output, pinning
engine == oracle exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAMPING = 0.85
PR_ITERS = 3
N_ITEMS = 100   # item-node domain for the bipartite click graph (props k mod)


class _ContribPass:
    """Actor-pool pass: edge batches → per-block dst-partial rank sums."""

    def __init__(self, state_ref):
        import ray

        r, inv_deg = (ray.get(state_ref)
                      if not isinstance(state_ref, tuple) else state_ref)
        self.r_over_deg = r * inv_deg   # 0 where outdeg == 0 (dangling)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy()
        dst = batch.column("dst").to_numpy()
        n = len(self.r_over_deg)
        s = np.bincount(dst, weights=self.r_over_deg[src], minlength=n)
        nz = np.flatnonzero(s)
        return pa.table({"dst": pa.array(nz.astype(np.int64)),
                         "contrib": pa.array(s[nz])})


def pagerank(edges_ds, n_nodes: int, iters: int = PR_ITERS,
             damping: float = DAMPING, concurrency: int | None = None):
    """edges Dataset (src, dst int64 in [0, n_nodes)) → (node, pagerank).

    Returns a pandas DataFrame (node-table-sized by construction).
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    if concurrency is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        concurrency = max(1, min(8, cpus - 1))

    edges = edges_ds.materialize()   # iterative: read the stream once

    def deg_partial(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy()
        c = np.bincount(src, minlength=n_nodes)
        nz = np.flatnonzero(c)
        return pa.table({"src": pa.array(nz.astype(np.int64)),
                         "deg": pa.array(c[nz].astype(np.int64))})

    deg_tbl = (edges.map_batches(deg_partial, batch_format="pyarrow")
               .groupby("src").aggregate(Sum("deg", alias_name="deg"))
               .to_pandas())
    inv_deg = np.zeros(n_nodes, dtype=np.float64)
    src_ids = deg_tbl["src"].to_numpy()
    inv_deg[src_ids] = 1.0 / deg_tbl["deg"].to_numpy(dtype=np.float64)

    r = np.full(n_nodes, 1.0 / n_nodes, dtype=np.float64)
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        ref = ray.put((r, inv_deg))
        agg = (edges.map_batches(_ContribPass, batch_format="pyarrow",
                                 concurrency=concurrency,
                                 fn_constructor_kwargs={"state_ref": ref})
               .groupby("dst").aggregate(Sum("contrib", alias_name="c"))
               .to_pandas())
        nxt = np.full(n_nodes, base, dtype=np.float64)
        nxt[agg["dst"].to_numpy()] += damping * agg["c"].to_numpy()
        r = np.round(nxt, 10)

    return pd.DataFrame({"node": np.arange(n_nodes, dtype=np.int64),
                         "pagerank": np.round(r, 6)})
