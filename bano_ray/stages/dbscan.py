"""Distributed DBSCAN over the geotagged point stream.

The §2 geospatial extension beyond single-linkage (q_spatial_clusters is
DBSCAN with minPts=1): density-based clustering with the classic role
split — CORE points (≥ ``minPts`` neighbors within ``eps``, self
included), clusters = connected components over core–core ≤ eps edges,
BORDER points (non-core within eps of a core; label = the minimum label
among their core neighbors — deterministic, no scan-order dependence),
NOISE (everything else, label −1).

Scale shape: candidate pairs come from the grid-bucket distance
self-join (``stages/spatial.distance_selfjoin`` — 3×3 cell probes, never
all-pairs); degrees / core flags / border attach all resolve through the
repo's tagged-union coarse-shard joins (shuffles carry pair-stream-sized
rows, no driver materialization); the cluster labels come from the
distributed star-contraction CC (``stages/graph.connected_components``).
The pair stream is materialized ONCE and re-streamed by the three
consumers (at 100 TB it is the dedup-output-sized edge list, orders of
magnitude smaller than the corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _coarse_groups

DBSCAN_MINPTS = 3   # neighbors within eps INCLUDING the point itself


def _detached(ds):
    from .graph import _detach

    return _detach(ds.materialize())


def dbscan(pts_ds, pairs_ds, minpts: int = DBSCAN_MINPTS):
    """(doc_id, role, label) for every point.

    ``pts_ds``: (doc_id, …) one row per point; ``pairs_ds``: (a, b) with
    a < b and distance ≤ eps (from distance_selfjoin).
    """
    import ray
    from ray.data.aggregate import Min, Sum

    from .graph import connected_components

    C = np.int64(_coarse_groups())
    pairs = _detached(pairs_ds.select_columns(["a", "b"]))

    # --- degrees → core flags (deg + 1 >= minpts) ------------------------
    def deg_partial(batch: pa.Table) -> pa.Table:
        ab = np.concatenate([batch.column("a").to_numpy(),
                             batch.column("b").to_numpy()]).astype(np.int64)
        u, c = np.unique(ab, return_counts=True)
        return pa.table({"node": pa.array(u), "n": pa.array(c.astype(np.int64))})

    deg = (pairs.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("n", alias_name="n")))

    # core table: CORE rows only (is_core always True) — zero-degree
    # points can never be core at minpts >= 2, and every downstream
    # flag resolve already defaults missing nodes to False, so the
    # pts ∪ deg tagged-union pass is pure overhead (measured ~1 s of
    # the sf0.1 wall).  minpts <= 1 degenerates to single-linkage —
    # q_spatial_clusters is that operator.
    if minpts <= 1:
        raise ValueError("dbscan requires minpts >= 2 "
                         "(minpts=1 is q_spatial_clusters)")

    def core_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(
            pc.greater_equal(pc.add(batch.column("n"), 1), minpts))
        return pa.table({
            "node": t.column("node"),
            "is_core": pa.array(np.ones(t.num_rows, dtype=bool))})

    core = _detached(deg.map_batches(core_only, batch_format="pyarrow"))

    # --- attach core flags to both pair endpoints ------------------------
    def tag_core(batch: pa.Table) -> pa.Table:
        d = batch.column("node").to_numpy().astype(np.int64)
        return pa.table({"key": batch.column("node"),
                         "other": pa.array(np.full(len(d), -1, np.int64)),
                         "flag": batch.column("is_core"),
                         "_shard": pa.array(d % C)})

    def tag_pair_by(col, other):
        def tag(batch: pa.Table) -> pa.Table:
            k = batch.column(col).to_numpy().astype(np.int64)
            return pa.table({"key": batch.column(col),
                             "other": batch.column(other),
                             "flag": pa.nulls(len(k), pa.bool_()),
                             "_shard": pa.array(k % C)})
        return tag

    def flag_resolve(df: pd.DataFrame) -> pd.DataFrame:
        """(a=key, b=other, a_core) — every pair row annotated with key's
        core flag."""
        recs = df.loc[df["flag"].notna(), ["key", "flag"]]
        qs = df.loc[df["flag"].isna(), ["key", "other"]]
        m = qs.merge(recs, on="key", how="left")
        return pd.DataFrame({"a": m["key"].to_numpy().astype(np.int64),
                             "b": m["other"].to_numpy().astype(np.int64),
                             "a_core": m["flag"].fillna(False).astype(bool)})

    p1 = (core.map_batches(tag_core, batch_format="pyarrow")
          .union(pairs.map_batches(tag_pair_by("a", "b"),
                                   batch_format="pyarrow"))
          .groupby("_shard").map_groups(flag_resolve, batch_format="pandas"))

    def requeue(batch: pa.Table) -> pa.Table:
        k = batch.column("b").to_numpy().astype(np.int64)
        return pa.table({"key": batch.column("b"),
                         "other": batch.column("a"),
                         "oflag": batch.column("a_core"),
                         "flag": pa.nulls(len(k), pa.bool_()),
                         "_shard": pa.array(k % C)})

    def tag_core2(batch: pa.Table) -> pa.Table:
        d = batch.column("node").to_numpy().astype(np.int64)
        return pa.table({"key": batch.column("node"),
                         "other": pa.array(np.full(len(d), -1, np.int64)),
                         "oflag": pa.nulls(len(d), pa.bool_()),
                         "flag": batch.column("is_core"),
                         "_shard": pa.array(d % C)})

    def flag2_resolve(df: pd.DataFrame) -> pd.DataFrame:
        """(a, b, a_core, b_core) fully annotated pairs."""
        recs = df.loc[df["flag"].notna(), ["key", "flag"]]
        qs = df.loc[df["flag"].isna(), ["key", "other", "oflag"]]
        m = qs.merge(recs, on="key", how="left")
        return pd.DataFrame({"a": m["other"].to_numpy().astype(np.int64),
                             "b": m["key"].to_numpy().astype(np.int64),
                             "a_core": m["oflag"].astype(bool),
                             "b_core": m["flag"].fillna(False).astype(bool)})

    flagged = _detached(
        core.map_batches(tag_core2, batch_format="pyarrow")
        .union(p1.map_batches(requeue, batch_format="pyarrow"))
        .groupby("_shard").map_groups(flag2_resolve, batch_format="pandas"))

    # --- clusters: CC over core-core edges + core self-edges -------------
    def cc_edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(batch.column("a_core"), batch.column("b_core"))
        t = batch.filter(keep)
        return pa.table({"a": t.column("a"), "b": t.column("b")})

    def core_self(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("is_core"))
        return pa.table({"a": t.column("node"), "b": t.column("node")})

    labels = _detached(connected_components(
        flagged.map_batches(cc_edges, batch_format="pyarrow")
        .union(core.map_batches(core_self, batch_format="pyarrow")),
        "a", "b"))

    # --- border attach: (noncore, core) rows pick min core label ---------
    def border_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        ac = batch.column("a_core").to_numpy(zero_copy_only=False)
        bc = batch.column("b_core").to_numpy(zero_copy_only=False)
        m1 = ~ac & bc        # a is border candidate via core b
        m2 = ac & ~bc
        return pa.table({
            "key": pa.array(np.concatenate([b[m1], a[m2]])),   # the core
            "other": pa.array(np.concatenate([a[m1], b[m2]])),  # the border
            "label": pa.nulls(int(m1.sum() + m2.sum()), pa.int64())})

    def tag_label(batch: pa.Table) -> pa.Table:
        d = batch.column("node").to_numpy().astype(np.int64)
        return pa.table({"key": batch.column("node"),
                         "other": pa.array(np.full(len(d), -1, np.int64)),
                         "label": batch.column("label")})

    def shardk(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy().astype(np.int64)
        return batch.append_column("_shard", pa.array(k % C))

    def border_resolve(df: pd.DataFrame) -> pd.DataFrame:
        recs = df.loc[df["label"].notna(), ["key", "label"]]
        qs = df.loc[df["label"].isna(), ["key", "other"]]
        m = qs.merge(recs, on="key", how="inner")
        g = m.groupby("other", sort=False)["label"].min()
        return pd.DataFrame({"node": g.index.to_numpy().astype(np.int64),
                             "blabel": g.to_numpy().astype(np.int64)})

    border = (labels.map_batches(tag_label, batch_format="pyarrow")
              .union(flagged.map_batches(border_rows, batch_format="pyarrow"))
              .map_batches(shardk, batch_format="pyarrow")
              .groupby("_shard").map_groups(border_resolve,
                                            batch_format="pandas"))
    # a border point may reach cores in several shards — one tiny
    # node-keyed Min merges the per-shard minima
    border = border.groupby("node").aggregate(Min("blabel",
                                                  alias_name="blabel"))

    # --- final role/label per point --------------------------------------
    def tag_final_pt(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        n = len(d)
        return pa.table({"node": pa.array(d),
                         "kind": pa.array(np.zeros(n, np.int8)),
                         "lab": pa.array(np.full(n, -1, np.int64)),
                         "_shard": pa.array(d % C)})

    def tag_final_core(batch: pa.Table) -> pa.Table:
        d = batch.column("node").to_numpy().astype(np.int64)
        n = len(d)
        return pa.table({"node": batch.column("node"),
                         "kind": pa.array(np.full(n, 1, np.int8)),
                         "lab": batch.column("label"),
                         "_shard": pa.array(d % C)})

    def tag_final_border(batch: pa.Table) -> pa.Table:
        d = batch.column("node").to_numpy().astype(np.int64)
        n = len(d)
        return pa.table({"node": batch.column("node"),
                         "kind": pa.array(np.full(n, 2, np.int8)),
                         "lab": batch.column("blabel"),
                         "_shard": pa.array(d % C)})

    def final_resolve(df: pd.DataFrame) -> pd.DataFrame:
        base = df[df["kind"] == 0][["node"]].drop_duplicates()
        co = df[df["kind"] == 1].set_index("node")["lab"]
        bo = df[df["kind"] == 2].set_index("node")["lab"]
        nodes = base["node"].to_numpy().astype(np.int64)
        cl = co.reindex(nodes)
        bl = bo.reindex(nodes)
        role = np.where(cl.notna(), "core",
                        np.where(bl.notna(), "border", "noise")).astype(object)
        label = np.where(cl.notna(), cl.fillna(-1).to_numpy(),
                         np.where(bl.notna(), bl.fillna(-1).to_numpy(),
                                  -1)).astype(np.int64)
        return pd.DataFrame({"doc_id": nodes, "role": role, "label": label})

    return (pts_ds.map_batches(tag_final_pt, batch_format="pyarrow")
            .union(labels.map_batches(tag_final_core, batch_format="pyarrow"))
            .union(border.map_batches(tag_final_border,
                                      batch_format="pyarrow"))
            .groupby("_shard").map_groups(final_resolve,
                                          batch_format="pandas"))
