"""Behavioral-analytics operators: ordered funnel, cohort retention,
item co-occurrence lift, column profiler, huge-partition percent-rank,
key-frequency spectrum, and triangle counting.

The reference engine has none of these (bano's SQL layer is pure
address-merge aggregates; see reference ``bano/sql/*``) — they are §2
"custom operator" extensions a training-data / product-analytics pipeline
runs over the same event logs it sessionizes (``stages/sessions.py``).

All of them follow the repo's established scale discipline:

* **coarse key-shards, not per-key groups** — every operator that needs a
  user's rows together groups on ``user_id % _coarse_groups()`` (a pure
  function of the key, so a key's rows land whole in exactly one group)
  and resolves per-key work with vectorized pandas/numpy inside the shard
  (``stages/window.py`` rationale: Ray's per-group dispatch is ~0.3 ms).
* **map-side pre-reduction** — blocks dedup / pre-count before any
  shuffle, so the all-to-all moves O(distinct), not O(events).
* **bounded finishes only** — the only driver-side materialization is the
  co-occurrence lift join, whose input is ≤ ``n_items²/2 + n_items + 1``
  rows by construction (the same bounded-finish argument as
  ``stages/ann.lsh_topk``).

Partitioning assumptions (SURVEY §2 custom-operator rule): one user's
DISTINCT (step|week|item) rows fit in a worker shard — at most
``len(steps)`` / #weeks / ``n_items`` rows per user after pre-reduction,
orders of magnitude below the raw event count.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _coarse_groups

logger = logging.getLogger(__name__)

WEEK_US = 7 * 24 * 3600 * 1_000_000  # calendar week, in timestamp[us] ticks

FUNNEL_STEPS = ("signup", "click", "purchase")

# sentinel row-kind marker for profile() stat rows (never a real value:
# real values are parquet strings / decimal renderings without NULs)
_STATS_VAL = "\x00stats\x00"


def _dedup_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Boolean mask of first occurrences of (a[i], b[i]) pairs (sorted scan,
    no Python sets)."""
    order = np.lexsort((b, a))
    keep_sorted = np.ones(len(a), dtype=bool)
    keep_sorted[1:] = ((a[order][1:] != a[order][:-1])
                       | (b[order][1:] != b[order][:-1]))
    keep = np.zeros(len(a), dtype=bool)
    keep[order] = keep_sorted
    return keep


def funnel(ds, steps: tuple[str, ...] = FUNNEL_STEPS):
    """Ordered conversion funnel over events (user_id, ts, event_type):
    a user reaches step k+1 iff they have a step-k+1 event STRICTLY after
    their earliest step-k reach time (the classic greedy funnel — greedy
    earliest-reach is optimal, so it equals "any increasing subsequence
    exists").  Returns one row per step: (step_idx, step, users).

    Shape: filter to the step types (map-side — on a real event stream the
    funnel types are a small fraction, so this IS the big reduction), then
    dedup exact (user, step, ts) triples per block — the only always-safe
    pre-reduction: collapsing to min-ts per (user, step) would be WRONG,
    because step k needs "min ts strictly after t_{k-1}" and the global
    minimum may precede it.  User-whole shards walk the ``len(steps)``
    merge chain vectorized, then the per-shard partial counts sum — the
    final shuffle is ``len(steps)`` rows per shard.
    """
    C = _coarse_groups()
    step_of = {s: i for i, s in enumerate(steps)}

    def prep(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.is_in(et, value_set=pa.array(list(steps)))
        t = batch.filter(keep)
        u = t.column("user_id").to_numpy().astype(np.int64)
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        si = np.full(len(u), -1, dtype=np.int64)
        for s, i in step_of.items():   # len(steps) vectorized compares
            si[pc.equal(t.column("event_type"), s)
               .to_numpy(zero_copy_only=False)] = i
        # per-block pre-reduction: distinct (user, step, ts) triples
        order = np.lexsort((ts, si, u))
        u, si, ts = u[order], si[order], ts[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = ((u[1:] != u[:-1]) | (si[1:] != si[:-1])
                     | (ts[1:] != ts[:-1]))
        return pa.table({
            "user_id": pa.array(u[first]),
            "step_idx": pa.array(si[first]),
            "ts": pa.array(ts[first]),
            "_shard": pa.array((u[first].astype(np.uint64)
                                % np.uint64(C)).astype(np.int64)),
        })

    def shard_counts(df: pd.DataFrame) -> pd.DataFrame:
        counts = []
        prev = None
        for i in range(len(steps)):
            sub = df[df["step_idx"] == i]
            if i == 0:
                cur = sub.groupby("user_id", as_index=False)["ts"].min()
            else:
                m = sub.merge(prev.rename(columns={"ts": "t_prev"}),
                              on="user_id")
                cur = (m[m["ts"] > m["t_prev"]]
                       .groupby("user_id", as_index=False)["ts"].min())
            counts.append(len(cur))
            prev = cur
        return pd.DataFrame({
            "step_idx": np.arange(1, len(steps) + 1, dtype=np.int64),
            "step": list(steps),
            "users": np.asarray(counts, dtype=np.int64),
        })

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "step_idx": df["step_idx"].iloc[:1].to_numpy(np.int64),
            "step": df["step"].iloc[:1],
            "users": np.asarray([df["users"].sum()], dtype=np.int64),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("_shard").map_groups(shard_counts, batch_format="pandas")
            .groupby("step_idx").map_groups(total, batch_format="pandas"))


def cohort_retention(ds, week_us: int = WEEK_US):
    """Weekly cohort retention over events (user_id, ts): cohort_week =
    the epoch-week of a user's first event, week_offset = active week −
    cohort week, users = distinct users of that cohort active at that
    offset.  Returns (cohort_week, week_offset, users).

    Shape: blocks pre-reduce to distinct (user, week) pairs, users shard
    whole (so shard-local distinct IS globally distinct and shard-local
    min-week IS the user's cohort), shards emit per-(cohort, offset)
    partial counts, and ONE small multi-key sum finishes — the all-to-alls
    move O(users × active-weeks), never O(events).
    """
    from ray.data.aggregate import Sum

    C = _coarse_groups()

    def prep(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype(np.int64)
        wk = batch.column("ts").cast(pa.int64()).to_numpy() // week_us
        keep = _dedup_pairs(u, wk)
        u, wk = u[keep], wk[keep]
        return pa.table({
            "user_id": pa.array(u),
            "wk": pa.array(wk),
            "_shard": pa.array((u.astype(np.uint64)
                                % np.uint64(C)).astype(np.int64)),
        })

    def shard_counts(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        wk = df["wk"].to_numpy(np.int64)
        keep = _dedup_pairs(u, wk)           # re-dedup across blocks
        u, wk = u[keep], wk[keep]
        cw = pd.Series(wk).groupby(pd.Series(u)).transform("min").to_numpy()
        part = (pd.DataFrame({"cohort_week": cw, "week_offset": wk - cw})
                .groupby(["cohort_week", "week_offset"], as_index=False)
                .size().rename(columns={"size": "users"}))
        part["users"] = part["users"].astype(np.int64)
        return part

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("_shard").map_groups(shard_counts, batch_format="pandas")
            .groupby(["cohort_week", "week_offset"])
            .aggregate(Sum("users", alias_name="users")))


def lift_cooccur(ds, n_items: int = 100, min_pair_users: int = 2,
                 max_items_per_user: int = 100_000):
    """Item co-occurrence lift over click events (user_id, props): for
    every unordered item pair (i < j) clicked by ≥ ``min_pair_users``
    distinct users, lift in exact integer ppm:

        lift_ppm = (1_000_000 · c_ab · n_users) // (c_a · c_b)

    (lift = P(ab)/(P(a)P(b)) over the distinct-user universe; ppm floor
    division keeps both sides exact-integer so the oracle hash-gates).
    Returns (i, j, c_ab, lift_ppm).

    Shape: click filter + per-block distinct (user, item) pre-reduction,
    user-whole shards generate pairs with ONE self-merge (no per-user
    loop), per-shard partials for pair counts / item counts / user count
    ride one union-typed table through a single multi-key sum, and the
    finish joins a table bounded by ``n_items²/2 + n_items + 1`` rows —
    independent of input size (bounded-finish rule, as
    ``stages/ann.lsh_topk``).  ``max_items_per_user`` is the skew guard
    (quadratic pair fan-out); drops are logged, never silent
    (``dedup._record_drop`` discipline).
    """
    from ray.data.aggregate import Sum

    from .dedup import _record_drop

    C = _coarse_groups()

    def prep(batch: pa.Table) -> pa.Table:
        ks = pc.extract_regex(batch.column("props"),
                              pattern='"k": (?P<k>[0-9]+)')
        item = (pc.cast(pc.struct_field(ks, "k"), pa.int64()).to_numpy()
                % n_items)
        u = batch.column("user_id").to_numpy().astype(np.int64)
        keep = _dedup_pairs(u, item)
        u, item = u[keep], item[keep]
        return pa.table({
            "user_id": pa.array(u),
            "item": pa.array(item),
            "_shard": pa.array((u.astype(np.uint64)
                                % np.uint64(C)).astype(np.int64)),
        })

    def shard_partials(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        item = df["item"].to_numpy(np.int64)
        keep = _dedup_pairs(u, item)
        ui = pd.DataFrame({"u": u[keep], "i": item[keep]})
        fan = ui.groupby("u")["i"].transform("size")
        big = fan > max_items_per_user
        if big.any():
            for uu, cnt in ui.loc[big, "u"].value_counts().items():
                _record_drop("cooccur_user", int(cnt), max_items_per_user)
            ui = ui[~big]
        m = ui.merge(ui, on="u")
        pairs = (m[m["i_x"] < m["i_y"]]
                 .groupby(["i_x", "i_y"], as_index=False).size())
        out = pd.DataFrame({
            "kind": np.zeros(len(pairs), dtype=np.int64),
            "i": pairs["i_x"].to_numpy(np.int64),
            "j": pairs["i_y"].to_numpy(np.int64),
            "c": pairs["size"].to_numpy(np.int64),
        })
        ic = ui.groupby("i", as_index=False).size()
        parts = [out,
                 pd.DataFrame({"kind": 1, "i": ic["i"].to_numpy(np.int64),
                               "j": -1,
                               "c": ic["size"].to_numpy(np.int64)}),
                 pd.DataFrame({"kind": [2], "i": [-1], "j": [-1],
                               "c": [ui["u"].nunique()]})]
        return pd.concat(parts, ignore_index=True).astype(np.int64)

    agg = (ds.filter(expr="event_type == 'click'")
           .map_batches(prep, batch_format="pyarrow")
           .groupby("_shard").map_groups(shard_partials, batch_format="pandas")
           .groupby(["kind", "i", "j"]).aggregate(Sum("c", alias_name="c")))
    # bounded finish: ≤ n_items²/2 + n_items + 1 rows by construction
    small = agg.to_pandas()
    n_users = int(small.loc[small["kind"] == 2, "c"].iloc[0])
    ic = small[small["kind"] == 1].set_index("i")["c"]
    pr = small[small["kind"] == 0]
    pr = pr[pr["c"] >= min_pair_users]
    i = pr["i"].to_numpy(np.int64)
    j = pr["j"].to_numpy(np.int64)
    c_ab = pr["c"].to_numpy(np.int64)
    lift = (1_000_000 * c_ab * n_users) // (ic.loc[i].to_numpy(np.int64)
                                            * ic.loc[j].to_numpy(np.int64))
    out = pd.DataFrame({"i": i, "j": j, "c_ab": c_ab, "lift_ppm": lift})
    return out.sort_values(["i", "j"], ignore_index=True)


def profile(ds, columns: tuple[str, ...], int_cols: frozenset[str] = frozenset()):
    """One-pass column profiler: per column, (col, n_rows, n_null,
    n_distinct, min_val, max_val) with min/max rendered as strings
    (numeric columns compare numerically — ``int_cols`` — so "999" < "1000"
    holds; everything else compares as text, matching SQL VARCHAR MIN/MAX
    on ASCII data).

    Shape: each block pre-reduces to its distinct values per column plus
    ONE stats row per column (row counts / null counts), a single
    (col, val) sum-groupby dedups values globally while summing the stat
    rows, and a per-col finish (≤ ``len(columns)`` groups) counts
    distincts and reduces min/max.  The shuffle moves O(distinct values),
    never O(rows), and nothing materializes on the driver.
    """
    from ray.data.aggregate import Sum

    def prep(batch: pa.Table) -> pa.Table:
        parts = []
        for c in columns:
            arr = batch.column(c)
            uniq = pc.unique(pc.cast(arr.drop_null(), pa.string()))
            if isinstance(uniq, pa.ChunkedArray):
                uniq = uniq.combine_chunks()
            k = len(uniq)
            nr = np.zeros(k + 1, dtype=np.int64)
            nn = np.zeros(k + 1, dtype=np.int64)
            nr[k] = len(arr)
            nn[k] = arr.null_count
            parts.append(pa.table({
                "col": pa.array([c] * (k + 1), pa.string()),
                "val": pa.concat_arrays(
                    [uniq, pa.array([_STATS_VAL], pa.string())]),
                "n_rows": pa.array(nr),
                "n_null": pa.array(nn),
            }))
        return pa.concat_tables(parts)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        c = df["col"].iloc[0]
        stats = df[df["val"] == _STATS_VAL]
        dv = df.loc[df["val"] != _STATS_VAL, "val"]
        if len(dv) and c in int_cols:
            as_int = dv.astype(np.int64)
            mn, mx = str(as_int.min()), str(as_int.max())
        elif len(dv):
            mn, mx = dv.min(), dv.max()
        else:
            mn = mx = None
        return pd.DataFrame({
            "col": [c],
            "n_rows": np.asarray([stats["n_rows"].sum()], dtype=np.int64),
            "n_null": np.asarray([stats["n_null"].sum()], dtype=np.int64),
            "n_distinct": np.asarray([len(dv)], dtype=np.int64),
            "min_val": [mn],
            "max_val": [mx],
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby(["col", "val"])
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("n_null", alias_name="n_null"))
            .groupby("col").map_groups(finish, batch_format="pandas"))


def pct_rank(ds, key: str, val: str, id_col: str):
    """Exact PERCENT_RANK over a HANDFUL OF HUGE partitions — the case
    ``stages/window.py`` explicitly defers (a per-entity shard cannot hold
    one partition).  pr_ppm = (1_000_000 · |{rows in partition < v}|) //
    (n_partition − 1), integer ppm so the oracle hash-gates (single-row
    partitions get 0, matching SQL PERCENT_RANK).

    Shape: instead of a distributed sort per partition, exploit that the
    VALUE DOMAIN is bounded (doc lengths, scores, ages…): one
    (key, value) count-combiner groupby shuffles O(distinct pairs), the
    below-counts prefix-sum runs on that small table, and the ppm lookup
    broadcasts back through ``ray.put`` into a stateless ``map_batches``
    join — the same moments-broadcast discipline as
    ``queries.q_group_outliers``.  Partitioning assumption (SURVEY §2
    rule): distinct (key, value) pairs fit in one worker (domain-bounded);
    an unbounded-domain column needs the two-pass distributed-sort
    variant instead.
    """
    import ray
    from ray.data.aggregate import Sum

    def prep(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        v = batch.column(val).to_numpy().astype(np.int64)
        codes, uk = pd.factorize(k)
        order = np.lexsort((v, codes))
        ck, cv = codes[order], v[order]
        first = np.ones(len(ck), dtype=bool)
        first[1:] = (ck[1:] != ck[:-1]) | (cv[1:] != cv[:-1])
        starts = np.flatnonzero(first)
        return pa.table({
            key: pa.array(uk[ck[starts]], pa.string()),
            val: pa.array(cv[starts]),
            "c": pa.array(np.diff(np.append(starts, len(ck))).astype(np.int64)),
        })

    counts = (ds.map_batches(prep, batch_format="pyarrow")
              .groupby([key, val]).aggregate(Sum("c", alias_name="c"))
              .to_pandas())           # domain-bounded small table
    counts = counts.sort_values([key, val], ignore_index=True)
    grp = counts.groupby(key)["c"]
    below = grp.cumsum() - counts["c"]
    n = grp.transform("sum")
    lut = counts[[key, val]].copy()
    lut["pr_ppm"] = np.where(n > 1, (1_000_000 * below.to_numpy(np.int64))
                             // np.maximum(n.to_numpy(np.int64) - 1, 1),
                             0).astype(np.int64)
    lut_ref = ray.put(lut)

    def attach(batch: pa.Table) -> pa.Table:
        df = batch.select([id_col, key, val]).to_pandas()
        df[val] = df[val].astype(np.int64)
        out = df.merge(ray.get(lut_ref), on=[key, val], how="left")
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(attach, batch_format="pyarrow")


def key_spectrum(ds, key: str):
    """Key-frequency spectrum (count-of-counts): for every multiplicity
    ``freq``, how many distinct keys occur exactly ``freq`` times — the
    skew diagnostic that tells a planner whether a groupby/join on ``key``
    needs salting.  Returns (freq, n_keys).

    Shape: per-block key-count partials → ONE O(distinct-keys) sum-groupby
    → per-block frequency bincount partials → ONE O(distinct-freqs)
    sum-groupby.  Nothing materializes; both shuffles are sub-linear.
    """
    from ray.data.aggregate import Sum

    def prep(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy()
        codes, uniq = pd.factorize(k)
        return pa.table({key: pa.array(uniq),
                         "c": pa.array(np.bincount(codes).astype(np.int64))})

    def spectrum(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy()
        codes, uniq = pd.factorize(c)
        return pa.table({"freq": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(np.bincount(codes).astype(np.int64))})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby(key).aggregate(Sum("c", alias_name="c"))
            .map_batches(spectrum, batch_format="pyarrow")
            .groupby("freq").aggregate(Sum("n", alias_name="n_keys")))


def triangles(ds, n_items: int = 100, min_pair_users: int = 2):
    """Per-node triangle counts on the co-click item graph: nodes = items,
    undirected edges = item pairs co-clicked by ≥ ``min_pair_users`` users
    (exactly :func:`lift_cooccur`'s survivors).  Returns (node, n_tri) for
    nodes in ≥1 triangle.

    Shape: the edge list is produced by the fully distributed lift
    pipeline; the triangle count itself runs on the ≤ n_items²/2-row edge
    set via one boolean-adjacency matmul (diag(A³)/2) — bounded finish,
    independent of input size.  At web scale the item vocabulary is the
    SMALL side by construction (this is a dim-graph operator); a
    billion-node graph needs the CC-style edge-iteration machinery in
    ``stages/graph.py`` instead.
    """
    edges = lift_cooccur(ds, n_items=n_items, min_pair_users=min_pair_users)
    a = np.zeros((n_items, n_items), dtype=np.int64)
    i = edges["i"].to_numpy(np.int64)
    j = edges["j"].to_numpy(np.int64)
    a[i, j] = 1
    a[j, i] = 1
    per_node = np.diag(a @ a @ a) // 2
    nodes = np.flatnonzero(per_node)
    return pd.DataFrame({"node": nodes.astype(np.int64),
                         "n_tri": per_node[nodes].astype(np.int64)})


def winsorize_sum(ds, key: str, val_cents, lo_q: float = 0.05,
                  hi_q: float = 0.95):
    """Winsorized (clipped) per-group aggregate: per ``key``, count and the
    sum of values clipped to the group's [lo_q, hi_q] DISCRETE quantiles —
    the robust-mean building block (a handful of extreme rows cannot move
    the total).  ``val_cents`` is a callable batch → int64 cents array, so
    the quantile ranks are exact integers on both sides (DuckDB
    ``quantile_disc`` convention: rank = ceil(q·n) − 1, exactly
    ``queries.q_group_quantiles``).  Returns (key, n, wsum_cents).

    Shape: the SAME domain-bounded (key, value) count-combiner as
    :func:`pct_rank` (no huge per-group sort); thresholds come from the
    small count table's cumsum, broadcast via ``ray.put``; a stateless
    clip + per-block partial sum and ONE tiny groupby finish.
    Partitioning assumption: distinct (key, cents) pairs fit in one worker.
    """
    import ray
    from ray.data.aggregate import Sum

    def prep(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        v = val_cents(batch)
        codes, uk = pd.factorize(k)
        order = np.lexsort((v, codes))
        ck, cv = codes[order], v[order]
        first = np.ones(len(ck), dtype=bool)
        first[1:] = (ck[1:] != ck[:-1]) | (cv[1:] != cv[:-1])
        starts = np.flatnonzero(first)
        return pa.table({
            key: pa.array(uk[ck[starts]], pa.string()),
            "cents": pa.array(cv[starts]),
            "c": pa.array(np.diff(np.append(starts, len(ck))).astype(np.int64)),
        })

    counts = (ds.map_batches(prep, batch_format="pyarrow")
              .groupby([key, "cents"]).aggregate(Sum("c", alias_name="c"))
              .to_pandas()            # domain-bounded small table
              .sort_values([key, "cents"], ignore_index=True))
    th = {}
    for g, sub in counts.groupby(key):
        cum = sub["c"].cumsum().to_numpy(np.int64)
        n = int(cum[-1])
        cents = sub["cents"].to_numpy(np.int64)
        lo = cents[np.searchsorted(cum, max(1, int(np.ceil(lo_q * n))))]
        hi = cents[np.searchsorted(cum, max(1, int(np.ceil(hi_q * n))))]
        th[g] = (lo, hi)
    th_ref = ray.put(th)

    def clip_partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        v = val_cents(batch)
        codes, uk = pd.factorize(k)
        table = ray.get(th_ref)
        lo = np.asarray([table[g][0] for g in uk], dtype=np.int64)[codes]
        hi = np.asarray([table[g][1] for g in uk], dtype=np.int64)[codes]
        w = np.clip(v, lo, hi)
        return pa.table({
            key: pa.array(uk, pa.string()),
            "n": pa.array(np.bincount(codes).astype(np.int64)),
            "wsum_cents": pa.array(np.bincount(codes, weights=w)
                                   .astype(np.int64)),
        })

    return (ds.map_batches(clip_partial, batch_format="pyarrow")
            .groupby(key).aggregate(Sum("n", alias_name="n"),
                                    Sum("wsum_cents",
                                        alias_name="wsum_cents")))


def _skyline_block(key: np.ndarray, x: np.ndarray, y: np.ndarray):
    """2-D Pareto frontier (maximize both) of one array triple — returns a
    boolean keep-mask in the ORIGINAL row order.

    Dominance: q dominates p iff q.x ≥ p.x, q.y ≥ p.y, strict in one.
    Vectorized: sort (key, x desc); within a key, a row survives iff its y
    exceeds the max y of every strictly-greater-x row (exclusive running
    max over x-groups) AND equals the max y of its own x-group — duplicate
    frontier points all survive, exactly the NOT-EXISTS SQL semantics."""
    keep = np.zeros(len(x), dtype=bool)
    if len(x) == 0:
        return keep
    order = np.lexsort((-y, -x, key))
    NEG = np.iinfo(np.int64).min
    for kf in np.split(np.arange(len(order)),
                       np.flatnonzero(key[order][1:] != key[order][:-1]) + 1):
        idx = order[kf]
        xs, ys = x[idx], y[idx]
        gf = np.flatnonzero(np.r_[True, xs[1:] != xs[:-1]])
        gmax = np.maximum.reduceat(ys, gf)
        m1 = np.r_[NEG, np.maximum.accumulate(gmax)[:-1]]
        gid = np.cumsum(np.r_[False, xs[1:] != xs[:-1]])
        keep[idx] = (ys > m1[gid]) & (ys == gmax[gid])
    return keep


def skyline(ds, key: str, xy):
    """Per-``key`` 2-D Pareto frontier (maximize both coordinates).

    ``xy``: callable batch → (x int64 array, y int64 array).  Returns all
    non-dominated rows (key, x, y) — duplicates of a frontier point are all
    kept (SQL NOT-EXISTS dominance semantics).

    Shape: skyline is a semilattice — skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B)) — so each block keeps only its LOCAL
    frontier (O(log n) expected rows for independent dims) and the shuffle
    moves candidates only; one tiny per-key ``map_groups`` finishes.
    Partitioning assumption: keys are few (a dim-typed column — the
    per-key python loop in ``_skyline_block`` is over ≤ dozens of keys);
    one key's CANDIDATE frontier fits in a worker."""

    def local(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        codes, uk = pd.factorize(k)
        x, y = xy(batch)
        keep = _skyline_block(codes, x, y)
        return pa.table({key: pa.array(uk[codes[keep]], pa.string()),
                         "x": pa.array(x[keep]), "y": pa.array(y[keep])})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(df[key].to_numpy())
        keep = _skyline_block(codes, df["x"].to_numpy(np.int64),
                              df["y"].to_numpy(np.int64))
        return df[keep]

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby(key).map_groups(final, batch_format="pandas"))


def weighted_median(ds, key: str, val_cents, weight,
                    bins: int = 1024, final_cap: int = 8192):
    """Per-``key`` lower weighted median: the smallest value v with
    2·(cumulative weight through v) ≥ total weight — integer-exact (the
    2·cum ≥ tot test is the engine/oracle shared expression, realized as
    rank r = (tot+1)//2 in weight space).  ``val_cents``/``weight`` are
    callables batch → int64.

    Shape — iterative weighted histogram selection (the
    ``stages/quantile.exact_quantiles`` discipline; values here are
    INTEGERS so candidate ranges shrink by exact arithmetic, no float-ulp
    chain needed): one per-key (min, max, Σw) pass pins ranges and ranks;
    each round ONE histogram pass emits ≤ keys×``bins`` (key, bin, Σw)
    partials, a tiny groupby-sum merges them, and the driver walks ≤
    ``bins`` cumulative weights per key to pick the rank-holding bin,
    shrinking that key's range ~bins×; when every range spans ≤
    ``final_cap`` integers, one filtered (key, v)→Σw pass finishes with a
    cumsum over ≤ keys×``final_cap`` rows.  Every shuffle moves
    histogram-sized data and the driver never holds O(distinct values) —
    the failure mode of a count-table combiner on an unbounded-domain
    column (lineitem prices: ~every row distinct).  ~2 rounds for a 10^7
    cents domain = 4 column-pruned scans, independent of row count.
    Partitioning assumption: ``key`` is dim-typed (≤ thousands of keys).
    Returns (key, wmedian_c).
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def prep(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        return pa.table({key: pa.array(k, pa.string()),
                         "v": pa.array(val_cents(batch)),
                         "w": pa.array(weight(batch))})

    pre = ds.map_batches(prep, batch_format="pyarrow")
    # pass 0: per-key range + total weight + rank
    span0 = (pre.groupby(key)
             .aggregate(Min("v", alias_name="lo"), Max("v", alias_name="hi"),
                        Sum("w", alias_name="tot"))
             .to_pandas())
    state = {r[key]: {"lo": int(r["lo"]), "hi": int(r["hi"]),
                      "rank": (int(r["tot"]) + 1) // 2}
             for _, r in span0.iterrows()}

    def hist_partial(batch: pa.Table, st: dict) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy()
        w = batch.column("w").to_numpy()
        codes, uk = pd.factorize(k)
        lo = np.asarray([st[g]["lo"] for g in uk], np.int64)[codes]
        span = np.asarray([st[g]["hi"] - st[g]["lo"] + 1
                           for g in uk], np.int64)[codes]
        m = (v >= lo) & (v < lo + span)
        codes, v, w, lo, span = codes[m], v[m], w[m], lo[m], span[m]
        b = (v - lo) * bins // span
        slot = codes * bins + b
        wsum = np.bincount(slot, weights=w, minlength=len(uk) * bins)
        nz = np.flatnonzero(wsum)
        return pa.table({
            key: pa.array(uk[nz // bins], pa.string()),
            "bin": pa.array((nz % bins).astype(np.int64)),
            "wsum": pa.array(wsum[nz].astype(np.int64)),
        })

    while True:
        active = {g: s for g, s in state.items()
                  if s["hi"] - s["lo"] + 1 > final_cap}
        if not active:
            break
        st_ref = ray.put(dict(state))
        hist = (pre.map_batches(
                    lambda batch, _r=st_ref: hist_partial(batch, ray.get(_r)),
                    batch_format="pyarrow")
                .groupby([key, "bin"]).aggregate(Sum("wsum", alias_name="wsum"))
                .to_pandas())
        for g in active:
            sub = hist[hist[key] == g].sort_values("bin")
            cum = sub["wsum"].cumsum().to_numpy(np.int64)
            i = int(np.searchsorted(cum, state[g]["rank"]))
            b = int(sub["bin"].to_numpy(np.int64)[i])
            lo, hi = state[g]["lo"], state[g]["hi"]
            span = hi - lo + 1
            state[g]["rank"] -= int(cum[i - 1]) if i else 0
            state[g]["lo"] = lo + (b * span + bins - 1) // bins
            state[g]["hi"] = lo + ((b + 1) * span + bins - 1) // bins - 1

    # final: exact (key, v) weights inside the ≤ final_cap candidate ranges
    st_ref = ray.put(dict(state))

    def final_partial(batch: pa.Table) -> pa.Table:
        st = ray.get(st_ref)
        k = batch.column(key).to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy()
        w = batch.column("w").to_numpy()
        codes, uk = pd.factorize(k)
        lo = np.asarray([st[g]["lo"] for g in uk], np.int64)[codes]
        hi = np.asarray([st[g]["hi"] for g in uk], np.int64)[codes]
        m = (v >= lo) & (v <= hi)
        codes, v, w = codes[m], v[m], w[m]
        order = np.lexsort((v, codes))
        ck, cv, cw = codes[order], v[order], w[order]
        first = np.ones(len(ck), dtype=bool)
        first[1:] = (ck[1:] != ck[:-1]) | (cv[1:] != cv[:-1])
        starts = np.flatnonzero(first)
        cum = np.concatenate(([0], np.cumsum(cw)))
        ends = np.append(starts[1:], len(ck))
        return pa.table({
            key: pa.array(uk[ck[starts]], pa.string()),
            "v": pa.array(cv[starts]),
            "w": pa.array((cum[ends] - cum[starts]).astype(np.int64)),
        })

    cand = (pre.map_batches(final_partial, batch_format="pyarrow")
            .groupby([key, "v"]).aggregate(Sum("w", alias_name="w"))
            .to_pandas()              # ≤ keys × final_cap rows
            .sort_values([key, "v"], ignore_index=True))
    out_k, out_v = [], []
    for g, sub in cand.groupby(key, sort=True):
        cum = sub["w"].cumsum().to_numpy(np.int64)
        i = int(np.searchsorted(cum, state[g]["rank"]))
        out_k.append(g)
        out_v.append(int(sub["v"].to_numpy(np.int64)[i]))
    return pd.DataFrame({key: out_k, "wmedian_c": np.array(out_v, np.int64)})


def grouped_mode(ds, key_cols, val_col: str):
    """Exact grouped mode (argmax-by-count): per key, the most frequent
    value, ties broken to the lexicographically smallest value.

    Two-phase, the 100 TB shape for a categorical mode: phase 1 is a
    map-side (key, value) pre-count (per-block np.unique — the shuffle
    moves distinct (key, value) pairs, not rows) into ONE groupby-sum;
    phase 2 resolves the per-key argmax inside coarse shards (a pure
    function of the key — no per-key dispatch) with a single flat
    lexsort + first-of-group cut.  Output: key_cols + (mode_<val>, n).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .dedup import _coarse_groups

    key_cols = list(key_cols)

    def precount(batch: pa.Table) -> pa.Table:
        df = batch.select(key_cols + [val_col]).to_pandas()
        g = df.groupby(key_cols + [val_col], sort=False,
                       observed=True).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(precount, batch_format="pyarrow")
              .groupby(key_cols + [val_col])
              .aggregate(Sum("n", alias_name="n")))
    C = _coarse_groups()

    def shard(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = pd.util.hash_pandas_object(df[key_cols].astype(str).agg(
            "|".join, axis=1), index=False).to_numpy()
        df["_shard"] = (h % np.uint64(C)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.sort_values(key_cols + ["n", val_col],
                              ascending=[True] * len(key_cols) + [False, True])
               .drop_duplicates(subset=key_cols, keep="first")
               .drop(columns=["_shard"])
               .rename(columns={val_col: f"mode_{val_col}"}))
        return out.reset_index(drop=True)

    return (counts.map_batches(shard, batch_format="pyarrow")
            .groupby("_shard").map_groups(argmax, batch_format="pandas"))


def mad_outliers(sf_dir: str, k: int = 3):
    """Per-event-type robust outlier census: lower median, median absolute
    deviation (both via :func:`weighted_median`'s iterative
    weighted-histogram selection — integer cents, exact rank tests), and
    the count of rows with ``|v − med| > k·MAD``.

    The robust twin of the z-score pass (``stages/outliers.py``): the
    z-score breaks down when the contamination inflates the variance;
    MAD has a 50% breakdown point.  Three streaming scans, each shuffling
    only histogram- / dim-sized partials; the two median maps broadcast
    as small dicts.  Returns (event_type, med_c, mad_c, n, n_outliers).
    """
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def cents(batch: pa.Table) -> np.ndarray:
        return np.round(batch.column("value").to_numpy()
                        * 100.0).astype(np.int64)

    def ones(batch: pa.Table) -> np.ndarray:
        return np.ones(batch.num_rows, dtype=np.int64)

    med = weighted_median(ds, "event_type", cents, ones)
    med_map = {g: int(v) for g, v in zip(med["event_type"],
                                         med["wmedian_c"])}

    def dev(batch: pa.Table) -> np.ndarray:
        ks = batch.column("event_type").to_numpy(zero_copy_only=False)
        codes, uk = pd.factorize(ks)
        m = np.asarray([med_map[g] for g in uk], np.int64)[codes]
        return np.abs(cents(batch) - m)

    mad = weighted_median(ds, "event_type", dev, ones)
    mad_map = {g: int(v) for g, v in zip(mad["event_type"],
                                         mad["wmedian_c"])}

    def census(batch: pa.Table) -> pa.Table:
        ks = batch.column("event_type").to_numpy(zero_copy_only=False)
        codes, uk = pd.factorize(ks)
        m = np.asarray([med_map[g] for g in uk], np.int64)[codes]
        md = np.asarray([mad_map[g] for g in uk], np.int64)[codes]
        out = np.abs(cents(batch) - m) > k * md
        return pa.table({
            "event_type": pa.array(uk, pa.string()),
            "n": pa.array(np.bincount(codes, minlength=len(uk))
                          .astype(np.int64)),
            "n_outliers": pa.array(np.bincount(codes[out],
                                               minlength=len(uk))
                                   .astype(np.int64)),
        })

    agg = (ds.map_batches(census, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_outliers", alias_name="n_outliers")))

    def attach(batch: pa.Table) -> pa.Table:
        ks = batch.column("event_type").to_numpy(zero_copy_only=False)
        return (batch
                .append_column("med_c", pa.array(
                    np.asarray([med_map[g] for g in ks], np.int64)))
                .append_column("mad_c", pa.array(
                    np.asarray([mad_map[g] for g in ks], np.int64))))

    return agg.map_batches(attach, batch_format="pyarrow")
