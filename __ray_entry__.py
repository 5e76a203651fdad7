"""Driver contract for the bano_ray engine.

The driver initialises Ray itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.  Each
``queries()`` entry is a pipeline from SURVEY.md §2; ``oracle_sql()`` holds
the DuckDB-equivalent SQL (rendered by ``bano_ray.oracle`` from the same
generative constants the pipelines use).  Queries without an oracle entry
are non-SQL-expressible (hash functions / approximate algorithms) and get
the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# queries with full DuckDB value-parity oracles
_ORACLE_QUERIES = [
    # --- never driver-sampled first: the driver samples a prefix of
    # --- this list, so rotation reaches un-gated queries soonest
    "q_image_thumbs",        # image: exact thumbnail box-filter sums (PNG-only)
    "q_frame_sample",        # video: sampled-frame integer luminance sums
    "q_filter_funnel",       # curation: filter-cascade attrition census
    "q_rrf_fusion",          # retrieval: reciprocal-rank fusion top-10
    "q_bpe_first_merge",     # tokenizer training: first BPE merge census
    "q_semantic_dedup",      # dedup: SemDeDup-style coarse PQ buckets
    "q_dbscan",              # geo: full DBSCAN (core/border/noise + labels)
    "q_containment_pairs",   # dedup: asymmetric containment census
    "q_mmr_rerank",          # retrieval: MMR diversified top-10
    "q_image_equalize",      # image: histogram-equalization census
    "q_tpch_q7",             # TPC-H Q7 shape: fact-fact orderkey join
    "q_watermark",           # text: LLM-watermark greenlist census
    "q_k_anonymity",         # privacy: QI group-size spectrum
    "q_dp_counts",           # privacy: DP noisy-count release harness
    "q_jl_distortion",       # embeddings: JL-projection norm census
    "q_frame_diff",          # video: inter-frame change census
    "q_track_lcss",          # geo: LCSS trajectory similarity
    "q_idw_grid",            # geo: exact-integer IDW interpolation
    "q_cell_image_mosaic",   # geo x image: per-tile thumbnail mosaic
    "q_dedup_keep_best",     # dedup: quality-argmax representative
    "q_boilerplate",         # curation: shared-shingle boilerplate census
    "q_matryoshka",          # embeddings: prefix-energy census
    "q_tpch_q9",             # TPC-H Q9 shape: broadcast star join
    "q_dedup_incremental",   # dedup: delta-vs-base incremental ingest
    "q_crossmodal_dups",     # multimodal: text-dup vs image-match census
    "q_crossmodal_corr",     # multimodal: per-zone image/caption corr
    "q_kmv_overlap",         # KMV set-overlap sketch (k-min distinct hashes)
    "q_distance_selfjoin",   # spatial distance self-join (grid buckets)
    "q_heavy_hitters",       # exact top-k by count (combiner shape)
    "q_group_moments",       # mergeable exact moments (count/Σ/Σ² partials)
    "q_delta_upsert",        # LSM-style last-wins snapshot compaction
    "q_rollup",              # multi-level ROLLUP aggregate from finest level
    "q_dup_clusters",        # iterative: connected components over dup pairs
    "q_pagerank",            # iterative: PageRank over the user<->item graph
    "q_topk_per_group",      # windowed top-k per group
    "q_group_quantiles",     # per-group discrete quantiles
    "q_sample_per_group",    # deterministic stratified per-group sample
    "q_bloom_semijoin",      # Bloom-prefiltered exact semi-join
    "q_broadcast_join",      # explicit broadcast fact-to-dim join
    "q_salted_join",         # skew-proof salted repartition join
    "q_quantiles",           # exact quantiles via distributed selection
    "q_percentile_cont",     # interpolated quantiles (rank-pair selection)
    "q_event_paths",         # ordered string_agg: first-8-events path/user
    "q_zorder_range",        # bbox via coalesced morton-range pruning
    "q_jaccard_neardup",     # dedup: exact-recall n-gram Jaccard (prefix filter)
    "q_audio_features",      # multimodal audio window features (fake PCM)
    "q_fuzzy_streets",       # blocked edit-distance fuzzy key matching
    "q_group_outliers",      # per-group z-score outliers (broadcast stats)
    "q_outer_join",          # one-shuffle FULL OUTER join (tagged union)
    "q_train_split",         # deterministic train/val/test hash split
    "q_char_entropy",        # per-doc character Shannon entropy
    "q_cube",                # CUBE grouping sets from finest-level partials
    "q_histogram",           # fixed-bin histogram (bincount combiner)
    "q_corr_by_group",       # per-group Pearson r from exact bilinear moments
    "q_embed_centroids",     # per-label embedding centroid (vector combiner)
    "q_vocab_topk",          # vocabulary building: global top-k bigrams
    "q_chunk_dedup",         # dedup: cross-doc duplicated-chunk removal
    "q_spatial_clusters",    # geo: single-linkage clusters (pairs + CC)
    "q_image_dims",          # image: container header parse (PNG/JPEG)
    "q_dedup_corpus",        # dedup: end-to-end near-dup removal filter
    "q_funnel",              # ordered conversion funnel (greedy earliest-reach)
    "q_cohort_retention",    # weekly cohort retention matrix
    "q_lift_cooccur",        # item co-occurrence lift (exact integer ppm)
    "q_profile",             # one-pass column profiler (exact distincts)
    "q_pct_rank",            # huge-partition PERCENT_RANK (integer ppm)
    "q_key_spectrum",        # key-frequency spectrum (count-of-counts)
    "q_triangles",           # per-node triangles on the co-click item graph
    "q_feature_hash",        # hashing-trick vectorizer (md5 % 4096 features)
    "q_winsorize",           # winsorized per-group aggregate (p05/p95 clip)
    "q_transitions",         # per-user event-transition (Markov) counts
    "q_interval_cover",      # gaps-and-islands interval union per user
    "q_skyline",             # per-group 2-D Pareto frontier
    "q_cell_smooth",         # 3x3 k-ring smoothed tile counts (raster conv)
    "q_scd2",                # SCD2 validity intervals from the event stream
    "q_weighted_median",     # integer-exact grouped weighted median
    "q_embed_gram",          # Gram matrix via per-block BLAS matmul partials
    "q_tile_pyramid",        # multi-zoom tile-count pyramid (one pass)
    "q_track_length",        # geo: exact integer polyline length per track
    "q_track_simplify",      # geo: one-pass Visvalingam polyline thinning
    "q_bearing_sectors",     # geo: 8-sector segment-heading histogram
    "q_track_turns",         # geo: signed-cross turn census per track
    "q_track_length_m",      # geo: haversine track length (exact BIGINT mm)
    "q_track_resample",      # geo: uniform arc-length polyline resampling
    "q_time_weighted",       # streaming: time-weighted value integral/user
    "q_wds_export",          # sink: WebDataset tar shards (index oracled)
    "q_cell_mode",           # grouped mode: per-cell modal source (argmax)
    "q_decay_score",         # recency-decayed engagement (exact int shifts)
    "q_window_selfjoin",     # stream-stream interval self-join (attribution)
    "q_cusum_days",          # monitoring: integer CUSUM ingest-drift curve
    "q_missing_slots",       # monitoring: stream-coverage gap detection
    "q_zone_digest_diff",    # incremental: per-zone snapshot digest diff
    "q_seq_pack",            # LLM: token-stream sequence packing chunks
    "q_vec_quantize",        # embeddings: int8 scalar-quantization codes
    "q_street_crossings",    # geo: exact segment-intersection join
    "q_mad_outliers",        # robust stats: median + MAD outlier census
    "q_top_orders",          # TPC-H Q3 shape: one-shuffle join + top-10
    "q_tpch_q5",             # TPC-H Q5 shape: two-exchange star join
    "q_json_props",          # semi-structured JSON column extraction
    "q_image_patches",       # image: ViT patch sums over real PNG decode
    "q_quadtree_leaves",     # geo: adaptive quadtree leaf tiles
    "q_zone_manifest",       # lifecycle: per-partition manifest stats
    "q_nearest_hub",         # geo: nearest-facility (Voronoi) assignment
    "q_late_events",         # streaming: watermark-lateness census
    "q_dup_cluster_sizes",   # curation QA: duplicate-cluster spectrum
    "q_ann_recall",          # curation QA: LSH recall@k vs brute exact
    "q_scene_cuts",          # video: scene-cut census over real decode
    "q_dhash",               # image: content dHash over real decode
    "q_langid_confusion",    # curation QA: language-ID confusion matrix
    "q_image_hist",          # image: luminance histogram over real decode
    "q_image_entropy",       # image: histogram entropy over real decode
    "q_bm25",                # retrieval: BM25 top-20 (broadcast stats)
    "q_sobel_energy",        # image: gradient energy over real decode
    "q_snap_points",         # geo: point→nearest-other-street segment snap
    "q_stay_points",         # geo: trajectory dwell (stay-point) detection
    "q_bfs_levels",          # graph: multi-source BFS hop levels
    "q_sssp",                # graph: weighted shortest paths (3 rounds)
    "q_unpivot",             # schema transform: distributed melt
    "q_tile_overlap",        # geo: zone×tile rectangle-intersection areas
    "q_image_mips",          # image: mip-pyramid census over real decode
    "q_geohash",             # geo: 6-char geohash cell encoding
    "q_lambert93",           # geo: WGS84→Lambert-93 projection (int mm)
    "q_phash_clusters",      # image: near-dup cluster size census (CC)
    "q_pq_codes",            # similarity: product-quantization codes
    "q_od_matrix",           # geo: origin→destination track flow matrix
    "q_speed_spikes",        # geo: GPS implausible-jump census
    "q_track_hausdorff",     # geo: stride-sampled Hausdorff track-pair join
    "q_geofence",            # geo: geofence enter/exit transition extraction
    "q_aspect_buckets",      # image: aspect-ratio bucketing from real bytes
    "q_raster_components",   # geo: raster→vector occupancy-blob extraction
    "q_map_match",           # geo: HMM Viterbi map-matching per track
    "q_source_diversity",    # curation: per-zone source-mix Gini census
    "q_iou_eval",            # vision-eval: bbox IoU match census
    "q_track_frechet",       # geo: discrete Fréchet track-pair distance
    "q_track_dtw",           # geo: DTW alignment cost between track pairs
    "q_minhash_est_err",     # dedup-QA: MinHash estimate vs exact Jaccard
    "q_embed_drift",         # embedding-QA: lag-cosine drift census
    "q_image_pool",          # image: 4×4 grid-pooled luminance from real decode
    "q_hex_cells",           # geo: H3-style axial hex binning
    "q_big_orders",          # TPC-H Q18 shape: HAVING cut + broadcast join-back
    "q_pad_waste",           # LLM: pow-2 length-bucket padding-waste census
    "q_knn_graph",           # geo: bounded-radius exact kNN graph
    "q_rolling_window",      # window: bounded ROWS frame sum per user
    "q_pmi_assoc",           # stats: PMI association census (lang × source)
    "q_range_frame",         # window: RANGE 1h value-frame burst counts
    "q_knn_classify",        # geo/ML: kNN majority-vote zone classifier
    "q_ab_ztest",            # stats: two-sample Welch z census per event type
    # --- driver-green in a prior round (r1-r4 CORRECTNESS) ---
    "q_parse_caption",       # M-series caption → (hn, street, key)
    "q_zone_counts",         # G1 PIP zone assignment counts
    "q_cell_counts",         # cell index encoding (z12 tiles)
    "q_phash_dups",          # §2.8 exact image dedup by phash
    "q_phash_neardup",       # §2.8 Hamming-≤3 phash near-dup (12-bit banding)
    "q_hn_canon",            # M9 canonical housenumber key
    "q_hn_explode",          # M7 OSM multi-number split
    "q_hn_ranges",           # M8 conditional range expansion
    "q_hn_plausible",        # M10 plausibility filters
    "q_fixed_width_parse",   # S4 fixed-width registry parse
    "q_cumul_adresses",      # §3.1 the per-zone merge (addresses)
    "q_cumul_voies",         # §3.1 the per-zone merge (streets)
    "q_export_csv",          # K1/J1/A1-A3 priority coalesce export
    "q_street_json",         # A1/A4/A5 importance + packing export
    "q_export_crosscheck",   # stats_export.sh CSV/SHP/duplicate cross-check
    "q_registry_unmatched",  # J9 anti-join
    "q_voies_sans_adresses", # J10 matched-without-addresses export
    "q_ban_pseudo",          # J11 pseudo-registry augmentation
    "q_min_cp",              # A6 min postal per zone
    "q_tile_zones",          # G9 expire tiles → impacted zones
    "q_tile_zones_arm",      # G9 metropolis rule: arrondissement substitution
    "q_commune_list",        # J12 ARM/COMD commune-list exclusion
    "q_knn_match",           # ST5 cell-local kNN matcher
    "q_places",              # §3.2 lieux-dits merge cascade
    "q_langid",              # text: language ID heuristic
    "q_token_count",         # text: whitespace token counting
    "q_token_bpe",           # text: BPE-ish subword tokenizer count
    "q_quality",             # text: quality scoring
    "q_fingerprint",         # text: rolling-hash fingerprint
    "q_tfidf",               # text: per-doc top-3 TF-IDF terms (broadcast df)
    "q_pii_redact",          # text: PII scan + redaction (RE2 both sides)
    "q_repetition",          # text: Gopher-style repetition quality signals
    "q_decontaminate",       # text: benchmark n-gram decontamination
    "q_term_postings",       # text: truncated inverted index (top-3 postings)
    "q_dedup_exact_docs",    # dedup: exact content hash
    "q_events_hourly",       # streaming-style windowed aggregate
    "q_events_sliding",      # hopping-window (2h/1h) aggregate
    "q_pivot",               # conditional-aggregation pivot by event type
    "q_sessionize",          # gap-based session windows (combiner shape)
    "q_window_funcs",        # per-key ROW_NUMBER / LAG / running SUM windows
    "q_window_ranks",        # per-key RANK/DENSE_RANK/PERCENT_RANK/NTILE
    "q_bigram_lm",           # text: bigram-LM quality scoring (broadcast MLE)
    "q_asof_join",           # as-of join (latest right row per key/ts)
    "q_range_join",          # interval range join (binned, prefix-sum probes)
    "q_hll_registers",       # HyperLogLog sketch registers (mergeable partials)
    "q_hll_by_group",        # per-group HLL distinct sketch
    "q_distinct_per_group",  # exact per-group distinct (combiner pairs)
    "q_hash_sample",         # deterministic min-hash bounded sample
    "q_weighted_sample",     # sequential-Poisson weighted sample (u/w priority)
    "q_cms_counters",        # Count-Min sketch counters (mergeable partials)
    "q_lineitem_pricing",    # relational baseline (TPC-H Q1 shape)
    "q_ann_topk",            # similarity search: brute cosine top-k
    "q_display_expand",      # M15 display-name expansion
    "q_source_counts",       # A11 monitoring counts
    "q_suffix_zones",        # G6/G7/A8/M13 suffix-zone decoration
    "q_communes_json",       # communes JSON export (importance variant)
    "q_pbf_nodes",           # S5 OSM PBF import (write + distributed read)
    "q_zone_raster",         # raster<->vector: polygon rasterization census
    "q_minhash_pairs",       # dedup: MinHash+LSH near-dup pairs (md5 shingles)
    "q_simhash",             # dedup: SimHash signatures (md5 token hashes)
    "q_simhash_neardup",     # dedup: SimHash Hamming-<=3 banding pairs
    "q_embedding_neardup",   # dedup: embedding-cosine near-dups (banded LSH)
    "q_ann_lsh",             # similarity search: LSH-bucketed ANN
]

# rows-only queries (approx algorithms with no exact SQL equivalent)
_ROWSONLY_QUERIES = [
    "q_ann_ivf",             # similarity search: IVF (k-means lists) ANN
    "q_image_roundtrip",     # image payload decode/validate stage
    "q_compress_ratio",      # text: DEFLATE compressibility quality signal
]


def entry() -> Any:
    """Flagship pipeline (spatial join + street aggregation) on sf0.001."""
    from bano_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    import bano_ray.pipelines.queries as Q

    return {name: getattr(Q, name) for name in _ORACLE_QUERIES + _ROWSONLY_QUERIES}


def oracle_sql() -> dict[str, str]:
    import bano_ray.oracle as O

    return {name: getattr(O, name)() for name in _ORACLE_QUERIES}
