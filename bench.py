#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced with a count() (no driver-side collect of payloads);
a warmup pass on sf0.001 triggers JVM/codegen warm paths so the measured
numbers reflect steady-state execution, not JIT noise.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

from npm_mirror_spark.queries import QUERIES
from npm_mirror_spark.session import get_spark

# Headline set: the flagship + one representative per operator family.
HEADLINE = [
    "q_mirror_record",
    "q_scan_project",
    "q_filter_size",
    "q_argmax_latest",
    "q_retention_topn",
    "q_count_events",
    "q_anti_join",
    "q_enrich_join",
    "q_dedup_exact",
    "q_dedup_norm",
    "q_minhash_pairs",
    "q_cosine_topk",
    "q_text_stats",
    "q_union_logs",
    "q_json_decode",
    "q_asof_join",
    "q_sessionize",
    "q_exact_percentiles",
    "q_region_rollup",
    "q_tpch_pricing",
    # round 2: registered scale paths + new join/window/dedup surface
    "q_ivf_dup_pairs",
    "q_session_stats",
    "q_dedup_keepset",
    "q_shipping_priority",
    "q_local_supplier_volume",
    "q_window_funcs",
    "q_normalize",
    "q_cosine_topk_arrow",
    "q_heavy_hitters",
    # round 2: corpus-curation + semantic-dedup + subquery-decorrelation
    "q_gopher_rules",
    "q_decontaminate",
    "q_redact_pii",
    "q_pack_sequences",
    "q_semdedup",
    "q_order_priority_check",
    "q_funnel",
    "q_chunk_tokens",
    "q_pack_blocks",
    "q_returned_item_revenue",
    # round 2b: wider TPC-H surface, grouping sets, time series, stats
    "q_market_share",
    "q_supplier_part_count",
    "q_cube_counts",
    "q_set_ops",
    "q_gap_fill",
    "q_cohort_retention",
    "q_event_cooccurrence",
    "q_zscore_outliers",
    "q_group_percentiles",
    "q_corr_moments",
    "q_best_supplier",
    "q_sliding_window",
    "q_last_touch",
    "q_rrf_fusion",
    "q_doc_rarity",
    "q_nation_profit",
    "q_mad",
    "q_forecast_revenue",
    "q_customer_order_dist",
]

# r5 growth: the r4/r5 additions benched on top of the r2 58-query set.
# The JSON line carries BOTH totals — "value" covers everything, and
# "common58_sec" sums only the r2 set so round-over-round comparison
# stays apples-to-apples (docs/BENCH_NOTES.md).
HEADLINE_R5 = [
    "q_cap_per_source",
    "q_source_overlap",
    "q_event_transitions",
    "q_variant_decode",
    "q_cluster_split",
    "q_edit_distance",
    # late-r5 additions: compressed-index ANN, substring-dedup spans,
    # and lexical ranked retrieval
    "q_ann_pq",
    "q_dup_spans",
    "q_bm25",
    "q_bloom_new_customers",
    "q_ann_sq8",
    "q_lm_nll",
    "q_hybrid_search",
    "q_srp_pairs",
    "q_kmeans",
    "q_quality_classifier",
    "q_ann_ivf_trained",
    "q_bpe_encode",
    "q_lm_bigram",
    "q_url_filter",
    "q_embed_text",
    "q_vocab_growth",
    "q_pagerank",
    "q_corpus_report",
    "q_classifier_eval",
    "q_pr_curve",
]
COMMON_58 = list(HEADLINE)
HEADLINE = HEADLINE + HEADLINE_R5
# Frozen r5-final headline (58 + 26): "common84_sec" is the long-series
# marker that gives r6+ a like-for-like on the trainers too; r6+ query
# additions extend HEADLINE but never this list (docs/BENCH_NOTES.md).
COMMON_84 = list(HEADLINE)

# r6 additions: leakage audit, epoch shuffling, exact-replay sketches.
HEADLINE_R6 = [
    "q_contamination_report",
    "q_epoch_shuffle",
    "q_count_min",
    "q_hll_replay",
    "q_url_canon",
    "q_split_assign",
    "q_token_budget",
    "q_cut_contaminated",
    "q_line_filter",
    "q_containment",
    "q_lang_margin",
    "q_binned_quantiles",
]
HEADLINE = HEADLINE + HEADLINE_R6

# r7 additions: directed PageRank (dangling fold), release composition.
HEADLINE_R7 = [
    "q_pagerank_directed",
    "q_release_cut",
    "q_zorder",
    "q_quality_checks",
    "q_skew_report",
    "q_join_size_est",
    "q_temperature_sample",
    "q_hll_setops",
    "q_triangles",
    "q_hll_by_group",
    "q_record_linkage",
    "q_jaccard_exact",
    "q_quantiles_by_group",
    "q_drift_report",
    "q_kcore",
    "q_trend_by_group",
    "q_quantile_bins",
    "q_calibration",
    "q_pagerank_seeded",
    "q_assoc_rules",
    "q_drift_weekly",
    "q_seasonal_outliers",
    "q_weighted_median",
    "q_source_gini",
]
HEADLINE = HEADLINE + HEADLINE_R7

# r8 additions: graph estimators/communities, validation-audit tier,
# libm-free two-sample statistics, boundary-sweep coverage, skyline.
HEADLINE_R8 = [
    "q_triangle_est",
    "q_communities",
    "q_validated_batch",
    "q_token_drift",
    "q_edit_join",
    "q_decay_counts",
    "q_luhn_scan",
    "q_hll_weekly",
    "q_dedup_lines",
    "q_quantile_norm",
    "q_fk_audit",
    "q_winsorized_mean",
    "q_kmv_distinct",
    "q_benford",
    "q_rank_sum",
    "q_ks_stat",
    "q_cusum",
    "q_autocorr",
    "q_interval_coverage",
    "q_collocations",
    "q_hhi",
    "q_simpson",
    "q_fd_violations",
    "q_skyline",
]
HEADLINE = HEADLINE + HEADLINE_R8
# Frozen r8-final headline (144 queries): "common_r8_sec" is the modern
# like-for-like window for r9+ — common-58/84 are r2/r5-era and no longer
# span most of the registry.  r9+ additions extend HEADLINE but never
# this list (r8 verdict item 7; docs/BENCH_NOTES.md).
COMMON_R8 = list(HEADLINE)

# r9 additions: the five wired stat/audit operators (r8 verdict item 2)
# plus the depth-2 FastSS fuzzy join.
HEADLINE_R9 = [
    "q_spearman",
    "q_runs_test",
    "q_mann_kendall",
    "q_kanonymity",
    "q_chisq",
    "q_edit2_join",
]
HEADLINE = HEADLINE + HEADLINE_R9

# r10 additions: robust/agreement stats, leakage-safe split, two-pass
# heavy hitters, paired-classifier McNemar.
HEADLINE_R10 = [
    "q_theilsen",
    "q_kappa",
    "q_cochran_armitage",
    "q_mad_outliers",
    "q_leakage_split",
    "q_hh_twopass",
    "q_mcnemar",
]
HEADLINE = HEADLINE + HEADLINE_R10

# r10 late batch: k-sample/parametric stats, graph tier 2, PPS
# sampling, lexical diversity.
HEADLINE_R10B = [
    "q_welch_t",
    "q_kruskal",
    "q_kendall_tau",
    "q_anova_cells",
    "q_hits",
    "q_bfs_hops",
    "q_link_pred",
    "q_assortativity",
    "q_systematic_sample",
    "q_lexical_diversity",
    "q_poisson_bootstrap",
    "q_gini_split",
    "q_changepoint",
]
HEADLINE = HEADLINE + HEADLINE_R10B

# r12 registrations: the r11-staged batch (faces_r12.py), lifted into
# the registry this round — blocked/ordinal stats, survival cells,
# vocab folds, the dedup recall audit and the Hilbert layout audit.
HEADLINE_R12 = [
    "q_friedman",
    "q_brown_forsythe",
    "q_jonckheere",
    "q_durbin_watson",
    "q_gk_gamma",
    "q_cochran_q",
    "q_vocab_coverage",
    "q_km_events",
    "q_mood_median",
    "q_vocab_richness",
    "q_capture_recapture",
    "q_hilbert_audit",
]
HEADLINE = HEADLINE + HEADLINE_R12


# Throttle-control probe (frozen): five pure projections whose code and
# plan shape never change round-over-round.  Timed at sweep START and END;
# their absolute time calibrates the host's speed for THIS run (the r6
# verdict documented same-commit spreads of 1.25x-4x on this box), and the
# end/start ratio exposes within-run drift.  Compare probe_sec across
# BENCH_r{N}.json files before reading anything into a common-58 delta.
PROBE = [
    "q_normalize",
    "q_scan_project",
    "q_split_last",
    "q_ts_parse",
    "q_json_decode",
]


def _time_probe(spark, sf_dir: str) -> float:
    t = 0.0
    for name in PROBE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        t += time.perf_counter() - t0
    return round(t, 3)


def _bench_pipeline(spark, n_changes: int) -> float:
    """End-to-end mirror-pipeline throughput (the reference's actual job):
    parse -> route -> project -> dedup -> multi-sink, changes/sec."""
    import shutil
    import tempfile

    from npm_mirror_spark.sources.changes import generate_changes, write_jsonl
    from npm_mirror_spark.streaming.pipeline import MirrorPipeline

    work = tempfile.mkdtemp(prefix="bench_pipeline_")
    try:
        feed = os.path.join(work, "feed")
        os.makedirs(feed)
        write_jsonl(
            generate_changes(n=n_changes, seed=42, redelivery_rate=0.02),
            os.path.join(feed, "changes.jsonl"),
        )
        p = MirrorPipeline(spark, os.path.join(work, "out"))
        t0 = time.perf_counter()
        p.run_batch(feed)
        dt = time.perf_counter() - t0
        return round(n_changes / dt, 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="npm-mirror-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup at the smallest SF: JVM classloading + codegen, not data
    for name in HEADLINE:
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
        spark.catalog.clearCache()

    probe_start = _time_probe(spark, sf_dir)

    # r14 measurement-bug fix (documented in OPTIMIZATION_r14.md):
    # operator-internal persists are deliberately not unpersisted when a
    # face's DataFrame is discarded (docs/SCALE.md persist policy), and
    # CacheManager holds strong refs, so a 200-face single-session sweep
    # accumulates dead cached blocks until GC pressure inflates the
    # LATER faces 4-6x over their isolated steady state (measured:
    # q_kmeans 29.1 s in-bench vs 4.5-5.0 s via tools/stage_audit.py).
    # Releasing the previous face's caches BETWEEN timed regions — the
    # same per-face hygiene tools/full_sweep.py and tools/stage_audit.py
    # already apply — restores steady-state timing.  The timed action is
    # unchanged; every face still computes from parquet inside its own
    # timed region.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    probe_end = _time_probe(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    common58 = round(sum(timings[n] for n in COMMON_58), 3)
    common84 = round(sum(timings[n] for n in COMMON_84), 3)
    common_r8 = round(sum(timings[n] for n in COMMON_R8), 3)

    # r8 verdict item 6: the pipeline leg had no probe around it, so a
    # host-speed dip during that leg was unattributable.  Bracket it with
    # the same frozen probe; pipeline_throttle_ratio compares the host's
    # speed DURING the pipeline leg to the sweep start, and
    # pipeline_corrected rescales the rate accordingly (a rate scales
    # inversely with host time, hence multiply).
    probe_pipe_before = _time_probe(spark, sf_dir)
    pipeline_rate = _bench_pipeline(spark, n_changes=int(20_000 * max(sf, 0.01) / 0.1))
    probe_pipe_after = _time_probe(spark, sf_dir)
    pipe_ratio = (
        round(((probe_pipe_before + probe_pipe_after) / 2) / probe_start, 3)
        if probe_start > 0
        else None
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "common58_sec": common58,
                "common84_sec": common84,
                # host-noise calibration: probe_sec is the frozen 5-query
                # projection probe (cross-round comparable — the probe code
                # never changes); throttle_ratio = end/start within THIS run
                "probe_start_sec": probe_start,
                "probe_end_sec": probe_end,
                "probe_sec": min(probe_start, probe_end),
                "throttle_ratio": round(probe_end / probe_start, 3)
                if probe_start > 0
                else None,
                # throttle-corrected totals (r7 verdict item 7): divide the
                # raw sums by throttle_ratio so the recorded number carries
                # its own calibration arithmetic.  Assumes the end-of-sweep
                # host speed held for the whole sweep — a deliberate
                # worst-case correction (ramped slowdowns land between raw
                # and corrected); both raw and corrected are emitted.
                "common58_corrected": round(
                    common58 / (probe_end / probe_start), 3
                )
                if probe_start > 0 and probe_end > 0
                else None,
                "common84_corrected": round(
                    common84 / (probe_end / probe_start), 3
                )
                if probe_start > 0 and probe_end > 0
                else None,
                # frozen r8-final window (144 queries) for r9+ like-for-like
                "common_r8_sec": common_r8,
                "common_r8_corrected": round(
                    common_r8 / (probe_end / probe_start), 3
                )
                if probe_start > 0 and probe_end > 0
                else None,
                "pipeline_changes_per_sec": pipeline_rate,
                # probe bracket around the pipeline leg (r8 verdict item 6)
                "pipeline_probe_before_sec": probe_pipe_before,
                "pipeline_probe_after_sec": probe_pipe_after,
                "pipeline_throttle_ratio": pipe_ratio,
                "pipeline_corrected": round(pipeline_rate * pipe_ratio, 1)
                if pipe_ratio
                else None,
                # scaling-contract observability (r14 verdict item 2,
                # additions-only): echo the core count the run actually
                # honored so a driver re-run at lower $SPARK_GRAFT_CPUS can
                # verify the contract from the output alone, plus a content
                # hash of this harness so any future bench.py drift is
                # self-reporting instead of relying on an external diff.
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                "master": spark.sparkContext.master,
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "shuffle_partitions": int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                ),
                "bench_rev": hashlib.sha256(
                    open(__file__, "rb").read()
                ).hexdigest()[:12],
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
