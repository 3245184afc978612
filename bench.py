"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Timing is end-to-end plan execution into the `noop` sink — full scan /
shuffle / aggregation work, no driver-side collect skew.  One warmup
query first so JVM/codegen startup is not billed to the first query.

Protocol (round-9 verdict item 2): MIN-OF-TWO per query, back-to-back.
Round 8's driver bench showed four consecutive queries reading 7-30x
their warm local numbers while their own sub-chains ran normally in
the same JVM — a time-correlated host epoch, not a plan regression.
A single cold reading cannot distinguish the two; the immediate second
run can (a stalled run1 with a normal run2 = host; both slow = plan).
Both passes are recorded in BENCH_DETAIL.json (`runs`), the headline
number is the per-query min.  Set SPARK_GRAFT_BENCH_RUNS=1 to restore
the single-pass protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

from activity_classifier_spark_cassandra_spark.session import get_spark

import __spark_entry__ as entrymod

# Headline set: the flagship pipeline, the shuffle-heavy relational
# shapes, each LLM-data-pipeline family, streaming-in-batch, and one
# model fit.  Names must exist in __spark_entry__.queries().
HEADLINE = [
    "q_session_features",
    "q_sessionize",
    "q_stream_session_features",
    "q_stream_windowed_features",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q_window_rank",
    "q_minmax_ts",
    "q_salted_agg",
    "q_asof_join",
    "q_range_join",
    "q_moving_avg",
    "q17_small_quantity",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_orders",
    "q_train_test_split",
    "q_funnel",
    "q_retention",
    "q_upsert_compact",
    "q_zscore_anomaly",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash",
    "q_simhash",
    "q_simhash_near_dup",
    "q_dedup_clusters",
    "q_dedup_embedding",
    "q_knn_brute",
    "q_knn_pandas",
    "q_text_stats",
    "q_tfidf_top_terms",
    "q_doc_fingerprint",
    "q_ml_predict_counts",
    "q_decontaminate",
    "q_chunk_sequences",
    # added in round 4 (headline grew — compare per-query across rounds,
    # not totals): the repaired ts family + the new operators
    "q_session_features_3axis",
    "q_scd2",
    "q_time_rollup",
    "q_event_transitions",
    "q_resample_gapfill",
    "q_daily_active",
    "q_stream_sliding_features",
    "q_bigram_logprob",
    "q_bm25_search",
    "q_group_topk_sample",
    # added in round 5: the tolerance-gated sketch agg and the
    # multi-probe IVF ANN path
    "q_approx_sketch",
    "q_knn_ivf_multiprobe",
    # added in round 5b: probabilistic structures, view maintenance,
    # layout
    "q_heavy_hitters_cms",
    "q_bloom_join_prune",
    "q_incremental_agg",
    "q_zorder_layout",
    "q_pack_greedy",
    "q_bpe_pair_stats",
    "q_temperature_sample",
    # added in round 5c: span-level exact-substring dedup, file-level
    # manifest pruning, weighted bottom-k sampling
    "q_span_dedup",
    "q_file_prune_manifest",
    "q_weighted_sample",
    "q_pagerank",
    "q_skipgram_pairs",
    "q_session_paths",
    "q_pmi_collocations",
    "q_shuffle_sample",
    "q_snapshot_diff",
    "q_user_trend",
    "q_label_centroids",
    "q_schema_evolution",
    # added in round 6: trained-quantizer ANN, tokenizer training loop,
    # CDC deletes, quantization, contrastive mining, index eval
    "q_knn_ivf_trained",
    "q_bpe_merges",
    "q_bpe_tokenize",
    "q_bpe_compression",
    "q_session_features_skewres",
    "q_upsert_with_deletes",
    "q_int8_quantize",
    "q_hard_negatives",
    "q_ann_recall_eval",
    "q_knn_int8",
    "q_contrastive_triplets",
    "q_knn_pq",
    "q_knn_ivfpq",
    "q_audio_features",
    "q_hybrid_search_rrf",
    "q_mmr_rerank",
    "q_drift_psi",
    "q_dedup_recall_eval",
    # added in round 7 second batch: cascade edit-distance verify,
    # rank-discounted retrieval eval, distributed power-iteration PCA
    "q_dedup_edit_distance",
    "q_ndcg_eval",
    "q_pca_power",
    "q_dedup_minhash_cc",
    "q_winnow_overlap",
    "q_kn_logprob",
    "q_dsir_weights",
    "q_gopher_rules",
    "q_dedup_apply",
    "q_ppl_buckets",
    "q_matryoshka_eval",
    # added in round 7 third batch: SemDeDup over trained k-means,
    # GD-trained hashed quality classifier, embedding decontamination
    "q_semdedup",
    "q_quality_classifier",
    "q_decontaminate_semantic",
    "q_dsir_sample",
    "q_domain_mix_budget",
    # added in round 8: perceptual-hash image near-dup, end-to-end
    # span dedup apply
    "q_phash_near_dup",
    "q_span_dedup_apply",
    "q_jpeg_features",
    # added in round 8 second batch: NN-descent graph ANN, full JPEG
    # pixel decode, candidate-graph triangles, binary-sign kNN, ORC
    "q_knn_graph",
    "q_knn_graph_search",
    "q_knn_graph_insert",
    "q_graph_recall_eval",
    "q_jpeg_decode",
    "q_triangle_count",
    "q_knn_binary",
    "q_orc_roundtrip",
    "q_stream_simhash_near_dup",
    # added in round 9: BLAS-assignment SemDeDup (production variant),
    # rebuild-vs-insert freshness/recall policy audit
    "q_semdedup_blas",
    "q_graph_insert_policy",
    "q_span_dedup_multik",
    "q_coreset_kcenter",
    "q_jl_recall_eval",
    "q_paragraph_dedup",
    "q_knn_graph_q8",
    # added in round 10: IVF-routed entry vertices (the growing-N
    # serving path), longest-match span resolution, URL-level dedup
    "q_knn_graph_routed",
    "q_span_dedup_longest",
    "q_span_dedup_apply_longest",
    "q_url_dedup",
    "q_stream_url_dedup",
    "q_bitext_mine",
    # added in round 11: full-corpus IVF-bounded bitext mining,
    # graph-index erasure (delete + repair)
    "q_bitext_mine_corpus",
    "q_knn_graph_delete",
    "q_knn_graph_update",
    "q_video_frames",
    "q_video_near_dup",
    # added in round 12: shingle-banded (trim-robust) video near-dup,
    # streaming graph-index ingest over the saved index
    "q_video_near_dup_shingle",
    "q_stream_graph_ingest",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Scaling-run transparency (round-12 verdict item 2): shuffle
    # partitions default to the core count (the long-standing local
    # contract) but can be PINNED via env for low-core scaling A/Bs,
    # so "fewer cores" does not also mean "fewer, better-sized
    # partitions" in the same measurement.
    shuffle_parts = int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    spark = get_spark(
        app_name="activity_classifier_spark_cassandra_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_parts,
    )
    qs = entrymod.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q1_pricing_summary")  # warmup (JVM + codegen + parquet footer)

    # Calibration query (round-12 verdict item 7): fixed synthetic work
    # independent of sf_dir, timed and REPORTED but never added to the
    # headline total — lets cross-epoch totals be normalized instead of
    # argued about (the documented host-epoch drift inflates identical
    # code +30-70%).
    def calibrate() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 64)
            .selectExpr("xxhash64(id) % 1024 AS k", "id")
            .groupBy("k")
            .agg({"id": "sum"})
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    calib_sec = round(min(calibrate(), calibrate()), 3)

    # Graph-index build accounting (round-12 verdict item 3): the
    # session-scoped build memo means nine graph queries share one
    # deterministic build per variant.  Warm the memos HERE, timed, so
    # the build cost is its own visible line instead of landing inside
    # whichever graph query happens to run first (run0), and every
    # graph query's per-run numbers measure serving/CRUD only.  The
    # builds are computed from the parquet inputs inside THIS timed
    # region on every invocation — nothing persists across runs.
    # Excluded from the headline total: the r11/r12 min-of-two totals
    # were serving-only too (run1 always hit the memo), so including
    # it would break cross-round total comparability.
    def build_graphs() -> float:
        from activity_classifier_spark_cassandra_spark.operators import (
            graph_ann as GA,
        )

        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("graph-index builds (memo warm)")
        GA.memo_graph_exact(spark, sf_dir)
        GA.memo_graph_q8(spark, sf_dir)
        GA.memo_graph_q8_old(spark, sf_dir)
        GA.memo_route_cents(spark, sf_dir)
        spark.sparkContext.setJobDescription(None)
        return time.perf_counter() - t0

    graph_build_sec = round(build_graphs(), 3)

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    runs: list[dict[str, float]] = [{} for _ in range(n_runs)]
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = -1.0
        for i in range(n_runs):
            try:
                t = round(run(name), 3)
            except Exception as e:  # keep the bench line parseable
                print(f"bench: {name} failed: {e}", file=sys.stderr)
                t = -1.0
            runs[i][name] = t
            if t >= 0 and (best < 0 or t < best):
                best = t
            if t < 0:
                break  # don't re-run a failing query
        timings[name] = best
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The driver's stdout capture is bounded (~3.5 KB): a single line
    # carrying all ~100 per-query timings gets truncated mid-JSON and
    # BENCH_r{N}.json records "parsed": null (happened rounds 6-7).
    # So: full per-query map goes to a sidecar file; stdout gets ONE
    # compact line (summary + the 10 slowest) that always fits.
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "n_runs": n_runs,
        "n": len(timings),
        "sf": sf_val,
        "cpus": int(cpus),
        "parallelism": spark.sparkContext.defaultParallelism,
        "shuffle_partitions": shuffle_parts,
        "calib_sec": calib_sec,
        "graph_build_sec": graph_build_sec,
    }
    # Per-core-count detail file (round-12 verdict item 2: the c8
    # scaling run used to clobber the c32 per-query record) plus the
    # legacy name for anything that reads it.
    here = os.path.dirname(os.path.abspath(__file__))
    detail_name = f"BENCH_DETAIL_c{int(cpus)}.json"
    for fname in (detail_name, "BENCH_DETAIL.json"):
        with open(os.path.join(here, fname), "w") as fh:
            json.dump(detail, fh)
            fh.write("\n")
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n": len(timings),
                "n_runs": n_runs,
                "sf": sf_val,
                "cpus": int(cpus),
                "parallelism": spark.sparkContext.defaultParallelism,
                "calib_sec": calib_sec,
                "graph_build_sec": graph_build_sec,
                "detail_file": detail_name,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
