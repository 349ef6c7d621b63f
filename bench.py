"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Default: times the flagship transcript pipeline (on a deterministic
generated corpus sized to the sf dir) plus representative operator
queries on the sf tables, printing ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}

--scaling: runs the headline twice in FRESH processes at num_cpus=8 and
num_cpus=32 on the same input and reports both throughputs plus the
scaling efficiency T(32)/(4*T(8)) (the sandbox stand-in for the
N->4N-node criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench corpus sizing per sf (turns ~ 6.5 * n_convs + giants)
_CORPUS_SPEC = {
    "sf0.001": dict(n_convs=1_000, n_giants=1, giant_turns=3_000, n_files=8),
    "sf0.01": dict(n_convs=10_000, n_giants=2, giant_turns=5_000, n_files=8),
    "sf0.1": dict(n_convs=90_000, n_giants=2, giant_turns=10_000, n_files=16),
}


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def bench_corpus_dir(sf_dir: str) -> str:
    """Deterministic transcript corpus matched to the sf scale (cached)."""
    tag = _sf_tag(sf_dir)
    spec = _CORPUS_SPEC.get(tag, _CORPUS_SPEC["sf0.01"])
    out = f"/tmp/luzzu_bench_corpus/{tag}"
    marker = os.path.join(out, ".complete-v1")
    if not os.path.exists(marker):
        import shutil

        from luzzu_ray.datagen import generate_corpus

        shutil.rmtree(out, ignore_errors=True)
        n = generate_corpus(out, **spec)
        print(f"generated {n} turns at {out}", file=sys.stderr)
        open(marker, "w").close()
    return out


def _count_turns(corpus: str) -> int:
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(corpus, "*.parquet"))
    )


def run_headline(corpus: str, out_dir: str) -> float:
    """Full flagship pipeline, read -> ... -> write_parquet; returns sec."""
    import shutil

    from luzzu_ray.pipelines.filter_pipeline import run_flagship

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    ds = run_flagship(corpus)
    ds.write_parquet(out_dir)
    return time.monotonic() - t0


def _init_ray(num_cpus: int) -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
        log_to_driver=False,  # keep stdout to exactly one JSON line
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def _fresh_headline(num_cpus: int, corpus: str) -> dict:
    """One headline measurement in a FRESH process (same protocol as
    --scaling).  Back-to-back flagship runs inside one Ray session
    measure 2-3x slower on this host (object-store/heap churn between
    runs), so in-session numbers are not comparable to BASELINE.md."""
    proc = subprocess.run(
        [sys.executable, __file__, "--_single", str(num_cpus), corpus],
        capture_output=True, text=True, check=True,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    # headline on the SAME 10x-replicated corpus as the BASELINE.md
    # scaling rows (6M turns at sf0.1) so turns/s is steady-state and
    # directly comparable; the small-corpus run (startup-dominated at
    # ~600k turns) is reported alongside as flagship_smallcorpus.
    small_corpus = bench_corpus_dir(SF_DIR)
    corpus = scaling_corpus_dir(SF_DIR)
    n_turns = _count_turns(corpus)
    small_res = _fresh_headline(NUM_CPUS, small_corpus)
    big_res = _fresh_headline(NUM_CPUS, corpus)
    headline = big_res["sec"]
    small_sec = small_res["sec"]
    q: dict[str, float] = {
        "flagship_transcripts": round(headline, 3),
        "flagship_smallcorpus": round(small_sec, 3),
    }
    _init_ray(NUM_CPUS)

    import __ray_entry__ as E

    qs = E.queries()
    for name in (
        "flagship_documents",
        "dedup_exact",
        "minhash_dedup",
        "embedding_neardup",
        "doc_scrub",
        "ann_topk",
        "tpch_q1",
        "events_sessions",
        # round-3 additions
        "vocab_topk",
        "doc_tfidf_terms",
        "doc_global_rank",
        "render_user_streams",
        "top_docs_per_source",
        "collapse_repeats",
        "events_value_delta",
        # round-3 session-3 additions
        "frequent_tokens",
        "fuzzy_prefix_pairs",
        "sq8_ann_topk",
        "events_cohort_retention",
        # round-3 session-4 additions
        "customer_order_counts_left",
        "bigram_next_top3",
        "bpe_pair_top20",
        "profile_documents",
        "pca_project2",
        "latest_event_per_user",
        # round-3 session-5 additions
        "token_cooccurrence",
        "neardup_keep_best",
        "events_user_value_mad",
        "doc_compression_ratio",
        "token_cms_counts",
        "prefix_contained",
        "events_value_winsorized",
        "lines_urgency_salted",
        # round-3 session-6 additions
        "tpch_q18",
        "part_cooc_triangles",
        "part_cooc_pagerank",
        "bm25_topk",
        "doc_unicode_stats",
        "bpe_merges",
        "audio_features",
        "part_cooc_walks",
        "bpe_encode_counts",
        "doc_bigram_surprisal",
        "events_user_growth",
        "users_intersect",
        "validate_documents",
        # round-4 additions
        "embedding_neardup_lsh",
        "semantic_dedup",
        "events_distinct_hll_est",
        "bpe_merges_sampled",
        "events_user_value_quantiles_cont",
        "streaming_dedup",
        # round-4 session-2 additions
        "dup_span_docs",
        "dsir_importance",
        "label_prototypicality",
        "tpch_q17",
        "tpch_q2",
        "ann_rrf_fusion",
        "events_value_moments",
        # round-4 session-3 additions
        "pq_ann_topk",
        "ivfpq_ann_topk",
        "sft_context_examples",
        "vocab_coverage",
        "image_phash_dedup",
        "image_neardup_pairs",
        "audio_fp_dedup",
        "audio_neardup_pairs",
        "video_fp_dedup",
        "documents_jsonl_roundtrip",
        "ann_recall_eval",
        "events_funnel3",
        "training_data_pipeline",
        "kmeans_clusters",
        "tpch_q7",
        "tpch_q8",
        "tpch_q9",
        "tpch_q13",
        "tpch_q21",
        # round-4 session-4 additions
        "conv_structure_audit",
        "knn_graph",
        "events_user_distinct_hll",
        "flagship_multiturn",
        "render_conversations",
        "sft_multiturn_examples",
        "events_running_total",
        "quality_score_auc",
        "events_session_hours",
        "conv_turn_stats",
        "conv_minhash_dedup",
        "events_hll_incremental",
        "langid_confusion",
        "epoch_shuffle",
        "events_centered_window",
        "source_divergence",
        "conv_structure_audit_salted",
        "conv_dedup_exact",
        "events_value_trimmed",
        "ppl_docs",
        # round-4 session-5 additions
        "source_overlap",
        "neardup_cluster_sizes",
        "source_len_ks",
        "clf_pr_curve",
        "filter_agreement",
        "role_transitions",
        "tool_usage",
        "containment_pairs",
        "doc_repetition",
        "conv_truncate",
        "top_dup_turns",
        "conv_time_stats",
        "cross_source_dups",
        # round-4 session-6 additions
        "ccnet_ppl_buckets",
        "doc_novelty_frac",
        "doc_token_diversity",
        "kanon_risky_docs",
        "pii_leak_by_role",
        "events_hourly_spikes",
        "filter_ablation_grid",
        "assistant_copy_rate",
        "surprisal_by_role",
        "bucketed_join_orders",
        "fertility_by_lang",
        "doc_len_outliers",
        "source_sampling_weights",
        "events_value_equidepth",
        "events_user_simpson",
        "neardup_index_probe",
        "quality_calibration",
        "docs_grouping_sets",
        # round-4 session-7 additions
        "zorder_prune_events",
        "doc_nfc_normalize",
        "bitext_mutual_pairs",
        "part_cooc_lpa",
        "c4_line_filter",
        "kcenter_select",
        "hard_negatives",
        "preference_pairs",
        "activity_window_overlap",
        "documents_orc_roundtrip",
        "events_bootstrap_means",
        "doc_skyline",
        "dedup_bow",
        "source_kendall",
        "url_normalize",
        "url_dedup",
        "host_blocklist",
        "html_strip",
        "topp_by_source",
        "cdc_chunk_stats",
        "conv_retry_stats",
        "topic_bucket_docs",
        "host_quality_stats",
        "web_pipeline",
        "watermark_stats",
        "conv_pii_propagate",
        "perceptron_weights",
        "doc_readability",
        "events_decayed_value",
        "perceptron_confusion",
        "part_cooc_linkpred",
        "minhash_recall_eval",
        "events_interarrival_hist",
        "events_window_dup",
        "conv_lang_switches",
        "split_leakage_audit",
        "rag_chunk_dedup",
        # round-5 additions
        "kcenter_sampled",
        "training_pipeline_neardup",
        "embedding_neardup_lsh_sq8",
        "length_bucket_batches",
        "borda_quality_topk",
        "temperature_mixture",
        "fim_examples",
        "winnowing_fp",
        "conv_canned_phrases",
        "curriculum_order",
        "jl_project",
        "contrastive_crops",
        "pack_offsets",
        "rdf_subject_stats",
        "rdf_conciseness",
        "rdf_dangling_links",
        "punct_normalize",
        "event_type_bigrams",
        "winnow_overlap_pairs",
        "events_user_mode_type",
        "label_centroid_dots",
        "script_mix",
        "conv_pack",
        "cluster_safe_split",
        "corpus_quality_card",
        "top_boilerplate_lines",
        "conv_tool_bigrams",
        "semdedup_recall_eval",
        "rdf_parse_report",
        "doc_hapax_rate",
    ):
        t0 = time.monotonic()
        res = qs[name](SF_DIR)
        import ray.data

        if isinstance(res, ray.data.Dataset):
            # consume the stream without materializing to the driver
            n = 0
            for b in res.iter_batches(batch_format="pyarrow"):
                n += b.num_rows
        q[name] = round(time.monotonic() - t0, 3)

    out = {
        "metric": "flagship transcript pipeline wall time (10x corpus)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": q,
        "sf": _sf_tag(SF_DIR),
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
        "n_turns_small": _count_turns(small_corpus),
        "smallcorpus_sec": round(small_sec, 3),
        "host_variance_note": (
            "this host oscillates ~2x between identical runs minutes "
            "apart (BASELINE.md round-2 notes: 10x leg measured 114.8s "
            "to 270.1s, small leg 17.5s to 39.5s, same code); compare "
            "against the BASELINE.md range, not a single number"
        ),
    }
    print(json.dumps(out))
    import ray

    ray.shutdown()


SCALING_REPLICATION = 10


def scaling_corpus_dir(sf_dir: str) -> str:
    """10x-replicated corpus for the scaling legs (conv_ids remapped).

    The N->4N criterion targets multi-node 10^12-turn runs where fixed
    startup (actor spin-up, shuffle setup, warm-up) is invisible; at
    600k turns those fixed ~20s dominate a 40s run and would measure
    startup, not scaling.  Replicating the deterministic corpus 10x
    (6.1M turns) amortizes them honestly.
    """
    import glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    base = bench_corpus_dir(sf_dir)
    tag = _sf_tag(sf_dir)
    out = f"/tmp/luzzu_bench_corpus/{tag}_x{SCALING_REPLICATION}"
    marker = os.path.join(out, ".complete-v1")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out)
        for f in sorted(glob.glob(os.path.join(base, "*.parquet"))):
            t = pq.read_table(f)
            stem = os.path.basename(f)[:-len(".parquet")]
            for rep in range(SCALING_REPLICATION):
                conv = pc.binary_join_element_wise(
                    pa.scalar(f"r{rep}-"), t["conv_id"], ""
                ) if rep else t["conv_id"]
                t2 = t.set_column(
                    t.schema.get_field_index("conv_id"), "conv_id", conv
                )
                pq.write_table(t2, os.path.join(out, f"{stem}-r{rep}.parquet"))
        open(marker, "w").close()
    return out


def single_run(num_cpus: int, corpus: str | None = None) -> None:
    """Internal: one fresh-process headline measurement (for --scaling)."""
    corpus = corpus or bench_corpus_dir(SF_DIR)
    n_turns = _count_turns(corpus)
    _init_ray(num_cpus)
    sec = run_headline(corpus, f"/tmp/luzzu_bench_out/scaling_{num_cpus}")
    print(json.dumps(
        {"num_cpus": num_cpus, "sec": sec, "turns_per_sec": n_turns / sec}
    ))
    import ray

    ray.shutdown()


SCALING_REPS = int(os.environ.get("LUZZU_SCALING_REPS", "2"))
# N and 4N parallelism levels; override e.g. LUZZU_SCALING_CPUS=4,16 for
# a narrower pair when external host load contends with the 32-wide leg
SCALING_CPUS = tuple(
    int(x) for x in os.environ.get("LUZZU_SCALING_CPUS", "8,32").split(",")
)


def scaling() -> None:
    """Interleaved fresh-process legs, SCALING_REPS repetitions per CPU
    level, fastest leg per level (the standard noise-robust estimator —
    this host's documented external-contention phases inflate single
    legs by up to 2x, see BASELINE.md round-2 notes)."""
    corpus = scaling_corpus_dir(SF_DIR)  # pre-generate outside the timed runs
    lo, hi = SCALING_CPUS
    legs: dict[int, list[dict]] = {lo: [], hi: []}
    for _rep in range(SCALING_REPS):
        for cpus in (lo, hi):  # interleave so a host phase hits both levels
            proc = subprocess.run(
                [sys.executable, __file__, "--_single", str(cpus), corpus],
                capture_output=True, text=True, check=True,
            )
            legs[cpus].append(json.loads(proc.stdout.strip().splitlines()[-1]))
    best = {c: min(rs, key=lambda r: r["sec"]) for c, rs in legs.items()}
    t8, t32 = best[lo]["turns_per_sec"], best[hi]["turns_per_sec"]
    eff = t8 and t32 / ((hi / lo) * t8)
    print(json.dumps(
        {
            "metric": f"scaling efficiency T({hi}cpu)/({hi // lo}*T({lo}cpu))",
            "value": round(eff, 3),
            "unit": "ratio",
            f"throughput_{lo}cpu_turns_per_sec": round(t8, 1),
            f"throughput_{hi}cpu_turns_per_sec": round(t32, 1),
            f"sec_{lo}cpu": round(best[lo]["sec"], 2),
            f"sec_{hi}cpu": round(best[hi]["sec"], 2),
            f"sec_{lo}cpu_all": [round(r["sec"], 2) for r in legs[lo]],
            f"sec_{hi}cpu_all": [round(r["sec"], 2) for r in legs[hi]],
            "reps_per_level": SCALING_REPS,
            "estimator": "fastest leg per CPU level (host contention noise)",
            "sf": _sf_tag(SF_DIR),
        }
    ))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        scaling()
    elif len(sys.argv) > 2 and sys.argv[1] == "--_single":
        single_run(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        main()
