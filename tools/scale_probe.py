"""sf1-equivalent scale/memory probe (VERDICT r7 item 7 -> SCALE.md).

Runs the heaviest registry entries against the tools/make_sfprobe.py dataset
(10x sf0.1: lineitem 6M / orders 1.5M / events 1M / documents 50k /
embeddings 20k, multi-file multi-row-group parquet) under the PRODUCTION
session posture (ksql_spark.session defaults: AQE on, no bench micro-tuning),
records wall seconds per entry and the JVM's peak RSS high-water mark
(VmHWM from /proc — set once per process lifetime, so the reported peak is
cumulative across entries; per-entry deltas are the interesting signal).

Usage: python tools/scale_probe.py [--sf-dir tmp_sfprobe] [--only a,b,c]
Prints one JSON line per entry + a trailing summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

HEAVY = [
    # TPC-H joins/aggs over the 6M-row fact
    "tpch_q1_pricing_summary", "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers", "tpch_q18_large_orders",
    "tpch_q13_order_distribution",
    # iterative graph (events-derived edges)
    "graph_pagerank", "graph_components", "graph_label_propagation",
    "graph_katz_centrality", "graph_triangle_count",
    # dedup / text heavy hitters over 50k docs (10x planted exact dups)
    "llm_dedup_near", "llm_dedup_cluster", "llm_substring_dup_spans",
    "llm_substring_dedup_apply", "llm_semantic_dedup", "llm_bpe_merges",
    "llm_collocations", "llm_boilerplate_ngrams", "llm_tfidf_cosine_pairs",
    # r9 production siblings of the pair/wedge tail (SCALE.md round-9 table)
    "llm_semantic_dedup_scaled", "llm_cluster_medoids_sampled",
    "graph_clustering_coefficient_capped", "graph_adamic_adar_capped",
    "graph_two_hop_reach_hll",
    # r9 audit/analytics wave (D55-D61, L16)
    "dq_referential_orphans", "dq_referential_orphans_onepass",
    "customer_order_coverage",
    "events_attribution_credit", "events_did_estimator", "graph_ppr",
    "orders_backlog_aging", "orders_perfect_order_rate",
    "part_price_elasticity", "events_mann_kendall",
    "events_dispersion_fano", "events_retention_halflife",
    "llm_readability_fk", "part_abc_xyz_matrix",
    "events_circadian_rayleigh", "part_croston_demand",
    "dq_freshness_audit", "llm_cluster_davies_bouldin",
    "orders_spearman_corr", "events_granger_lite",
    "orders_runs_test", "supplier_herfindahl",
    "events_cuped_adjusted", "events_sprt_ab", "llm_quality_ks_sources",
    "llm_multimodal_histogram", "events_srm_fdr",
    "events_hill_tail_index", "events_hill_tail_index_pruned",
    "customer_migration_steady_state",
    "part_price_index_monthly", "orders_mann_whitney",
    "events_mcnemar_prepost", "events_periodogram", "llm_mmr_rerank",
    "llm_conformal_calibration", "events_attribution_markov",
    # ANN over 20k vectors (KMeans fits, bucket joins)
    "ann_ivf_topk", "ann_lsh_topk", "ann_pq_topk",
    # windows / sessions / ranged primitives over 1M events
    "events_rolling_wau", "events_session_funnel", "win_rolling_median",
    "llm_pack_sequences", "events_markov_transitions",
    "events_changepoint_binseg", "stream_session_dynamic_gap",
    # r11 wave (survival inference, drift, supply chain, curation surgery,
    # preference data, HITS, Hilbert layout, PAV)
    "orders_logrank_segments", "events_page_hinkley",
    "orders_bullwhip_ratio", "sort_hilbert_locality", "graph_hits",
    "llm_paragraph_dedup", "llm_line_rules_c4", "llm_winnowing_pairs",
    "llm_preference_pairs", "llm_semantic_decontaminate",
    "llm_isotonic_calibration",
]


def jvm_vmhwm_kb() -> int | None:
    """Peak RSS (VmHWM, kB) of the driver JVM child process."""
    try:
        import subprocess

        out = subprocess.run(
            ["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
            capture_output=True, text=True,
        ).stdout.split()
        pids = [int(p) for p in out]
        best = 0
        for pid in pids:
            status = Path(f"/proc/{pid}/status").read_text()
            for line in status.splitlines():
                if line.startswith("VmHWM:"):
                    best = max(best, int(line.split()[1]))
        return best or None
    except Exception:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=str(REPO / "tmp_sfprobe"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from ksql_spark.registry import all_specs
    from ksql_spark.session import get_spark

    spark = get_spark(app_name="ksql-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    names = args.only.split(",") if args.only else HEAVY
    results = {}
    for n in names:
        if n not in specs:
            results[n] = {"error": "no such key"}
            continue
        t0 = time.perf_counter()
        try:
            specs[n].builder(spark, args.sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            dt = round(time.perf_counter() - t0, 2)
            results[n] = {"sec": dt, "jvm_peak_mb": (jvm_vmhwm_kb() or 0) // 1024}
        except Exception as exc:
            results[n] = {
                "sec": round(time.perf_counter() - t0, 2),
                "error": f"{type(exc).__name__}: {str(exc)[:300]}",
            }
        print(json.dumps({n: results[n]}), flush=True)
    ok = [r["sec"] for r in results.values() if "error" not in r]
    print(json.dumps({
        "summary": {
            "entries": len(names),
            "passed": len(ok),
            "total_sec": round(sum(ok), 1),
            "jvm_peak_mb": (jvm_vmhwm_kb() or 0) // 1024,
        }
    }))
    spark.stop()


if __name__ == "__main__":
    main()
