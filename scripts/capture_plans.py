"""Capture .explain('formatted') output for bench-suite queries.

Usage: python scripts/capture_plans.py <outdir> [name ...]

Driver-side only for non-iterative queries (no jobs executed); iterative
operators (CC loops, Lloyd) run their construction jobs -- those are
cheap label-table jobs at fixture scale.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# queries timed by bench.py's datapipe phase
BENCH_PICKS = [
    "dp_dedup_exact", "dp_simhash", "dp_fingerprint", "dp_ann_topk",
    "dp_srp_neardup", "dp_frame_sample", "dp_dedup_clusters",
    "dp_decontaminate", "dp_pq_encode", "dp_ann_pq", "dp_lm_score",
    "dp_paragraph_dedup", "dp_bloom_prune", "dp_mixture_sample",
    "dp_skew_audit", "dp_hard_negatives", "dp_bm25",
    "dp_semdedup", "dp_lm_bigram", "dp_pack_sequences",
    "dp_dsir", "dp_bpe", "dp_incremental_dedup",
    "rel_tpch_q1", "rel_tpch_q5", "rel_tpch_q3", "rel_rose_means",
    "rel_stats_bundle", "rel_rank_topk", "rel_broadcast_join_agg",
    "rel_asof_join", "rel_json_extract", "rel_events_funnel"]


def main():
    outdir = sys.argv[1]
    names = sys.argv[2:] or BENCH_PICKS
    os.makedirs(outdir, exist_ok=True)
    from terraspark.session import build_session
    import __spark_entry__ as E
    spark = build_session("capture-plans")
    qs = E.queries()
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR: {ex}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else "ERROR")
    spark.stop()


if __name__ == "__main__":
    main()
