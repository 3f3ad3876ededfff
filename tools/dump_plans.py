"""Dump formatted physical plans for the key operators into PLANS.md —
the plan-quality audit: filter/column pushdown at the scan, broadcast vs
shuffle join choice, partial aggregation, whole-stage codegen spans.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    out = buf.getvalue()
    # sentinel literals (chr(0)/chr(31) in FD combos, hash keys) would make
    # PLANS.md a "binary" file for grep — render them visibly instead
    return out.replace("\x00", "<NUL>").replace("\x1f", "<US>")


def main():
    import __spark_entry__ as em
    from taco_toolbox_spark.session import get_spark

    spark = get_spark("plans", master="local[4]", shuffle_partitions=4)
    qs = em.queries()
    picks = {
        "q1_pricing (scan pushdown + partial agg)": qs["q1_pricing"],
        "j1_broadcast_enrich (broadcast hash join)": qs["j1_broadcast_enrich"],
        "j3_rollup (big join + rollup)": qs["j3_rollup"],
        "v9_monotone (single window pass)": qs["v9_monotone"],
        "dedup_ngram_jaccard (shingle equi-join)": qs["dedup_ngram_jaccard"],
        "sim_topk (TakeOrderedAndProject)": qs["sim_topk"],
        "w3_size_bins (distributed prefix sum: bucket-keyed window + broadcast offsets)": qs["w3_size_bins"],
        "dedup_minhash (bucket-capped LSH + candidate-restricted verify)": qs["dedup_minhash"],
        "sim_near_dup (banded signature self-join, slim rows)": qs["sim_near_dup"],
        "sim_ivf_topk (shuffle-free probe filter + TakeOrdered re-rank)": qs["sim_ivf_topk"],
        "w3_greedy_pack (per-group applyInPandas, one shuffle)": qs["w3_greedy_pack"],
        "j4_position_pattern (count + tiny argmax window)": qs["j4_position_pattern"],
        "s1_stratified_sample (zero-shuffle hash predicate at the scan)": qs["s1_stratified_sample"],
        "s2_sample_k_per_group (one shuffle + rank<=k window)": qs["s2_sample_k_per_group"],
        "j5_asof_join (union-tag single-shuffle as-of, no nested loop)": qs["j5_asof_join"],
        "j6_range_join (bin-replication equi-join, exact post-filter)": qs["j6_range_join"],
        "t1_quality_filter (shared window sort: count + rank)": qs["t1_quality_filter"],
        "dedup_common_spans (HOF blocking, slim removal map, no 2nd text shuffle)": qs["dedup_common_spans"],
        "dedup_winnow_pairs (HOF winnowing selection + capped hash join)": qs["dedup_winnow_pairs"],
        "d3_embedding_drift (posexplode + partial/final sum + dims broadcast)": qs["d3_embedding_drift"],
        "w5_token_truncate (one cumulative window, JVM token count)": qs["w5_token_truncate"],
        "b1_bloom_contains (partial-distinct build + broadcast membership join)": qs["b1_bloom_contains"],
        "w6_reindex_turns (one row_number window, battery key shape)": qs["w6_reindex_turns"],
        "sim_join_topk (broadcast query side, per-query top-k window)": qs["sim_join_topk"],
        "sim_join_topk_blocked (map-side pandas top-k; only survivors shuffle)": qs["sim_join_topk_blocked"],
        "sim_join_lsh (band-sig equi-join candidates, semi-join bucket cap)": qs["sim_join_lsh"],
        "dedup_containment (shared shingle-join core, least() projection)": qs["dedup_containment"],
        "v16_fd_tool_role (two stacked partial aggs, no expand/window)": qs["v16_fd_tool_role"],
        "t5_budget_select (bucketed prefix sum + broadcast offsets, no global window)": qs["t5_budget_select"],
        "v17_embedding_sanity (zero-shuffle HOF row battery)": qs["v17_embedding_sanity"],
        "m1_content_digest (one-pass commutative digest: partial/final hash agg)": qs["m1_content_digest"],
        "d5_corr_drift (exact-moment corr: one hash agg per side, 1-row broadcast)": qs["d5_corr_drift"],
        "d6_cond_drift (one grouped count, broadcast-grid conditional TV)": qs["d6_cond_drift"],
        "d7_transition_drift (one seq-keyed lag/lead window, one grouped count)": qs["d7_transition_drift"],
        "w11_burst_rate (one RANGE-frame window on the key exchange)": qs["w11_burst_rate"],
        "w11_burst_rate_chunked (hot key split by (key, bucket); ghosts by Union, not Join)": qs["w11_burst_rate_chunked"],
        "w12_stuck_runs (two stacked Windows, one exchange, one sort)": qs["w12_stuck_runs"],
        "w13_loop_detect (stacked Windows + exchange-reusing island agg, one shuffle)": qs["w13_loop_detect"],
        "d8_sem_decontaminate (broadcast bench vectors, per-row norm once)": qs["d8_sem_decontaminate"],
        "d14_cardinality_anomaly (one partition-grain agg, band windows on the tiny profile)": qs["d14_cardinality_anomaly"],
        "d16_volume_vs_history (1-row history band broadcast onto the profile)": qs["d16_volume_vs_history"],
    }
    out = [
        "# PLANS — physical plan audit (sf0.01, local[4])",
        "",
        "Generated by tools/dump_plans.py. What to look for: `PushedFilters`",
        "/ `ReadSchema` at the Parquet scan (predicate + column pruning),",
        "`BroadcastHashJoin` for dimension joins, `HashAggregate` pairs",
        "(partial -> final, map-side combine), `WholeStageCodegen` spans,",
        "and `TakeOrderedAndProject` for top-k (no full sort).",
        "",
    ]
    for title, fn in picks.items():
        out += [f"## {title}", "", "```", explain_str(fn(spark, SF)).rstrip(), "```", ""]

    # engine passes on a small in-memory corpus
    from taco_toolbox_spark.checks import transcript_checks
    from taco_toolbox_spark.datagen import generate_transcripts
    from taco_toolbox_spark.engine import EngineConfig, run_validation

    corpus = generate_transcripts(spark, n_convs=50, hot_conv_every=0)
    checks = [
        c for c in transcript_checks(drift_baseline=[1.0] * 5)
    ]
    res = run_validation(corpus.corrupted, checks)
    out += [
        "## validation engine: unified violations plan (all passes)",
        "",
        "```",
        explain_str(res.violations).rstrip(),
        "```",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
