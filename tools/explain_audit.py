"""Physical-plan audit: prints `.explain("formatted")` for the headline
queries and greps for the plan properties that matter at 100 TB:

  * PushedFilters / ReadSchema on parquet scans (predicate pushdown +
    column pruning reached the scan)
  * WholeStageCodegen spans (expressions stayed JVM-side)
  * broadcast joins where a small dim is joined (no shuffle of the big
    probe side)
  * no CartesianProduct except the intentional broadcast NLJ prefilters

Usage: python tools/explain_audit.py [sf_dir] [query ...] > PLANS.md
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

AUDIT = [
    "tile_assign_points", "zoom_rollup", "spatial_join_pip", "knn_hot",
    "way_join_agg", "topk_per_group", "semi_join_reduction", "agg_pushdown",
    "dedup_minhash_lsh", "embedding_topk", "embedding_ivf_topk",
    "area_join_concave", "tiles_e2e_bbox", "bpe_token_count",
    "stream_window_counts", "embedding_neardup", "declarative_profile",
    "relations_scalars",
    # round 4
    "s2_cells", "html_extract", "pii_scrub", "url_dedup_latest",
    # round 5
    "h3_cells", "hex_smooth", "pack_chunks", "boilerplate_lines",
    "simhash_pairs_wide", "dedup_incremental", "span_dedup",
    "lm_corpus_fit", "stratified_sample", "token_budget_sample",
    "dedup_clusters", "decontaminate", "decontaminate_fuzzy",
    # round-5 closers
    "classifier_score", "tfidf_keywords", "extract_links",
    "link_pipeline", "url_blocklist", "dedup_paragraphs", "anchor_terms",
    "semantic_dedup", "dsir_select", "host_quota", "curation_funnel",
    "curated_tiles", "bpe_merges", "bpe_tokenize", "warc_scan",
    "url_canonical", "token_percentiles", "robots_screen",
    "areal_interp",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or AUDIT

    import __spark_entry__ as entrymod
    from tilemaker_spark.session import get_spark

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    print("# Physical plan audit\n")
    print(f"sf dir: {sf_dir}; spark {spark.version}\n")
    print("Note: with AQE enabled, pre-execution formatted plans print "
          "`AdaptiveSparkPlan` without `codegen id` annotations — "
          "codegen_spans: 0 here does NOT mean codegen is off; the "
          "executed plan compiles Filter/Project/HashAggregate spans "
          "via whole-stage codegen as usual. The meaningful checks are "
          "pushed_filters, pruned_scan (ReadSchema subset), "
          "broadcast_join, and exchange counts.\n")
    for name in only:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        checks = {
            "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
            "pushed_filters": bool(re.search(r"PushedFilters: \[(?!\])", plan)),
            "pruned_scan": bool(re.search(r"ReadSchema: struct<(?!.{600})",
                                          plan)),
            "broadcast_join": bool(re.search(r"Broadcast(Hash|NestedLoop)Join",
                                             plan)),
            "cartesian": bool(re.search(r"CartesianProduct", plan)),
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
        }
        print(f"## {name}\n")
        print(f"checks: {checks}\n")
        print("```\n" + plan.strip()[:4000] + "\n```\n")


if __name__ == "__main__":
    main()
