"""Generate BENCH/PLANS.md: physical-plan audit of the most expensive
headline queries — operator histogram (shuffles, codegen spans, Python
hops, join strategies) plus the scan-level pushdown evidence, with a
one-line verdict each. Run: python tools/gen_plan_audit.py [sf_dir]."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

AUDIT = [
    ("extract_flagship", "FUSED single MapInArrow hop; the one exchange is the scan-width repartition (no-op at scale)"),
    ("extract_span_hashes", "fused extraction + per-row md5; only the width-repartition exchange"),
    ("dedup_minhash_resolve",
     "shuffles only on doc_id/band keys; verify join on candidate ids"),
    ("dedup_ngram_jaccard",
     "inverted-index self-join keyed on shingle; hot list broadcast"),
    ("curate_corpus",
     "window dedup + BROADCAST anti-join for the fuzzy drop list"),
    ("embedding_cosine_pairs",
     "block-pair grid: corpus never gathered to the driver"),
    ("ann_search_ivf", "assignment mapInPandas + broadcast probe join"),
    ("sessionize_events", "ONE exchange shared by both windows + final agg"),
    ("q3_shipping_priority",
     "filters pushed to all three scans; TakeOrderedAndProject top-k"),
    ("quantile_doc_sizes", "text column pruned at the scan"),
    ("pagerank_hosts",
     "iterative loop: per-iteration lineage cut by localCheckpoint, "
     "edges/nodes materialized once"),
    ("heavy_hitters_users",
     "MG candidates per partition; exact pass broadcast-joins candidates"),
    ("zorder_events", "pure codegen bit-interleave, no shuffle"),
    ("dedup_exact_substring",
     "window-md5 inverted-index self-join; shuffle keyed on the 32-byte "
     "hash, never raw text"),
    ("quality_repetition_stats",
     "two doc_id-keyed aggs with map-side combine; text never shuffled"),
    ("dedup_embedding_resolve",
     "block-grid pair scan feeds connected components; edge shuffle only"),
    ("rank_bm25",
     "one scan + 1-row stats BROADCAST cross join + TakeOrderedAndProject top-20"),
    ("sketch_kmv_distinct",
     "per-partition Arrow bottom-k (<= K rows cross the wire), one "
     "K-array merge + exact-count QA crossjoins of 1-row frames"),
    ("sketch_kmv_overlap",
     "union bottom-k + BROADCAST semi-joins of the K sketch hashes "
     "against each side — no full-key-space shuffle"),
    ("multimodal_jpeg_pixel_stats",
     "pruned single-column scan -> codegen filter -> ONE mapInPandas "
     "decode hop, zero exchanges"),
    ("pdf_image_xobjects",
     "pruned single-column scan -> ONE mapInPandas PDF+image decode "
     "hop, zero exchanges"),
    ("quality_lm_perplexity",
     "bigram LM: model aggs BROADCAST to the scorers; corpus side is "
     "explode + broadcast joins + one doc_id agg"),
    ("boilerplate_corpus_lines",
     "line-frequency pass keyed on the line; boilerplate SET (freq >= "
     "threshold) broadcast back over the corpus"),
    ("dsir_importance_weights",
     "bucket-weight table <= B rows by construction, BROADCAST; corpus "
     "side explode -> broadcast join -> doc_id agg"),
    ("pack_training_sequences",
     "ONE exchange: the (lang, shard) window hash — packing is "
     "per-shard by design, no global window exists"),
    ("bpe_segment_stats",
     "trained word->segmentation model is vocabulary-sized, BROADCAST "
     "joined to the corpus tokens"),
    ("hits_hosts",
     "two sparse matvecs per iteration, L1 normalizer as 1-row "
     "broadcast; lineage cut per step like pagerank"),
    ("curate_corpus_v3",
     "v2 chain + model-stage joins all doc_id-keyed; ppl terciles "
     "computed corpus-wide then joined to survivors"),
    ("route_mixed_formats",
     "pruned doc_id scan -> ONE mapInPandas sniff+parse hop, zero "
     "exchanges — the per-doc format work never shuffles"),
    ("scan_tar_archive",
     "pruned doc_id scan -> ONE mapInPandas gunzip+ustar walk, zero "
     "exchanges"),
    ("eml_extract_text",
     "pruned doc_id scan -> ONE mapInPandas MIME walk, zero exchanges"),
    ("quality_kn_perplexity",
     "Kneser-Ney: c12/c1/continuation-count tables + 1-row totals all "
     "BROADCAST; corpus side explode + broadcast joins + one doc_id agg"),
    ("quality_classifier_score",
     "trained weight table <= B+1 rows BROADCAST; scoring pass is one "
     "wide exchange (groupBy doc_id); GD steps reuse one materialized "
     "feature table"),
    ("keyword_tfidf_topk",
     "df table broadcast back over the corpus; per-doc window "
     "partitions by doc_id, never globally"),
    ("scan_zip_archive",
     "pruned doc_id scan -> ONE mapInPandas central-directory walk, "
     "zero exchanges"),
    ("curate_corpus_v4",
     "v3 chain + classifier gate: trust-score join doc_id-keyed, "
     "tercile window partitions by lang (never global)"),
    ("crawl_snapshot_diff",
     "full outer join on doc_id shuffles 32-byte hashes only, never "
     "text; one status agg"),
    ("collocations_pmi_topk",
     "map-side-combined unigram/bigram counts; unigram table BROADCAST "
     "to the floor-5 bigram survivors"),
    ("join_asof_versions",
     "union-and-carry-forward: ONE exchange (per-user window), zero "
     "Join operators — the naive inequality join is a cross product"),
    ("join_range_windows",
     "bin-bucketed EQUI join on (user_id, bin) + exact containment "
     "filter — never BroadcastNestedLoop"),
    ("split_leakage_check",
     "gram table materialized once for both branches; train-gram set "
     "is the hash-join key, corpus never self-joins"),
    ("dedup_containment_pairs",
     "undirected a<b inverted-index join (half the pair rows); both "
     "directed containments emitted post-agg via explode"),
    ("dedup_winnowing",
     "fingerprint table checkpointed once (single-Window selection pass "
     "audited by tests/test_winnowing.py); pair join keyed on the capped "
     "16-hex fingerprint, hot list BROADCAST"),
    ("dedup_winnowing_resolve",
     "winnowing pairs >= MIN_SHARED feed connected components; "
     "post-checkpoint remainder is the CC output only"),
    ("site_template_fingerprints",
     "UNCAPPED fingerprints are safe here — two aggregations (per-"
     "(source,h) df, per-source counts), broadcast host table, no pair "
     "join ever forms"),
    ("dedup_incremental_minhash",
     "increment bands probe the corpus band index (new x old) + small "
     "new x new self-join; the old x old quadrant is never formed"),
    ("dedup_substring_coverage",
     "gram table materialized once for the dup-count agg AND the "
     "join-back; interval union is one doc_id window — no pair join"),
    ("frontier_politeness_schedule",
     "one frontier agg, then host-table-only math (bounded) with a "
     "16-group final agg"),
    ("pack_context_windows",
     "two-level prefix sum: the only UNPARTITIONED window runs on the "
     "block table (corpus/1024 rows), offsets broadcast back; per-doc "
     "pass partitioned by blk"),
    ("communities_label_propagation",
     "per-round join keyed on edge src + (node,label) agg + per-node "
     "window, lineage cut per round; post-checkpoint remainder shown"),
    ("pagerank_personalized",
     "pagerank loop shape with the personalization vector as a carried "
     "column; dangling scalar is a 1-row broadcast; lineage cut per "
     "iteration"),
    ("scan_orc_roundtrip",
     "ORC round trip verified by a FULL OUTER join back to the original "
     "on doc_id — 32-byte digests shuffle, text never does; mismatches "
     "pinned 0"),
    ("fix_mojibake",
     "chained JVM replace, map-only: zero exchanges, rides the corpus "
     "scan"),
    ("unicode_nfc_stats",
     "union + ONE mapInPandas audit hop, zero exchanges"),
    ("text_char_entropy",
     "ONE mapInPandas numpy-count hop, zero exchanges — never explodes "
     "chars to rows (the oracle's formulation would shuffle ~100x the "
     "corpus)"),
    ("quality_blocklist_gate",
     "JVM array membership filter, map-only: zero exchanges"),
    ("surt_url_index",
     "links checkpointed ONCE (twin branches must not re-run "
     "extraction); post-checkpoint plan is the single surt groupBy "
     "exchange, no join"),
    ("registered_domain_stats",
     "links checkpointed ONCE; single etld1 groupBy exchange, suffix "
     "probes are codegen CASEs (the real PSL would broadcast)"),
    ("rewrite_drop_boilerplate",
     "boilerplate set broadcast back over the lines; rebuild is one "
     "doc_id agg (collect_list bounded by the doc's own line count)"),
    ("rewrite_drop_dup_substrings",
     "gram table checkpointed once for dup-agg AND join-back; "
     "occurrences merged to disjoint intervals (lag/gid window) so the "
     "per-token test is O(n_toks x n_merged) — template pages cannot "
     "straggle; no pair join, no UDF"),
    ("quality_gate_funnel",
     "three doc_id-keyed joins of map-side gate outputs, one small "
     "per-source agg — composed from the registered gates"),
]


def main() -> None:
    from crawspark.plans import plan_summary, pushed_filters
    from crawspark.registry import load_all
    from crawspark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    reg = load_all()
    lines = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Generated by tools/gen_plan_audit.py at {SF}, local[8]. Columns:",
        "Exchange = shuffle stages, WSCG = whole-stage-codegen spans,",
        "Py = Arrow/Python hops, BHJ/SMJ = broadcast / sort-merge joins.",
        "The per-query plan PROPERTIES (broadcast, pruning, single-exchange,",
        "skew split, bucketed no-shuffle) are enforced as tests in",
        "tests/test_export_and_plans.py and tests/test_scale_plans.py —",
        "this file is the human-readable snapshot.",
        "",
        "Caveat: queries that eagerly localCheckpoint an intermediate",
        "(dedup_minhash_resolve, curate_corpus, the lsh candidate tables)",
        "show only the post-checkpoint remainder here — the materialized",
        "stages (shingle explode, band self-join) ran at construction and",
        "their shuffle counts are audited by the dedicated dedup tests.",
        "",
        "| query | Exchange | WSCG | Py | BHJ | SMJ | scans | pushed filters | note |",
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    for name, note in AUDIT:
        df = reg[name].spark(spark, SF)
        s = plan_summary(df)
        pf = pushed_filters(df)
        pf_txt = "; ".join(pf[:3]) + ("…" if len(pf) > 3 else "") if pf else "—"
        lines.append(
            f"| {name} | {s['exchanges']} | {s['wholestage_codegen']} "
            f"| {s['python_arrow_stages']} | {s['broadcast_joins']} "
            f"| {s['sortmerge_joins']} | {s['scans']} | {pf_txt} | {note} |")
    out = pathlib.Path(__file__).resolve().parent.parent / "BENCH" / "PLANS.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
