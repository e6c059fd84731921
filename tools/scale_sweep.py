"""Scale-stability sweep: run every registry query at two SFs and
flag degenerate flips.

The driver's correctness gate only ever executes queries at sf0.01, so
a query can be oracle-green there yet collapse at 10x the data (the
boilerplate gate did exactly that: 128 survivors at sf0.01, 0 at
sf0.1). This sweep is the cheap guard: count rows at both SFs and
flag anything that (a) returns rows at one SF but zero at the other,
or (b) returns the exact same nonzero count at both SFs when the query
is input-driven (suspicious invariance is usually a hardcoded limit —
top-k/training queries legitimately do this, so those are listed, not
failed).

Usage: python tools/scale_sweep.py [--sf-a DIR] [--sf-b DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

# top-k / fixed-output queries where an SF-invariant row count is the
# intended contract, not a bug
EXPECTED_INVARIANT = {
    "topk_largest_docs", "ann_cosine_topk", "ann_search_lsh",
    "ann_search_ivf", "ann_search_pq", "bpe_train_merges",
    "q1_pricing_summary", "quantile_doc_sizes", "approx_quantile_bound",
    "heavy_hitters_users", "sketch_kmv_distinct", "sketch_kmv_overlap",
    "rank_bm25", "agg_status_counts", "agg_mktsegment", "bloom_seen_urls", "cms_user_counts", "hll_distinct_urls", "triangle_count_hosts",
    "cube_lang_source", "rollup_lang_source", "pivot_source_by_lang",
    "part_type_stats", "extract_lang_histogram",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-a", default="/root/testdata/sf0.01")
    ap.add_argument("--sf-b", default="/root/testdata/sf0.1")
    ap.add_argument("--only", action="append", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from crawspark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    qs = entry.queries()
    names = args.only if args.only else sorted(qs)
    flagged = []
    for name in names:
        row = {"query": name}
        try:
            t0 = time.time()
            a = qs[name](spark, args.sf_a).count()
            b = qs[name](spark, args.sf_b).count()
            row.update(a=a, b=b, sec=round(time.time() - t0, 1))
            if (a == 0) != (b == 0):
                row["flag"] = "ZERO_FLIP"
                flagged.append(name)
            elif a == b and a > 0 and name not in EXPECTED_INVARIANT:
                row["flag"] = "invariant"
        except Exception as exc:  # noqa: BLE001
            row["flag"] = f"ERROR {type(exc).__name__}: {exc}"[:200]
            flagged.append(name)
        print(json.dumps(row), flush=True)
    print(json.dumps({"flagged": flagged}), flush=True)
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
