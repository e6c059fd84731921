"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

`value` = total wall seconds of the headline suite; extra keys report the
north-metric view (extraction docs/sec) without breaking the contract.
Scaling evidence (local[8] vs local[32]) lives in tools/bench_scaling.py →
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYN_DOCS = int(os.environ.get("CRAWSPARK_BENCH_SYN", "20000"))


def _repin() -> None:
    """Re-exec under taskset pinned to CPUS cores (bench_scaling.py's
    discipline, VERDICT r3 "what's wrong" #1: unpinned bench runs recorded
    2.4x co-tenant interference artifacts as if they were measurements).
    No-op when already pinned, taskset is missing, or the box has no spare
    cores to wander onto."""
    import shutil

    if os.environ.get("CRAWSPARK_BENCH_PINNED"):
        return
    try:
        avail = len(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        return
    if avail <= CPUS or shutil.which("taskset") is None:
        return
    os.environ["CRAWSPARK_BENCH_PINNED"] = "1"
    os.execvp("taskset",
              ["taskset", "-c", f"0-{CPUS - 1}", sys.executable] + sys.argv)


def _materialize(df) -> int:
    """Force full computation without driver collect; returns row count."""
    return df.count()


def main() -> None:
    _repin()
    from crawspark.bundle import ensure_shipped
    from crawspark.operators.extract import (
        extract_documents,
        interleave_and_extract,
        synthetic_corpus,
    )
    from crawspark.operators.partitioning import salted_repartition
    from crawspark.registry import load_all
    from crawspark.session import get_spark
    from crawspark.sources import read_testdata

    spark = get_spark(master=f"local[{CPUS}]", app="crawspark-bench",
                      shuffle_partitions=CPUS)
    ensure_shipped(spark)
    registry = load_all()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # headline query -> the table whose rows it drives (for per-query
    # input-rows/sec rates in `extra`).
    DRIVING = {
        "q1_pricing_summary": "lineitem",
        "join_media_docs": "lineitem",
        "window_dedup_first": "events",
        "dedup_exact": "documents",
        "dedup_minhash_lsh": "documents",
        "dedup_minhash_resolve": "documents",
        "dedup_ngram_jaccard": "documents",
        "decode_bytes": "documents",
        "text_token_count": "documents",
        "embedding_cosine_pairs": "embeddings",
        "ann_cosine_topk": "embeddings",
        "ann_search_ivf": "embeddings",
        # r5 model-based corpus-filtering additions (new keys — prior
        # keys stay untouched for round-over-round comparability)
        "quality_lm_perplexity": "documents",
        "dsir_importance_weights": "documents",
        "bpe_train_merges": "documents",
        "curate_corpus_v3": "documents",
        # r5 session-6 additions: Kneser-Ney scoring, the trained
        # logistic-regression gate (3 GD steps + a scoring pass), and
        # the union-window as-of join (the custom join the brief names)
        "quality_kn_perplexity": "documents",
        "quality_classifier_score": "documents",
        "join_asof_versions": "events",
        # r5 session-7 additions: position-aware winnowing dedup (pair
        # join + CC resolve), increment-vs-index minhash, substring-level
        # duplication coverage, and the two-level prefix-sum packer
        "dedup_winnowing_resolve": "documents",
        "dedup_incremental_minhash": "documents",
        "dedup_substring_coverage": "documents",
        "pack_context_windows": "documents",
        # r5 session-8 additions: encoding hygiene (chained-replace
        # mojibake repair, numpy char-entropy gate) and SURT key build
        "fix_mojibake": "documents",
        "text_char_entropy": "documents",
        "surt_url_index": "documents",
        "rewrite_drop_boilerplate": "documents",
        "rewrite_drop_dup_substrings": "documents",
    }
    NAMES = tuple(DRIVING)
    table_rows = {t: read_testdata(spark, SF_DIR, t).count()
                  for t in sorted(set(DRIVING.values()))}

    # Warmup at the smallest SF: JIT/codegen/python-worker spin-up is not
    # what the suite measures (steady-state is the regime of the north
    # metric); costs ~seconds.
    warm_sf = "/root/testdata/sf0.001"
    for name in NAMES:
        try:
            _materialize(registry[name].spark(spark, warm_sf))
        except Exception:
            pass

    def bench(name: str, df_fn) -> None:
        # best-of-3 minimum (VERDICT r3: best-of-2 let a co-tenant spike
        # land in BENCH_r03 as a phantom 2.4x regression); capability =
        # the unimpeded run. The spread (max/min) ships alongside so a
        # noisy measurement is visibly noisy in the BENCH file instead of
        # masquerading as a code regression.
        times = []
        n = 0
        for _ in range(3):
            t0 = time.perf_counter()
            n = _materialize(df_fn())
            times.append(time.perf_counter() - t0)
        # Up to two extra shots while the measurement looks impeded AND the
        # retries keep improving (measured 3-4x same-code swings within one
        # session on this box — see BENCH/BASELINE.md co-tenancy notes).
        while len(times) < 5 and (max(times) > 2 * min(times)
                                  or min(times) > 2):
            t0 = time.perf_counter()
            n = _materialize(df_fn())
            t = time.perf_counter() - t0
            improved = t < 0.8 * min(times)
            times.append(t)
            if not improved:
                break
        timings[name] = round(min(times), 3)
        extra[f"{name}_rows"] = n
        extra[f"{name}_spread"] = round(max(times) / min(times), 2)
        drv = DRIVING.get(name)
        if drv:
            extra[f"{name}_input_rows_per_sec"] = round(
                table_rows[drv] / min(times), 1)

    # 1) The product: full extraction over the sf documents table.
    docs = read_testdata(spark, SF_DIR, "documents")
    n_docs = docs.count()
    ext_times = []
    for _ in range(3):  # headline metric: give it one extra shot at an
        # unimpeded window (co-tenant spikes documented in BENCH/BASELINE.md)
        t0 = time.perf_counter()
        _materialize(interleave_and_extract(docs))
        ext_times.append(time.perf_counter() - t0)
    t_ext = min(ext_times)
    timings["extract_testdata"] = round(t_ext, 3)
    extra["extract_testdata_docs_per_sec"] = round(n_docs / t_ext, 1)
    extra["extract_testdata_spread"] = round(max(ext_times) / t_ext, 2)

    # 2) Heavy-tail synthetic corpus extraction. Corpus GENERATION is
    # materialized (cached) and timed separately first, so co-tenant noise
    # in the synthesis stage cannot pollute the extraction headline (the
    # north metric is extraction throughput, not word-soup generation).
    corpus = synthetic_corpus(spark, SYN_DOCS, seed=42, heavy_tail=True,
                              partitions=CPUS * 2).persist()
    t0 = time.perf_counter()
    corpus.count()
    extra["synthetic_gen_sec"] = round(time.perf_counter() - t0, 3)
    syn_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _materialize(extract_documents(
            salted_repartition(corpus, partitions=CPUS * 2)))
        syn_times.append(time.perf_counter() - t0)
    corpus.unpersist()
    t_syn = min(syn_times)
    timings["extract_synthetic"] = round(t_syn, 3)
    extra["extract_synthetic_docs_per_sec"] = round(SYN_DOCS / t_syn, 1)
    extra["extract_synthetic_spread"] = round(max(syn_times) / t_syn, 2)

    # 2b) Multilingual corpus rate (extra-only — keeps the headline suite
    # comparable across rounds): 15-language synthetic docs including the
    # per-character zh/ja scoring paths, ar, and the rules_v5 additions
    # (ko/tr/pl/id/hi/vi — hi exercises the Devanagari tokenizer path).
    ml = synthetic_corpus(
        spark, SYN_DOCS // 2, seed=43, heavy_tail=False,
        partitions=CPUS * 2,
        langs=("en", "fr", "de", "es", "it", "pt", "zh", "ja", "ar",
               "ko", "tr", "pl", "id", "hi", "vi")).persist()
    ml.count()
    t_ml = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _materialize(extract_documents(ml))
        t_ml = min(t_ml, time.perf_counter() - t0)
    ml.unpersist()
    extra["extract_multilingual_docs_per_sec"] = round(
        (SYN_DOCS // 2) / t_ml, 1)

    # 3) Relational / dedup / similarity headliners from the registry.
    for name in NAMES:
        bench(name, lambda n=name: registry[n].spark(spark, SF_DIR))

    total = round(sum(timings.values()), 3)
    # ONE record dict, printed twice: full (with `extra`) first, then the
    # minimal version LAST — the driver's output-tail capture truncated
    # the grown full record's HEAD in r4 (`parsed: null`), so the tail
    # must always end with a complete parseable line. Building both
    # prints from the same dict keeps them in lockstep (r5 review
    # finding: two hand-maintained literals).
    rec = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": CPUS,
    }
    print(json.dumps(rec | {"extra": extra}))
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
