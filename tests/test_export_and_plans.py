"""Export sinks + physical-plan quality gates.

The plan tests pin the optimizer behaviors the 100 TB design depends on
(SURVEY.md §4.2): filter/column pushdown into the parquet scan, broadcast
joins for small dims, TakeOrderedAndProject for top-k — so a regression
that silently de-optimizes a plan fails CI, not a cluster run."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from crawspark.corpus import make_doc
from crawspark.operators.export import export_csv, export_flat_spans, export_json
from crawspark.operators.extract import extract_documents
from crawspark.schema import DOCUMENTS_INTERLEAVED
from crawspark.sources import read_testdata


def _extracted(spark, n=12):
    docs = [make_doc(42, i) for i in range(n)]
    df = spark.createDataFrame(
        [(d["doc_id"], d["spans"]) for d in docs], schema=DOCUMENTS_INTERLEAVED)
    return extract_documents(df)


def test_export_sinks(spark, tmp_path):
    ext = _extracted(spark).cache()
    export_json(ext, str(tmp_path / "j"))
    export_csv(ext, str(tmp_path / "c"))
    export_flat_spans(ext, str(tmp_path / "f"))
    assert spark.read.json(str(tmp_path / "j")).count() == 12
    csv = spark.read.option("header", True).csv(str(tmp_path / "c"))
    assert csv.count() == 12 and "spans_json" in csv.columns
    flat = spark.read.parquet(str(tmp_path / "f"))
    assert flat.count() == ext.select(F.sum("n_spans")).collect()[0][0]
    assert glob.glob(str(tmp_path / "c") + "/*.csv")
    ext.unpersist()


from crawspark.plans import executed_plan as _plan
from crawspark.plans import plan_summary, pushed_filters


def test_plan_summary_and_pushed_filters(spark, sf_dir):
    df = (read_testdata(spark, sf_dir, "documents")
          .filter(F.col("lang") == "en").select("doc_id"))
    assert "EqualTo(lang,en)" in pushed_filters(df)
    s = plan_summary(df)
    assert s["scans"] == 1 and s["exchanges"] == 0


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (read_testdata(spark, sf_dir, "documents")
          .filter(F.col("n_chars") > 100).select("doc_id", "n_chars"))
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]" in plan
    # column pruning: text column must NOT be read
    assert "ReadSchema" in plan and "text" not in plan.split("ReadSchema")[1]


def test_small_dim_join_broadcasts(spark, sf_dir):
    c = read_testdata(spark, sf_dir, "customer")
    n = read_testdata(spark, sf_dir, "nation")
    df = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    assert "BroadcastHashJoin" in _plan(df)


def test_topk_avoids_total_sort(spark, sf_dir):
    df = (read_testdata(spark, sf_dir, "documents")
          .orderBy(F.col("n_chars").desc()).limit(5))
    assert "TakeOrderedAndProject" in _plan(df)


def test_q1_partial_aggregation(spark, sf_dir):
    from crawspark.registry import load_all
    df = load_all()["q1_pricing_summary"].spark(spark, sf_dir)
    plan = _plan(df)
    # map-side partial agg before the exchange (two HashAggregate levels)
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan


def test_curate_fuzzy_drop_broadcasts(spark, sf_dir):
    # The fuzzy-dedup drop list must join as a broadcast anti-join — the
    # corpus side never shuffles for it (the drop list is |dup clusters|).
    from crawspark.registry import load_all
    df = load_all()["curate_corpus"].spark(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_quantile_scan_prunes_text(spark, sf_dir):
    # percentile over n_chars must not drag the text column off disk.
    from crawspark.registry import load_all
    df = load_all()["quantile_doc_sizes"].spark(spark, sf_dir)
    plan = _plan(df)
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "n_chars" in read_schema and "text" not in read_schema


def test_sessionize_single_exchange(spark, sf_dir):
    # Both windows and the final aggregate share the user_id hash
    # partitioning — exactly ONE shuffle of the events table.
    from crawspark.plans import plan_summary
    from crawspark.registry import load_all
    df = load_all()["sessionize_events"].spark(spark, sf_dir)
    assert plan_summary(df)["exchanges"] == 1


def test_bm25_topk_is_take_ordered(spark, sf_dir):
    # The global top-20 must compile to TakeOrderedAndProject
    # (per-partition top-k + 20-row merge) — the first cut used a
    # global row_number window, which moves EVERY scored row to one
    # partition (plan audit finding, r5). The corpus stats join must
    # broadcast its 1-row side.
    from crawspark.registry import load_all
    df = load_all()["rank_bm25"].spark(spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_pmi_topk_is_take_ordered(spark, sf_dir):
    # Same contract as bm25: the global top-20 collocations must be
    # TakeOrderedAndProject, never a single-partition row_number window
    # over the whole floor-5 bigram table (VERDICT r5 perf-weak #2 —
    # the one surviving unbounded-window plan defect).
    from crawspark.registry import load_all
    df = load_all()["collocations_pmi_topk"].spark(spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_format_route_plans_are_single_hop(spark, sf_dir):
    # The format routes must stay "pruned doc_id scan -> ONE Python
    # hop, zero exchanges" — any accidental shuffle or full-row scan in
    # these per-doc parsers is a 100 TB regression. (Enforced here;
    # BENCH/PLANS.md is the human-readable snapshot.)
    from crawspark.registry import load_all

    reg = load_all()
    for name in ("route_mixed_formats", "warc_route_payloads",
                 "scan_tar_archive", "eml_extract_text",
                 "epub_extract_text", "doc_legacy_extract_text",
                 "rtf_extract_text", "xlsx_extract_rows",
                 "pptx_extract_text", "odt_extract_text",
                 "latex_extract_blocks", "markdown_extract_blocks",
                 "html_extract_tables"):
        df = reg[name].spark(spark, sf_dir)
        s = plan_summary(df)
        assert s["exchanges"] == 0, (name, s)
        assert s["python_arrow_stages"] == 1, (name, s)
        assert s["scans"] == 1, (name, s)
        plan = _plan(df)
        # column pruning: only doc_id is read from the documents table
        assert "text" not in plan.split("ReadSchema")[1], name
