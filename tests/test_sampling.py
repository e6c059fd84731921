"""Deterministic-sampling operators (operators/sampling.py): semantics
pinned against an independent pure-Python replay of the hash math, plan
properties pinned against the executed plan (broadcast-only joins, the
WindowGroupLimit partial, TakeOrderedAndProject)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from crawspark.operators.sampling import (
    _BERN_THRESH,
    _MIX_BUDGET,
    _MIX_WEIGHTS,
    _PRIO_K,
    _STRAT_K,
    _TWO60,
    mixture_token_budget,
    sample_hash_bernoulli,
    sample_stratified_topk,
    sample_weighted_priority,
)
from crawspark.plans import executed_plan


def _h60_py(doc_id: int, salt: str = "samp") -> int:
    return int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:15], 16)


def _docs(sf_dir):
    return duckdb.sql(
        f"SELECT doc_id, lang, source, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet')").fetchall()


def test_bernoulli_matches_python_replay(spark, sf_dir):
    # The sampled set is a pure function of md5(doc_id): replay the
    # threshold selection doc-by-doc in Python and compare aggregates.
    rows = {r["source"]: (r["n_sampled"], r["chars_sampled"], r["min_doc_id"])
            for r in sample_hash_bernoulli(spark, sf_dir).collect()}
    expect: dict[str, list] = {}
    for doc_id, _lang, source, n_chars in _docs(sf_dir):
        t = _BERN_THRESH.get(source)
        if t is not None and _h60_py(doc_id) < t:
            expect.setdefault(source, []).append((doc_id, n_chars))
    assert rows == {s: (len(v), sum(c for _, c in v), min(d for d, _ in v))
                    for s, v in expect.items()}


def test_stratified_exact_k_smallest_hashes(spark, sf_dir):
    got = sample_stratified_topk(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for doc_id, lang, _s, _c in _docs(sf_dir):
        by_lang.setdefault(lang, []).append((_h60_py(doc_id), doc_id))
    for lang, hs in by_lang.items():
        want = [d for _, d in sorted(hs)[:_STRAT_K]]
        sel = sorted((r["rank"], r["doc_id"]) for r in got
                     if r["lang"] == lang)
        assert [d for _, d in sel] == want, lang
        assert [k for k, _ in sel] == list(range(1, len(want) + 1))


def test_weighted_priority_is_exact_topk(spark, sf_dir):
    # Brute-force the same w/u priority in Python (same IEEE double ops)
    # and check the operator returns exactly the global top-K.
    got = [r["doc_id"] for r in
           sample_weighted_priority(spark, sf_dir).collect()]
    prios = [(-(n_chars / ((_h60_py(doc_id) + 1) / _TWO60)), doc_id)
             for doc_id, _l, _s, n_chars in _docs(sf_dir)]
    want = [d for _, d in sorted(prios)[:_PRIO_K]]
    assert got == want
    # heavier docs are overrepresented: the sample's mean weight must
    # exceed the corpus mean (the point of weighted sampling)
    rows = sample_weighted_priority(spark, sf_dir).collect()
    corpus_mean = (sum(n for *_, n in _docs(sf_dir)) / len(_docs(sf_dir)))
    assert sum(r["weight"] for r in rows) / len(rows) > corpus_mean


def test_mixture_budget_fractions_and_replay(spark, sf_dir):
    rows = {r["source"]: r for r in
            mixture_token_budget(spark, sf_dir).collect()}
    totals: dict[str, int] = {}
    for _d, _l, source, n_chars in _docs(sf_dir):
        if source in _MIX_WEIGHTS:
            totals[source] = totals.get(source, 0) + n_chars
    for source, w in _MIX_WEIGHTS.items():
        frac = min(1.0, (_MIX_BUDGET * w) / totals[source])
        thresh = int(frac * _TWO60)
        taken = [(d, c) for d, _l, s, c in _docs(sf_dir)
                 if s == source and _h60_py(d, "mix") < thresh]
        r = rows[source]
        assert (r["n_docs"], r["chars_taken"]) == (
            len(taken), sum(c for _, c in taken)), source
        assert r["frac"] == pytest.approx(round(frac, 6))
        # a fully-budgeted source takes everything; others stay under
        if frac >= 1.0:
            assert r["chars_taken"] == totals[source]


def test_sampling_plan_properties(spark, sf_dir):
    # bernoulli + mixture: broadcast joins only, no sort-merge; the scan
    # side is never shuffled before the filter (the 100 TB claim).
    for fn, n_bhj in ((sample_hash_bernoulli, 1), (mixture_token_budget, 2)):
        plan = executed_plan(fn(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") == n_bhj, fn.__name__
        assert "SortMergeJoin" not in plan, fn.__name__
    # stratified: ONE exchange, with the rank-limit pushed down as a
    # PARTIAL WindowGroupLimit before it (each map task ships <= K rows
    # per stratum — the optimizer-native form of the salt tournament)
    plan = executed_plan(sample_stratified_topk(spark, sf_dir))
    assert plan.count("Exchange") == 1, plan
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan
    # weighted: global top-K compiles to TakeOrderedAndProject (map-side
    # partial top-k) — no Exchange, no global Sort
    plan = executed_plan(sample_weighted_priority(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan, plan


def test_sampling_is_idempotent(spark, sf_dir):
    # Re-running the job yields the identical sample — the property that
    # makes resume-after-failure safe for a sampling stage.
    a = sorted(r["doc_id"] for r in
               sample_stratified_topk(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in
               sample_stratified_topk(spark, sf_dir).collect())
    assert a == b


# ---------------------------------------------------------------------------
# C4 line gates (textops.quality_c4_gates) — semantic pins on the gate
# logic itself, independent of the oracle twin.
# ---------------------------------------------------------------------------


def test_c4_gates_semantics(spark, sf_dir):
    from crawspark.operators.textops import quality_c4_gates
    from crawspark.plans import executed_plan

    df = quality_c4_gates(spark, sf_dir)
    rows = {r["doc_id"]: r for r in df.collect()}
    texts = dict(duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')").fetchall())
    for doc_id, r in rows.items():
        n_words = len(texts[doc_id].split(" "))
        # line count follows the 8-word chunking
        assert r["n_lines"] == max(-(-n_words // 8), 1)
        # a page containing lorem ipsum or a brace is never kept
        if doc_id % 31 == 0 or doc_id % 37 == 0:
            assert r["keep"] == 0, doc_id
        # kept lines are a subset of all lines and imply kept chars
        assert 0 <= r["n_kept_lines"] <= r["n_lines"]
        assert (r["kept_chars"] > 0) == (r["n_kept_lines"] > 0)
        if r["keep"] == 1:
            assert r["n_kept_lines"] >= 3
    # both outcomes occur — the gates discriminate on this corpus
    keeps = {r["keep"] for r in rows.values()}
    assert keeps == {0, 1}
    # pure per-doc map: zero exchanges in the executed plan
    assert "Exchange" not in executed_plan(df)


def test_budget_allocation_is_exact_hamilton(spark, sf_dir):
    # Largest-remainder apportionment properties: the allocations sum
    # to exactly B, every host gets floor or floor+1 of its exact
    # proportional share (the Hamilton "quota rule"), and the +1 units
    # go precisely to the largest remainders (ties by host asc).
    from crawspark.operators.relational import frontier_budget_allocation

    rows = {r["host"]: r for r in
            frontier_budget_allocation(spark, sf_dir).collect()}
    B = 1000
    total = sum(r["demand"] for r in rows.values())
    assert sum(r["alloc"] for r in rows.values()) == B
    rem = {}
    for h, r in rows.items():
        base = (B * r["demand"]) // total
        assert r["alloc"] in (base, base + 1), h
        rem[h] = (B * r["demand"]) % total
    leftover = B - sum((B * r["demand"]) // total for r in rows.values())
    winners = sorted(rows, key=lambda h: (-rem[h], h))[:leftover]
    for h, r in rows.items():
        base = (B * r["demand"]) // total
        assert r["alloc"] == base + (1 if h in winners else 0), h


def test_snapshot_diff_partitions_the_union(spark, sf_dir):
    # The four statuses must partition old ∪ new exactly, with counts
    # matching the deterministic derivation's closed forms.
    import duckdb as _duck

    from crawspark.operators.relational import crawl_snapshot_diff

    got = {r["status"]: r["n_docs"] for r in
           crawl_snapshot_diff(spark, sf_dir).collect()}
    con = _duck.connect()
    n, n17, n19, n13 = con.execute(
        f"""SELECT count(*),
                   sum(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END),
                   sum(CASE WHEN doc_id % 19 = 0 THEN 1 ELSE 0 END),
                   sum(CASE WHEN doc_id % 13 = 0 AND doc_id % 17 <> 0
                            THEN 1 ELSE 0 END)
            FROM read_parquet('{sf_dir}/documents.parquet')"""
    ).fetchone()
    con.close()
    assert got["removed"] == n17
    assert got["added"] == n19
    assert got["changed"] == n13
    assert got["unchanged"] == n - n17 - n13
    assert sum(got.values()) == n + n19  # old ∪ new


def test_pack_context_windows_matches_python_replay(spark, sf_dir):
    # The two-level distributed prefix sum must equal a plain sequential
    # scan: recompute the token stream in Python from the raw parquet and
    # compare every doc's bin range bit-for-bit.
    import re as _re

    from crawspark.operators.sampling import PACK_L, pack_context_windows

    got = {r.doc_id: (r.n_toks, r.first_bin, r.last_bin, r.n_bins)
           for r in pack_context_windows(spark, sf_dir).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT doc_id, text FROM
            read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"""
    ).fetchall()
    con.close()
    cum = 0
    n_checked = 0
    for doc_id, text in rows:
        n = len([t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t])
        if n < 1:
            assert doc_id not in got
            continue
        start, cum = cum, cum + n
        first, last = start // PACK_L, (cum - 1) // PACK_L
        assert got[doc_id] == (n, first, last, last - first + 1), doc_id
        n_checked += 1
    assert n_checked == len(got) > 0


def test_pack_window_only_over_block_table(spark, sf_dir):
    # Scale guard: the only UNPARTITIONED window (global order) must sit
    # on the block-sum table, never the per-doc table — the per-doc pass
    # is partitioned by blk.
    from crawspark.operators.sampling import pack_context_windows

    plan = executed_plan(pack_context_windows(spark, sf_dir))
    windows = [l for l in plan.splitlines()
               if l.strip().lstrip(":+- ").startswith("Window ")]
    assert len(windows) == 2, plan
    # A partitioned Window prints THREE bracket groups (functions,
    # partition spec, order spec); an unpartitioned one prints two.
    import re as _re
    unpartitioned = [w for w in windows
                     if not _re.search(r"\], \[blk#\d+L?\], \[", w)]
    # exactly one window lacks a partition spec, and it aggregates bn
    # (the block sums), not n (the doc tokens)
    assert len(unpartitioned) == 1, windows
    assert "sum(bn#" in unpartitioned[0], unpartitioned
