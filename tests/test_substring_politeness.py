"""dedup_substring_coverage (textops.py) and frontier_politeness_schedule
(relational.py): the interval-union window formula against a brute-force
reference, the planted-slogan guarantee, and the scheduler's bound
invariants."""

from __future__ import annotations

def union_len_brute(positions: list[int], k: int) -> int:
    covered: set[int] = set()
    for p in positions:
        covered.update(range(p, p + k))
    return len(covered)


def union_len_window(positions: list[int], k: int) -> int:
    # The query's formula: sorted starts, each contributes
    # min(k, pos - prev_pos) (first contributes k).
    out = 0
    prev = None
    for p in sorted(positions):
        out += k if prev is None else min(k, p - prev)
        prev = p
    return out


def test_interval_union_formula_matches_brute_force():
    # Fixed-length interval union via the lag window == brute-force set
    # union, over 300 deterministic pseudo-random position sets.
    for trial in range(300):
        n = 1 + (trial * 7919) % 25
        positions = sorted({1 + (trial * 31 + i * i * 17) % 60
                            for i in range(n)})
        for k in (3, 8):
            assert union_len_window(positions, k) == \
                union_len_brute(positions, k), (trial, k, positions)


def test_planted_slogan_is_covered(spark, sf_dir):
    # Every 17th doc carries the shared 11-word slogan; with >= 2 planted
    # docs all slogan-internal 8-grams are corpus-duplicated, so each
    # planted doc reports covered_toks >= 11.
    from crawspark.registry import load_all
    reg = load_all()
    rows = reg["dedup_substring_coverage"].spark(spark, sf_dir).collect()
    got = {r.doc_id: r for r in rows}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = [r.doc_id for r in
               docs.filter("doc_id % 17 = 0").select("doc_id").collect()]
    assert len(planted) >= 2, "plant cohort too small — test is vacuous"
    for d in planted:
        assert d in got, d
        assert got[d].covered_toks >= 11, got[d]
    for r in rows:
        assert 0 < r.covered_toks <= r.n_toks, r
        assert 0.0 < r.dup_frac <= 1.0, r


def test_politeness_bounds_invariants(spark, sf_dir):
    from crawspark.registry import load_all
    reg = load_all()
    rows = reg["frontier_politeness_schedule"].spark(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_hosts = docs.select("source").distinct().count()
    n_urls = docs.count()
    assert sum(r.n_hosts for r in rows) == n_hosts
    assert sum(r.n_urls for r in rows) == n_urls
    hexchars = set("0123456789abcdef")
    for r in rows:
        assert r.worker in hexchars
        # the capacity and chain bounds both lower-bound the result
        assert r.lower_bound_s >= r.chain_bound_s
        assert r.lower_bound_s >= r.n_urls
        assert r.chain_bound_s >= 0
