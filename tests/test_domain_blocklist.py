"""PSL eTLD+1 semantics and the blocklist gate: the branches the shared
closed-form oracles replay but cannot independently justify. The hand
cases drive the PRODUCTION expression builders exported by
relational.py (psl_exprs) — not a private copy that could drift."""

from __future__ import annotations

from pyspark.sql import functions as F

PSL_CASES = [
    # (host, expected eTLD+1) — the PSL rule: longest matching suffix
    # plus exactly one label; a bare suffix registers nothing.
    ("news.example.co.uk", "example.co.uk"),   # longest match, not .uk
    ("example.co.uk", "example.co.uk"),
    ("co.uk", "(none)"),                       # bare 2-label suffix
    ("deep.sub.example.org", "example.org"),
    ("example.org", "example.org"),
    ("org", "(none)"),                         # bare 1-label suffix
    ("localhost", "(none)"),                   # no matching suffix
]


def test_psl_longest_match_hand_cases(spark):
    from crawspark.operators.relational import psl_exprs
    df = spark.createDataFrame([(h,) for h, _ in PSL_CASES], ["host"])
    ls = F.split("host", r"\.")
    hosts = df.select("host", ls.alias("ls"), F.size(ls).alias("n"))
    k, etld1 = psl_exprs()
    got = {r.host: r.e for r in
           hosts.withColumn("k", k).select("host", etld1.alias("e"))
           .collect()}
    assert got == dict(PSL_CASES)


def test_registered_domain_query_classes(spark, sf_dir):
    from crawspark.registry import load_all
    rows = {r.etld1: r for r in
            load_all()["registered_domain_stats"].spark(spark, sf_dir)
            .collect()}
    # the three designed classes all materialize at every SF
    assert rows["example.org"].suffix_labels == 1
    assert rows["example.co.uk"].suffix_labels == 2
    assert rows["(none)"].n_urls > 0


def test_blocklist_gate_both_outcomes(spark, sf_dir):
    from crawspark.operators.textops import BLOCK_RATIO_MAX
    from crawspark.registry import load_all
    rows = load_all()["quality_blocklist_gate"].spark(spark, sf_dir) \
        .collect()
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    assert kept and dropped, "threshold must split the corpus"
    for r in rows:
        assert 0 <= r.n_blocked <= r.n_tokens
        assert r.keep == (r.n_blocked / max(r.n_tokens, 1)
                          < BLOCK_RATIO_MAX)
