"""Encoding-hygiene operators: mojibake repair, NFC audit, char entropy,
SURT keys.

The registry parity harness already hash-compares each query against its
DuckDB oracle at 3 SFs; these units pin the SEMANTICS the shared
closed-form oracles cannot check independently:
- the mojibake mapping table IS the cp1252 mis-decode it claims to undo
  (real .encode/.decode round trip, not the table replayed);
- the NFC plants exercise both the flagged (decomposed) and the
  passing (precomposed) branches;
- the entropy formula against a hand-computed case;
- SURT against hand-written canonicalization examples.
"""

from __future__ import annotations

import math
import unicodedata

import pytest

from crawspark.operators.textops import MOJIBAKE_PAIRS, _MOJI_PREFIX


def test_mojibake_pairs_are_real_cp1252_misdecodes():
    # Independent ground truth: each 'bad' form must be the clean char's
    # UTF-8 bytes viewed through cp1252 — the table cannot drift from
    # the defect it undoes.
    for good, bad in MOJIBAKE_PAIRS:
        assert good.encode("utf-8").decode("cp1252") == bad, good


def test_mojibake_prefix_round_trips():
    clean = "Café naïve façade über mañana “quote’ – dash — em …"
    assert clean.encode("utf-8").decode("cp1252") == _MOJI_PREFIX
    fixed = _MOJI_PREFIX
    for good, bad in MOJIBAKE_PAIRS:
        fixed = fixed.replace(bad, good)
    assert fixed == clean


def test_mojibake_pattern_occurrences_disjoint():
    # Counting each pattern on the PRE-repair text is exact because no
    # two pattern occurrences can overlap in any text: no pattern is a
    # substring of another, and no nonempty suffix of one pattern is a
    # prefix of another (so matches can't share characters, and the
    # sequential replace chain sees exactly the original occurrences).
    bads = [bad for _, bad in MOJIBAKE_PAIRS]
    for a in bads:
        for b in bads:
            if a != b:
                assert a not in b, (a, b)
            for k in range(1, min(len(a), len(b))):
                assert a[-k:] != b[:k], (a, b, k)


def test_mojibake_chain_order_safe():
    # A repaired clean char can occur INSIDE another pattern ('“' is the
    # final char of 'â€“'): replacing it next to a stray partial
    # sequence could assemble a new occurrence of that other pattern.
    # Safe iff any such other pattern has ALREADY been replaced when the
    # creating pair runs: if good_i occurs in bad_j, then j before i.
    for i, (good_i, _) in enumerate(MOJIBAKE_PAIRS):
        for j, (_, bad_j) in enumerate(MOJIBAKE_PAIRS):
            if good_i in bad_j:
                assert j < i, (good_i, bad_j)
    # and the concrete scenario: a stray 'â€' before a '“'-mojibake must
    # NOT trigger a second (chain-created) repair
    stray = "â€" + "â€œ"
    fixed = stray
    n_expected = sum(stray.count(bad) for _, bad in MOJIBAKE_PAIRS)
    n_done = 0
    for good, bad in MOJIBAKE_PAIRS:
        n_done += fixed.count(bad)
        fixed = fixed.replace(bad, good)
    assert n_expected == n_done == 1
    assert fixed == "â€" + "“"


def test_mojibake_query_plants_and_cleans(spark, sf_dir):
    from crawspark.registry import load_all
    rows = load_all()["fix_mojibake"].spark(spark, sf_dir).collect()
    by_sign = {s: [r for r in rows if (r.doc_id < 0) == s]
               for s in (True, False)}
    assert by_sign[True], "plants missing"
    # every plant repairs >= the 10 prefix instances; clean docs repair 0
    assert all(r.n_fixed >= 10 for r in by_sign[True])
    assert all(r.n_fixed == 0 for r in by_sign[False])


def test_nfc_plants_flag_decomposed_and_pass_precomposed(spark, sf_dir):
    from crawspark.registry import load_all
    rows = load_all()["unicode_nfc_stats"].spark(spark, sf_dir).collect()
    dec = [r for r in rows if -1000000001 < r.doc_id < 0]
    pre = [r for r in rows if r.doc_id <= -1000000001]
    clean = [r for r in rows if r.doc_id >= 0]
    assert dec and pre and clean
    # decomposed twins: flagged, and NFC recomposition shortens them
    assert all(not r.is_nfc and r.nfc_len < r.orig_len for r in dec)
    # precomposed twins: non-ASCII but already NFC — must pass untouched
    assert all(r.is_nfc and r.nfc_len == r.orig_len for r in pre)
    assert all(r.is_nfc for r in clean)


def test_nfc_plant_transform_matches_unicodedata():
    s = "tree beam"
    decomposed = s.replace("e", "e\u0301")
    assert not unicodedata.is_normalized("NFC", decomposed)
    assert unicodedata.normalize("NFC", decomposed) == s.replace(
        "e", "\u00e9")


def test_char_entropy_hand_cases():
    # Drive the SAME kernel the UDF runs (char_entropy_stats), against
    # hand-computed values: 'aab' has
    # H = log2(3) - (2*log2(2) + 1*log2(1))/3 = 1.58496 - 0.66667
    from crawspark.operators.lmquality import char_entropy_stats
    assert char_entropy_stats("aab") == (3, 2, 2, 0.9183)
    assert char_entropy_stats("aaaa") == (4, 1, 4, 0.0)
    n, d, m, h = char_entropy_stats("abcd")
    assert (n, d, m) == (4, 4, 1) and h == pytest.approx(2.0)
    # non-BMP codepoint counted as ONE char (utf-32 view, not utf-16)
    assert char_entropy_stats("\U0001F600a")[0] == 2


def test_char_entropy_bounds_on_corpus(spark, sf_dir):
    from crawspark.registry import load_all
    rows = load_all()["text_char_entropy"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 <= H <= log2(n_distinct); the value was rounded at 4dp so
        # the upper bound may legitimately overshoot by half an ulp of
        # that grid (5e-5), not by a float epsilon
        assert -5e-5 <= r.char_entropy <= math.log2(r.n_distinct) + 5e-5
        assert r.max_char_count <= r.n_chars


SURT_CASES = [
    ("https://WWW.Table.Example.org:443/d3p1?b=2&a=1#x",
     "org,example,table)/d3p1?a=1&b=2"),
    ("http://data.example.org:80/", "org,example,data)/"),
    ("http://key.example.org", "org,example,key)/"),
    ("http://a.b.c/path?z", "c,b,a)/path?z"),
]


def test_surt_hand_cases(spark):
    from pyspark.sql import functions as F

    from crawspark.operators.relational import surt_exprs
    # Drive the PRODUCTION chain (surt_exprs) over hand-written cases —
    # an inlined copy here would let the operator drift while the test
    # stayed green.
    df = spark.createDataFrame([(u,) for u, _ in SURT_CASES], ["url"])
    _, surt = surt_exprs(F.col("url"))
    got = [r.surt for r in df.select(surt.alias("surt")).collect()]
    assert got == [want for _, want in SURT_CASES]


def test_surt_twins_collapse(spark, sf_dir):
    from crawspark.registry import load_all
    rows = load_all()["surt_url_index"].spark(spark, sf_dir).collect()
    multi = [r for r in rows if r.n_urls >= 2]
    assert multi, "messy twins must collapse into shared groups"
    # query-twin groups: both param orders sorted into one canonical key
    q_groups = [r for r in multi if "?" in r.surt]
    assert q_groups and all(r.surt.endswith("?a=1&b=2") for r in q_groups)
    # collapse-twin groups: the clean original sorts first
    # (http:// < https://WWW.)
    c_groups = [r for r in multi if "?" not in r.surt]
    assert c_groups
    assert all(r.first_url.startswith("http://") for r in c_groups)
    # no surt ever keeps scheme, www., a default port or a fragment
    for r in rows:
        assert "://" not in r.surt and "#" not in r.surt
        assert ":443" not in r.surt and ":80" not in r.surt
        host_part = r.surt.split(")", 1)[0]
        assert "www" not in host_part


def test_mojibake_roundtrip_property():
    # For ANY text of ASCII + mapped clean chars: the cp1252 mis-decode
    # of its UTF-8 bytes is exactly repaired by the chain, and the
    # repair count equals the number of non-ASCII chars. This pins the
    # whole table AND the chain order against the real defect across a
    # seeded sample, not just the fixed prefix.
    import random

    rng = random.Random(20260820)
    cleans = [g for g, _ in MOJIBAKE_PAIRS]
    alphabet = list("abc XYZ.,!0129") + cleans
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        moji = s.encode("utf-8").decode("cp1252")
        fixed, n = moji, 0
        for good, bad in MOJIBAKE_PAIRS:
            n += fixed.count(bad)
            fixed = fixed.replace(bad, good)
        assert fixed == s, repr(s)
        assert n == sum(1 for ch in s if ord(ch) > 127), repr(s)


def test_char_entropy_kernel_vs_naive_reference():
    # The numpy utf-32 kernel against an independent Counter-based
    # formula, over random strings including astral codepoints.
    import math
    import random
    from collections import Counter

    from crawspark.operators.lmquality import char_entropy_stats

    rng = random.Random(20260821)
    pool = "aabbbc xyéé世界" + "\U0001F600\U0001F680"
    for _ in range(300):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(1, 60)))
        n, d, m, h = char_entropy_stats(s)
        cnt = Counter(s)
        assert n == len(s) and d == len(cnt) and m == max(cnt.values())
        ref = -sum((c / n) * math.log2(c / n) for c in cnt.values())
        ref4 = math.floor(ref * 1e4 + 0.5) / 1e4
        # two float formulations may straddle the same 4dp boundary by
        # one grid step at most
        assert abs(h - ref4) <= 1e-4 + 1e-12, (s, h, ref4)


def test_substring_rewrite_agrees_with_coverage_metric(spark, sf_dir):
    # Two independent formulations of the same covered-token set — the
    # coverage metric's lag-window interval union vs the rewrite's
    # per-token exists-test — must agree doc for doc: tokens dropped by
    # the rewrite == covered_toks counted by the metric. Docs with no
    # duplicated run keep every token and appear only in the rewrite.
    from crawspark.registry import load_all
    reg = load_all()
    cov = {r.doc_id: (r.n_toks, r.covered_toks) for r in
           reg["dedup_substring_coverage"].spark(spark, sf_dir).collect()}
    rw = {r.doc_id: (r.n_toks, r.n_kept) for r in
          reg["rewrite_drop_dup_substrings"].spark(spark, sf_dir)
          .collect()}
    assert set(cov) <= set(rw)
    assert cov, "planted slogans must produce coverage rows"
    for doc_id, (n, covered) in cov.items():
        rn, kept = rw[doc_id]
        assert rn == n, doc_id
        assert n - kept == covered, (doc_id, n, kept, covered)
    for doc_id, (n, kept) in rw.items():
        if doc_id not in cov:
            assert kept == n, doc_id
