"""Randomized invariance properties for the URL canonicalization chains
(SURT, PSL eTLD+1) — the planted twins prove each step once; these prove
the same invariants across a seeded sample of the component space, all
evaluated in ONE Spark job per property (per-example jobs would take
minutes)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

N_CASES = 200


def _gen_url_pairs(rng: random.Random):
    """(messy, clean) pairs that MUST canonicalize to the same SURT."""
    schemes = ["http", "https", "HTTP", "HtTpS"]
    labels = ["news", "blog", "data", "archive", "a1", "x-y", "cdn"]
    tlds = ["org", "com", "net", "io"]
    paths = ["", "/", "/a", "/a/b.html", "/p%20q", "/idx"]
    params = [["a=1"], ["a=1", "b=2"], ["z=9", "a=1", "m=5"], []]
    pairs = []
    for _ in range(N_CASES):
        host = ".".join(rng.sample(labels, rng.randint(1, 3))
                        + [rng.choice(tlds)])
        path = rng.choice(paths)
        q = rng.choice(params)
        q_shuffled = q[:]
        rng.shuffle(q_shuffled)
        q_clean = "?" + "&".join(sorted(q)) if q else ""
        q_messy = "?" + "&".join(q_shuffled) if q else ""
        scheme = rng.choice(schemes)
        port = rng.choice(["", ":80", ":443"])
        # port must agree with the scheme for the drop rule to apply
        if port == ":80" and scheme.lower() != "http":
            port = ""
        if port == ":443" and scheme.lower() != "https":
            port = ""
        www = rng.choice(["", "www.", "WWW."])
        frag = rng.choice(["", "#x", "#frag?y"])
        host_m = rng.choice([host, host.upper(), host.title()])
        messy = f"{scheme}://{www}{host_m}{port}{path}{q_messy}{frag}"
        clean = f"http://{host}{path or ''}{q_clean}"
        pairs.append((messy, clean))
    return pairs


def test_surt_invariant_under_messy_forms(spark):
    from crawspark.operators.relational import surt_exprs
    rng = random.Random(20260818)
    pairs = _gen_url_pairs(rng)
    df = spark.createDataFrame(pairs, ["messy", "clean"])
    _, surt_m = surt_exprs(F.col("messy"))
    _, surt_c = surt_exprs(F.col("clean"))
    rows = df.select("messy", "clean", surt_m.alias("sm"),
                     surt_c.alias("sc")).collect()
    for r in rows:
        assert r.sm == r.sc, (r.messy, r.clean, r.sm, r.sc)
        assert "#" not in r.sm and "://" not in r.sm
        # empty path always normalizes to '/'
        assert ")" in r.sm and r.sm.split(")", 1)[1].startswith("/")


def test_psl_etld1_structure_property(spark):
    # For every generated host: if a suffix matches, the registrable
    # domain is that suffix plus EXACTLY one label and the host ends
    # with it; bare-suffix and unmatched hosts register '(none)'.
    from crawspark.operators.relational import (
        PSL_ONE_LABEL,
        PSL_TWO_LABEL,
        psl_exprs,
    )
    rng = random.Random(20260819)
    labels = ["news", "blog", "data", "sub", "deep", "x1"]
    suffixes = (list(PSL_ONE_LABEL) + list(PSL_TWO_LABEL)
                + ["internal", "lan"])  # incl. non-matching
    hosts = []
    for _ in range(N_CASES):
        n_extra = rng.randint(0, 3)
        host = ".".join(rng.sample(labels, n_extra) + [rng.choice(suffixes)])
        hosts.append((host,))
    df = spark.createDataFrame(hosts, ["host"])
    ls = F.split("host", r"\.")
    frame = df.select("host", ls.alias("ls"), F.size(ls).alias("n"))
    k, etld1 = psl_exprs()
    rows = frame.withColumn("k", k).select(
        "host", "k", etld1.alias("e")).collect()
    for r in rows:
        parts = r.host.split(".")
        if r.e == "(none)":
            # either no suffix matched, or the host IS a bare suffix
            suffix2 = ".".join(parts[-2:]) if len(parts) >= 2 else ""
            matched = (suffix2 in PSL_TWO_LABEL and len(parts) >= 3) or \
                      (suffix2 not in PSL_TWO_LABEL
                       and parts[-1] in PSL_ONE_LABEL and len(parts) >= 2)
            assert not matched, r.host
        else:
            assert r.host == r.e or r.host.endswith("." + r.e), r.host
            assert len(r.e.split(".")) == r.k + 1, (r.host, r.e, r.k)
