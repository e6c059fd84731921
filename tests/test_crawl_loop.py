"""jobs/crawl_loop.py — the fetch-extract-frontier main loop: wave
semantics, robots gating, per-round commit markers and resume.
"""

from __future__ import annotations

import json

SF = "/root/testdata/sf0.001"


def _run(spark, out, rounds=3, seeds=8):
    from jobs.crawl_loop import run

    return run(spark, SF, str(out), rounds, seeds)


def test_crawl_loop_semantics(spark, tmp_path):
    from jobs.crawl_loop import robots_text_for

    summary = _run(spark, tmp_path / "a")
    rounds = summary["rounds"]
    assert len(rounds) == 3
    # round 0 fetches every allowed seed; the wave then expands through
    # the deterministic edge formula with robots genuinely blocking
    assert rounds[0]["fetched"] > 0
    assert any(r["blocked_by_robots"] > 0 for r in rounds)
    assert all(r["fetched"] + r["blocked_by_robots"] <= r["frontier"]
               for r in rounds)
    assert all(r["spans"] > 0 for r in rounds if r["fetched"])
    # visited accumulates every frontier member (fetched or blocked)
    assert summary["visited"] >= sum(r["fetched"] for r in rounds)
    # the robots grid really splits hosts both ways
    hosts = [f"h{k}.example.com" for k in range(37)]
    kinds = {len(h) % 3 for h in hosts}
    assert 0 in kinds and 2 in kinds
    assert "Disallow: /" in robots_text_for("h10.example.com")


def test_crawl_loop_fetched_sets_are_deterministic(spark, tmp_path):
    a = _run(spark, tmp_path / "a")
    b = _run(spark, tmp_path / "b")
    assert a == b
    fa = sorted(r["doc_id"] for r in spark.read.parquet(
        str(tmp_path / "a" / "rounds" / "000" / "fetched")).collect())
    fb = sorted(r["doc_id"] for r in spark.read.parquet(
        str(tmp_path / "b" / "rounds" / "000" / "fetched")).collect())
    assert fa == fb and fa


def test_crawl_loop_resumes_from_committed_rounds(spark, tmp_path):
    out = tmp_path / "c"
    # partial run: 2 of 3 rounds committed
    partial = _run(spark, out, rounds=2)
    assert len(partial["rounds"]) == 2
    # tamper-proof the resume check: poison round 0's metrics marker;
    # a resumed run must READ it (not refetch), so the poison surfaces
    marker = out / "rounds" / "000" / "_COMMITTED"
    row = json.loads(marker.read_text())
    row["spans"] = -777
    marker.write_text(json.dumps(row))
    full = _run(spark, out, rounds=3)
    assert full["rounds"][0]["spans"] == -777  # round 0 was NOT rerun
    assert len(full["rounds"]) == 3
    # the fresh third round matches an uninterrupted 3-round run
    clean = _run(spark, tmp_path / "d", rounds=3)
    assert full["rounds"][2] == clean["rounds"][2]
    assert full["visited"] == clean["visited"]
