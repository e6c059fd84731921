"""Physical-plan inspection helpers (SURVEY.md §4.2 — verify, don't
hand-build: these assert that Catalyst produced the plan the 100 TB
design depends on)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (empty = nothing pushed)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        # split on commas OUTSIDE parens: EqualTo(lang,en) is one filter
        out.extend(p.strip() for p in
                   re.split(r",(?![^(]*\))", m.group(1)) if p.strip())
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def plan_summary(df: DataFrame) -> dict[str, int]:
    """Operator histogram — quick smell test: how many Exchanges (shuffles),
    codegen stages, Python (Arrow) hops a plan has."""
    plan = executed_plan(df)
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        # codegen stages render as "*(n) Operator" in the plan string
        "wholestage_codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python_arrow_stages": len(
            re.findall(r"ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas"
                       r"|MapInPandas", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "scans": len(re.findall(r"Scan parquet|BatchScan", plan)),
    }
