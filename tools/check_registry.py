#!/usr/bin/env python
"""Full-registry oracle self-check — the rotation insurance the r2 verdict
asked for: the driver samples only 50 of the registry's queries per round,
so a red query can sit unsampled for rounds. This runs EVERY registry
query against its DuckDB oracle at the driver's correctness SF and prints
one pass/fail row per query; nonzero exit on any failure.

Usage:
    python tools/check_registry.py [--sf-dir /root/testdata/sf0.01]

Part of the round checklist (see .claude/skills/verify/SKILL.md); the
same compare also runs as pytest via tests/test_oracle_parity.py.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import duckdb  # noqa: E402

from crawspark.registry import check_query, load_all  # noqa: E402
from crawspark.session import get_spark  # noqa: E402
from crawspark.sources.tables import TESTDATA_TABLES  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--only", nargs="*", default=None,
                    help="check only these query names (milestone loop; "
                         "the full run stays the round gate)")
    args = ap.parse_args()

    registry = load_all()
    if args.only:
        unknown = sorted(set(args.only) - set(registry))
        if unknown:
            print(f"unknown queries: {unknown}")
            return 2
        registry = {n: registry[n] for n in args.only}
    spark = get_spark(master=args.master, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    n_fail = 0
    names = sorted(registry)
    width = max(len(n) for n in names)
    for name in names:
        t0 = time.perf_counter()
        try:
            r = check_query(spark, con, name, args.sf_dir)
        except Exception as ex:  # a crash is a failure row, not an abort
            r = {"hash_match": False, "err": f"{type(ex).__name__}: {ex}"}
        dt = time.perf_counter() - t0
        if r.get("err") == "no_oracle":
            status = "rows-only"
        elif r.get("hash_match"):
            status = "PASS"
        else:
            status = "FAIL"
            n_fail += 1
        extra = "" if r.get("err") in (None, "no_oracle") else f"  {r['err']}"
        print(f"{name:<{width}}  {status:<9} {dt:6.1f}s  "
              f"spark={r.get('spark_rows')} oracle={r.get('oracle_rows')}"
              f"{extra}")
    con.close()
    spark.stop()
    total = len(names)
    print(f"\n{total - n_fail}/{total} green "
          f"({sum(1 for n in names if registry[n].sql is None)} rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
