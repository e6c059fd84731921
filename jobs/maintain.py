"""spark-submit table-maintenance job: the operational companion to the
streaming snapshot sink (one commit per microbatch grows file and
manifest counts linearly — this job bounds both).

Usage:
  spark-submit --py-files <bundle> jobs/maintain.py \\
      --table-root /path/tables --table extracted \\
      [--compact-target 8] [--expire-keep 3] \\
      [--delete-where "n_spans = 0"]

Order of operations: DELETE (optional) → compact → expire. Each step is
one atomic snapshot commit; a crash between steps leaves a consistent
table that the next run finishes.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table-root", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--compact-target", type=int, default=0,
                    help="compact current snapshot into N files (0 = skip)")
    ap.add_argument("--expire-keep", type=int, default=0,
                    help="expire all but the newest N snapshots (0 = skip)")
    ap.add_argument("--delete-where", default=None,
                    help="SQL predicate; matching rows are deleted first")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crawspark.operators.merge import delete_where
    from crawspark.session import get_spark
    from crawspark.sources.tables import SnapshotParquetBackend

    spark = get_spark(master=args.master)
    backend = SnapshotParquetBackend(args.table_root)
    out: dict = {"table": args.table,
                 "version_before": backend.current_version(args.table)}
    if args.delete_where:
        out["rows_deleted"] = delete_where(
            spark, backend, args.table, F.expr(args.delete_where))
    if args.compact_target > 0:
        out["compacted_to_version"] = backend.compact(
            spark, args.table, target_files=args.compact_target)
    if args.expire_keep > 0:
        out["expired_versions"] = backend.expire_snapshots(
            args.table, keep_last=args.expire_keep)
    out["version_after"] = backend.current_version(args.table)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
