"""Mirror of the driver's correctness gate: run each registry query on
Spark AND its DuckDB oracle SQL on the same parquet, compare row count,
column names, and order-insensitive value content. Catches mismatches
before the driver does.

Run at sf0.001 by default (fast); CRAWSPARK_PARITY_SF=/root/testdata/sf0.01
for the driver-scale check."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from crawspark.registry import load_all
from crawspark.sources.tables import TESTDATA_TABLES

SF_DIR = os.environ.get("CRAWSPARK_PARITY_SF", "/root/testdata/sf0.001")

REGISTRY = load_all()
SQL_CASES = sorted(n for n, s in REGISTRY.items() if s.sql is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.sql is None)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            v = 0.0  # fold -0.0 → 0.0 (engines may differ on zero sign)
        return f"{v:.6g}"
    if v is None:
        return "NULL"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", SQL_CASES)
def test_sql_parity(name, spark, ddb):
    # Extraction oracles render their SF-specific twin parquet path from
    # the runtime SF_DIR via QuerySpec.render_sql (no path rewriting).
    spec = REGISTRY[name]
    sdf = spec.spark(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    cur = ddb.execute(spec.render_sql(SF_DIR))
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    assert _canon(srows, scols) == _canon(drows, dcols), f"{name}: values differ"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark):
    df = REGISTRY[name].spark(spark, SF_DIR)
    assert df.count() >= 0  # runs and has a stable schema
    assert df.columns
