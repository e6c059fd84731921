"""Boolean query compiler: parser, three evaluators (python / Spark /
DuckDB SQL) agree [R: query.py::Query.match semantics]."""

from __future__ import annotations

import duckdb
import pytest

from crawspark.functions.boolquery import (
    QueryParseError,
    compile_query,
    match_text,
    parse_query,
    query_to_duckdb_sql,
)

TEXTS = [
    "the quick data pipeline runs a query every night",
    "streaming data arrives late",
    "a carbon tax policy for climate",
    "spam spam spam query",
    "climate policy without the phrase",
    "databases are not data",  # 'data' must NOT match inside 'databases'
]

QUERIES = [
    "data AND query",
    "data query",                      # juxtaposition = AND
    "(data AND query) OR stream",
    'climate AND "carbon tax"',
    "query NOT spam",
    "NOT (data OR climate)",
    "data AND NOT streaming",
]


def test_parse_shapes():
    assert parse_query("a AND b OR c") == (
        "or", ("and", ("term", "a"), ("term", "b")), ("term", "c"))
    assert parse_query('"two words" x') == (
        "and", ("phrase", "two words"), ("term", "x"))
    for bad in ["", "AND", "a AND", "(a", "a)"]:
        with pytest.raises(QueryParseError):
            parse_query(bad)


def test_word_boundary_semantics():
    assert not match_text("data", "databases are everywhere")
    assert match_text("data", "raw data, cleaned")


@pytest.mark.parametrize("query", QUERIES)
def test_three_evaluators_agree(query, spark):
    expected = [match_text(query, t) for t in TEXTS]

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "id int, text string")
    got_spark = [r["m"] for r in
                 df.select("id", compile_query(query).alias("m"))
                 .orderBy("id").collect()]
    assert got_spark == expected, f"spark mismatch for {query!r}"

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id int, text varchar)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(TEXTS)))
    sql = query_to_duckdb_sql(query)
    got_duck = [bool(r[0]) for r in con.execute(
        f"SELECT {sql} FROM t ORDER BY id").fetchall()]
    assert got_duck == expected, f"duckdb mismatch for {query!r}"
