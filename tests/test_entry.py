"""Driver-contract smoke: entry() + queries()/oracle_sql() shape.

The full Spark-vs-DuckDB comparison lives in tools/check_oracles.py (run at
sf0.01, mirrors the driver); here we pin the contract shape and a cheap
subset end-to-end at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    df = E.entry(spark)
    rows = df.count()
    assert rows > 0
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "lang", "text", "spans", "n_blocks", "error", "engine",
    ]


def test_oracle_keys_subset_of_queries():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    assert len(o) >= 15  # keep oracle coverage broad


def test_oracles_are_valid_duckdb_sql():
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in E.oracle_sql().items():
        con.execute(sql).fetchmany(1)  # parses + executes


@pytest.mark.parametrize("name", ["dedup_exact", "token_stats", "sessionize", "embedding_dups"])
def test_query_subset_nonempty(spark, name):
    df = E.queries()[name](spark, SF)
    assert df.count() > 0
