"""Driver-contract smoke: entry() runs, queries()/oracle_sql() keys align,
and a fast subset of oracles matches DuckDB exactly."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E

FAST_ORACLE_SUBSET = ["zonal_stats", "global_stats", "tile_cells", "map_pixel", "gini"]


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"source", "n_docs", "n_hits", "mean_value"}


def test_query_oracle_keys_align():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 10


@pytest.mark.parametrize("name", FAST_ORACLE_SUBSET)
def test_oracle_match(spark, name):
    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import TABLES, canon, compare

    sf_dir = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    sdf = E.queries()[name](spark, sf_dir).toPandas()
    odf = con.sql(E.oracle_sql()[name]).df()
    assert compare(name, sdf, odf)
