"""Catalog guard: every registered query runs at sf0.001 and agrees with its
DuckDB oracle on column names and row count. Value-level hash equality is
tools/check.py's job (run at sf0.01); this keeps the whole catalog green
under pytest so refactors can't silently break an entry."""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for name in TABLES:
        p = f"{SF}/{name}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_and_matches_oracle_shape(spark, oracle_con, name):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, SF)
    srows = sdf.collect()
    if qd.oracle is None:
        assert len(srows) >= 0  # rows-only contract
        return
    res = oracle_con.execute(qd.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
