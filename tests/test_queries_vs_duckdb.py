"""The in-repo version of the driver's correctness gate: every oracle
pair must hash-match DuckDB at sf0.001 (small = fast; the driver runs
sf0.01)."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from hbase_increment_index_spark.catalog import TABLES
from hbase_increment_index_spark.queries import ORACLES, QUERIES


def _norm(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "∅"
        if isinstance(v, float):
            return repr(round(v, 9))
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    rows = sorted("|".join(cell(v) for v in r) for r in df.itertuples(index=False, name=None))
    return len(df), cols, hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(ORACLES[name]).df()
    assert _norm(sdf) == _norm(odf)


def test_every_query_has_an_oracle():
    """Round 9 closed the last oracle gap (q14b reformulated as an
    error-bound check): the rows-only escape hatch is retired and every
    registry query must ship a DuckDB oracle. A new rows-only entry is
    a deliberate contract change, not an oversight — re-add the
    rows-only runner if one ever becomes genuinely non-expressible."""
    assert set(QUERIES) == set(ORACLES)
