"""The in-repo version of the driver's correctness gate: every oracle
pair must hash-match DuckDB at sf0.001 (small = fast; the driver runs
sf0.01).

r17: the 359 pairs are PRECOMPUTED concurrently by a module-scoped
fixture (guide §2.6 — at sf0.001 every query is driver/scheduling
bound, so a thread pool overlaps the per-query scheduling tails and
the DuckDB replays instead of paying them serially; this sweep was
most of the suite's 33-40 min wall, which had outgrown the driver's
verify budget). The tests themselves stay one-per-entry so a failure
still attributes to its query name, and each test re-raises the
worker's exception verbatim when its pair errored.
"""

from __future__ import annotations

import hashlib
import os
import threading
from concurrent.futures import ThreadPoolExecutor

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
def parity(spark, sf_dir):
    """name → (spark_norm, duck_norm) | Exception, computed once for
    the whole module with worker threads. Spark job submission is
    thread-safe (the standard multi-tenant driver pattern); DuckDB
    needs one cursor per thread (cursors share the parent connection's
    catalog, i.e. the parquet views)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    tl = threading.local()

    def one(name: str):
        try:
            sdf = QUERIES[name](spark, sf_dir).toPandas()
            cur = getattr(tl, "cur", None)
            if cur is None:
                cur = tl.cur = con.cursor()
            odf = cur.execute(ORACLES[name]).df()
            return (_norm(sdf), _norm(odf))
        except Exception as exc:  # noqa: BLE001 — re-raised by the test
            return exc

    n_workers = int(os.environ.get("SPARK_GRAFT_TEST_WORKERS", "8"))
    names = sorted(ORACLES)
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        results = dict(zip(names, pool.map(one, names)))
    # free the checkpoint blocks 359 query constructions accumulated
    # (clearCache does not drop them — functions.layout)
    from hbase_increment_index_spark.functions.layout import release_checkpoints

    spark.catalog.clearCache()
    release_checkpoints(spark)
    return results


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, parity):
    r = parity[name]
    if isinstance(r, Exception):
        raise r
    assert r[0] == r[1]


def test_every_query_has_an_oracle():
    """Round 9 closed the last oracle gap (q14b reformulated as an
    error-bound check): the rows-only escape hatch is retired and every
    registry query must ship a DuckDB oracle. A new rows-only entry is
    a deliberate contract change, not an oversight — re-add the
    rows-only runner if one ever becomes genuinely non-expressible."""
    assert set(QUERIES) == set(ORACLES)
