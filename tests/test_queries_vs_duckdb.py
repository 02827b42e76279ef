"""The in-repo version of the driver's correctness gate: every oracle
pair must hash-match DuckDB at sf0.001 (small = fast; the driver runs
sf0.01).

r17: the 359 pairs come from the session-scoped ``registry_sweep``
fixture (conftest), which computes them CONCURRENTLY and shares each
entry's query construction with test_plans' full-registry sweeps
(guide §2.6 — the three serial sweeps were most of the suite's wall,
which had outgrown the driver's verify budget). The tests themselves
stay one-per-entry so a failure still attributes to its query name,
and each test re-raises the worker's exception verbatim when its pair
errored.
"""

from __future__ import annotations

import pytest

from hbase_increment_index_spark.queries import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, registry_sweep):
    r = registry_sweep[name]["parity"]
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
