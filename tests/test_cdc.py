"""Unit tests for the CDC core — hand-built tiny fixtures with known
answers (upsert overwrite, whole-row delete, tombstone-then-reinsert)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hbase_increment_index_spark.cdc.cell_model import (
    drop_empty_cells,
    filter_families,
)
from hbase_increment_index_spark.cdc.compaction import (
    apply_deletes,
    apply_deletes_anti_join,
    latest_per_key,
    live_cells,
)
from hbase_increment_index_spark.cdc.index_builder import (
    compact_state,
    documents_from_cells,
    documents_from_state,
    merge_state,
)


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # row A: two puts to same cell -> latest wins
        ("put", "A", "cf", "name", "v1", _ts(1), 1),
        ("put", "A", "cf", "name", "v2", _ts(2), 2),
        # row B: put then whole-row delete -> gone
        ("put", "B", "cf", "name", "b1", _ts(1), 3),
        ("delete", "B", "cf", None, None, _ts(5), 4),
        # row C: delete then re-insert -> alive with new value
        ("delete", "C", "cf", None, None, _ts(1), 5),
        ("put", "C", "cf", "name", "c2", _ts(2), 6),
        # row D: same-ts tie broken by seq
        ("put", "D", "cf", "name", "d1", _ts(3), 7),
        ("put", "D", "cf", "name", "d2", _ts(3), 8),
        # row E: cell in non-indexed family + empty value cell
        ("put", "E", "other", "name", "e1", _ts(1), 9),
        ("put", "E", "cf", "name", "", _ts(2), 10),
    ]
    return spark.createDataFrame(
        rows, "op string, row_key string, family string, qualifier string, value string, ts timestamp, seq long"
    )


def test_family_allowlist(log):
    kept = filter_families(log, ["cf"])
    assert kept.filter(F.col("family") == "other").count() == 0
    assert kept.count() == log.count() - 1


def test_empty_cell_skip(log):
    kept = drop_empty_cells(log)
    assert kept.filter((F.col("row_key") == "E") & (F.col("op") == "put")).count() == 1  # 'other' family row kept, empty dropped


def test_latest_per_key_tie_break(log):
    latest = {r["row_key"]: r for r in latest_per_key(log).collect()}
    assert latest["A"]["value"] == "v2"
    assert latest["D"]["value"] == "d2"  # seq 8 beats seq 7 at equal ts
    assert latest["B"]["op"] == "delete"
    assert latest["C"]["op"] == "put"


def test_apply_deletes_both_forms(log):
    a = {r["row_key"] for r in apply_deletes(log).collect()}
    b = {r["row_key"] for r in apply_deletes_anti_join(log).collect()}
    assert a == b == {"A", "C", "D", "E"}


def test_live_cells_row_granularity(log):
    live = live_cells(filter_families(drop_empty_cells(log), ["cf"]))
    rows = {(r["row_key"], r["qualifier"]): r["value"] for r in live.collect()}
    assert rows[("A", "name")] == "v2"
    assert ("B", "name") not in rows  # whole-document delete
    assert rows[("C", "name")] == "c2"  # re-insert after tombstone


def test_documents_pivot(log):
    docs = documents_from_cells(filter_families(drop_empty_cells(log), ["cf"]), ["name"])
    got = {r["id"]: r["name"] for r in docs.collect()}
    assert got == {"A": "v2", "C": "c2", "D": "d2"}


def test_merge_state(spark, log):
    base = compact_state(filter_families(drop_empty_cells(log), ["cf"]))
    inc = spark.createDataFrame(
        [
            ("put", "A", "cf", "name", "v3", _ts(9), 100),   # overwrite
            ("delete", "C", "cf", None, None, _ts(9), 101),  # delete
            ("put", "Z", "cf", "name", "z1", _ts(9), 102),   # new key
            # out-of-order: OLDER than A's v3 — must NOT win
            ("put", "A", "cf", "name", "stale", _ts(0), 103),
        ],
        "op string, row_key string, family string, qualifier string, value string, ts timestamp, seq long",
    )
    merged = merge_state(base, inc)
    got = {r["id"]: r["name"] for r in documents_from_state(merged, ["name"]).collect()}
    assert got == {"A": "v3", "D": "d2", "Z": "z1"}


def test_apply_ttl_fractional_and_bad_type(spark):
    """apply_ttl keeps sub-second precision for fractional TTLs (bound
    make_dt_interval literal, not string interpolation) and rejects
    non-numeric TTLs with a clear error at call time."""
    import datetime as dt

    from hbase_increment_index_spark.cdc.compaction import apply_ttl

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("put", "A", "cf", "q", "old", base, 1),
        ("put", "B", "cf", "q", "mid", base + dt.timedelta(milliseconds=600), 2),
        ("put", "C", "cf", "q", "new", base + dt.timedelta(milliseconds=1000), 3),
    ]
    log = spark.createDataFrame(
        rows,
        "op string, row_key string, family string, qualifier string, value string, ts timestamp, seq long",
    )
    # ttl = 0.5s from the max ts (t=1.0s): keeps B (t=0.6) and C, drops A
    kept = {r["row_key"] for r in apply_ttl(log, 0.5).collect()}
    assert kept == {"B", "C"}
    import pytest as _pytest

    with _pytest.raises((TypeError, ValueError)):
        apply_ttl(log, "a-week")
