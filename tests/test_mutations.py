"""Unit tests for the full HBase mutation surface (cdc.mutations):
Increment/Append resolution, timestamp-ordered row tombstones, and
last-writer-wins puts on a hand-built mutation log."""

from __future__ import annotations

import datetime

import pytest

from hbase_increment_index_spark.cdc.mutations import resolve_mutations

T = datetime.datetime


def _log(spark, rows):
    return spark.createDataFrame(
        rows,
        "op string, row_key string, family string, qualifier string, "
        "value string, ival long, ts timestamp, seq long",
    )


@pytest.fixture(scope="module")
def resolved(spark):
    t = lambda s: T(2024, 1, 1, 0, 0, s)
    rows = [
        # counter cell: 3 increments sum to 60
        ("inc", "u1", "cf", "clicks", "10.00", 10, t(1), 1),
        ("inc", "u1", "cf", "clicks", "20.00", 20, t(2), 2),
        ("inc", "u1", "cf", "clicks", "30.00", 30, t(3), 3),
        # journal cell: append order is (ts, seq), not arrival
        ("append", "u1", "cf", "log", "b", None, t(2), 5),
        ("append", "u1", "cf", "log", "a", None, t(1), 4),
        ("append", "u1", "cf", "log", "c", None, t(2), 6),
        # put cell: last writer (by ts) wins
        ("put", "u1", "cf", "name", "old", None, t(1), 7),
        ("put", "u1", "cf", "name", "new", None, t(9), 8),
        # u2: tombstone at t5 masks earlier mutations only
        ("inc", "u2", "cf", "clicks", "7.00", 7, t(1), 9),
        ("delete", "u2", "cf", None, None, None, t(5), 10),
        ("inc", "u2", "cf", "clicks", "5.00", 5, t(6), 11),
        ("append", "u2", "cf", "log", "x", None, t(4), 12),
        # u3: everything at/before the tombstone -> row absent
        ("put", "u3", "cf", "name", "gone", None, t(1), 13),
        ("delete", "u3", "cf", None, None, None, t(1), 14),
    ]
    out = resolve_mutations(_log(spark, rows)).collect()
    return {(r["row_key"], r["qualifier"]): r for r in out}


def test_increment_sums(resolved):
    assert resolved[("u1", "clicks")]["value"] == "60"
    assert resolved[("u1", "clicks")]["n_events"] == 3


def test_append_orders_by_ts_then_seq(resolved):
    assert resolved[("u1", "log")]["value"] == "a,b,c"


def test_put_last_writer_wins(resolved):
    assert resolved[("u1", "name")]["value"] == "new"


def test_tombstone_masks_only_earlier_mutations(resolved):
    # the pre-tombstone inc (7) and append are masked; the later inc survives
    assert resolved[("u2", "clicks")]["value"] == "5"
    assert resolved[("u2", "clicks")]["n_events"] == 1
    assert ("u2", "log") not in resolved


def test_fully_masked_row_is_absent(resolved):
    assert all(k[0] != "u3" for k in resolved)


def test_same_ts_delete_masks_equal_position(spark):
    # HBase Delete at ts covers cells with ts <= delete ts; with our
    # (ts, seq) total order the put at the same ts but lower seq is masked
    rows = [
        ("put", "u4", "cf", "name", "v", None, T(2024, 1, 1), 1),
        ("delete", "u4", "cf", None, None, None, T(2024, 1, 1), 2),
    ]
    assert resolve_mutations(_log(spark, rows)).count() == 0


def test_check_and_put_semantics(spark):
    """CAS decisions read the pre-batch snapshot: '=', '>', '<' and
    'absent' each decide correctly; failed checks are no-ops."""
    from pyspark.sql import functions as F

    from hbase_increment_index_spark.cdc.mutations import apply_check_and_put

    live = spark.createDataFrame(
        [("r1", "cf", "q", "10.00"), ("r2", "cf", "q", "3.00")],
        ["row_key", "family", "qualifier", "value"],
    )
    batch = spark.createDataFrame(
        [
            ("r1", "cf", "q", ">", "5.00", "A"),      # 10 > 5 -> applied
            ("r2", "cf", "q", ">", "5.00", "B"),      # 3 > 5  -> no-op
            ("r2", "cf", "q", "=", "3.00", "C"),      # exact  -> applied (snapshot!)
            ("r3", "cf", "q", "absent", None, "D"),   # absent -> applied
            ("r1", "cf", "q", "absent", None, "E"),   # exists -> no-op
            ("r1", "cf", "q", "<", "5.00", "F"),      # 10 < 5 -> no-op
        ],
        ["row_key", "family", "qualifier", "compare_op", "expected", "new_value"],
    )
    rows = apply_check_and_put(live, batch).collect()
    by = {}
    for r in rows:
        by.setdefault(r.row_key, []).append(r)
    # r1: one applied ('>' -> A), absent and '<' are no-ops keeping 10.00
    r1 = {r.value for r in by["r1"]}
    assert r1 == {"A", "10.00"}
    assert sum(1 for r in by["r1"] if r.applied) == 1
    # r2: '>' fails (keeps 3.00), '=' applies (C) — both read the snapshot
    r2vals = {(r.applied, r.value) for r in by["r2"]}
    assert (False, "3.00") in r2vals and (True, "C") in r2vals
    # r3: absent -> applied, old_value null
    (r3,) = by["r3"]
    assert r3.applied and r3.value == "D" and r3.old_value is None


def test_check_and_delete_semantics(spark):
    """checkAndDelete decisions read the pre-batch snapshot; a passed
    check dooms the whole ROW (the postDelete row-granularity
    contract) via the caller's anti-join; failed checks are no-ops."""
    from pyspark.sql import functions as F

    from hbase_increment_index_spark.cdc.mutations import apply_check_and_delete

    live = spark.createDataFrame(
        [
            ("r1", "cf", "q", "10.00"),
            ("r1", "cf", "other", "keep"),
            ("r2", "cf", "q", "3.00"),
            ("r3", "cf", "other", "x"),
        ],
        ["row_key", "family", "qualifier", "value"],
    )
    batch = spark.createDataFrame(
        [
            ("r1", "cf", "q", ">", "5.00"),      # 10 > 5  -> applied
            ("r2", "cf", "q", ">", "5.00"),      # 3 > 5   -> no-op
            ("r2", "cf", "q", "=", "3.0"),       # byte-exact: '3.0' != '3.00'
            ("r3", "cf", "q", "absent", None),   # no q cell -> applied
            ("r1", "cf", "q", "absent", None),   # exists   -> no-op
        ],
        ["row_key", "family", "qualifier", "compare_op", "expected"],
    )
    dec = apply_check_and_delete(live, batch)
    # two checks on the same cell come back as two decision rows, so
    # assert per-row decision multisets
    by_row = {
        r.row_key: sorted(x.applied for x in dec.collect() if x.row_key == r.row_key)
        for r in dec.select("row_key").distinct().collect()
    }
    assert by_row["r1"] == [False, True]   # '>' applied, 'absent' no-op
    assert by_row["r2"] == [False, False]  # '>' fails; '=' is byte-exact
    assert by_row["r3"] == [True]
    # application: anti-join of live against passed keys removes ALL of
    # r1's and r3's cells, keeps every r2 cell
    doomed = dec.filter(F.col("applied")).select("row_key").distinct()
    survivors = live.join(F.broadcast(doomed), "row_key", "left_anti")
    assert {r.row_key for r in survivors.collect()} == {"r2"}
    assert survivors.count() == 1
    # pre-image comes back with the decision
    old = {(r.row_key, r.old_value) for r in dec.collect()}
    assert ("r3", None) in old and ("r1", "10.00") in old
