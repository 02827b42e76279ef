"""As-of join edge cases: no-match nulls, equal-timestamp ties,
strictly-later rights excluded."""

from __future__ import annotations

import datetime as dt

from hbase_increment_index_spark.functions.temporal import asof_join_backward


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(5)), (2, "a", _ts(1)), (3, "b", _ts(9)), (4, "c", _ts(9))],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(2), 10, 1.0),   # before event 1, after event 2
            ("a", _ts(5), 11, 2.0),   # ties event 1's ts exactly -> wins (<=)
            ("a", _ts(5), 12, 3.0),   # same ts, higher tie-break id -> this wins
            ("b", _ts(10), 20, 4.0),  # strictly after event 3 -> excluded
        ],
        "k string, rts timestamp, rid long, val double",
    )
    out = {
        r["event_id"]: (r["rid"], r["val"])
        for r in asof_join_backward(
            left, right, key="k", left_ts="ts", right_ts="rts",
            payload=["rid", "val"], right_tie="rid",
        ).collect()
    }
    assert out[1] == (12, 3.0)        # equal-ts tie -> max rid
    assert out[2] == (None, None)     # nothing at or before
    assert out[3] == (None, None)     # right exists but strictly later
    assert out[4] == (None, None)     # key never seen on the right


def test_asof_null_payload_field_not_stitched(spark):
    # The matched right row has val=NULL; that NULL must survive instead
    # of being backfilled from the older right row (10, 1.0) — all
    # payload fields come from ONE matched row (ADVICE r1).
    left = spark.createDataFrame([(1, "a", _ts(9))], "event_id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _ts(2), 10, 1.0), ("a", _ts(5), 11, None)],
        "k string, rts timestamp, rid long, val double",
    )
    row = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="rts",
        payload=["rid", "val"], right_tie="rid",
    ).collect()[0]
    assert row["rid"] == 11 and row["val"] is None
