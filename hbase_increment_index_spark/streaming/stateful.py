"""Custom stateful streaming operators via applyInPandasWithState —
the [EXT] streaming surface beyond the reference's stateless
timer-flush loop (SURVEY.md §2.4: the reference has no event-time or
state semantics; these are the training-pipeline streaming primitives
the north star asks for).

Both operators keep per-group state bounded: the dedup filter stores
one fingerprint set per group (cap-able), the running counter two
scalars. State lives in the state store (checkpointed, exactly-once
across restarts) — the scale property the reference's in-memory
buffers lacked (reference README.md:19-20).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "doc_id long, fp string, first_seen boolean"
DEDUP_STATE_SCHEMA = "fps array<string>"

COUNT_OUT_SCHEMA = "user_id long, n_events long, sum_value double"
COUNT_STATE_SCHEMA = "n long, s double"


def streaming_dedup(
    fingerprinted: DataFrame,
    group_col: str = "shard",
    max_fps_per_shard: int | None = None,
) -> DataFrame:
    """Continuous exact dedup: emit each (doc_id, fp) with a
    first_seen flag; state = the set of fingerprints seen per shard.

    Input must carry a ``shard`` column (e.g. pmod(xxhash64(fp), N)) so
    state partitions evenly — the fingerprint space is the shard key,
    NOT the doc id, so duplicates always meet the same state.

    ``max_fps_per_shard`` bounds state size: once a shard holds that
    many fingerprints, NEW fingerprints are no longer remembered across
    batches (their rows still emit first_seen=true; within-batch
    duplicates are still caught, but duplicates arriving in LATER
    batches re-emit first_seen=true). That trades recall on post-cap
    duplicates for a hard ceiling on state-store size and per-batch
    serialization — size it as target_total_fps / n_shards. The state
    list is append-ordered (never re-sorted), so per-batch cost is
    O(batch + state_size) serialization, not O(state log state).
    """

    def _dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        fps = list(state.get[0]) if state.exists else []
        seen = set(fps)
        for pdf in pdfs:
            flags = []
            for fp in pdf["fp"]:
                fresh = fp not in seen
                if fresh:
                    seen.add(fp)  # within-batch dedup is always exact
                    if max_fps_per_shard is None or len(fps) < max_fps_per_shard:
                        fps.append(fp)  # cross-batch memory is what the cap bounds
                flags.append(fresh)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "fp": pdf["fp"], "first_seen": flags}
            )
        state.update((fps,))

    return fingerprinted.groupBy(group_col).applyInPandasWithState(
        _dedup,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def trending_terms(
    tokens: DataFrame, decay: float = 0.5, epoch_col: str | None = None
) -> DataFrame:
    """Exponentially-decayed term popularity, updated each micro-batch:
    score' = decay · score + batch_count — the classic trending-now
    counter (recent batches dominate, old interest fades geometrically).
    Input: a stream with a ``term`` column (e.g. exploded query logs or
    document tokens); emits (term, score, n_total) per touched term.

    Without ``epoch_col``, decay applies ONCE per touch: a term absent
    for k batches decays once when next seen, not k times — scores of
    terms touched at different cadences are therefore not on a common
    time basis, and a stale term can transiently outrank a fresher one
    until its next touch. Pass ``epoch_col`` (a monotonically
    increasing batch/epoch number carried on every row, e.g. injected
    in foreachBatch or derived from event time) to make decay
    time-faithful: state remembers the last-seen epoch and applies
    ``decay ** gap`` on touch, so all scores share the epoch clock.

    State per group is a few scalars, so the state store stays
    vocabulary-bounded regardless of stream length; per-batch cost is
    the batch's distinct-term count. Solr has no streaming analogue —
    this is the [EXT] streaming polish over the suggester/terms
    surface (half-life = ln2/ln(1/decay) epochs)."""

    def _trend(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if epoch_col is None:
            score, n = state.get if state.exists else (0.0, 0)
            last_epoch = None
        else:
            score, n, last_epoch = state.get if state.exists else (0.0, 0, 0)
        batch_n = 0
        epoch = None
        for pdf in pdfs:
            batch_n += len(pdf)
            if epoch_col is not None and len(pdf):
                vals = pd.Series(pdf[epoch_col]).dropna()
                if len(vals):  # all-null epochs = no epoch signal this batch
                    e = int(vals.max())
                    epoch = e if epoch is None else max(epoch, e)
        if epoch_col is None or not state.exists or epoch is None:
            score = score * decay + batch_n
        else:
            # gap=0 (second micro-batch of the SAME epoch) must not decay
            # again — counts within one epoch just accumulate; negative
            # gaps (late out-of-order epoch) likewise skip decay and do
            # not rewind the stored clock (max() below)
            gap = epoch - last_epoch
            score = score * (decay**gap if gap > 0 else 1.0) + batch_n
        n += batch_n
        if epoch_col is None:
            state.update((score, n))
        else:
            new_epoch = last_epoch if epoch is None else max(epoch, last_epoch)
            state.update((score, n, new_epoch))
        yield pd.DataFrame({"term": [key[0]], "score": [score], "n_total": [n]})

    state_schema = (
        "score double, n long"
        if epoch_col is None
        else "score double, n long, last_epoch long"
    )
    return tokens.groupBy("term").applyInPandasWithState(
        _trend,
        outputStructType="term string, score double, n_total long",
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user lifetime event count + exact value sum, updated each
    micro-batch (the stateful analogue of flagship's batch stats)."""

    def _count(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            # cents-exact accumulation in int space, like numeric.py
            s += float(pd.Series(pdf["value"]).mul(100).round().sum()) / 100.0
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        _count,
        outputStructType=COUNT_OUT_SCHEMA,
        stateStructType=COUNT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
