"""HBase client mutation surface beyond Put/Delete: Increment and
Append, resolved against the cell state (SURVEY.md §2.1 extension).

The reference intercepts only ``postPut``/``postDelete``
(HbaseSolrIndexCoprocesser.java:37-61), but the HBase client API it
hooks into also ships ``Increment`` (atomic counter add) and
``Append`` (atomic value concatenation) mutations; on the index side
these are exactly Solr's atomic updates ``inc`` and ``add``
(solrj supports partial updates since 4.0 — the reference's solrj
dependency, pom.xml:98-109). A real deployment of the reference
pattern has counter columns and journal columns, so the engine
resolves the full mutation op set:

- ``put``     — last writer wins per cell (ts, then seq).
- ``delete``  — HBase row tombstone: masks every mutation of that row
  at or before the tombstone's (ts, seq); later mutations survive.
  (This is HBase's timestamp-ordered Delete semantics, deliberately
  richer than the reference's deleteById which only drops the doc
  when the delete is the row's latest event — see compaction.py.)
- ``inc``     — the cell is a counter: its value is the SUM of all
  unmasked increments (long arithmetic, like HBase counters).
- ``append``  — the cell is a journal: its value is the (ts, seq)-
  ordered concatenation of all unmasked appends.
- ``remove`` / ``removeregex`` — Solr's atomic-update list-element
  removal verbs (SolrJ partial-update surface: ``remove`` drops all
  occurrences of a value from a multivalued field, ``removeregex``
  drops elements matching a pattern): a journal element appended at
  (ts, seq) survives iff NO LATER remove matches it — elements
  appended after a remove are untouched, matching Solr's in-order
  atomic-update application. ``removeregex`` matches the WHOLE value
  (Solr's AtomicUpdateDocumentMerger applies Pattern.matches, not
  find-anywhere), so an unanchored 'x' removes 'x' but not 'x1' —
  patterns are wrapped ``^(?:pat)$`` before evaluation.

Resolution is deliberately *closed-form per op class* (sum / ordered
string-agg / argmax) rather than a general per-cell event fold: every
class collapses into ONE hash aggregate, so the whole resolve is a
tiny tombstone broadcast plus a single shuffle on the cell key —
at 100 TB the mutation log aggregates map-side first, and no
collect_list ever holds more than one cell's appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Mutation-log schema: CELL_LOG_COLUMNS plus the op domain
#: {put, delete, inc, append}; ``value`` stays a decimal-formatted
#: string (the cell model is untyped — SURVEY.md §1.1), ``ival`` the
#: long increment payload for ``inc`` ops.
MUTATION_OPS = ("put", "delete", "inc", "append", "remove", "removeregex")


def _rx_full_match(value, pattern):
    """Solr's removeregex semantics: java.util.regex.Pattern.matches —
    the pattern must consume the ENTIRE element. Wrapping as ^(?:pat)$
    gives full-match under find-anywhere engines (Spark regexp_like,
    DuckDB regexp_matches, Python re.search) identically."""
    return F.regexp_like(
        value, F.concat(F.lit("^(?:"), pattern, F.lit(")$"))
    )


def mutation_log_from_events(
    events: DataFrame,
    delete_event_type: str = "error",
    counter_event_types: tuple[str, ...] = ("click",),
    append_event_types: tuple[str, ...] = ("view",),
) -> DataFrame:
    """Derive a deterministic full-surface mutation log from the
    ``events`` fixture (same convention as cell_model.cell_log_from_events:
    row_key = user_id, qualifier = event_type, value = decimal-string).

    Counter qualifiers carry ``ival = floor(value)`` (HBase Increment
    is long-only); every other op carries the decimal(18,2) string.
    """
    et = F.col("event_type")
    return events.select(
        F.when(et == delete_event_type, F.lit("delete"))
        .when(et.isin(*counter_event_types), F.lit("inc"))
        .when(et.isin(*append_event_types), F.lit("append"))
        .otherwise(F.lit("put"))
        .alias("op"),
        F.col("user_id").cast("string").alias("row_key"),
        F.lit("cf").alias("family"),
        et.alias("qualifier"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("value"),
        F.floor(F.col("value")).cast("long").alias("ival"),
        F.col("ts").alias("ts"),
        F.col("event_id").alias("seq"),
    )


def resolve_mutations(mlog: DataFrame) -> DataFrame:
    """Resolve a mutation log into final cell values.

    Plan shape (scale-first):
    1. Row tombstones reduce to one (ts, seq) max per deleted row —
       a map-side-combinable agg over the (rare) delete slice, then a
       BROADCAST left join: the big mutation log is never shuffled to
       apply deletes.
    2. Survivors take ONE hash aggregate on (row_key, family,
       qualifier); the op classes are conditional aggregates in the
       same pass (collect_list ignores the NULLs the non-append ops
       contribute, so only journal cells pay for ordering). The
       remove/removeregex verbs fold as a SECOND per-cell array
       (bounded like the journal itself) applied in a post-projection:
       a higher-order filter keeps each appended element unless a
       LATER matching remove exists — still zero extra shuffles.

    Output: (row_key, family, qualifier, value, n_events) — the live
    cell state a downstream ``documents_from_cells`` pivot would index.
    A journal cell whose every element was removed (or a pure-remove
    cell) resolves to a NULL value, Solr's empty-multivalued-field
    outcome.
    """
    tomb = (
        mlog.filter(F.col("op") == "delete")
        .groupBy("row_key")
        .agg(F.max(F.struct("ts", "seq")).alias("_tomb"))
    )
    pos = F.struct("ts", "seq")
    alive = (
        mlog.filter(F.col("op") != "delete")
        .join(F.broadcast(tomb), "row_key", "left")
        .filter(F.col("_tomb").isNull() | (pos > F.col("_tomb")))
    )
    is_rm = F.col("op").isin("remove", "removeregex")
    journal = F.array_sort(
        F.collect_list(
            F.when(F.col("op") == "append", F.struct("ts", "seq", "value"))
        )
    )
    removes = F.array_sort(
        F.collect_list(
            F.when(
                is_rm,
                F.struct(
                    "ts", "seq", "value",
                    (F.col("op") == "removeregex").alias("rx"),
                ),
            )
        )
    )
    agged = alive.groupBy("row_key", "family", "qualifier").agg(
        F.max(F.col("op") == "inc").alias("_is_inc"),
        F.max((F.col("op") == "append") | is_rm).alias("_is_journal"),
        F.sum(F.when(F.col("op") == "inc", F.col("ival")))
        .cast("string")
        .alias("_inc_val"),
        journal.alias("_apps"),
        removes.alias("_rms"),
        F.max(F.when(F.col("op") == "put", F.struct("ts", "seq", "value")))
        .alias("_latest"),
        F.count(F.lit(1)).alias("n_events"),
    )
    surviving = F.filter(
        F.col("_apps"),
        lambda a: ~F.exists(
            F.col("_rms"),
            lambda r: (
                F.struct(r["ts"].alias("ts"), r["seq"].alias("seq"))
                > F.struct(a["ts"].alias("ts"), a["seq"].alias("seq"))
            )
            & F.when(r["rx"], _rx_full_match(a["value"], r["value"])).otherwise(
                r["value"] == a["value"]
            ),
        ),
    )
    journal_val = F.when(
        F.size(surviving) > 0, F.array_join(surviving.getField("value"), ",")
    )
    return agged.select(
        "row_key",
        "family",
        "qualifier",
        F.when(F.col("_is_inc"), F.col("_inc_val"))
        .when(F.col("_is_journal"), journal_val)
        .otherwise(F.col("_latest").getField("value"))
        .alias("value"),
        "n_events",
    )


def resolve_journal_ordered(mlog: DataFrame) -> DataFrame:
    """Exact IN-ORDER journal resolution — the full Solr atomic-update
    multivalued verb set including ``add-distinct`` (SolrJ: append the
    value only if not already present). Whereas resolve_mutations uses
    closed-form per-op-class folds (sufficient for put/inc/append/
    remove — each element's survival is decided by later events alone),
    add-distinct's insert-iff-absent check reads the LIVE LIST STATE at
    its own position, which is inherently sequential: whether an
    earlier add-distinct inserted depends on the state before IT, and
    removes reset presence between occurrences. So journal cells take
    one ordered higher-order fold (collect_list → array_sort →
    aggregate) over the per-cell event array: per-cell bounded work,
    a single hash aggregate on the cell key, zero extra shuffles —
    sequential SEMANTICS without sequential EXECUTION across cells.

    Ops folded: ``append``, ``add-distinct``, ``remove``,
    ``removeregex``; row tombstones (``delete``) mask as in
    resolve_mutations; any other op contributes to ``n_events`` only.
    Output matches resolve_mutations' journal shape: (row_key, family,
    qualifier, value, n_events), value NULL when the list ends empty.
    """
    tomb = (
        mlog.filter(F.col("op") == "delete")
        .groupBy("row_key")
        .agg(F.max(F.struct("ts", "seq")).alias("_tomb"))
    )
    pos = F.struct("ts", "seq")
    alive = (
        mlog.filter(F.col("op") != "delete")
        .join(F.broadcast(tomb), "row_key", "left")
        .filter(F.col("_tomb").isNull() | (pos > F.col("_tomb")))
    )
    agged = alive.groupBy("row_key", "family", "qualifier").agg(
        F.array_sort(F.collect_list(F.struct("ts", "seq", "op", "value"))).alias("_ev"),
        F.count(F.lit(1)).alias("n_events"),
    )

    def step(acc, e):
        ins = F.concat(acc, F.array(e["value"]))
        return (
            F.when(e["op"] == "append", ins)
            .when(
                e["op"] == "add-distinct",
                F.when(F.array_contains(acc, e["value"]), acc).otherwise(ins),
            )
            .when(e["op"] == "remove", F.filter(acc, lambda x: x != e["value"]))
            .when(
                e["op"] == "removeregex",
                F.filter(acc, lambda x: ~_rx_full_match(x, e["value"])),
            )
            .otherwise(acc)
        )

    journal = F.aggregate(
        F.col("_ev"), F.expr("CAST(array() AS array<string>)"), step
    )
    return agged.select(
        "row_key",
        "family",
        "qualifier",
        F.when(F.size(journal) > 0, F.array_join(journal, ",")).alias("value"),
        "n_events",
    )


def apply_check_and_put(live: DataFrame, cap_batch: DataFrame) -> DataFrame:
    """HBase ``checkAndPut`` — the primary store's compare-and-set
    mutation (Table.checkAndPut / CheckAndMutate with a CompareOp):
    each mutation applies ONLY if the current cell value passes its
    check; otherwise it is a no-op. The reference's coprocessor sees
    the resulting Put like any other (HbaseSolrIndexCoprocesser
    postPut), so index maintenance is unchanged — this operator is
    the decision step.

    ``live``: current live cells (row_key, family, qualifier, value).
    ``cap_batch``: (row_key, family, qualifier, compare_op, expected,
    new_value) with compare_op ∈ {'=', '>', '<', 'absent'}. '=' is
    EXACT byte/string equality — HBase's comparator compares the raw
    cell bytes, so '5.0' does not CAS-match a stored '5.00'; the
    ordering ops '>'/'<' cast both sides to decimal(18,2) (the cell
    encoding) for numeric comparison; 'absent' succeeds when the cell
    does not exist (HBase's checkAndPut(null) idiom).

    Semantics: ALL checks read the same pre-batch snapshot (HBase
    guarantees per-row atomicity; batch-snapshot reads make the whole
    batch deterministic and order-free — the same discipline as
    merge_state). Returns one row per mutation: applied flag, the
    pre-image, and the post-image value.

    Plan: one equi join (mutations ⋈ live on the cell coordinate —
    broadcast when the batch is small, which is the checkAndPut use
    case) + a projection. Work ∝ batch size, never state size.
    """
    cur = live.select(
        "row_key", "family", "qualifier", F.col("value").alias("_cur")
    )
    j = cap_batch.join(cur, ["row_key", "family", "qualifier"], "left")
    curd = F.col("_cur").cast("decimal(18,2)")
    expd = F.col("expected").cast("decimal(18,2)")
    applied = (
        F.when(F.col("compare_op") == "absent", F.col("_cur").isNull())
        .when(F.col("compare_op") == "=", F.col("_cur") == F.col("expected"))
        .when(F.col("compare_op") == ">", curd > expd)
        .when(F.col("compare_op") == "<", curd < expd)
        .otherwise(F.lit(False))
    )
    return j.select(
        "row_key",
        "family",
        "qualifier",
        F.coalesce(applied, F.lit(False)).alias("applied"),
        F.col("_cur").alias("old_value"),
        F.when(F.coalesce(applied, F.lit(False)), F.col("new_value"))
        .otherwise(F.col("_cur"))
        .alias("value"),
    )


def apply_check_and_delete(live: DataFrame, cad_batch: DataFrame) -> DataFrame:
    """HBase ``checkAndDelete`` — the compare-and-DELETE half of the
    primary store's CAS verb family (Table.checkAndDelete /
    CheckAndMutate with a Delete), completing
    :func:`apply_check_and_put`'s twin: each mutation deletes its ROW
    iff the check on the named cell passes. Row granularity is the
    HBase/reference contract — the coprocessor's postDelete hook
    receives only the rowkey and removes the whole document
    (HbaseSolrIndexCoprocesser.java:55-61), so a passed check here
    produces exactly the delete event S2 captures.

    ``live``: current live cells (row_key, family, qualifier, value).
    ``cad_batch``: (row_key, family, qualifier, compare_op, expected)
    with the same comparator contract as checkAndPut: '=' is exact
    byte/string equality, '>'/'<' compare as decimal(18,2), 'absent'
    passes when the checked cell does not exist (the
    checkAndDelete(null) idiom — "delete unless someone wrote the
    guard cell").

    Semantics: ALL checks read the same pre-batch snapshot (the
    apply_check_and_put discipline — per-row atomicity plus
    batch-snapshot reads make the batch deterministic and order-free).
    Returns one DECISION row per mutation: (row_key, family,
    qualifier, applied, old_value). Applying the passed deletes is the
    caller's one-liner anti-join of ``live`` against the applied keys
    (compaction.apply_deletes' shape) — decision and application stay
    separate so the decision frame can feed the delete SINK unchanged
    (SolrIndexTools.delDoc buffers rowkeys, not cells).

    Plan: one equi join (batch ⋈ live on the cell coordinate —
    broadcast when the batch is small) + a projection; work ∝ batch
    size, never state size."""
    cur = live.select(
        "row_key", "family", "qualifier", F.col("value").alias("_cur")
    )
    j = cad_batch.join(cur, ["row_key", "family", "qualifier"], "left")
    curd = F.col("_cur").cast("decimal(18,2)")
    expd = F.col("expected").cast("decimal(18,2)")
    applied = (
        F.when(F.col("compare_op") == "absent", F.col("_cur").isNull())
        .when(F.col("compare_op") == "=", F.col("_cur") == F.col("expected"))
        .when(F.col("compare_op") == ">", curd > expd)
        .when(F.col("compare_op") == "<", curd < expd)
        .otherwise(F.lit(False))
    )
    return j.select(
        "row_key",
        "family",
        "qualifier",
        F.coalesce(applied, F.lit(False)).alias("applied"),
        F.col("_cur").alias("old_value"),
    )
