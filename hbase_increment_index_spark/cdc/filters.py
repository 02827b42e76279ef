"""HBase filter-tree compilation: ``FilterList`` composition.

The reference deploys on the HBase 0.98 client API (reference
pom.xml:19), whose scan-side predicate language is a TREE: a
``FilterList(MUST_PASS_ALL | MUST_PASS_ONE, [...])`` composes leaf
filters (RowFilter comparators, PrefixFilter,
SingleColumnValueFilter) and other FilterLists to any depth. The
engine already serves each leaf individually (cdc_scan_range,
cdc_scan_multirange, cdc_fuzzy_rowkey); this module adds the
composition verb: one recursive compile from the tree to a SINGLE
Spark ``Column`` predicate, so Catalyst sees a plain boolean
expression of sargable comparisons and pushes the conjunctive legs
into the scan (PushedFilters) exactly as a single-leaf filter would.

Filter-spec grammar (plain tuples, JSON-shaped so trees are easy to
generate, store, and property-test):

    ("AND", [spec, ...])        FilterList MUST_PASS_ALL
    ("OR",  [spec, ...])        FilterList MUST_PASS_ONE
    ("cmp", col, op, value[, filter_if_missing])
                                SingleColumnValueFilter / RowFilter:
                                op in =, !=, <, <=, >, >= (HBase
                                CompareOp names EQUAL..GREATER)
    ("prefix", col, value)      PrefixFilter on a rowkey-class column
    ("in", col, [v, ...])       TimestampsFilter-class discrete-set
                                leaf: col IN (v1, v2, ...) — one
                                sargable In predicate, so a version
                                set pushes to the scan like any
                                comparator (NULL fails membership in
                                BOTH engines' three-valued logic, the
                                HBase behavior: a missing cell has no
                                timestamp to match)
    ("stop", col, value)        InclusiveStopFilter: scan rows up to
                                AND INCLUDING the stop row →
                                col <= value (lexicographic string
                                compare, matching HBase's
                                unsigned-byte rowkey ordering)

NULL semantics are HBase's, not SQL's: SingleColumnValueFilter with
``filterIfMissing=false`` (the HBase DEFAULT) lets a row PASS when the
column is absent — the filter only compares cells that exist. A
missing cell is a NULL column in the compacted row view, so the leaf
compiles to ``col IS NULL OR col <op> value``; pass
``filter_if_missing=True`` for the drop-when-absent behavior (a plain
comparison, NULL never satisfies it under ANSI three-valued logic
once coalesced to false). Rowkey comparisons are lexicographic
(string compare), matching HBase's unsigned-byte ordering on the
string rowkeys this engine models.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_CMP_OPS = ("=", "!=", "<", "<=", ">", ">=")


class FilterSpecError(ValueError):
    pass


def _leaf_cmp(col: Column, op: str, value) -> Column:
    if op == "=":
        return col == F.lit(value)
    if op == "!=":
        return col != F.lit(value)
    if op == "<":
        return col < F.lit(value)
    if op == "<=":
        return col <= F.lit(value)
    if op == ">":
        return col > F.lit(value)
    if op == ">=":
        return col >= F.lit(value)
    raise FilterSpecError(f"unknown comparator {op!r} (use one of {_CMP_OPS})")


def compile_filter_list(spec) -> Column:
    """Compile an HBase filter tree (grammar above) to one boolean
    ``Column``. Pure and recursive; AND/OR legs fold with Spark's
    ``&``/``|`` so the optimizer sees ordinary nested boolean
    expressions (conjunctive sargable legs reach PushedFilters)."""
    if not isinstance(spec, (tuple, list)) or not spec:
        raise FilterSpecError(f"bad filter spec: {spec!r}")
    kind = spec[0]
    if kind in ("AND", "OR"):
        if len(spec) != 2 or not isinstance(spec[1], (tuple, list)) or not spec[1]:
            raise FilterSpecError(f"{kind} takes a non-empty filter list")
        legs = [compile_filter_list(s) for s in spec[1]]
        out = legs[0]
        for leg in legs[1:]:
            out = (out & leg) if kind == "AND" else (out | leg)
        return out
    if kind == "cmp":
        if len(spec) not in (4, 5):
            raise FilterSpecError("cmp takes (col, op, value[, filter_if_missing])")
        _, col, op, value, *rest = spec
        filter_if_missing = bool(rest[0]) if rest else False
        cmp_col = _leaf_cmp(F.col(col), op, value)
        if filter_if_missing:
            return cmp_col
        # HBase default: rows without the cell pass the filter
        return F.col(col).isNull() | cmp_col
    if kind == "prefix":
        if len(spec) != 3:
            raise FilterSpecError("prefix takes (col, value)")
        _, col, value = spec
        return F.col(col).startswith(str(value))
    if kind == "in":
        if (
            len(spec) != 3
            or not isinstance(spec[2], (tuple, list))
            or not spec[2]
        ):
            raise FilterSpecError("in takes (col, [values...]) non-empty")
        _, col, values = spec
        import datetime as _dt

        # datetime values become TIMESTAMP_NTZ literals: the engine's
        # timestamp convention is NTZ throughout (catalog tables, the
        # DuckDB oracle's naive timestamps). A bare datetime literal
        # would infer the LTZ TimestampType, forcing a cast on the
        # COLUMN that blocks predicate pushdown; casting the literal
        # instead constant-folds, so In(ts, ...) reaches PushedFilters.
        vals = [
            F.lit(v).cast("timestamp_ntz") if isinstance(v, _dt.datetime) else v
            for v in values
        ]
        return F.col(col).isin(vals)
    if kind == "stop":
        if len(spec) != 3:
            raise FilterSpecError("stop takes (col, value)")
        _, col, value = spec
        return F.col(col) <= F.lit(str(value))
    raise FilterSpecError(f"unknown filter node {kind!r}")


def filter_list_sql(spec) -> str:
    """The same tree rendered as an ANSI-SQL boolean expression — the
    oracle twin of :func:`compile_filter_list`, used by the DuckDB
    side of the correctness gate and by the property test (random
    trees must agree between the two compilers on every row)."""
    if not isinstance(spec, (tuple, list)) or not spec:
        raise FilterSpecError(f"bad filter spec: {spec!r}")
    kind = spec[0]
    if kind in ("AND", "OR"):
        joiner = " AND " if kind == "AND" else " OR "
        return "(" + joiner.join(filter_list_sql(s) for s in spec[1]) + ")"
    if kind == "cmp":
        _, col, op, value, *rest = spec
        filter_if_missing = bool(rest[0]) if rest else False
        op_sql = "<>" if op == "!=" else op
        lit = _sql_lit(value)
        if filter_if_missing:
            return f"({col} {op_sql} {lit})"
        return f"({col} IS NULL OR {col} {op_sql} {lit})"
    if kind == "prefix":
        _, col, value = spec
        # backslash FIRST so a literal \ in the prefix stays literal
        # under ESCAPE '\' (and the \% / \_ escapes added after are
        # not themselves re-doubled)
        esc = (
            str(value)
            .replace("\\", "\\\\")
            .replace("'", "''")
            .replace("%", r"\%")
            .replace("_", r"\_")
        )
        return f"({col} LIKE '{esc}%' ESCAPE '\\')"
    if kind == "in":
        _, col, values = spec
        return f"({col} IN ({', '.join(_sql_lit(v) for v in values)}))"
    if kind == "stop":
        _, col, value = spec
        return f"({col} <= {_sql_lit(str(value))})"
    raise FilterSpecError(f"unknown filter node {kind!r}")


def _sql_lit(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    return "'" + str(value).replace("'", "''") + "'"


def dependent_column_filter(
    cells: DataFrame,
    family: str,
    qualifier: str,
    value_op: str | None = None,
    value: str | None = None,
    drop_dependent: bool = False,
) -> DataFrame:
    """HBase ``DependentColumnFilter(family, qualifier,
    dropDependentColumn, [CompareOp, comparator])`` (HBase 0.98 filter
    API, reference pom.xml:19) — the cross-column TIMESTAMP
    dependency: collect the timestamps of the row's reference-column
    cells that pass the optional value check, then keep any cell of
    the row whose timestamp is in that stamp set; ``drop_dependent``
    additionally removes the reference column itself from the output
    (HBase's dropDependentColumn flag).

    Compiles to ONE window over the row partition — no join: on a
    compacted (live) view each row holds at most one version of the
    reference cell, so the stamp set is the max-when over the
    partition and membership is a plain timestamp equality. The
    window reuses the compaction's row_key clustering, so no extra
    shuffle at any scale; a multi-version stamp SET would be the same
    shape with collect_set + array_contains. Value comparison is the
    unsigned-byte (lexicographic string) order of HBase's
    BinaryComparator, as in the other comparator leaves."""
    ref_cell = (F.col("family") == family) & (F.col("qualifier") == qualifier)
    passes = ref_cell
    if value_op is not None:
        passes = passes & _leaf_cmp(F.col("value"), value_op, value)
    w = Window.partitionBy("row_key")
    stamp = F.max(F.when(passes, F.col("ts"))).over(w)
    out = (
        cells.withColumn("_dep_ts", stamp)
        .filter(F.col("ts") == F.col("_dep_ts"))
        .drop("_dep_ts")
    )
    if drop_dependent:
        out = out.filter(~ref_cell)
    return out
