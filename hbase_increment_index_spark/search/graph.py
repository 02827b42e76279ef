"""Graph traversal query parser — Solr ``{!graph}`` (SURVEY.md §2.2).

Solr's graph query (``{!graph from=f to=t maxDepth=n}rootQuery``)
starts from the documents matching ``rootQuery`` and repeatedly walks
edges: at each step it gathers the ``from``-field values of the
current frontier and matches them against the ``to`` field of other
documents, until ``maxDepth`` hops or a fixed point.

Spark mapping — level-synchronous BFS as a bounded chain of joins:

  frontier_0 = docs matching root predicate           (depth 0)
  frontier_d = docs whose to-field ∈ from-values(frontier_{d-1})
               minus everything already visited        (depth d)

Each hop is: distinct from-values of the frontier (a small key set —
broadcast), a semi-join against the corpus on the to field (the
filter pushes into the scan), and an anti-join against visited keys
so every node is labeled with its FIRST (minimum) hop count — BFS
order, matching the recursive-CTE ``MIN(depth)`` oracle.

Scale shape: per hop the corpus is probed once with a broadcast hash
join on the frontier's key set; work is proportional to the frontier,
not to depth × corpus. For unbounded (fixed-point) traversals,
persist each frontier and loop until it is empty — the per-hop plan
is unchanged; the bounded form here keeps the whole traversal one
lazy plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_traverse(
    df: DataFrame,
    id_col: str,
    from_col: str,
    to_col: str,
    root_pred,
    max_depth: int = 3,
    persist_levels: bool = True,
) -> DataFrame:
    """Nodes reachable from ``root_pred`` docs in ≤ ``max_depth`` hops,
    each tagged with its minimum hop count as ``depth``.

    Edge rule (Solr {!graph}): doc B is one hop from doc A when
    ``B[to_col] == A[from_col]``.

    ``persist_levels`` caches each frontier so level d's plan doesn't
    re-derive levels 0..d-1 (the standard iterative-algorithm hygiene —
    without it the lazy plan re-expands the whole BFS chain at every
    level, quadratic plan growth in depth). Disable only for
    plan-inspection of the fully-inlined form.
    """
    proj = df.select(
        F.col(id_col), F.col(from_col).alias("_from"), F.col(to_col).alias("_to")
    )
    frontier = df.filter(root_pred).select(
        F.col(id_col), F.col(from_col).alias("_from"), F.col(to_col).alias("_to")
    )
    visited = frontier.select(F.col(id_col), F.lit(0).alias("depth"))
    cached = []
    for d in range(1, int(max_depth) + 1):
        nxt = (
            proj.join(
                F.broadcast(frontier.select(F.col("_from").alias("_v")).distinct()),
                proj["_to"] == F.col("_v"),
            )
            .drop("_v")
            .join(visited.select(id_col), id_col, "left_anti")
            .dropDuplicates([id_col])
        )
        if persist_levels:
            nxt = nxt.persist()
            cached.append(nxt)
        visited = visited.unionByName(
            nxt.select(F.col(id_col), F.lit(d).alias("depth"))
        )
        frontier = nxt
    if not cached:
        return visited
    # the per-level caches exist only to stop quadratic plan
    # re-expansion while the BFS is BUILT; materialize the (small)
    # node set once, lineage-truncated, then release every level so a
    # serving facade issuing many traversals doesn't accumulate
    # cached partitions for the life of the session
    out = visited.localCheckpoint(eager=True)
    for f in cached:
        f.unpersist()
    return out
