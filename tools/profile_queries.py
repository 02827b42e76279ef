"""Per-query cost decomposition: construction+analysis vs execution.

For each named registry entry, measure (a) DataFrame construction time
(the query function call, which also pays any eager collects the
operator runs at build time, plus one .schema to force analysis) and
(b) execution time (toPandas). Guide §1: decide whether a slow key is
plan-build-bound, scheduling-bound or compute-bound before touching it.

Caveat: this clears caches after EVERY run, so build-once/query-many
operators (the minhash family) profile COLDER here than in bench.py,
which clears per query and legitimately serves runs 2-5 from the live
store (e2b bench min 0.06 s vs ~2.5 s here — by design, not a bug).

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_queries.py q46_hybrid_rrf e14_dsir ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    from hbase_increment_index_spark.functions.layout import release_checkpoints
    from hbase_increment_index_spark.queries import QUERIES
    from hbase_increment_index_spark.session import get_spark

    spark = get_spark("profile")
    spark.range(1).count()
    QUERIES["flagship"](spark, sf_dir).toPandas()  # warm-up
    for name in names:
        fn = QUERIES[name]
        rows = []
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            _ = df.schema  # force analysis
            t1 = time.time()
            pdf = df.toPandas()
            t2 = time.time()
            rows.append((t1 - t0, t2 - t1, len(pdf)))
            spark.catalog.clearCache()
            release_checkpoints(spark)
        best = min(rows, key=lambda r: r[0] + r[1])
        print(
            f"{name}: construct+analyze {best[0]:.3f}s, execute {best[1]:.3f}s, "
            f"rows {best[2]}  (all runs: "
            + ", ".join(f"[{a:.2f}+{b:.2f}]" for a, b, _ in rows)
            + ")"
        )


if __name__ == "__main__":
    main()
