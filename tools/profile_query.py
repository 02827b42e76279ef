"""Per-query optimization profiler (r16).

For each named registry query, separates where the wall time goes:

  build    – Python call that constructs the DataFrame (plan build +
             analysis; includes any driver-side collects the builder
             itself performs, e.g. bounded seed pulls)
  topandas – best/median of N end-to-end runs via toPandas(), the
             bench's timed action
  noop     – best/median of N runs through the noop sink (guide §1.4),
             isolating computation from driver materialization

Optionally dumps .explain("formatted") to plans/r16/<name>_<tag>.txt
so before/after plan evidence is committed (judge contract).

  python tools/profile_query.py [--sf DIR] [--runs N] [--explain TAG] \
         [--noop] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="write plans/r16/<name>_<TAG>.txt")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    from hbase_increment_index_spark.queries import QUERIES
    from hbase_increment_index_spark.session import get_spark

    spark = get_spark("profile")
    spark.range(1).count()
    # warm-up: absorb codegen-compiler + parquet-footer one-time costs
    QUERIES["flagship"](spark, args.sf).toPandas()
    QUERIES["e4_token_counts"](spark, args.sf).toPandas()
    spark.catalog.clearCache()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in args.names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = fn(spark, args.sf)
        build_s = time.time() - t0
        if args.explain:
            path = os.path.join(repo, "plans", "r16", f"{name}_{args.explain}.txt")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
            print(f"#   plan -> {os.path.relpath(path, repo)}")
        runs = []
        nrows = 0
        for _ in range(args.runs):
            t0 = time.time()
            nrows = len(fn(spark, args.sf).toPandas())
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        line = (f"{name}: build={build_s:.3f}s topandas(min={min(runs):.3f} "
                f"med={sorted(runs)[len(runs)//2]:.3f} runs={runs}) rows={nrows}")
        if args.noop:
            nruns = []
            for _ in range(args.runs):
                t0 = time.time()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                nruns.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
            line += f" noop(min={min(nruns):.3f} runs={nruns})"
        print(line)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
