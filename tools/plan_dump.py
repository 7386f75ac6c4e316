"""Dump .explain('formatted') and optionally noop-time registry queries.

Usage:
    python tools/plan_dump.py [--time N] [--out DIR] [--sf DIR] name1 name2 ...

Writes DIR/<name>.txt with the formatted plan (default plans/r12/work/),
and with --time N runs N noop-write passes per query printing the best.
The SparkSession is the bench session (same env contract), so plans match
what bench.py executes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiotcvectordb_spark import queries as Q
from aiotcvectordb_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    n_time = 0
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12", "work",
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = ""
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--time":
            n_time = int(args[i + 1]); i += 2
        elif args[i] == "--out":
            out_dir = args[i + 1]; i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump")
    # same warmup as bench.py so timings are comparable
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import functions as F

    warm = spark.range(64).withColumn("v", F.rand(seed=1))

    def _noop(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    warm.mapInPandas(_noop, schema="id long, v double").count()
    for name in names:
        fn = Q.QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exchanges = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("MapInArrow")
        print(f"# {name}: plan -> {path} (Exchange={n_exchanges}, pyNodes={n_py})")
        if n_time:
            best = float("inf")
            for _ in range(n_time):
                spark.sparkContext.setJobDescription(f"plan_dump:{name}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = min(best, dt)
                print(f"#   {name}: {dt:.3f}s")
            print(f"# {name}: best={best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
