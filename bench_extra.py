#!/usr/bin/env python
"""Ad-hoc per-query profiling harness (guide §1.4) — NOT the frozen bench.py.

Times individual declared queries through the noop sink, optionally dumping
`.explain("formatted")` to a file. Usage:

    python bench_extra.py --sf-dir /root/testdata/sf1.0 er_fs_multilevel_scores
    python bench_extra.py --reps 2 --explain-dir plans/r06 er_mcl er_ktruss
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("queries", nargs="+")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    p.add_argument("--reps", type=int, default=1)
    p.add_argument("--explain-dir", default=None)
    p.add_argument("--explain-suffix", default="")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    import __spark_entry__ as E
    from fel_spark.session import get_spark

    spark = get_spark(app_name="fel_bench_extra", master=args.master)
    qs = E.queries()
    out = {}
    for name in args.queries:
        fn = qs[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            plan = fn(spark, args.sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, args.sf_dir)._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain_dir, f"{name}{args.explain_suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        times = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = times
        print(f"## {name}: {times}", flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "times": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
