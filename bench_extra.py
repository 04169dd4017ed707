#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1.4).

NOT the driver bench: ``bench.py`` is frozen for measurement. This tool
times individual declared queries with the noop sink (min over N passes,
same methodology), captures ``.explain("formatted")`` into
``plans/<tag>/<query>_<suffix>.txt``, and labels jobs so the UI/eventlog
is readable. Usage:

    python bench_extra.py --sf-dir /root/testdata/sf1.0 \
        --queries ngram_jaccard_pairs,dedup_groups --passes 2 \
        --plans plans/r07 --suffix before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default=None, help="comma list; default: all")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir to write explain(formatted) files")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    import __spark_entry__ as E
    from couch_to_mongo_spark.session import get_spark

    extra = {"spark.ui.showConsoleProgress": "false"}
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/c2m-bench-extra"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    spark = get_spark(f"bench-extra-{args.cpus}", cpus=args.cpus, extra_conf=extra)

    qs = E.queries()
    names = args.queries.split(",") if args.queries else list(qs)
    out = {}
    for name in names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf_dir)
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        walls = []
        for _ in range(max(args.passes, 1)):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            walls.append(round(wall, 3))
            best = wall if best is None else min(best, wall)
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": round(best, 3), "walls": walls}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "results": {k: v["min"] for k, v in out.items()}}))


if __name__ == "__main__":
    main()
