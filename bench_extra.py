#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py stays frozen).

Times individual declared queries at an arbitrary SF dir with the same
`.count()` methodology as bench.py, and can dump `.explain("formatted")`
per query into plans/r06/<query>_<suffix>.txt for the plan-diff record.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --repeats 2 \
      --queries ann_cosine_topk,ivf_ann_topk --explain-suffix before
  python bench_extra.py --sf /root/testdata/sf1.0 --all
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--explain-suffix", default="",
                    help="dump plans/r06/<q>_<suffix>.txt per query")
    ap.add_argument("--noop", action="store_true",
                    help="use the noop sink instead of .count()")
    args = ap.parse_args()

    import destor_spark.queries as Q
    from destor_spark.session import build_session

    names = (
        list(Q.QUERIES) if args.all
        else [q for q in args.queries.split(",") if q]
    )
    spark = build_session(
        app="destor-bench-extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    out: dict[str, float] = {}
    for name in names:
        fn = Q.QUERIES[name]
        if args.explain_suffix:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            pdir = os.path.join(REPO, "plans", "r06")
            os.makedirs(pdir, exist_ok=True)
            with open(
                os.path.join(pdir, f"{name}_{args.explain_suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        best = None
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            # time fn() + count together, exactly like bench.py: eager
            # _barrier parquet writes run during query CONSTRUCTION and
            # are part of the frozen bench's timed window
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            wall = round(time.time() - t0, 3)
            best = wall if best is None else min(best, wall)
            spark.sparkContext.setJobDescription(None)
        out[name] = best
        print(f"  {name}: {best}s", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": args.sf, "cpus": args.cpus,
                      "repeats": args.repeats, "noop": args.noop,
                      "queries": out,
                      "total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
