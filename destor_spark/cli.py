"""spark-submit entrypoint.

Cluster usage (north rule: spark-submit --py-files at N and 4N
executors; spark-submit takes an application FILE — package.sh copies
this module to dist/cli_main.py for exactly that):

    ./package.sh
    spark-submit --master <cluster> \
        --py-files dist/destor_spark.zip \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        dist/cli_main.py \
        --input  <parquet path of web_pages> \
        --output <checkpoint + assignment dir> \
        --run-id r1 [--no-simhash] [--substring]

    # Iceberg input: add the runtime jar + catalog confs (README
    # "catalog" section) and pass --input-table <catalog.db.table>
    # instead of --input — the current-snapshot read goes through the
    # catalog, never a raw directory scan of data files.

Local sandbox equivalent:

    python -m destor_spark.cli --input .bench_cache/web_pages_s42_n5000.parquet \
        --output /tmp/run1 --master 'local[8]'

destor analogue: the destor binary's job dispatch
(/root/reference/src/destor.c:263-355) — one entrypoint, config knobs,
durable state under the working directory.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="destor_spark dedup pipeline")
    p.add_argument(
        "--input",
        default=None,
        help="web_pages parquet path (for Iceberg use --input-table)",
    )
    p.add_argument(
        "--input-table",
        default=None,
        help="catalog table name (e.g. dedup.db.web_pages) read via "
        "spark.read.table — the correct current-snapshot path for "
        "Iceberg; a raw --input directory scan of an Iceberg location "
        "would also read superseded-snapshot files",
    )
    p.add_argument("--output", required=True, help="checkpoint/output dir")
    p.add_argument("--run-id", default="r1")
    p.add_argument("--master", default=None, help="override spark master")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--no-simhash", action="store_true")
    p.add_argument("--substring", action="store_true",
                   help="also run the exact-substring pass")
    p.add_argument("--shingle-size", type=int, default=5)
    p.add_argument("--num-hashes", type=int, default=128)
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--rows", type=int, default=8)
    p.add_argument("--tau", type=float, default=0.71)
    args = p.parse_args(argv)
    if bool(args.input) == bool(args.input_table):
        p.error("exactly one of --input / --input-table is required")

    from destor_spark.config import DedupConfig
    from destor_spark.plans.pipeline import run_checkpointed
    from destor_spark.session import build_session

    cfg = DedupConfig(
        shingle_size=args.shingle_size,
        num_hashes=args.num_hashes,
        bands=args.bands,
        rows=args.rows,
        tau=args.tau,
    )
    spark = build_session(
        app=f"destor-spark-{args.run_id}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    pages = (
        spark.read.table(args.input_table)
        if args.input_table
        else spark.read.parquet(args.input)
    )
    t0 = time.time()
    assign = run_checkpointed(
        spark,
        pages,
        cfg,
        args.output,
        run_id=args.run_id,
        use_simhash=not args.no_simhash,
        use_substring=args.substring,
    )
    n = assign.count()
    n_clusters = assign.filter("is_canonical").count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "run_id": args.run_id,
                "docs": n,
                "clusters": n_clusters,
                "dup_docs": n - n_clusters,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n / wall, 1),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
