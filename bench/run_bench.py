#!/usr/bin/env python
"""spark-submit entry point (BASELINE.json:6,14 — the job runs via
``spark-submit --py-files`` on multi-executor clusters; SURVEY §3.4).

Usage (cluster):
    python scripts/package.py                       # builds dist/engine.zip
    spark-submit --master <cluster> \
        --py-files dist/engine.zip bench/run_bench.py \
        --sf-dir /path/to/sf --algo pagerank

Usage (sandbox stand-in):
    spark-submit --master 'local[8]' --py-files dist/engine.zip \
        bench/run_bench.py --algo pagerank --edges 1000000

Unlike bench.py (which builds its own local session), this script uses
the session spark-submit provides — master, executor counts and memory
come from the submit command, which is exactly how the N-vs-4N
executor comparison runs on a real cluster.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--algo", default="pagerank",
                   choices=["pagerank", "cc", "lpa", "triangles"])
    p.add_argument("--sf-dir", default=None,
                   help="testdata dir; build the graph from events.parquet")
    p.add_argument("--edges", type=int, default=1_000_000,
                   help="synthetic graph size when no --sf-dir given")
    p.add_argument("--vert-ratio", type=float, default=10.0)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-supersteps", type=int, default=30)
    p.add_argument("--checkpoint-dir", default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"pregel-{args.algo}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # Imports resolve from --py-files (engine.zip) or the repo checkout.
    from mesos_pregel_spark.algos.cc import connected_components
    from mesos_pregel_spark.algos.lpa import label_propagation
    from mesos_pregel_spark.algos.pagerank import pagerank
    from mesos_pregel_spark.algos.triangles import triangle_count

    nparts = args.partitions or spark.sparkContext.defaultParallelism

    if args.sf_dir:
        from mesos_pregel_spark.queries import _graph_edges
        edges = _graph_edges(spark, args.sf_dir)
    else:
        from bench import synth_graph
        edges = synth_graph(
            spark, args.edges, max(2000, int(args.edges / args.vert_ratio)),
            partitions=nparts,
        )

    t = time.monotonic()
    if args.algo == "pagerank":
        result, run = pagerank(
            spark, edges, tol=args.tol, max_supersteps=args.max_supersteps,
            checkpoint_dir=args.checkpoint_dir, edge_partitions=nparts,
        )
        n_steps = len(run.metrics)
    elif args.algo == "cc":
        result, run = connected_components(
            spark, edges, max_supersteps=args.max_supersteps,
            checkpoint_dir=args.checkpoint_dir, edge_partitions=nparts,
        )
        n_steps = len(run.metrics)
    elif args.algo == "lpa":
        result, run = label_propagation(
            spark, edges, max_supersteps=min(args.max_supersteps, 20),
            checkpoint_dir=args.checkpoint_dir, edge_partitions=nparts,
        )
        n_steps = len(run.metrics)
    else:
        result, total = triangle_count(spark, edges)
        n_steps = 1
    n_rows = result.count()
    dt = time.monotonic() - t

    print(json.dumps({
        "algo": args.algo,
        "seconds": round(dt, 3),
        "supersteps": n_steps,
        "supersteps_per_hour": round(n_steps / dt * 3600),
        "result_rows": n_rows,
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
