#!/usr/bin/env python
"""Bench harness (SURVEY §2.4 S5, §3.4, §7.5).

Default mode: runs the headline pipeline at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``
(default 32) and prints ONE JSON line::

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "throughput": {...edges/sec, supersteps/hour...}}

Workloads (all seed-deterministic, no external data):
  edge_build  — X1–X6 over synthetic transcripts (~12M turns/sf-unit,
                i.e. 1.2M at sf0.1 per FIXTURES.md §1 'bench')
  pagerank    — A1 on a zipf-skewed synthetic graph (~1M edges at
                sf0.1, 100k vertices) — hub skew exercises S1/AQE
  cc          — A2 to fixpoint on the same graph
  lpa         — A3, 5 bounded supersteps
  triangles   — A4 exact count on the same graph
  events_e2e  — events.parquet → edges → PageRank convergence (the
                driver-testdata path; small graph, loop-overhead bound)

Scaling mode (``--scaling``): re-runs the same workloads at
``local[8]`` and ``local[32]`` (the sandbox stand-in for N vs 4N
executors — no real cluster here; BASELINE.md documents this) in
fresh subprocesses, reports throughput at both and the efficiency
``(T_8/T_32)/(32/8)``, and appends a row to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PR_SUPERSTEPS = int(os.environ.get("SPARK_GRAFT_PR_STEPS", "12"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def synth_graph(spark, n_edges: int, n_vertices: int, seed: int = 43):
    """Zipf-skewed deterministic edge list: uniform sources, heavy-hub
    destinations (worst case for combine fan-in)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_vertices, n_edges, dtype=np.int64)
    dst = (rng.zipf(1.8, n_edges).astype(np.int64) - 1) % n_vertices
    pdf = pd.DataFrame(
        {"src": src, "dst": dst, "weight": np.ones(n_edges, dtype=np.float64)}
    )
    return spark.createDataFrame(pdf, schema="src long, dst long, weight double")


def run_bench(sf_dir: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from mesos_pregel_spark.algos.cc import connected_components
    from mesos_pregel_spark.algos.lpa import label_propagation
    from mesos_pregel_spark.algos.pagerank import pagerank
    from mesos_pregel_spark.algos.triangles import triangle_count
    from mesos_pregel_spark.fixtures import generate_transcripts
    from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids
    from mesos_pregel_spark.queries import _graph_edges
    from mesos_pregel_spark.session import get_spark

    sf = _sf_from_dir(sf_dir)
    scale = sf / 0.1
    n_conv = max(2000, int(200_000 * scale))
    n_edges = max(20_000, int(1_000_000 * scale))
    n_vertices = max(2_000, n_edges // 10)

    spark = get_spark(app_name=f"bench-{cpus}", cores=cpus)
    queries: dict[str, float] = {}
    throughput: dict[str, float] = {}

    t = time.monotonic()
    transcripts = generate_transcripts(spark, n_conv=n_conv, partitions=cpus * 2)
    transcripts = transcripts.persist()
    n_turns = transcripts.count()
    gen_sec = time.monotonic() - t

    t = time.monotonic()
    tedges = edges_with_ids(build_edges(transcripts))
    tedge_rows = tedges.count()
    queries["edge_build"] = round(time.monotonic() - t, 3)
    throughput["edge_build_turns_per_sec"] = round(n_turns / queries["edge_build"])
    transcripts.unpersist()

    g = synth_graph(spark, n_edges, n_vertices).persist()
    g_edges = g.count()

    t = time.monotonic()
    _ranks, run = pagerank(
        spark, g, tol=1e-6, max_supersteps=PR_SUPERSTEPS, edge_partitions=cpus * 2
    )
    pr_sec = time.monotonic() - t
    pr_steps = len(run.metrics)
    queries["pagerank"] = round(pr_sec, 3)
    throughput["pagerank_supersteps_per_hour"] = round(pr_steps / pr_sec * 3600)
    throughput["pagerank_edges_per_sec"] = round(g_edges * pr_steps / pr_sec)

    t = time.monotonic()
    _comps, run_cc = connected_components(spark, g, edge_partitions=cpus * 2)
    cc_sec = time.monotonic() - t
    queries["cc"] = round(cc_sec, 3)
    throughput["cc_supersteps_per_hour"] = round(len(run_cc.metrics) / cc_sec * 3600)

    t = time.monotonic()
    _labels, run_lpa = label_propagation(
        spark, g, max_supersteps=5, edge_partitions=cpus * 2
    )
    queries["lpa"] = round(time.monotonic() - t, 3)

    t = time.monotonic()
    _pv, total_tri = triangle_count(spark, g)
    queries["triangles"] = round(time.monotonic() - t, 3)

    t = time.monotonic()
    ev_edges = _graph_edges(spark, sf_dir)
    _ranks2, run_ev = pagerank(
        spark, ev_edges, tol=1e-6, max_supersteps=100, edge_partitions=8
    )
    ev_sec = time.monotonic() - t
    queries["events_e2e"] = round(ev_sec, 3)
    throughput["events_supersteps_per_hour"] = round(
        len(run_ev.metrics) / ev_sec * 3600
    )

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "pregel_link_graph_bench_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "throughput": throughput,
        "detail": {
            "n_turns": n_turns,
            "transcript_edge_rows": tedge_rows,
            "synthetic_edges": g_edges,
            "synthetic_vertices": n_vertices,
            "pagerank_supersteps": pr_steps,
            "pagerank_final_max_delta": run.metrics[-1]["max_delta"],
            "cc_supersteps": len(run_cc.metrics),
            "triangles_total": total_tri,
            "transcript_gen_sec": round(gen_sec, 3),
        },
    }
    spark.stop()
    return result


def run_scaling() -> None:
    """local[8] vs local[32] on identical inputs; efficiency =
    (throughput_32/throughput_8)/4 (BASELINE.md row)."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    thr8 = results[8]["throughput"]["pagerank_edges_per_sec"]
    thr32 = results[32]["throughput"]["pagerank_edges_per_sec"]
    eff = (thr32 / thr8) / (32 / 8)
    summary = {
        "metric": "scaling_efficiency_local8_vs_local32",
        "value": round(eff, 3),
        "unit": "ratio",
        "pagerank_edges_per_sec": {"local8": thr8, "local32": thr32},
        "full": {str(k): v for k, v in results.items()},
    }
    print(json.dumps(summary))
    _append_baseline_row(results, eff)


def _append_baseline_row(results: dict, eff: float) -> None:
    import datetime

    row = (
        f"| {datetime.date.today()} | pagerank | synth zipf "
        f"{results[32]['detail']['synthetic_edges']} edges | local[8]→local[32] | "
        f"{results[32]['throughput']['pagerank_supersteps_per_hour']} | "
        f"{results[32]['throughput']['pagerank_edges_per_sec']} | "
        f"{eff:.3f} |\n"
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    header = (
        "# BENCH/BASELINE.md — measured rows\n\n"
        "Sandbox stand-in for N vs 4N executors: same job+input at "
        "local[8] vs local[32] (SURVEY §7.6 risk 7).\n\n"
        "| date | algo | fixture | parallelism | supersteps/hour | "
        "edges/sec | scaling eff |\n|---|---|---|---|---|---|---|\n"
    )
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(header)
    with open(path, "a") as f:
        f.write(row)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench(SF_DIR, CPUS)))
