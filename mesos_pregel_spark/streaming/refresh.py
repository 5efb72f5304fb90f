"""Streaming → Pregel refresh glue: re-rank a link graph after a
streaming micro-batch lands new edges, WARM-STARTED from the previous
converged state.

Why this exists: the streaming side (streaming/edges.py,
streaming/stateful.py) maintains an incrementally-updated edge table;
the batch side (plans/program.py) runs fixpoints from scratch.  On a
small edge delta the previous converged PageRank vector is already
within ~delta of the new fixpoint, so initializing from it converges
in a fraction of the cold supersteps when the tolerance sits above the
perturbation scale — the production regime for per-micro-batch deltas
on a large graph (pytest-pinned in tests/test_streaming_refresh.py:
warm first-step max_delta 3.6e-4 vs cold 4.1e-2 on a 1-edge delta to
a 500-vertex graph; at tolerances far below the perturbation both
runs grind the same spectral tail and warm saves only its head
start).  The damped power iteration has a UNIQUE fixpoint, so warm
and cold runs agree to the convergence tolerance — warm-starting
changes cost, not the answer.

Scale shape: the warm init is ONE left join of the fresh vertex set
against the previous rank table (both id-keyed), then the standard
superstep loop; nothing else changes, so all engine machinery
(salting, lineage truncation, checkpointing) applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.algos.pagerank import pagerank_program
from mesos_pregel_spark.plans.pregel import PregelRun
from mesos_pregel_spark.plans.program import pregel


def warm_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    prev_ranks: DataFrame | None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_supersteps: int = 100,
    edge_partitions: int | None = None,
    n_salt: int = 0,
    salt_hot_k: int = 0,
) -> tuple[DataFrame, PregelRun]:
    """PageRank on ``edges`` initialized from ``prev_ranks``
    (id, pagerank) where available; vertices new since the previous run
    start at the cold 1/N.  ``prev_ranks=None`` degrades to a cold run.
    Returns (ranks(id, pagerank), run)."""
    program = pagerank_program(damping=damping, tol=tol)
    if prev_ranks is not None:
        base_init = program.init
        prev = prev_ranks.select(
            "id", F.col("pagerank").alias("warm_pr")
        )

        def init(e: DataFrame, ctx: dict) -> DataFrame:
            state = base_init(e, ctx)  # (id, outdeg, pr=1/N)
            return state.join(prev, "id", "left_outer").select(
                "id", "outdeg",
                F.coalesce("warm_pr", F.col("pr")).alias("pr"),
            )

        program.init = init
    return pregel(
        spark, edges, program,
        max_supersteps=max_supersteps,
        n_salt=n_salt, salt_hot_k=salt_hot_k,
        edge_partitions=edge_partitions,
    )


def refresh_pagerank_from_stream(
    spark: SparkSession,
    transitions_dir: str,
    prev_ranks: DataFrame | None,
    **kwargs,
) -> tuple[DataFrame, PregelRun]:
    """End-to-end refresh: consolidate the stateful linker's appended
    transitions (streaming/stateful.py) into the current edge snapshot,
    assign stable ids (X6), and warm-start PageRank from the previous
    converged ranks.  Call after each micro-batch lands (or on a
    cadence); feed the returned ranks back in as ``prev_ranks`` next
    time."""
    from mesos_pregel_spark.functions.edges import edges_with_ids
    from mesos_pregel_spark.streaming.stateful import stateful_edges_snapshot

    snapshot = stateful_edges_snapshot(spark, transitions_dir)
    return warm_pagerank(spark, edges_with_ids(snapshot), prev_ranks, **kwargs)
