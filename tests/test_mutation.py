"""Topology mutation [P §3.4]: the edge table can change between
supersteps — removals via k-core's prune_edges demo, additions via a
custom program that symmetrizes its own graph mid-run."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import id_space
from tests.oracle_pregel import oracle_kcore

from mesos_pregel_spark.algos.kcore import k_core
from mesos_pregel_spark.fixtures import generate_transcripts
from mesos_pregel_spark.functions.edges import build_edges, edges_with_ids
from mesos_pregel_spark.plans.program import VertexProgram, pregel


def _df(spark, rows):
    schema = T.StructType([
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ])
    return spark.createDataFrame(rows, schema=schema)


def test_prune_edges_result_identical_and_shrinking(spark):
    """Triangle + tail, k=2: pruning drops the peeled tail's edges
    round by round (10 → 8 → 6 symmetric rows) without changing the
    answer."""
    rows = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (3, 4, 1.0), (4, 5, 1.0)]
    plain, _ = k_core(spark, _df(spark, rows), k=2)
    pruned, run = k_core(spark, _df(spark, rows), k=2, prune_edges=True)
    assert (
        {r["id"]: r["in_core"] for r in plain.collect()}
        == {r["id"]: r["in_core"] for r in pruned.collect()}
        == oracle_kcore(rows, 2)
    )
    sizes = [m.get("edges_after_mutation") for m in run.metrics]
    assert sizes[0] == 8 and sizes[1] == 6      # two peel rounds shrink
    assert sizes[-1] is None                     # quiet round: no mutation


def test_prune_edges_transcript_graph(spark):
    t = generate_transcripts(spark, n_conv=300, seed=42)
    ids_df = edges_with_ids(build_edges(t))
    plain, _ = k_core(spark, ids_df, k=3)
    pruned, _ = k_core(spark, ids_df, k=3, prune_edges=True)
    assert (
        {r["id"]: r["in_core"] for r in plain.collect()}
        == {r["id"]: r["in_core"] for r in pruned.collect()}
    )


def test_mutation_rejected_with_checkpoint(spark, tmp_path):
    rows = [(1, 2, 1.0), (2, 3, 1.0)]
    with pytest.raises(ValueError, match="mutate_edges"):
        k_core(
            spark, _df(spark, rows), k=2, prune_edges=True,
            checkpoint_dir=str(tmp_path / "kc"),
        )


def test_mutation_can_add_edges(spark):
    """Directed max-propagation on the 'V' 1→2←3: without mutation the
    answer is {1:1, 2:3, 3:3} (vertex 1 can never hear about 3); the
    program adds the reversed edges after its first superstep, so the
    global max reaches everyone — additions visibly change the
    result.  (Superstep 1 does change vertex 2, so the run is still
    live when the mutation fires.)"""

    def init(e, ctx):
        return (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id"))).distinct()
            .select("id", F.col("id").alias("mx"), F.lit(True).alias("changed"))
        )

    def apply(state, combined, ctx):
        return (
            state.join(combined, state["id"] == combined["dst"], "left_outer")
            .select(
                state["id"],
                F.greatest(
                    state["mx"], F.coalesce(combined["msg_max"], state["mx"])
                ).alias("mx"),
                (
                    F.coalesce(combined["msg_max"], state["mx"]) > state["mx"]
                ).alias("changed"),
            )
        )

    def mutate(e, state, ctx):
        if ctx.get("sym_done"):
            return None
        ctx["sym_done"] = True
        return e.select("src", "dst").unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()

    prog = VertexProgram(
        name="max_prop_directed",
        init=init,
        prep_edges=lambda e: e.select("src", "dst").distinct(),
        edge_cols=("src", "dst"),
        msg_cols=[F.col("mx").alias("msg")],
        active_filter=F.col("changed"),
        combiner={"msg_max": ("msg", "max")},
        apply=apply,
        aggregators=[F.sum(F.col("changed").cast("long")).alias("active")],
        halt=lambda aggs: aggs["active"] == 0,
        mutate_edges=mutate,
    )
    rows = [(1, 2, 1.0), (3, 2, 1.0)]
    result, run = pregel(spark, _df(spark, rows), prog, max_supersteps=20)
    assert {r["id"]: r["mx"] for r in result.collect()} == {1: 3, 2: 3, 3: 3}
    # the mutated table has both directions: 4 edges
    assert run.metrics[0]["edges_after_mutation"] == 4
