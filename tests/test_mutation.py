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


def _crash_after(ck_dir, last_kept_step):
    """Simulate a crash: drop every checkpoint superstep dir (including
    the final one) newer than ``last_kept_step``."""
    import re
    import shutil
    import os

    for name in os.listdir(ck_dir):
        m = re.match(r"^superstep=(\d{6})$", name)
        if m and int(m.group(1)) > last_kept_step:
            shutil.rmtree(os.path.join(ck_dir, name))


def test_prune_checkpoint_resume_equals_straight(spark, tmp_path):
    """Mutation runs now checkpoint TOPOLOGY beside vertex state:
    interrupt a pruning k-core mid-peel (crash-simulated by deleting
    the newer checkpoints), resume, and the final membership equals the
    straight-through run — the resume replays against the pruned edge
    snapshot, not the caller's original edges."""
    # chain 1..6 peels over several rounds; K4 on 7..10 survives k=2
    rows = [(i, i + 1, 1.0) for i in range(1, 6)] + [(6, 7, 1.0)] + [
        (7, 8, 1.0), (8, 9, 1.0), (9, 10, 1.0), (7, 9, 1.0), (8, 10, 1.0),
        (7, 10, 1.0),
    ]
    straight, _ = k_core(spark, _df(spark, rows), k=2, prune_edges=True)
    ck = str(tmp_path / "kc")
    _full, run1 = k_core(
        spark, _df(spark, rows), k=2, prune_edges=True,
        checkpoint_dir=ck, checkpoint_every=1,
    )
    assert len(run1.metrics) >= 3  # a real multi-round cascade
    _crash_after(ck, 1)
    resumed, run2 = k_core(
        spark, _df(spark, rows), k=2, prune_edges=True,
        checkpoint_dir=ck, checkpoint_every=1,
    )
    assert run2.metrics[0]["superstep"] >= 2  # actually resumed
    assert (
        {r["id"]: r["in_core"] for r in resumed.collect()}
        == {r["id"]: r["in_core"] for r in straight.collect()}
    )


def test_mutation_resume_missing_snapshot_rejected(spark, tmp_path):
    """A checkpoint without an edge snapshot (pre-topology layout /
    torn write) must be rejected, not resumed against stale edges."""
    import os
    import shutil

    rows = [(i, i + 1, 1.0) for i in range(1, 6)]
    ck = str(tmp_path / "kc")
    k_core(
        spark, _df(spark, rows), k=2, prune_edges=True,
        checkpoint_dir=ck, checkpoint_every=1,
    )
    _crash_after(ck, 1)
    shutil.rmtree(os.path.join(ck, "superstep=000001", "edges"))
    with pytest.raises(ValueError, match="edge snapshot"):
        k_core(
            spark, _df(spark, rows), k=2, prune_edges=True,
            checkpoint_dir=ck, checkpoint_every=1,
        )


def _max_prop_program():
    """Directed max-propagation whose mutation adds the reversed edges
    after the first superstep (idempotent on re-fire)."""

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

    return VertexProgram(
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


def test_mutation_can_add_edges(spark):
    """Directed max-propagation on the 'V' 1→2←3: without mutation the
    answer is {1:1, 2:3, 3:3} (vertex 1 can never hear about 3); the
    program adds the reversed edges after its first superstep, so the
    global max reaches everyone — additions visibly change the
    result.  (Superstep 1 does change vertex 2, so the run is still
    live when the mutation fires.)"""
    rows = [(1, 2, 1.0), (3, 2, 1.0)]
    result, run = pregel(
        spark, _df(spark, rows), _max_prop_program(), max_supersteps=20)
    assert {r["id"]: r["mx"] for r in result.collect()} == {1: 3, 2: 3, 3: 3}
    # the mutated table has both directions: 4 edges
    assert run.metrics[0]["edges_after_mutation"] == 4


def test_addition_mutation_resume_uses_snapshot(spark, tmp_path):
    """The sharp fidelity case: for the addition program the RESULT
    depends on the mutated topology (vertex 1 only hears about 3 over
    an ADDED edge), so a resume that replayed the caller's original
    directed edges would end with mx[1] == 1.  Interrupt right after
    the mutation superstep; the resumed run must read the snapshot."""
    rows = [(1, 2, 1.0), (3, 2, 1.0)]
    ck = str(tmp_path / "mp")
    _partial, run1 = pregel(
        spark, _df(spark, rows), _max_prop_program(),
        max_supersteps=1, checkpoint_dir=ck, checkpoint_every=1,
    )
    assert run1.metrics[0]["edges_after_mutation"] == 4
    result, run2 = pregel(
        spark, _df(spark, rows), _max_prop_program(),
        max_supersteps=20, checkpoint_dir=ck, checkpoint_every=1,
    )
    assert run2.metrics[0]["superstep"] >= 1  # resumed, not re-run
    assert {r["id"]: r["mx"] for r in result.collect()} == {1: 3, 2: 3, 3: 3}
