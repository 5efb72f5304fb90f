"""Strongly connected components — the coloring algorithm
(Trim → Forward-Max-Color → Backward-Reach-in-Color → peel), the
standard Pregel-style SCC for web-scale digraphs (Orzan's coloring /
the FW-BW-Trim family).

Pinned semantics (python Tarjan oracle in tests, pairwise-reach
recursive-CTE oracle in the driver): every vertex gets
``scc`` = the MINIMUM vertex id of its strongly connected component.

Algorithm, per outer round on the remaining subgraph:

1. **Trim** — iteratively peel vertices with zero in- or out-degree
   (each is a singleton SCC).  Handles DAG-shaped regions in rounds
   proportional to their depth; without it the coloring loop peels
   them one root at a time.
2. **Color** — propagate ``color(v) = max(id(v), max over in-nbrs
   color(u))`` to fixpoint: a max-combiner Pregel fixpoint on the
   scatter/combine operators.  Afterwards color(v) = the largest id
   that can reach v; a vertex with color(v) == id(v) is a root.
3. **Backward** — from every root r, flood along REVERSED edges
   restricted to vertices of the same color.  The flooded set is
   exactly SCC(r) (v is colored r ⇒ r reaches v; v backward-reaches
   r ⇒ v reaches r).  Label members, remove them, repeat.

Termination: every round removes at least each current root's SCC
(and Trim eats DAG tails), so rounds ≤ #SCCs; in practice a handful —
the cap is a safety rail and hitting it raises.

Execution shape (design-for-100×): all three phases are
frontier-filtered scatters + combines over a semi-joined remaining
subgraph, the same shuffle economics as CC; state is truncated with
eager localCheckpoints at phase boundaries (the driver-loop analogue
of the superstep loop's S3 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mesos_pregel_spark.operators.combine import combine
from mesos_pregel_spark.operators.scatter import scatter
from mesos_pregel_spark.plans.pregel import PregelRun


def _ckpt(df: DataFrame) -> DataFrame:
    """Eager lineage truncation for driver-loop state (S3)."""
    return df.localCheckpoint(eager=True)


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 50,
    max_inner: int = 200,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Label every vertex with its SCC's minimum vertex id.  Returns
    (labels(id, scc), run)."""
    nparts = edge_partitions or spark.sparkContext.defaultParallelism
    e_all = (
        edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(nparts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    )
    e_all.count()
    verts = _ckpt(
        e_all.select(F.col("src").alias("id"))
        .unionByName(e_all.select(F.col("dst").alias("id"))).distinct()
    )
    run = PregelRun(spark, "scc")
    remaining = verts
    # (id, root) pieces APPENDED per phase and unioned once at the end:
    # each piece is (a plan over) checkpointed state, so accumulating
    # the list costs zero jobs — the round-2 shape re-checkpointed the
    # whole union every add, rewriting all labels O(rounds) times.
    labeled_parts: list[DataFrame] = []

    def add_labels(new: DataFrame) -> None:
        labeled_parts.append(new)

    rounds = 0
    while True:
        n_remaining = remaining.count()
        if n_remaining == 0:
            break
        if rounds >= max_rounds:
            raise RuntimeError(
                f"SCC did not finish in {max_rounds} rounds "
                f"({n_remaining} vertices remaining)"
            )
        rounds += 1

        # restrict edges to the remaining subgraph
        e = _ckpt(
            e_all.join(
                remaining.withColumnRenamed("id", "src"), "src", "left_semi"
            ).join(
                remaining.withColumnRenamed("id", "dst"), "dst", "left_semi"
            ).select("src", "dst")
        )

        # -- 1. Trim: peel zero-in/out-degree vertices iteratively ----
        # ONE degree aggregate per iteration (both directions in a
        # single groupBy over the dir-tagged endpoint union) instead of
        # the round-2 shape's two distinct scans + three semi-joins —
        # a deep DAG tail costs O(depth) iterations, so per-iteration
        # driver jobs matter.
        trimmed = 0
        for _ in range(max_inner):
            keep_ids = (
                e.select(F.col("src").alias("id"),
                         F.lit(1).alias("o"), F.lit(0).alias("i"))
                .unionByName(
                    e.select(F.col("dst").alias("id"),
                             F.lit(0).alias("o"), F.lit(1).alias("i")))
                .groupBy("id")
                .agg(F.max("o").alias("has_out"), F.max("i").alias("has_in"))
                .where((F.col("has_out") == 1) & (F.col("has_in") == 1))
                .select("id")
            )
            # keep_ids ⊆ remaining (e's endpoints live in remaining),
            # so it IS the next remaining; everything else is trivial
            # (zero in- or out-degree, or fully isolated).
            keep_ids = _ckpt(keep_ids)
            trivial = _ckpt(remaining.join(keep_ids, "id", "left_anti"))
            n_trivial = trivial.count()
            if n_trivial == 0:
                break
            trimmed += n_trivial
            add_labels(trivial.select("id", F.col("id").alias("root")))
            remaining = keep_ids
            e = _ckpt(
                e.join(remaining.withColumnRenamed("id", "src"), "src",
                       "left_semi")
                .join(remaining.withColumnRenamed("id", "dst"), "dst",
                      "left_semi").select("src", "dst")
            )
        run.record(phase="trim", removed=trimmed,
                   remaining=remaining.count())
        run.next_superstep()
        if remaining.count() == 0:
            break

        # -- 2. Color: forward max propagation to fixpoint ------------
        color = _ckpt(remaining.select(
            "id", F.col("id").alias("color"), F.lit(True).alias("changed")
        ))
        # Inner fixpoints RAISE on non-convergence (like the outer
        # round cap): an unconverged color table would let the backward
        # flood label only part of an SCC — silently splitting it.
        for _inner in range(max_inner + 1):
            if _inner == max_inner:
                raise RuntimeError(
                    f"SCC color propagation did not converge in "
                    f"{max_inner} iterations (remaining-subgraph "
                    f"diameter exceeds max_inner; raise max_inner)"
                )
            msgs = scatter(
                e, color, [F.col("color").alias("msg")],
                active_filter=F.col("changed"),
            )
            combined = combine(msgs, ["dst"], {"msg_max": ("msg", "max")})
            color = _ckpt(
                color.join(combined, color["id"] == combined["dst"],
                           "left_outer")
                .select(
                    color["id"],
                    F.greatest(
                        color["color"],
                        F.coalesce(combined["msg_max"], color["color"]),
                    ).alias("color"),
                    (
                        F.coalesce(combined["msg_max"], color["color"])
                        > color["color"]
                    ).alias("changed"),
                )
            )
            if color.where("changed").limit(1).count() == 0:
                break

        # -- 3. Backward reach from roots within their color ----------
        # reversed edges whose endpoints share a color
        ce = (
            e.join(color.select(F.col("id").alias("src"),
                                F.col("color").alias("c_src")), "src")
            .join(color.select(F.col("id").alias("dst"),
                               F.col("color").alias("c_dst")), "dst")
            .where(F.col("c_src") == F.col("c_dst"))
            # backward flood ⇒ walk v→u for original u→v
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        ce = _ckpt(ce)
        member = _ckpt(color.select(
            "id", "color", (F.col("id") == F.col("color")).alias("in_scc"),
            (F.col("id") == F.col("color")).alias("changed"),
        ))
        for _inner in range(max_inner + 1):
            if _inner == max_inner:
                raise RuntimeError(
                    f"SCC backward reach did not converge in "
                    f"{max_inner} iterations (raise max_inner)"
                )
            msgs = scatter(
                ce, member, [F.lit(1).alias("msg")],
                active_filter=F.col("changed") & F.col("in_scc"),
            )
            combined = combine(msgs, ["dst"], {"hit": ("msg", "max")})
            member = _ckpt(
                member.join(combined, member["id"] == combined["dst"],
                            "left_outer")
                .select(
                    member["id"], member["color"],
                    (member["in_scc"] | combined["hit"].isNotNull())
                    .alias("in_scc"),
                    (~member["in_scc"] & combined["hit"].isNotNull())
                    .alias("changed"),
                )
            )
            if member.where("changed").limit(1).count() == 0:
                break

        found = member.where("in_scc").select(
            "id", F.col("color").alias("root")
        )
        add_labels(found)
        remaining = _ckpt(
            remaining.join(member.where("in_scc").select("id"), "id",
                           "left_anti")
        )
        run.record(phase="peel", removed=n_remaining - remaining.count(),
                   remaining=remaining.count())
        run.next_superstep()

    # relabel: scc = MIN member id of each root group (oracle contract)
    if not labeled_parts:  # edgeless input: verts is empty
        labeled_parts.append(verts.select("id", F.col("id").alias("root")))
    labeled = labeled_parts[0]
    for part in labeled_parts[1:]:
        labeled = labeled.unionByName(part)
    mins = labeled.groupBy("root").agg(F.min("id").alias("scc"))
    result = run.finish(
        labeled.join(mins, "root").select("id", "scc")
    )
    e_all.unpersist()
    return result, run
