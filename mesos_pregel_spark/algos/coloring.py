"""Greedy graph coloring — Jones–Plassmann with deterministic md5
priorities on the generic vertex-program API.  The symmetric-breaking
sibling of MIS (algos/mis.py): scheduling conflicting updates, channel
assignment, and parallel iteration ordering all reduce to it.

Pinned semantics (unrolled SQL twin in queries.py, python greedy
oracle in tests/test_coloring.py):

- UNDIRECTED simple graph (symmetrized, self-loops dropped, parallel
  edges collapsed).
- priority(v) = md5(string(v)); total order = (priority, id) — the
  same candidacy order as MIS, so the result is the coloring produced
  by sequential greedy in priority order.
- One transition per superstep: every vertex accumulates the bitmask
  of its already-colored neighbors' colors; an uncolored vertex whose
  (priority, id) is strictly smaller than every uncolored neighbor's
  candidacy colors itself with the MINIMUM EXCLUDANT of the
  accumulated mask.  Adjacent vertices can never win the same
  superstep (strict candidacy order), and the later winner always has
  the earlier winner's color in its mask by its winning round (the
  color rides the next scatter; the loser necessarily waited at least
  that round) — so the coloring is PROPER.
- Monotone (colors assigned once, masks only grow): a capped run
  equals a same-cap unrolled oracle exactly; vertices still uncolored
  at the cap report color -1 on both sides.

Execution shape (design-for-100x): one scatter per superstep over
src-partitioned symmetrized edges with two MERGEABLE combiners — min
of the candidacy struct and bit_or of (1 << color) — i.e. CC's
shuffle economics; neighbor color SETS are never shuffled, only their
64-bit union (Pregel combiner discipline, SURVEY §2.1 P2).  The mask
bounds palette size at 62; Jones-Plassmann uses ~degeneracy+1 colors
(a handful on power-law link graphs), and the engine RAISES loudly —
never answers wrong — if a vertex's neighborhood saturates the mask
(the chunked multi-mask extension is mechanical when a graph needs
it).

mex(mask) is extracted without iteration: lowbit = ~mask & (mask+1)
is the lowest zero bit as an exact power of two, and log2 of an exact
power of two is exact in IEEE — Spark and DuckDB produce the identical
integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mesos_pregel_spark.functions.edges import symmetrize
from mesos_pregel_spark.plans.pregel import PregelRun
from mesos_pregel_spark.plans.program import VertexProgram, pregel

_UNCOLORED = -1
# 62 usable color bits in a signed 64-bit mask (bit 63 is the sign;
# bit 62 is kept clear so mask+1 in the mex trick cannot overflow).
MAX_COLORS = 62


class ColorMaskSaturated(RuntimeError):
    """A vertex's neighborhood used all MAX_COLORS mask bits."""


def greedy_coloring(
    spark: SparkSession,
    edges: DataFrame,
    max_supersteps: int = 50,
    n_salt: int = 0,
    salt_hot_k: int = 0,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Jones-Plassmann greedy coloring.  Returns
    (colors(id, color), run); color = -1 iff uncolored at the cap."""

    def init(e: DataFrame, ctx: dict) -> DataFrame:
        return (
            e.select(F.col("src").alias("id")).distinct()
            .select(
                "id",
                F.md5(F.col("id").cast("string")).alias("p"),
                F.lit(_UNCOLORED).cast("int").alias("color"),
                F.lit(0).cast("long").alias("mask"),
            )
        )

    def apply(state: DataFrame, combined: DataFrame, ctx: dict) -> DataFrame:
        # NB: Column.__or__/__and__ are LOGICAL ops in PySpark; the
        # mask arithmetic must use the explicit bitwise methods.
        new_mask = state["mask"].bitwiseOR(
            F.coalesce(combined["nbr_mask"], F.lit(0).cast("long"))
        )
        my = F.struct(state["p"].alias("p"), state["id"].alias("i"))
        win = (state["color"] == _UNCOLORED) & (
            combined["cand_min"].isNull() | (my < combined["cand_min"])
        )
        lowbit = F.bitwise_not(new_mask).bitwiseAND(
            new_mask + F.lit(1).cast("long")
        )
        mex = F.log2(lowbit.cast("double")).cast("int")
        new_color = (
            F.when(state["color"] != _UNCOLORED, state["color"])
            .when(win, mex)
            .otherwise(F.lit(_UNCOLORED))
        )
        return state.join(
            combined, state["id"] == combined["dst"], "left_outer"
        ).select(
            state["id"], state["p"],
            new_color.cast("int").alias("color"),
            new_mask.alias("mask"),
        )

    def check_saturation(aggs: dict) -> bool:
        max_color = aggs.get("max_color")
        if max_color is not None and max_color >= MAX_COLORS:
            raise ColorMaskSaturated(
                f"neighborhood exhausted the {MAX_COLORS}-color mask; "
                "chunk the mask or reduce degeneracy first"
            )
        return aggs["uncolored"] == 0

    program = VertexProgram(
        name="coloring",
        init=init,
        prep_edges=lambda e: symmetrize(e.select("src", "dst", "weight"))
        .select("src", "dst"),
        edge_cols=("src", "dst"),
        msg_cols=[
            F.when(
                F.col("color") == _UNCOLORED,
                F.struct(F.col("p").alias("p"), F.col("src").alias("i")),
            ).alias("cand"),
            F.when(
                F.col("color") != _UNCOLORED,
                # F.shiftleft only takes a literal bit count; the SQL
                # form shifts by a column
                F.expr("shiftleft(CAST(1 AS BIGINT), color)"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("cmask"),
        ],
        # colored vertices keep scattering their (idempotent, bit_or)
        # color bit so late winners see the full neighborhood mask —
        # so no active_filter: every vertex stays on the sending side
        combiner={"cand_min": ("cand", "min"), "nbr_mask": ("cmask", "bit_or")},
        apply=apply,
        aggregators=[
            F.sum((F.col("color") == _UNCOLORED).cast("long")).alias("uncolored"),
            F.max("color").alias("max_color"),
        ],
        halt=check_saturation,
        finalize=lambda s: s.select("id", "color"),
        # monotone color/mask lattice: capped == unrolled
        converged_at_cap=True,
    )
    return pregel(
        spark, edges, program,
        max_supersteps=max_supersteps,
        n_salt=n_salt, salt_hot_k=salt_hot_k,
        edge_partitions=edge_partitions,
    )
