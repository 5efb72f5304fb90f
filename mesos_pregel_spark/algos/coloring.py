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


def speculative_coloring(
    spark: SparkSession,
    edges: DataFrame,
    max_supersteps: int = 30,
    n_salt: int = 0,
    salt_hot_k: int = 0,
    edge_partitions: int | None = None,
) -> tuple[DataFrame, PregelRun]:
    """Speculative coloring with deterministic conflict resolution —
    the SCALE path (Jones-Plassmann above is the greedy-order-exact
    variant, but its round count is the priority-DAG depth, which on a
    zipf bench graph measured 50+ rounds: dependency CHAINS through
    the dense core color one-at-a-time).  Here every uncolored vertex
    bids for its tentative color simultaneously and only same-color
    conflicts serialize, so rounds ~ O(log n) + palette size
    (measured: 52 -> ~10 on the same graph).

    Pinned transition (replayed exactly by the unrolled SQL twin and
    the python oracle):

    - tent(v) = mex(v.mask) — mask accumulates finalized neighbor
      colors with a ONE-ROUND LAG (a winner's color bit rides the next
      scatter, send-once);
    - v finalizes tent(v) in round t iff (a) no uncolored neighbor u
      with tent(u) == tent(v) and (p_u, u) < (p_v, v) [per-color
      priority — adjacent same-color bids can't both win], and (b) the
      bit for tent(v) did not arrive in THIS round's mask union [the
      lag guard: a neighbor that won this color last round blocks it].
    - Monotone (colors final, masks grow): capped == unrolled, -1 for
      vertices past the cap, identical on both sides.

    Shuffle shape: one scatter per superstep combined per (dst, tent)
    — min of the candidacy struct and bit_or of the color bit (LPA's
    combine_keys economics) — then a per-dst rollup into a
    tent->min-candidate map + mask union (post_combine, same shape as
    LPA's argmax).  active_filter keeps finalized vertices silent
    after their single color-bit send.
    """

    def init(e: DataFrame, ctx: dict) -> DataFrame:
        return (
            e.select(F.col("src").alias("id")).distinct()
            .select(
                "id",
                F.md5(F.col("id").cast("string")).alias("p"),
                F.lit(_UNCOLORED).cast("int").alias("color"),
                F.lit(0).cast("long").alias("mask"),
                F.lit(0).cast("int").alias("fresh"),
            )
        )

    # mex over the STATE's mask column (valid in scatter-joined rows
    # and in apply alike): the lowest zero bit is an exact power of
    # two; log2 of it is exact in IEEE.
    _mex = "CAST(log2(CAST((~mask) & (mask + 1) AS DOUBLE)) AS INT)"

    def post_combine(per_tent: DataFrame) -> DataFrame:
        entries = F.filter(
            F.collect_list(
                F.struct(F.col("tent").alias("key"),
                         F.col("cand_min").alias("value"))
            ),
            lambda s: s["key"].isNotNull() & s["value"].isNotNull(),
        )
        return per_tent.groupBy("dst").agg(
            F.bit_or("cm").alias("nbr_mask"),
            F.map_from_entries(
                F.when(F.size(entries) > 0, entries)
            ).alias("cand_map"),
        )

    def apply(state: DataFrame, combined: DataFrame, ctx: dict) -> DataFrame:
        lowbit = F.bitwise_not(state["mask"]).bitwiseAND(
            state["mask"] + F.lit(1).cast("long")
        )
        my_tent = F.log2(lowbit.cast("double")).cast("int")
        new_mask = state["mask"].bitwiseOR(
            F.coalesce(combined["nbr_mask"], F.lit(0).cast("long"))
        )
        my = F.struct(state["p"].alias("p"), state["id"].alias("i"))
        nbr = F.element_at(combined["cand_map"], my_tent)
        win = (
            (state["color"] == _UNCOLORED)
            & (nbr.isNull() | (my < nbr))
            # lag guard: lowbit IS (1 << my_tent) — the bid is dead if
            # that bit just arrived from a last-round winner
            & (new_mask.bitwiseAND(lowbit) == 0)
        )
        new_color = (
            F.when(state["color"] != _UNCOLORED, state["color"])
            .when(win, my_tent)
            .otherwise(F.lit(_UNCOLORED))
        )
        return state.join(
            combined, state["id"] == combined["dst"], "left_outer"
        ).select(
            state["id"], state["p"],
            new_color.cast("int").alias("color"),
            new_mask.alias("mask"),
            win.cast("int").alias("fresh"),
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
        name="coloring_spec",
        init=init,
        prep_edges=lambda e: symmetrize(e.select("src", "dst", "weight"))
        .select("src", "dst"),
        edge_cols=("src", "dst"),
        msg_cols=[
            F.when(F.col("color") == _UNCOLORED, F.expr(_mex)).alias("tent"),
            F.when(
                F.col("color") == _UNCOLORED,
                F.struct(F.col("p").alias("p"), F.col("src").alias("i")),
            ).alias("cand"),
            F.when(
                F.col("fresh") == 1,
                F.expr("shiftleft(CAST(1 AS BIGINT), color)"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("cmask"),
        ],
        combine_keys=("dst", "tent"),
        combiner={"cand_min": ("cand", "min"), "cm": ("cmask", "bit_or")},
        post_combine=post_combine,
        active_filter=(F.col("color") == _UNCOLORED) | (F.col("fresh") == 1),
        apply=apply,
        aggregators=[
            F.sum((F.col("color") == _UNCOLORED).cast("long")).alias("uncolored"),
            F.max("color").alias("max_color"),
        ],
        halt=check_saturation,
        finalize=lambda s: s.select("id", "color"),
        converged_at_cap=True,
    )
    return pregel(
        spark, edges, program,
        max_supersteps=max_supersteps,
        n_salt=n_salt, salt_hot_k=salt_hot_k,
        edge_partitions=edge_partitions,
    )


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
                F.lit(0).cast("int").alias("fresh"),
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
            win.cast("int").alias("fresh"),
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
                F.col("fresh") == 1,
                # F.shiftleft only takes a literal bit count; the SQL
                # form shifts by a column
                F.expr("shiftleft(CAST(1 AS BIGINT), color)"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("cmask"),
        ],
        # SEND-ONCE: a winner scatters its color bit exactly once (the
        # superstep after it wins — `fresh`); uncolored neighbors
        # accumulate bits in their state mask, so by any later win the
        # mask is complete.  Late supersteps therefore scatter only
        # the uncolored frontier + the last round's winners — CC's
        # vote-to-halt economics instead of a whole-graph rebroadcast
        # every round (measured 46s -> frontier-bound on the 1M-edge
        # zipf bench graph).  Final colors are identical to the
        # resend-forever formulation (bits present from win+1 onward
        # either way), so the unrolled oracle is unchanged.
        active_filter=(F.col("color") == _UNCOLORED) | (F.col("fresh") == 1),
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
