"""Delta-restricted incremental materialization across micro-batches.

The streaming pipeline's scale path: instead of re-running the full R1-R4
fixpoint over all accumulated told axioms per micro-batch, maintain a
ClosureState and extend it with just the batch's delta:

- incremental transitive closure: new pairs are exactly those with >= 1 new
  edge on some path, found by composing the delta against the accumulated
  closure from BOTH sides until fixpoint (O(log diameter) rounds, same
  'smart' discipline as closure.transitive_closure);
- delta-restricted R3: a new relation row needs >= 1 new input among
  {subject-closure pair, told existential, filler-closure pair, property-
  closure pair}; four derivation passes each restricted to one delta side
  cover all of them (overlaps removed by the distinct), then an anti-join
  against the accumulated rel keeps only genuinely new rows.

Fallback: equivalence definitions (AX_EQUIV_SOME) make the fixpoint
non-monotone across R4 feedback — when the state or the delta carries any,
apply_delta transparently recomputes from the merged told set (correct,
just not delta-sized). Streaming output is monotone-append: config effects
that can retract rows (late unsatisfiability, late mutual subsumption under
equivalence_as_subclass=False) apply to rows emitted from the current batch
onward; already-committed rows stand (documented exactly-once append
semantics).

State frames persist as parquet per batch under the pipeline's work dir,
versioned by batch id and committed via the same manifest protocol as the
sink, so crash/replay rebuilds identical state.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from relation_graph_spark import tokens as T
from relation_graph_spark.closure import reflexive, transitive_closure
from relation_graph_spark.config import RGConfig
from relation_graph_spark.materialize import (
    _bcast_if_small,
    derive_relations,
    materialize_edges,
)

# persisted state frames (everything else derives cheaply on load)
STATE_FRAMES = [
    "sc",  # told subclass edges incl. R4-derived (post-feedback)
    "some",
    "def_some",
    "sp",
    "classes",
    "props",
    "assertions",
    "sc_tc",  # transitive closure of sc
    "rel",  # accumulated R3 output
]


def _sc_star_of(sc_tc: DataFrame, classes: DataFrame) -> DataFrame:
    refl = reflexive(classes, "c", "sub", "sup")
    top = classes.select(F.col("c").alias("sub"), F.lit(T.TOP).cast("int").alias("sup"))
    return sc_tc.unionByName(refl).unionByName(top).dropDuplicates()


def initial_state(told: dict[str, DataFrame], cfg: RGConfig) -> dict[str, DataFrame]:
    m = materialize_edges(told, cfg)
    return {
        "sc": m["sc_final"],
        "some": told["some"].dropDuplicates(),
        "def_some": told["def_some"].dropDuplicates(),
        "sp": told["sp"].dropDuplicates(),
        "classes": m["classes"],
        "props": told["props"],
        "assertions": told["assertions"].dropDuplicates(),
        "sc_tc": m["sc_closure"],
        "rel": m["rel"],
    }


def output_frames(state: dict[str, DataFrame], cfg: RGConfig) -> dict[str, DataFrame]:
    """Reconstruct the frame dict assemble_output expects from a state."""
    from relation_graph_spark.materialize import compute_unsat

    sc_star = _sc_star_of(state["sc_tc"], state["classes"])
    return {
        "rel": state["rel"],
        "sc_closure": state["sc_tc"],
        "sc_star": sc_star,
        "unsat": compute_unsat(sc_star, state["some"], cfg),
        "classes": state["classes"],
        "assertions": state["assertions"],
    }


def incremental_tc(
    old_tc: DataFrame,
    delta_edges: DataFrame,
    cfg: RGConfig,
) -> tuple[DataFrame, DataFrame]:
    """(new_tc, delta_pairs): extend a closed relation with new edges by
    two-sided delta composition. delta_pairs = new_tc minus old_tc."""
    delta = delta_edges.join(old_tc, on=["sub", "sup"], how="left_anti").localCheckpoint()
    closure = old_tc.unionByName(delta).dropDuplicates().localCheckpoint()
    all_delta = delta
    for _ in range(cfg.max_iterations):
        if delta.isEmpty():
            return closure, all_delta
        side = _bcast_if_small(closure, cfg.broadcast_row_threshold)
        fwd = (
            delta.alias("d")
            .join(side.alias("c"), F.col("d.sup") == F.col("c.sub"))
            .select(F.col("d.sub").alias("sub"), F.col("c.sup").alias("sup"))
        )
        bwd = (
            side.alias("c")
            .join(delta.alias("d"), F.col("c.sup") == F.col("d.sub"))
            .select(F.col("c.sub").alias("sub"), F.col("d.sup").alias("sup"))
        )
        delta = (
            fwd.unionByName(bwd)
            .dropDuplicates()
            .join(closure, on=["sub", "sup"], how="left_anti")
            .localCheckpoint()
        )
        closure = closure.unionByName(delta).localCheckpoint()
        all_delta = all_delta.unionByName(delta).localCheckpoint()
    from relation_graph_spark.closure import FixpointDidNotConverge

    raise FixpointDidNotConverge("incremental_tc did not converge")


def apply_delta(
    state: dict[str, DataFrame],
    delta_told: dict[str, DataFrame],
    cfg: RGConfig,
) -> dict[str, DataFrame]:
    """Fold a micro-batch's told delta into the state (see module doc)."""
    has_feedback = (not state["def_some"].isEmpty()) or (
        not delta_told["def_some"].isEmpty()
    )
    if has_feedback:
        merged = {
            "sc": state["sc"].unionByName(delta_told["sc"]).dropDuplicates(),
            "some": state["some"].unionByName(delta_told["some"]).dropDuplicates(),
            "def_some": state["def_some"]
            .unionByName(delta_told["def_some"])
            .dropDuplicates(),
            "sp": state["sp"].unionByName(delta_told["sp"]).dropDuplicates(),
            "classes": state["classes"]
            .unionByName(delta_told["classes"])
            .dropDuplicates(),
            "props": state["props"].unionByName(delta_told["props"]).dropDuplicates(),
            "assertions": state["assertions"]
            .unionByName(delta_told["assertions"])
            .dropDuplicates(),
        }
        return initial_state(merged, cfg)

    # ------- monotone fast path: no equivalence feedback anywhere -------
    classes_new = (
        state["classes"].unionByName(delta_told["classes"]).dropDuplicates().localCheckpoint()
    )
    props_new = state["props"].unionByName(delta_told["props"]).dropDuplicates().localCheckpoint()

    d_sc = delta_told["sc"].join(state["sc"], on=["sub", "sup"], how="left_anti")
    sc_new = state["sc"].unionByName(d_sc).dropDuplicates().localCheckpoint()
    sc_tc_new, d_tc = incremental_tc(state["sc_tc"], d_sc, cfg)

    d_sp = delta_told["sp"].join(state["sp"], on=["sub", "sup"], how="left_anti")
    sp_new = state["sp"].unionByName(d_sp).dropDuplicates().localCheckpoint()
    sp_changed = not d_sp.isEmpty()
    sp_star_new = (
        transitive_closure(
            sp_new,
            child="sub",
            parent="sup",
            max_iterations=cfg.max_iterations,
            broadcast_row_threshold=cfg.broadcast_row_threshold,
        )
        .unionByName(reflexive(props_new, "p", "sub", "sup"))
        .dropDuplicates()
        .localCheckpoint()
    )

    d_some = delta_told["some"].join(state["some"], on=["s", "p", "f"], how="left_anti").localCheckpoint()
    some_new = state["some"].unionByName(d_some).dropDuplicates().localCheckpoint()

    sc_star_new = _sc_star_of(sc_tc_new, classes_new).localCheckpoint()
    # delta closure pairs incl. reflexive/top pairs of newly-seen classes
    d_classes = delta_told["classes"].join(state["classes"], on=["c"], how="left_anti")
    d_star = (
        d_tc.unionByName(reflexive(d_classes, "c", "sub", "sup"))
        .unionByName(
            d_classes.select(
                F.col("c").alias("sub"), F.lit(T.TOP).cast("int").alias("sup")
            )
        )
        .dropDuplicates()
        .localCheckpoint()
    )

    thr = cfg.broadcast_row_threshold
    passes = [
        # >=1 new subject-closure pair
        derive_relations(sc_star_new, some_new, sp_star_new, thr, subject_star=d_star),
        # >=1 new filler-closure pair
        derive_relations(sc_star_new, some_new, sp_star_new, thr, filler_star=d_star),
        # >=1 new told existential
        derive_relations(sc_star_new, d_some, sp_star_new, thr),
    ]
    if sp_changed:
        # property hierarchy grew: conservatively re-derive with the full
        # (tiny) property closure over all told existentials
        passes.append(derive_relations(sc_star_new, some_new, sp_star_new, thr))
    rel_delta = passes[0]
    for p in passes[1:]:
        rel_delta = rel_delta.unionByName(p)
    rel_delta = (
        rel_delta.dropDuplicates()
        .join(state["rel"], on=["s", "p", "o"], how="left_anti")
        .localCheckpoint()
    )
    rel_new = state["rel"].unionByName(rel_delta).localCheckpoint()

    return {
        "sc": sc_new,
        "some": some_new,
        "def_some": state["def_some"],
        "sp": sp_new,
        "classes": classes_new,
        "props": props_new,
        "assertions": state["assertions"]
        .unionByName(delta_told["assertions"])
        .dropDuplicates(),
        "sc_tc": sc_tc_new,
        "rel": rel_new,
    }


def assemble_from_state(state: dict[str, DataFrame], cfg: RGConfig) -> DataFrame:
    from relation_graph_spark.materialize import assemble_output

    return assemble_output(output_frames(state, cfg), cfg)


# ------------------------------------------------------------- persistence
def save_state(state: dict[str, DataFrame], root: str, batch_id: int) -> None:
    for name in STATE_FRAMES:
        state[name].write.mode("overwrite").parquet(
            os.path.join(root, f"batch={batch_id}", name)
        )


def load_state(
    spark: SparkSession, root: str, batch_id: int
) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(os.path.join(root, f"batch={batch_id}", name))
        for name in STATE_FRAMES
    }
