"""Incremental-engine equivalence: folding deltas batch-by-batch must equal
the one-shot batch materialization — on the monotone fast path (no
equivalence feedback), on the fallback path, and with late-arriving
property-hierarchy axioms."""

import pyspark.sql.functions as F

from relation_graph_spark import fixtures as FX
from relation_graph_spark.config import RGConfig
from relation_graph_spark.decode import decode_axioms, told_tables
from relation_graph_spark.incremental import (
    apply_delta,
    assemble_from_state,
    initial_state,
)
from relation_graph_spark.materialize import materialize

from conftest import triples

CFG = RGConfig(output_subclasses=True, reflexive_subclasses=False)


def _told(spark, rows, source):
    return told_tables(decode_axioms(FX._rows_to_df(spark, rows, source)))


def _fold(spark, row_splits):
    state = initial_state(_told(spark, row_splits[0], "s0"), CFG)
    for i, part in enumerate(row_splits[1:], 1):
        state, deltas = apply_delta(state, _told(spark, part, f"s{i}"), CFG)
        # every fold is delta-sized — including under equivalence feedback
        assert deltas is not None
    return triples(assemble_from_state(state, CFG))


def test_incremental_equals_batch_generated(spark):
    rows = FX.gen_ontology_rows(60, 3, 120)
    batch = triples(materialize(FX._rows_to_df(spark, rows, "g"), CFG))
    k = len(rows) // 3
    inc = _fold(spark, [rows[:k], rows[k : 2 * k], rows[2 * k :]])
    assert inc == batch


def test_incremental_fast_path_no_feedback(spark):
    # subclass chain split so the closure must compose across batches
    rows1 = [[FX.T.AX_DECL_CLASS, c] for c in (11, 12, 13, 14)] + [
        [FX.T.AX_SUBCLASS, 12, 11]
    ]
    rows2 = [[FX.T.AX_SUBCLASS, 13, 12], [FX.T.AX_DECL_PROP, 21]]
    rows3 = [[FX.T.AX_SUBCLASS, 14, 13], [FX.T.AX_SOME, 13, 21, 11]]
    batch = triples(materialize(FX._rows_to_df(spark, rows1 + rows2 + rows3, "b"), CFG))
    inc = _fold(spark, [rows1, rows2, rows3])
    assert inc == batch
    # cross-batch entailment: 14 below 13 told in batch 3, chain to 11
    assert (14, FX.T.SUBCLASSOF, 11) in inc
    assert (14, 21, 11) in inc  # subject descends through the new edge


def test_incremental_feedback_equals_batch(spark):
    # fixture A carries an equivalence definition -> incremental R4 feedback
    # rounds on the delta path; split across 3 deltas must still equal the
    # one-shot goldens (incl. the E ⊑ F feedback entailment)
    rows = FX.MATERIALIZE_TEST_ROWS
    inc = _fold(spark, [rows[:7], rows[7:10], rows[10:]])
    assert inc == FX.GOLDEN_A_EXISTENTIAL | FX.GOLDEN_A_SUBCLASS


def test_incremental_equiv_def_before_and_after_members(spark):
    # definitions arriving BEFORE their member axioms (F ≡ p some B in b0,
    # members in b1) and AFTER them (G ≡ p some A in b2, against rel rows
    # derived in earlier folds), plus a late told edge (b3) widening filler
    # closures under both standing definitions
    import __spark_entry__ as entry

    batches = entry._EQUIV_STREAM_BATCHES
    batch = triples(
        materialize(FX._rows_to_df(spark, [r for b in batches for r in b], "b"), CFG)
    )
    inc = _fold(spark, batches)
    assert inc == batch
    # late-definition activation against accumulated rel: E ⊑ G, F ⊑ G
    assert (15, FX.T.SUBCLASSOF, 17) in inc
    assert (16, FX.T.SUBCLASSOF, 17) in inc
    # def-before-members: members arriving later still close under F
    assert (15, FX.T.SUBCLASSOF, 16) in inc


def test_incremental_equiv_generated_equals_batch(spark):
    # generated ontology + equivalence definitions sprinkled in, split 3 ways
    rows = FX.gen_ontology_rows(60, 3, 120)
    base_c, base_p = 100, 160
    defs = [
        [FX.T.AX_EQUIV_SOME, base_c + 55 + i, base_p + i % 3, base_c + 7 * i % 50]
        for i in range(4)
    ]
    rows = rows + defs
    batch = triples(materialize(FX._rows_to_df(spark, rows, "g"), CFG))
    k = len(rows) // 3
    inc = _fold(spark, [rows[:k], rows[k : 2 * k], rows[2 * k :]])
    assert inc == batch


def test_incremental_late_subproperty_axiom(spark):
    # the subPropertyOf axiom arrives AFTER the existential that uses it
    rows1 = [
        [FX.T.AX_DECL_CLASS, 31],
        [FX.T.AX_DECL_CLASS, 32],
        [FX.T.AX_DECL_PROP, 41],
        [FX.T.AX_DECL_PROP, 42],
        [FX.T.AX_SOME, 31, 41, 32],
    ]
    rows2 = [[FX.T.AX_SUBPROP, 41, 42]]
    inc = _fold(spark, [rows1, rows2])
    assert {(s, p, o) for s, p, o in inc if p in (41, 42)} == FX.GOLDEN_D


def test_incremental_new_class_under_existing_subject(spark):
    # a brand-new subclass of an existing told-existential subject must pick
    # up the relation via the delta subject-closure pass
    rows1 = [
        [FX.T.AX_DECL_CLASS, 51],
        [FX.T.AX_DECL_CLASS, 52],
        [FX.T.AX_DECL_PROP, 61],
        [FX.T.AX_SOME, 51, 61, 52],
    ]
    rows2 = [[FX.T.AX_DECL_CLASS, 53], [FX.T.AX_SUBCLASS, 53, 51]]
    inc = _fold(spark, [rows1, rows2])
    assert (53, 61, 52) in inc


def test_save_state_delta_clears_stale_folded_marker(spark, tmp_path):
    """Round-5 ADVICE (low): a folded.json left by a crashed consolidation
    must not survive a plain-delta replay of the same batch id — otherwise
    live_delta_batches would exclude the still-live superseded dirs and
    their state rows would be lost."""
    import json
    import os

    from relation_graph_spark.incremental import (
        folded_delta_ids,
        save_state_delta,
    )

    root = str(tmp_path / "state")
    ddir = os.path.join(root, "delta-3")
    os.makedirs(ddir)
    with open(os.path.join(ddir, "folded.json"), "w") as fh:
        json.dump({"folded": [1, 2]}, fh)
    assert folded_delta_ids(root, 3) == [1, 2]
    df = spark.range(2).select(
        F.col("id").cast("int").alias("s"),
        F.lit(0).alias("p"),
        F.col("id").cast("int").alias("o"),
    )
    save_state_delta({"subclasses": df}, root, 3)
    assert folded_delta_ids(root, 3) == []
