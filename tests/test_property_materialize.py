"""Randomized semantic equivalence: the Spark engine vs the naive pure-
Python fixpoint oracle on random small ontologies (incl. equivalence
definitions, named equivalences, property chains, Top/Bottom edge cases),
and incremental-vs-batch on random splits."""

import os

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# fast default profile; RGS_SLOW=1 restores the full randomized budget
# (round-1 VERDICT item 8: keep the default suite under ~10 min)
_EXAMPLES = 10 if os.environ.get("RGS_SLOW") else 3

from relation_graph_spark import fixtures as FX
from relation_graph_spark import tokens as T
from relation_graph_spark.config import RGConfig
from relation_graph_spark.materialize import materialize

from conftest import triples
from pyoracle import materialize_py

CFG = RGConfig(output_subclasses=True, reflexive_subclasses=False)

cls = st.integers(11, 17)
prop = st.integers(21, 23)
cls_or_builtin = st.one_of(cls, st.just(T.TOP), st.just(T.BOT))

axiom = st.one_of(
    st.tuples(st.just(T.AX_SUBCLASS), cls, cls_or_builtin),
    st.tuples(st.just(T.AX_SOME), cls, prop, cls),
    st.tuples(st.just(T.AX_EQUIV_SOME), cls, prop, cls),
    st.tuples(st.just(T.AX_SUBPROP), prop, prop),
    st.tuples(st.just(T.AX_EQUIV_NAMED), cls, cls),
    st.tuples(st.just(T.AX_DECL_CLASS), cls),
    st.tuples(st.just(T.AX_DECL_PROP), prop),
)
ontologies = st.lists(axiom, min_size=1, max_size=14)


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ontologies)
def test_engine_matches_python_oracle(spark, rows):
    rows = [list(r) for r in rows]
    got = triples(materialize(FX._rows_to_df(spark, rows, "prop"), CFG))
    assert got == materialize_py(rows)


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ontologies, cut=st.integers(0, 13))
def test_incremental_matches_batch_on_random_split(spark, rows, cut):
    from relation_graph_spark.decode import decode_axioms, told_tables
    from relation_graph_spark.incremental import (
        apply_delta,
        assemble_from_state,
        initial_state,
    )

    rows = [list(r) for r in rows]
    cut = min(cut, len(rows))
    a, b = rows[:cut], rows[cut:]

    def told(part, name):
        return told_tables(decode_axioms(FX._rows_to_df(spark, part or [[T.AX_DECL_CLASS, 11]], name)))

    state = initial_state(told(a, "a"), CFG)
    state, _deltas = apply_delta(state, told(b, "b"), CFG)
    inc = triples(assemble_from_state(state, CFG))
    batch = materialize_py(rows + ([[T.AX_DECL_CLASS, 11]] if not a or not b else []))
    # the dummy declaration only adds class 11, which never emits alone
    assert inc == batch or inc == materialize_py(rows + [[T.AX_DECL_CLASS, 11]])
