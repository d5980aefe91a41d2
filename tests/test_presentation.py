"""Full presentation-mode path (cfg.mode RDF/OWL/TSV) over fixture A."""

from relation_graph_spark import fixtures as FX
from relation_graph_spark.config import OutputMode, RGConfig
from relation_graph_spark.materialize import materialize_presented

NS = "http://example.org/test#"


def test_rdf_mode_iri_triples(spark):
    cfg = RGConfig(mode=OutputMode.RDF, output_subclasses=False)
    out = materialize_presented(
        FX.materialize_test(spark), cfg, FX.materialize_test_vocab(spark)
    )
    rows = {(r.s, r.p, r.o) for r in out.collect()}
    assert (f"{NS}A", f"{NS}p", f"{NS}D") in rows
    assert len(rows) == len(FX.GOLDEN_A_EXISTENTIAL)


def test_owl_mode_reified(spark):
    cfg = RGConfig(mode=OutputMode.OWL, output_subclasses=True, reflexive_subclasses=False)
    out = materialize_presented(
        FX.materialize_test(spark), cfg, FX.materialize_test_vocab(spark)
    )
    rows = [(r.s, r.p, r.o) for r in out.collect()]
    # header + 8 existential edges x 4 reified triples + 4 taxonomy rows
    assert len(rows) == 1 + 8 * 4 + 4
    bnodes = {o for _, _, o in rows if o.startswith("_:")}
    assert len(bnodes) == 8  # deterministic, distinct per edge


def test_tsv_mode_compacted(spark):
    cfg = RGConfig(mode=OutputMode.TSV, output_subclasses=False)
    out = materialize_presented(
        FX.materialize_test(spark),
        cfg,
        FX.materialize_test_vocab(spark),
        prefixes={"ex": NS},
    )
    rows = {(r.s, r.p, r.o) for r in out.collect()}
    assert ("ex:A", "ex:p", "ex:D") in rows
    assert all(s.startswith("ex:") for s, _, _ in rows)


def test_owl_mode_individual_reified_via_rdf_type(spark):
    """Individual-subject existential edges reify with rdf:type as the
    linking predicate (owlTriples(..., RDFType), RelationGraph.scala:149);
    class-subject edges keep rdfs:subClassOf; ind-type taxonomy rows pass
    through unreified."""
    from relation_graph_spark import tokens as T
    from relation_graph_spark.schema import VOCAB_SCHEMA

    rows = list(FX.MATERIALIZE_TEST_ROWS) + [[T.AX_CLASS_ASSERTION, FX.C_, 91]]
    df = FX._rows_to_df(spark, rows, "ind_owl_test")
    vocab_rows = [(91, f"{NS}ind91", "individual")]
    vocab = FX.materialize_test_vocab(spark).unionByName(
        spark.createDataFrame(vocab_rows, VOCAB_SCHEMA)
    )
    cfg = RGConfig(
        mode=OutputMode.OWL,
        output_subclasses=True,
        reflexive_subclasses=False,
        output_individuals=True,
    )
    out = materialize_presented(df, cfg, vocab)
    rows_out = [(r.s, r.p, r.o) for r in out.collect()]
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    subclass_of = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    ind = f"{NS}ind91"
    # the individual's existential edge (91 p D) links via rdf:type
    ind_links = [(s, p, o) for s, p, o in rows_out if s == ind and o.startswith("_:")]
    assert ind_links and all(p == rdf_type for _, p, _ in ind_links)
    # class-subject existential edges still link via rdfs:subClassOf
    cls_links = [
        (s, p, o) for s, p, o in rows_out
        if s == f"{NS}C" and o.startswith("_:")
    ]
    assert cls_links and all(p == subclass_of for _, p, _ in cls_links)
    # individual taxonomy rows (ind rdf:type C/B/A) pass through unreified
    assert (ind, rdf_type, f"{NS}C") in rows_out
    assert (ind, rdf_type, f"{NS}A") in rows_out
