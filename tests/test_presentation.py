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
