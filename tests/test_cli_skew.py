"""CLI surface + skew-salting helper tests."""

import os

import pyspark.sql.functions as F

from relation_graph_spark import fixtures as FX


def test_salted_join_matches_plain_join(spark):
    from relation_graph_spark.skew import salted_join

    # skewed big side: 10k rows, 90% on one hub key
    big = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(100)], "sk: bigint, name: string"
    )
    plain = big.join(small, big["k"] == small["sk"]).select("v", "name")
    salted = salted_join(big, small, "k", "sk").select("v", "name")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).isEmpty() and salted.exceptAll(plain).isEmpty()


def test_cli_batch_roundtrip(spark, tmp_path):
    from relation_graph_spark.cli import config_from_args, build_parser

    # config parsing incl. properties file with blanks (reference Main.scala:87)
    pf = tmp_path / "props.txt"
    pf.write_text("21\n\n  \n9999\n")
    args = build_parser().parse_args(
        ["batch", "--input", "x", "--output", "y", "--output-subclasses", "true",
         "--properties-file", str(pf), "--property", "42"]
    )
    cfg = config_from_args(args)
    assert cfg.properties == frozenset({21, 42, 9999})
    assert cfg.output_subclasses and cfg.reflexive_subclasses
    # defaults mirror the reference's BoolValue defaults (Config.scala:10-52)
    dargs = build_parser().parse_args(["batch", "--input", "x", "--output", "y"])
    dcfg = config_from_args(dargs)
    assert not dcfg.output_subclasses and dcfg.equivalence_as_subclass
    assert dcfg.reflexive_subclasses and not dcfg.output_individuals


def test_cli_batch_end_to_end(spark, tmp_path):
    """Run the batch subcommand in-process against fixture A."""
    from relation_graph_spark import cli

    inp = str(tmp_path / "seq")
    FX.materialize_test(spark).write.parquet(inp)
    out = str(tmp_path / "out")
    rc = cli.main(
        ["batch", "--input", inp, "--output", out, "--output-subclasses", "true",
         "--reflexive-subclasses", "false", "--master", "local[4]"]
    )
    assert rc == 0
    edges = spark.read.parquet(f"{out}/edges")
    got = {(r.s, r.p, r.o) for r in edges.select("s", "p", "o").collect()}
    assert got == FX.GOLDEN_A_EXISTENTIAL | FX.GOLDEN_A_SUBCLASS
    assert edges.select("edge_hash").distinct().count() == len(got)


def test_cli_verbose_flag(spark, tmp_path):
    """--verbose true applies INFO logging (reference Config.scala:50-52);
    default stays quiet (ERROR)."""
    from relation_graph_spark import cli

    inp = str(tmp_path / "seq")
    FX.materialize_test(spark).write.parquet(inp)
    sc = spark.sparkContext
    jlog = sc._jvm.org.apache.log4j.LogManager.getRootLogger()
    try:
        rc = cli.main(
            ["batch", "--input", inp, "--output", str(tmp_path / "o1"),
             "--verbose", "true", "--master", "local[4]"]
        )
        assert rc == 0
        assert str(jlog.getLevel()) == "INFO"
        rc = cli.main(
            ["batch", "--input", inp, "--output", str(tmp_path / "o2"),
             "--master", "local[4]"]
        )
        assert rc == 0
        assert str(jlog.getLevel()) == "ERROR"
    finally:
        sc.setLogLevel("ERROR")


def _write_fixture_inputs(spark, tmp_path):
    inp = str(tmp_path / "seq")
    FX.materialize_test(spark).write.parquet(inp)
    voc = str(tmp_path / "vocab")
    FX.materialize_test_vocab(spark).write.parquet(voc)
    return inp, voc


def test_cli_presentation_ntriples(spark, tmp_path):
    """--mode RDF --vocab writes N-Triples lines (reference Main.scala:62-70)."""
    from relation_graph_spark import cli

    inp, voc = _write_fixture_inputs(spark, tmp_path)
    out = str(tmp_path / "out")
    rc = cli.main(
        ["batch", "--input", inp, "--output", out, "--vocab", voc,
         "--master", "local[4]"]
    )
    assert rc == 0
    lines = set(spark.read.text(f"{out}/triples_nt").toPandas()["value"])
    assert (
        "<http://example.org/test#A> <http://example.org/test#p> "
        "<http://example.org/test#D> ." in lines
    )
    assert len(lines) == len(FX.GOLDEN_A_EXISTENTIAL)


def test_cli_presentation_tsv_with_prefixes_yaml(spark, tmp_path):
    """--mode TSV --prefixes YAML + --obo-prefixes routing
    (reference Main.scala:54-59, 90-97)."""
    from relation_graph_spark import cli

    inp, voc = _write_fixture_inputs(spark, tmp_path)
    yml = tmp_path / "prefixes.yaml"
    yml.write_text("ex: 'http://example.org/test#'\n")
    out = str(tmp_path / "out")
    rc = cli.main(
        ["batch", "--input", inp, "--output", out, "--vocab", voc,
         "--mode", "TSV", "--prefixes", str(yml), "--master", "local[4]"]
    )
    assert rc == 0
    import glob

    rows = set()
    for f in glob.glob(f"{out}/triples_tsv/*.csv"):
        with open(f) as fh:
            rows |= {tuple(line.rstrip("\n").split("\t")) for line in fh if line.strip()}
    assert ("ex:A", "ex:p", "ex:D") in rows
    assert len(rows) == len(FX.GOLDEN_A_EXISTENTIAL)


def test_cli_presentation_owl_mode(spark, tmp_path):
    """--mode OWL --vocab writes reified N-Triples incl. the ontology header
    (reference RelationGraph.scala:63-64, owlTriples)."""
    from relation_graph_spark import cli

    inp, voc = _write_fixture_inputs(spark, tmp_path)
    out = str(tmp_path / "out")
    rc = cli.main(
        ["batch", "--input", inp, "--output", out, "--vocab", voc,
         "--mode", "OWL", "--master", "local[4]"]
    )
    assert rc == 0
    lines = set(spark.read.text(f"{out}/triples_nt").toPandas()["value"])
    assert any("owl#Ontology" in ln for ln in lines)
    # 1 header + 8 existential edges x 4 reified triples
    assert len(lines) == 1 + 8 * 4


def test_hot_key_salted_join_matches_plain(spark):
    from relation_graph_spark.skew import hot_key_salted_join

    fact = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 8, F.lit(1)).otherwise(F.col("id") % 50).alias("s"),
        (F.col("id") % 7).alias("p"),
        (F.col("id") % 11).alias("f"),
    )
    dim = spark.createDataFrame(
        [(i % 60, i) for i in range(3000)], "sub: bigint, sup: bigint"
    ).select(F.col("sup").alias("sub"), F.col("sub").alias("sup"))  # hub on sup side
    plain = fact.join(dim, fact["s"] == dim["sup"]).select("sub", "p", "f")
    salted = hot_key_salted_join(fact, dim, "s", "sup", n_salts=8, hot_threshold=10).select(
        "sub", "p", "f"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).isEmpty() and salted.exceptAll(plain).isEmpty()


def test_derive_relations_salted_branch_matches_broadcast(spark):
    """Force the above-broadcast-threshold branch (threshold=0) with a tiny
    hot-key bound on the hub fixture: the salted R3 derivation must equal
    the broadcast-plan derivation edge-for-edge."""
    from relation_graph_spark.config import RGConfig
    from relation_graph_spark.decode import decode_axioms, told_tables
    from relation_graph_spark.materialize import materialize_edges, derive_relations

    seq = FX.gen_ontology(spark, 300, 3, 600, hub_pct=0.01, hub_boost=100)
    told = told_tables(decode_axioms(seq))
    m = materialize_edges(told, RGConfig())
    some = told["some"].dropDuplicates()
    bcast = derive_relations(m["sc_star"], some, m["sp_star"], 5_000_000)
    salted = derive_relations(
        m["sc_star"], some, m["sp_star"], 0, hot_key_threshold=5, n_salts=8
    )
    assert bcast.count() == salted.count()
    assert bcast.exceptAll(salted).isEmpty() and salted.exceptAll(bcast).isEmpty()


def test_cli_properties_file_with_iris(spark, tmp_path):
    """Properties file may hold IRIs (the reference's shape) resolved via
    --vocab; undefined IRIs are tolerated (TestRelationGraph.scala:58-67)."""
    from relation_graph_spark import cli

    inp, voc = _write_fixture_inputs(spark, tmp_path)
    pf = tmp_path / "props.txt"
    pf.write_text("http://example.org/test#p\nhttp://example.org/test#nonexistent\n")
    out = str(tmp_path / "out")
    rc = cli.main(
        ["batch", "--input", inp, "--output", out, "--vocab", voc,
         "--properties-file", str(pf), "--master", "local[4]"]
    )
    assert rc == 0
    edges = spark.read.parquet(f"{out}/edges")
    got = {(r.s, r.p, r.o) for r in edges.select("s", "p", "o").collect()}
    assert got == FX.GOLDEN_A_EXISTENTIAL  # p resolved, nonexistent ignored
