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
        ["batch", "--input", "x", "--output", "y", "--output-subclasses",
         "--properties-file", str(pf), "--property", "42"]
    )
    cfg = config_from_args(args)
    assert cfg.properties == frozenset({21, 42, 9999})
    assert cfg.output_subclasses and cfg.reflexive_subclasses


def test_cli_batch_end_to_end(spark, tmp_path):
    """Run the batch subcommand in-process against fixture A."""
    from relation_graph_spark import cli

    inp = str(tmp_path / "seq")
    FX.materialize_test(spark).write.parquet(inp)
    out = str(tmp_path / "out")
    rc = cli.main(
        ["batch", "--input", inp, "--output", out, "--output-subclasses",
         "--no-reflexive-subclasses", "--master", "local[4]"]
    )
    assert rc == 0
    edges = spark.read.parquet(f"{out}/edges")
    got = {(r.s, r.p, r.o) for r in edges.select("s", "p", "o").collect()}
    assert got == FX.GOLDEN_A_EXISTENTIAL | FX.GOLDEN_A_SUBCLASS
    assert edges.select("edge_hash").distinct().count() == len(got)
