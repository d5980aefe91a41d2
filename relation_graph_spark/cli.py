"""spark-submit entry point — the CLI surface of the engine (the analog of
the reference's `relation-graph --ontology-file ... --output-file ...`,
Config.scala:10-52 / Main.scala:21-49).

Cluster launch (north rule):

    zip -r relation_graph_spark.zip relation_graph_spark
    spark-submit --py-files relation_graph_spark.zip \\
        -m relation_graph_spark.cli batch \\
        --input /path/to/sequences_parquet --output /path/to/out \\
        --mode RDF --output-subclasses --property 21 --property 42

Subcommands:
  batch   one-shot materialization: sequences parquet -> edge parquet (+
          optional N-Triples / TSV presentation output)
  stream  incremental: watch an input dir, run the exactly-once micro-batch
          pipeline with checkpoint/resume
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="relation-graph-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("batch", "stream"):
        p = sub.add_parser(name)
        p.add_argument("--input", required=True, help="sequences parquet path/dir")
        p.add_argument("--output", required=True, help="output dir")
        p.add_argument("--mode", choices=["RDF", "OWL", "TSV"], default="RDF")
        p.add_argument("--output-subclasses", action="store_true")
        p.add_argument("--no-reflexive-subclasses", action="store_true")
        p.add_argument("--equivalence-as-subclass", action="store_true")
        p.add_argument("--output-individuals", action="store_true")
        p.add_argument("--disable-owl-nothing", action="store_true")
        p.add_argument("--property", type=int, action="append", default=None,
                       help="restrict to property token (repeatable)")
        p.add_argument("--properties-file", default=None,
                       help="file with one property token per line")
        p.add_argument("--master", default=None)
        p.add_argument("--shuffle-partitions", type=int, default=None)
    sp = sub.choices["stream"]
    sp.add_argument("--watermark-seconds", type=int, default=3600)
    sp.add_argument("--max-files-per-trigger", type=int, default=1)
    return ap


def config_from_args(args) -> "RGConfig":
    from relation_graph_spark.config import OutputMode, RGConfig

    props = set(args.property or [])
    if args.properties_file:
        with open(args.properties_file) as fh:
            # trim + skip blanks (reference Main.scala:87)
            props |= {int(line.strip()) for line in fh if line.strip()}
    return RGConfig(
        mode=OutputMode(args.mode),
        output_subclasses=args.output_subclasses,
        reflexive_subclasses=not args.no_reflexive_subclasses,
        equivalence_as_subclass=args.equivalence_as_subclass,
        output_individuals=args.output_individuals,
        disable_owl_nothing=args.disable_owl_nothing,
        properties=frozenset(props) if props else None,
    )


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    from relation_graph_spark.session import get_spark

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(
        f"rgs-{args.cmd}", master=args.master, shuffle_partitions=args.shuffle_partitions
    )
    cfg = config_from_args(args)

    if args.cmd == "batch":
        from relation_graph_spark.hashing import with_edge_hash
        from relation_graph_spark.materialize import materialize

        seq = spark.read.parquet(args.input)
        edges = with_edge_hash(materialize(seq, cfg))
        edges.write.mode("overwrite").parquet(f"{args.output}/edges")
        print(f"wrote {spark.read.parquet(f'{args.output}/edges').count()} edges")
    else:
        from relation_graph_spark.streaming.pipeline import IncrementalClosureJob

        job = IncrementalClosureJob(
            spark, args.input, args.output, cfg,
            watermark_horizon_seconds=args.watermark_seconds,
        )
        job.run_available(max_files_per_trigger=args.max_files_per_trigger)
        out = job.result_edges()
        print(f"sink now holds {0 if out is None else out.count()} edges; "
              f"{len(job.metrics())} committed batches")
    if not preexisting:  # don't tear down a caller-owned session
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
