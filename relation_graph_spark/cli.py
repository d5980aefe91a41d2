"""spark-submit entry point — the CLI surface of the engine (the analog of
the reference's `relation-graph --ontology-file ... --output-file ...`,
Config.scala:10-52 / Main.scala:21-49).

Cluster launch (north rule):

    zip -r relation_graph_spark.zip relation_graph_spark
    spark-submit --py-files relation_graph_spark.zip \\
        -m relation_graph_spark.cli batch \\
        --input /path/to/sequences_parquet --output /path/to/out \\
        --mode TSV --vocab /path/to/vocab.parquet --prefixes prefixes.yaml \\
        --output-subclasses true --property 21 --property 42

Subcommands:
  batch   one-shot materialization: sequences parquet -> edge parquet, plus —
          when --vocab is given — the presentation output selected by --mode
          (N-Triples text for RDF/OWL, compacted TSV for TSV), mirroring the
          reference's createStream routing (Main.scala:51-78)
  stream  incremental: watch an input dir, run the exactly-once micro-batch
          pipeline with checkpoint/resume
  session watermark-gated session-closure stream over event parquet files
          (user_id, ts, child, parent): emit-once per-session transitive
          closure with optional --max-session-seconds duration cap

Boolean options take explicit true/false values (the reference's BoolValue
args, Config.scala:96-127), so defaults can be true (e.g.
--reflexive-subclasses defaults true, pass `false` to disable).
"""

from __future__ import annotations

import argparse
import sys


def _parse_bool(v: str) -> bool:
    lv = v.lower()
    if lv in ("true", "1"):
        return True
    if lv in ("false", "0"):
        return False
    raise argparse.ArgumentTypeError(f"expected true|false|1|0, got {v!r}")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="relation-graph-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("batch", "stream"):
        p = sub.add_parser(name)
        p.add_argument("--input", required=True, help="sequences parquet path/dir")
        p.add_argument("--output", required=True, help="output dir")
        p.add_argument(
            "--mode",
            type=lambda s: s.upper(),
            choices=["RDF", "OWL", "TSV"],
            default="RDF",
        )
        # reference defaults: Config.scala:10-52
        p.add_argument("--output-subclasses", type=_parse_bool, default=False,
                       metavar="true|false")
        p.add_argument("--reflexive-subclasses", type=_parse_bool, default=True,
                       metavar="true|false")
        p.add_argument("--equivalence-as-subclass", type=_parse_bool, default=True,
                       metavar="true|false")
        p.add_argument("--output-classes", type=_parse_bool, default=True,
                       metavar="true|false")
        p.add_argument("--output-individuals", type=_parse_bool, default=False,
                       metavar="true|false")
        p.add_argument("--disable-owl-nothing", type=_parse_bool, default=False,
                       metavar="true|false")
        p.add_argument("--property", type=int, action="append", default=None,
                       help="restrict to property token (repeatable)")
        p.add_argument("--properties-file", default=None,
                       help="file with one property token per line")
        p.add_argument("--vocab", default=None,
                       help="token->IRI vocabulary parquet (enables the "
                            "RDF/OWL/TSV presentation output)")
        p.add_argument("--prefixes", default=None,
                       help="YAML prefix map for TSV compaction "
                            "(reference Main.scala:90-97)")
        p.add_argument("--obo-prefixes", type=_parse_bool, default=True,
                       metavar="true|false",
                       help="compact OBO-style IRIs regardless of prefix file")
        p.add_argument("--master", default=None)
        p.add_argument("--shuffle-partitions", type=int, default=None)
        # reference Config.scala:50-52 (verbose flag -> log level)
        p.add_argument("--verbose", type=_parse_bool, default=False,
                       metavar="true|false",
                       help="INFO-level Spark logging (reference --verbose)")
    sp = sub.choices["stream"]
    sp.add_argument("--watermark-seconds", type=int, default=3600)
    sp.add_argument("--max-files-per-trigger", type=int, default=1)
    # out-of-band sink maintenance (size-tiered merges off the stream's
    # critical path — the analog of scheduling Iceberg rewrite_data_files /
    # expire_snapshots from a maintenance job, iceberg_sink.maintenance_sql)
    np = sub.add_parser("session")
    np.add_argument("--input", required=True,
                    help="event parquet files dir (user_id, ts, child, parent)")
    np.add_argument("--work-dir", required=True,
                    help="state + checkpoint + sink root")
    np.add_argument("--gap", default="30 minutes",
                    help="session inactivity gap (Spark interval string)")
    np.add_argument("--delay-seconds", type=int, default=0,
                    help="watermark delay for late rows")
    np.add_argument("--max-session-seconds", type=float, default=None,
                    help="duration cap: force-split never-idle sessions into "
                         "greedy <= cap chunks (bounds open state per key)")
    np.add_argument("--max-split-rounds", type=int, default=64,
                    help="convergence bound for the duration split: raise it "
                         "when a bootstrap batch's longest session spans more "
                         "than this many caps")
    np.add_argument("--max-files-per-trigger", type=int, default=1)
    np.add_argument("--master", default=None)
    np.add_argument("--shuffle-partitions", type=int, default=None)
    np.add_argument("--verbose", type=_parse_bool, default=False,
                    metavar="true|false")

    mp = sub.add_parser("maintain")
    mp.add_argument("--sink", required=True, help="sink root dir")
    mp.add_argument("--told", default=None,
                    help="told-trail root dir (optional: merge trail dirs)")
    mp.add_argument("--rounds", type=int, default=1,
                    help="number of maintenance passes (0 = run forever)")
    mp.add_argument("--interval-seconds", type=float, default=30.0,
                    help="sleep between passes")
    mp.add_argument("--master", default=None)
    mp.add_argument("--shuffle-partitions", type=int, default=None)
    mp.add_argument("--verbose", type=_parse_bool, default=False,
                    metavar="true|false")
    return ap


def read_prefixes_yaml(path: str) -> dict[str, str]:
    """Flat YAML dictionary prefix -> namespace (reference readPrefixesFile,
    Main.scala:90-97)."""
    import yaml

    with open(path) as fh:
        data = yaml.safe_load(fh) or {}
    if not isinstance(data, dict):
        raise ValueError(f"prefixes file {path} must be a YAML dictionary")
    return {str(k): str(v) for k, v in data.items()}


def config_from_args(args, spark=None) -> "RGConfig":
    from relation_graph_spark.config import OutputMode, RGConfig

    props = set(args.property or [])
    iri_props: list[str] = []
    if args.properties_file:
        with open(args.properties_file) as fh:
            # trim + skip blanks (reference Main.scala:87); lines may be
            # int tokens or IRIs (the reference's shape) — IRIs resolve
            # through the --vocab dictionary
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    props.add(int(line))
                except ValueError:
                    iri_props.append(line)
    if iri_props:
        if spark is None or not args.vocab:
            raise SystemExit(
                "properties-file contains IRIs; pass --vocab to resolve them"
            )
        vocab = spark.read.parquet(args.vocab)
        resolved = {
            r["iri"]: r["token"]
            for r in vocab.where(vocab["iri"].isin(iri_props)).collect()
        }
        # undefined property IRIs are tolerated, like the reference's
        # 'nonexistent' test property (TestRelationGraph.scala:58-67): they
        # restrict to nothing rather than erroring
        props |= {resolved[i] for i in iri_props if i in resolved}
        props |= {-1 for i in iri_props if i not in resolved}  # impossible token
    return RGConfig(
        mode=OutputMode(args.mode),
        output_subclasses=args.output_subclasses,
        reflexive_subclasses=args.reflexive_subclasses,
        equivalence_as_subclass=args.equivalence_as_subclass,
        output_classes=args.output_classes,
        output_individuals=args.output_individuals,
        disable_owl_nothing=args.disable_owl_nothing,
        properties=frozenset(props) if props else None,
    )


def _write_presentation(spark, args, cfg, edges_kind) -> None:
    """Route ALREADY-materialized edges (s, p, o, kind) through the
    presentation sink selected by --mode (reference Main.scala:51-78):
    RDF/OWL -> N-Triples text, TSV -> prefix-compacted TSV. Takes the frames
    the batch run already computed — the fixpoint runs exactly once."""
    from relation_graph_spark.config import OutputMode
    from relation_graph_spark.materialize import present_edges
    from relation_graph_spark.sinks import to_ntriples_file, to_tsv_file

    vocab = spark.read.parquet(args.vocab)
    prefixes = read_prefixes_yaml(args.prefixes) if args.prefixes else {}
    presented = present_edges(
        edges_kind, cfg, vocab, prefixes=prefixes, obo_prefixes=args.obo_prefixes
    )
    if cfg.mode == OutputMode.TSV:
        to_tsv_file(presented, f"{args.output}/triples_tsv")
    else:
        to_ntriples_file(presented, f"{args.output}/triples_nt")


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    from relation_graph_spark.session import get_spark

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(
        f"rgs-{args.cmd}", master=args.master, shuffle_partitions=args.shuffle_partitions
    )
    spark.sparkContext.setLogLevel("INFO" if args.verbose else "ERROR")

    if args.cmd == "session":
        from relation_graph_spark.streaming.session_pipeline import (
            SessionClosureStreamJob,
        )

        job = SessionClosureStreamJob(
            spark,
            args.input,
            args.work_dir,
            gap=args.gap,
            delay_seconds=args.delay_seconds,
            max_session_seconds=args.max_session_seconds,
            max_split_rounds=args.max_split_rounds,
        )
        job.run_available(max_files_per_trigger=args.max_files_per_trigger)
        ms = job.metrics()
        last = ms[-1] if ms else {}
        print(
            f"session stream: {last.get('n_sessions_finalized_total', 0)} "
            f"sessions finalized "
            f"({last.get('n_sessions_forced_split_total', 0)} by the "
            f"duration cap), watermark {last.get('hwm_epoch')}"
        )
        if not preexisting:
            spark.stop()
        return 0

    if args.cmd == "maintain":
        import time

        from relation_graph_spark.sinks import IdempotentParquetSink

        # n_buckets=None adopts the sink's pinned bucket layout
        sink = IdempotentParquetSink(spark, args.sink, n_buckets=None)
        told = None
        if args.told:
            from relation_graph_spark.told_trail import ToldTrail

            told = ToldTrail(spark, args.told)
        rnd = 0
        while True:
            actions = sink.compact()
            if told is not None and told.compact():
                actions.append("told-merge")
            print(f"maintain pass {rnd}: {actions or ['noop']}")
            rnd += 1
            if args.rounds and rnd >= args.rounds:
                break
            time.sleep(args.interval_seconds)
        if not preexisting:
            spark.stop()
        return 0

    cfg = config_from_args(args, spark=spark)

    if args.cmd == "batch":
        from relation_graph_spark.decode import decode_axioms, told_tables
        from relation_graph_spark.hashing import with_edge_hash
        from relation_graph_spark.materialize import assemble_output, materialize_edges

        seq = spark.read.parquet(args.input)
        # ONE materialization feeds both the edge parquet and the optional
        # presentation sink (kind column dropped from the parquet output)
        told = told_tables(decode_axioms(seq))
        edges_kind = assemble_output(
            materialize_edges(told, cfg), cfg, with_kind=True
        ).localCheckpoint(eager=False)
        edges = with_edge_hash(edges_kind.select("s", "p", "o"))
        edges.write.mode("overwrite").parquet(f"{args.output}/edges")
        if args.vocab:
            _write_presentation(spark, args, cfg, edges_kind)
        elif cfg.mode.value != "RDF":
            print(
                f"note: --mode {cfg.mode.value} text output needs --vocab; "
                "wrote token-edge parquet only",
                file=sys.stderr,
            )
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
