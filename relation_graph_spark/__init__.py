"""relation-graph-spark: a from-scratch PySpark-native streaming graph-closure
engine with the query capabilities of INCATools/relation-graph.

The reference (/root/reference, v2.3.3) materializes OWL existential
relations: for every object property p and named class D, all named classes S
entailed to satisfy ``S SubClassOf (p some D)``, emitted as direct triples
``S p D`` (reference README.md:3). This package re-creates that semantics as
an idiomatic Spark engine:

- batch core: ``materialize.materialize`` — semi-naive fixpoint over
  DataFrames (SURVEY.md section 7.0 rules R1-R4)
- incremental streaming: ``streaming.pipeline`` — micro-batch delta closure
  with watermarks, windows, exactly-once idempotent sink
- training-data ops: ``ops`` — dedup / similarity / text-analysis operators
  for large-scale token pipelines

Nothing here is a translation of the reference's Scala: the reference uses
in-memory hash-map probes on a single JVM (RelationGraph.scala:159-170); we
declare the same logical relations as DataFrame joins and let Catalyst pick
physical strategy (broadcast hash join for hierarchy sides, shuffled join +
AQE for edge-scale sides).
"""

from relation_graph_spark.config import RGConfig
from relation_graph_spark.materialize import materialize
from relation_graph_spark.closure import transitive_closure

__all__ = ["RGConfig", "materialize", "transitive_closure"]
__version__ = "0.1.0"
