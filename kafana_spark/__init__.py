"""kafana_spark — a PySpark-native log/event analytics engine.

Re-implements, Spark-first, the capability set of the reference system
(FrederikS/kafana: Kafka -> Kafka Connect SMT chain -> Elasticsearch ->
Kibana):

- ingest: streaming/batch enrichment of keyed records into an indexed,
  append-only changelog store (``kafana_spark.ingest``, ``.store``)
- query: discover / search / aggregate API over the store
  (``kafana_spark.query``)
- extensions: LLM-data-pipeline operators — dedup, similarity search,
  text analysis, multimodal plumbing (``kafana_spark.operators``)

Everything is expressed as DataFrame transformations so Catalyst can
optimize (pushdown, pruning, broadcast, AQE); Python UDFs are used only
where built-ins cannot express the semantics, and then always as
Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from kafana_spark.session import get_spark  # noqa: F401
