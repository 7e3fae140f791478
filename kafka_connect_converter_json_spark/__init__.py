"""PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
Norsk-Tipping/kafka-connect-converter-json (a Kafka Connect value converter:
deserialize -> identify schema -> extract dotted-path keys -> stringify
logical types -> emit flat struct + JSON payload), generalized into a
Spark-first CDC ingest pipeline:

- vectorized envelope parse + key extraction (``operators.extract``)
- schema identification probes (``operators.identify``)
- logical-type stringification table (``functions.logical_types``)
- additive struct-widening schema registry (``plans.registry``)
- last-writer-wins dedup with skew salting (``operators.dedup``)
- exactly-once idempotent MERGE sink + checkpoint/replay + lineage
  (``streaming.sink``, ``streaming.ingest``)
- training-data-pipeline operators: dedup families, ANN similarity,
  text analysis, multimodal plumbing (``operators.*``)

Reference behavior citations use ``JC`` =
``/root/reference/src/main/java/no/norsktipping/kafka/connect/converter/JsonConverter.java``
and ``JCC``/``TEST`` analogously (see SURVEY.md header).
"""

__version__ = "0.1.0"
