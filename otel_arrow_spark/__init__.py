"""otel_arrow_spark — a brand-new PySpark-native telemetry analytics engine.

Re-expresses the query and data-processing capabilities of the reference
`lalitb/otel-arrow` (OTAP dataflow engine + KQL recordset query engine)
as idiomatic PySpark: DataFrame/SQL plans optimized by Catalyst, vectorized
pandas/Arrow UDFs only where built-ins can't express the semantics, and
Structured Streaming for continuous pipelines.

Subpackages
-----------
- ``fixtures``   deterministic synthetic transcript/catalog generators
- ``parse``      vectorized syslog/CEF/RFC5424 text parsing (receiver analog)
- ``enrich``     broadcast lookup enrichment (attribute-dictionary analog)
- ``router``     deterministic signal-type routing + fan-out sinks
- ``aggregate``  per-sink windowed aggregations
- ``operators``  KQL-subset DataFrame combinators (where/extend/project/summarize)
- ``functions``  KQL scalar function surface mapped onto pyspark.sql.functions
- ``sources``    star-schema (OTAP logs/log_attrs) readers
- ``streaming``  Structured Streaming variant of the pipeline
- ``datapipe``   training-data ops: dedup, similarity search, text analysis
- ``lineage``    per-partition lineage + offset checkpoints + idempotent resume
"""

__version__ = "0.1.0"
