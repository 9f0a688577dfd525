"""cdc_cascade_spark — a PySpark-native analytics + CDC-stream engine.

Spark-first re-expression of the capabilities of the reference system
``tr1sm0s1n/cdc-cascade`` (a Postgres→Debezium→Kafka→Redis CDC pipeline,
see SURVEY.md), extended with a batch relational layer and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing), all designed for 100 TB scale:

- declarative DataFrame/SQL plans (Catalyst handles pushdown/pruning),
- broadcast joins for dimension tables, shuffle-minimal aggregations,
- Structured Streaming + checkpointing for the CDC core,
- Arrow-batched Pandas UDFs only where built-ins cannot express semantics.
"""

__version__ = "0.1.0"
