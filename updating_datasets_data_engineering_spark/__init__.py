"""updating_datasets_data_engineering_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``theccalderon/updating-datasets-data-engineering``
(a Kafka -> Spark -> S3 continuously-updating shot-event dataset), plus
the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) that a 100 TB deployment
needs.

Design stance (see SURVEY.md §7):
  * DataFrame/SQL first — declare logical plans, let Catalyst pick the
    physical strategy.
  * Every reference Python UDF (spark_processing.py:94-133) becomes a
    native, codegen-friendly column expression (functions.play_parser).
  * Batch and streaming share the same DataFrame->DataFrame combinators;
    the streaming path is the batch path under ``readStream``.
  * Storage is columnar (Parquet); single-file CSV export survives only
    as an explicit export utility (sinks.py).
"""

__version__ = "0.1.0"
