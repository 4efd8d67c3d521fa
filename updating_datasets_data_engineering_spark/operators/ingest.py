"""Kafka-shaped ingest: binary (key, value) records -> typed shot rows.

Reference pipeline (scripts/spark_processing.py:68-135) does
cast -> from_json -> flatten -> 10 Python UDFs.  Here the same logical
steps are declarative and UDF-free, so the whole parse+enrich is one
codegen stage; the identical combinator runs under ``readStream`` for
the streaming path (streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import play_parser

# 9-field raw shot-event schema.  The reference declares all-string
# (scripts/spark_processing.py:77-88); we keep the raw fields string at
# parse time for fidelity and add typed projections afterwards.
SHOT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.StringType()),
        T.StructField("year", T.StringType()),
        T.StructField("month", T.StringType()),
        T.StructField("day", T.StringType()),
        T.StructField("winner", T.StringType()),
        T.StructField("loser", T.StringType()),
        T.StructField("x", T.StringType()),
        T.StructField("y", T.StringType()),
        T.StructField("play", T.StringType()),
    ]
)


def parse_shot_events(records: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka-record DataFrame -> 9-column raw shot rows.

    Mirrors P1-P3 (scripts/spark_processing.py:90-92) plus the
    malformed-row guard the reference lacks: rows whose value fails
    ``from_json`` are dropped instead of poisoning downstream parsing.
    """
    parsed = (
        records.select(F.col(value_col).cast("string").alias("value"))
        .select(F.from_json("value", SHOT_EVENT_SCHEMA).alias("r"))
        .where(F.col("r").isNotNull() & F.col("r.play").isNotNull())
    )
    return parsed.select("r.*")


def enrich_shot_events(raw: DataFrame) -> DataFrame:
    """Raw 9-column rows -> 18-column enriched rows (native expressions)."""
    return play_parser.enrich(raw)


def typed_shot_events(enriched: DataFrame) -> DataFrame:
    """Engine extension: the typed projection the reference never does
    (SURVEY.md §1.4) — real DATE/INT columns for analytics."""
    return enriched.withColumns(
        {
            "game_date": F.to_date(
                F.concat_ws("-", F.col("year"), F.lpad("month", 2, "0"), F.lpad("day", 2, "0"))
            ),
            "x_int": F.col("x").cast("int"),
            "y_int": F.col("y").cast("int"),
            "winner_score_int": F.col("winner_score").cast("int"),
            "loser_score_int": F.col("loser_score").cast("int"),
            "seconds_remaining": play_parser.seconds_remaining(F.col("play")),
            "distance_ft": play_parser.distance_ft(F.col("play")),
        }
    )


def ingest_pipeline(records: DataFrame) -> DataFrame:
    """Full ingest: records -> parsed -> enriched (batch or streaming)."""
    return enrich_shot_events(parse_shot_events(records))


def read_kafka_batch(spark, brokers: str, topic: str) -> DataFrame:
    """Batch Kafka scan (reference: scripts/spark_processing.py:43-65).
    Untestable in this container (no broker) but the option surface is
    the engine's Kafka contract; offset bounds enable scan pruning."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )


def read_kafka_stream(spark, brokers: str, topic: str, starting_offsets: str = "earliest") -> DataFrame:
    """Streaming Kafka scan — the durable-offset replacement for the
    reference's delete-and-recreate topic lifecycle
    (dags/kafka_stream_dag.py:41-45): checkpointed offsets mean the
    topic is a durable log, not a transient buffer."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
