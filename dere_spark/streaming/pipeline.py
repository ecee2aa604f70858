"""Structured Streaming ingestion for the KG pipeline.

The reference is batch-only (SURVEY §2.11), so streaming semantics are ours
to define, and the natural cut is exactly what the survey proposes:
``readStream`` on the documents table + ``foreachBatch`` running the SAME
staged batch plan per micro-batch, appending to the triples table. One code
path for batch and streaming — no drift between the two.

Also included: a watermarked event-time windowed aggregation over the
`events` stream (the canonical late-data pattern — 10-minute tumbling
windows, 30-minute watermark), since production corpora arrive with
`warc_ts` event time.
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

DOCUMENTS_DDL = "doc_id string, text string, lang string, source string, n_chars long"


def stream_extract_triples(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """readStream(parquet documents) -> foreachBatch(batch KG plan) ->
    append parquet triples.

    `available_now=True` drains everything currently in the source then
    stops — the test/backfill trigger; production uses processingTime.
    foreachBatch gives exactly-once appends via the streaming checkpoint
    (offsets + commit log), complementing the stage-level manifests.
    """
    from dere_spark.operators.frames import assemble_frames, best_fillers, score_pairs
    from dere_spark.operators.pairs import candidate_pairs, whitelist_df
    from dere_spark.operators.spans import detect_spans, gazetteer_df
    from dere_spark.operators.tokenize import tokenize
    from dere_spark.operators.triples import entity_dictionary, frames_to_triples
    from dere_spark.webtext import (
        ENTITY_ALIASES,
        GAZETTEERS,
        MAX_TOKEN_DISTANCE,
        webtext_plan,
    )

    plan = webtext_plan()
    gaz = gazetteer_df(spark, GAZETTEERS)
    wl = whitelist_df(spark, plan)
    dictionary = entity_dictionary(spark, ENTITY_ALIASES)

    stream = (
        spark.readStream.schema(DOCUMENTS_DDL).parquet(source_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select(
            F.col("doc_id").cast("string").alias("doc_id"), "text", "lang", "source"
        )
        tokens = tokenize(docs)
        spans = detect_spans(tokens, gaz)
        pairs = candidate_pairs(spans, wl, MAX_TOKEN_DISTANCE)
        frames = assemble_frames(best_fillers(score_pairs(pairs)), plan)
        triples = frames_to_triples(frames, dictionary)
        triples.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            output_dir
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (late-data-safe).

    events_stream must carry an event-time `ts`; rows later than the
    watermark are dropped, everything else lands in its event-time window.
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
