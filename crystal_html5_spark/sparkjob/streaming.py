"""Structured Streaming extraction.

Continuous ingest variant of the batch pipeline: file-source stream of page
captures -> watermarked duplicate-capture drop -> the same Arrow-vectorized
extract UDF -> parquet sink with checkpointed exactly-once progress (the
streaming counterpart of the batch job's anti-join resume).

The latest-capture-wins window of the batch job is not expressible in a
stream (it would need unbounded state); the streaming contract is instead
exactly-once per (url, warc_ts) capture within the watermark, with
downstream compaction picking the latest capture at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract_job import DEFAULT_MAX_DOC_BYTES, RESULT_SCHEMA_DDL, make_extract_fn
from .pages import PAGES_SCHEMA_DDL


def stream_pages(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_extract(pages: DataFrame,
                   max_doc_bytes: int = DEFAULT_MAX_DOC_BYTES,
                   watermark: str | None = None) -> DataFrame:
    """Dedup repeated (url, warc_ts) captures, then extract via the same
    mapInArrow core as the batch job.

    Web-archive captures arrive with arbitrary event times (a recrawl may
    carry a timestamp days ahead of a backfill), so the default is
    state-based dropDuplicates without a watermark — correct for
    availableNow compaction-style runs where the checkpoint bounds state
    lifetime.  Pass a watermark only for feeds with bounded event-time
    disorder."""
    cols = pages.select("url", "warc_ts", "html")
    if watermark is not None:
        cols = cols.withWatermark("warc_ts", watermark)
    deduped = cols.dropDuplicates(["url", "warc_ts"])
    return deduped.mapInArrow(make_extract_fn(max_doc_bytes),
                              RESULT_SCHEMA_DDL)


def start_stream(spark: SparkSession, input_dir: str, output_dir: str,
                 checkpoint_dir: str, available_now: bool = True,
                 max_doc_bytes: int = DEFAULT_MAX_DOC_BYTES):
    """Start (or resume, via the checkpoint) the extraction stream."""
    out = stream_extract(stream_pages(spark, input_dir),
                         max_doc_bytes=max_doc_bytes)
    writer = (
        out.withColumn("batch_ts", F.current_timestamp())
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
