"""The production extraction pipeline.

Plan shape (all relational steps are stock Catalyst operators; the parser is
a single vectorized Arrow UDF):

    scan(url, warc_ts, html)            -- column-pruned parquet/Iceberg scan
      -> [anti-join done-keys]          -- checkpoint/resume
      -> latest-capture dedup           -- window on url, desc(warc_ts)
      -> salted repartition             -- host # (xxhash64(url) % salt)
      -> mapInArrow(extract_batches)    -- tokenizer+tree+extract per batch
      -> sink (parquet) + per-partition metrics table

Scale notes (100 TB / 1000 executors):
- The only shuffles are the dedup window and the explicit salted
  repartition; both key on url/host so domain skew is defeated by the salt
  and AQE's skew-join handling covers the residue.
- Filters/column pruning reach the scan (only url, warc_ts, html cross
  into Python over Arrow).
- A single oversize or malformed page becomes an error row, never a task
  failure; `max_doc_bytes` bounds per-document memory.
- Output batches re-batch by accumulated byte size so one 50 MB page amid
  4 KB pages cannot blow up a single Arrow batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RESULT_SCHEMA_DDL = (
    "url string, warc_ts timestamp, text binary, main_text string,"
    " n_nodes int, html_bytes bigint, err string, parse_ms double"
)

DEFAULT_MAX_DOC_BYTES = 64 * 1024 * 1024
_TARGET_OUT_BATCH_BYTES = 32 * 1024 * 1024


def make_extract_fn(max_doc_bytes: int = DEFAULT_MAX_DOC_BYTES,
                    dedup_consecutive: bool = False):
    """Build the mapInArrow function (Iterator[RecordBatch] ->
    Iterator[RecordBatch]); one Python worker per partition, zero per-row
    Python objects crossing the wire.

    With ``dedup_consecutive`` the input is expected sorted by
    (url, warc_ts desc) within the partition; the first row of each url
    group (the latest capture) wins and the rest are skipped — this is the
    single-shuffle dedup path (see run_extract)."""

    def extract_batches(iterator):
        import pyarrow as pa

        from crystal_html5_spark.html5x.extract import extract_document

        last_url = None
        for batch in iterator:
            urls = batch.column("url").to_pylist()
            tss = batch.column("warc_ts")
            htmls = batch.column("html").to_pylist()

            keep_idx: list[int] = []
            acc_bytes = 0
            texts: list[bytes] = []
            mains: list[str] = []
            n_nodes: list[int] = []
            html_bytes: list[int] = []
            errs: list[str] = []
            parse_ms: list[float] = []

            def flush():
                if not keep_idx:
                    return None
                return pa.RecordBatch.from_arrays(
                    [
                        pa.array([urls[i] for i in keep_idx], pa.string()),
                        tss.take(pa.array(keep_idx, pa.int32())),
                        pa.array(texts, pa.binary()),
                        pa.array(mains, pa.string()),
                        pa.array(n_nodes, pa.int32()),
                        pa.array(html_bytes, pa.int64()),
                        pa.array(errs, pa.string()),
                        pa.array(parse_ms, pa.float64()),
                    ],
                    names=[
                        "url", "warc_ts", "text", "main_text", "n_nodes",
                        "html_bytes", "err", "parse_ms",
                    ],
                )

            for i, h in enumerate(htmls):
                u = urls[i]
                if dedup_consecutive:
                    if u == last_url:
                        continue  # older capture of the same url
                    last_url = u
                h = h or b""
                r = extract_document(h, max_doc_bytes=max_doc_bytes)
                keep_idx.append(i)
                texts.append(r["text"])
                mains.append(r["main_text"])
                n_nodes.append(r["n_nodes"])
                html_bytes.append(len(h))
                errs.append(r["err"])
                parse_ms.append(r["parse_ms"])
                acc_bytes += len(h) + len(r["text"])
                if acc_bytes >= _TARGET_OUT_BATCH_BYTES:
                    out = flush()
                    if out is not None:
                        yield out
                    keep_idx = []
                    acc_bytes = 0
                    texts, mains, n_nodes = [], [], []
                    html_bytes, errs, parse_ms = [], [], []
            out = flush()
            if out is not None:
                yield out

    return extract_batches


def dedup_latest_capture(pages: DataFrame) -> DataFrame:
    """Keep the latest (url, warc_ts) capture per url."""
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def salted_repartition(df: DataFrame, num_partitions: int,
                       salt: int | None = None) -> DataFrame:
    """Repartition on host + url-hash salt: keeps per-host grouping for
    cache locality while splitting mega-hosts across `salt` buckets
    (defeats domain skew — north_rule).

    The salt must scale with the parallelism: with a constant salt S, a
    single dominant host can never occupy more than S partitions and adding
    executors stops helping.  Default 4x the partition count so even a
    one-host corpus spreads across every core."""
    if salt is None:
        salt = 4 * num_partitions
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    key = F.concat_ws(
        "#", host,
        F.pmod(F.xxhash64(F.col("url")), F.lit(salt)).cast("string"),
    )
    return df.repartition(num_partitions, key)


def run_extract(
    spark,
    pages: DataFrame,
    num_partitions: int | None = None,
    salt: int | None = None,
    max_doc_bytes: int = DEFAULT_MAX_DOC_BYTES,
    dedup: bool = True,
    done_keys: DataFrame | None = None,
) -> DataFrame:
    """Full pipeline: prune -> [resume-filter ->] dedup -> salt -> extract.

    Hot path (no resume): ONE shuffle.  The salted key is a pure function
    of url, so every capture of a url lands in the same partition; a
    partition-local sort on (url, warc_ts desc) plus skip-consecutive in
    the UDF implements latest-capture dedup without the window's second
    full-data exchange.  The resume path (done_keys) keeps the explicit
    window dedup so the anti-join can run on exact (url, warc_ts) keys
    after it.
    """
    cols = pages.select("url", "warc_ts", "html")
    n = num_partitions or spark.sparkContext.defaultParallelism
    if dedup and done_keys is None:
        salted = salted_repartition(cols, n, salt)
        local_sorted = salted.sortWithinPartitions(
            "url", F.desc("warc_ts")
        )
        return local_sorted.mapInArrow(
            make_extract_fn(max_doc_bytes, dedup_consecutive=True),
            RESULT_SCHEMA_DDL,
        )
    if dedup:
        cols = dedup_latest_capture(cols)
    if done_keys is not None:
        # Resume: drop already-extracted (url, warc_ts) pairs.  Runs after
        # dedup so an older capture of a finished url cannot resurface.
        # No broadcast hint: done_keys grows without bound as extraction
        # progresses, so the join strategy is left to AQE (which picks
        # broadcast while the done set is small and shuffle after).
        cols = cols.join(
            done_keys.select("url", "warc_ts").distinct(),
            ["url", "warc_ts"], "left_anti",
        )
    salted = salted_repartition(cols, n, salt)
    return salted.mapInArrow(make_extract_fn(max_doc_bytes),
                             RESULT_SCHEMA_DDL)


def partition_metrics(extracted: DataFrame) -> DataFrame:
    """Per-partition lineage/metrics table (north_rule: per-partition
    lineage + metrics enabling resume)."""
    return extracted.groupBy(
        F.spark_partition_id().alias("partition_id")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("html_bytes").alias("sum_html_bytes"),
        F.sum(F.length("text")).alias("sum_text_bytes"),
        F.sum("parse_ms").alias("sum_parse_ms"),
        F.sum(F.when(F.col("err") == "", 0).otherwise(1)).alias("n_errors"),
    )


def top_error_pages(extracted: DataFrame, k: int = 20) -> DataFrame:
    """Fixture/error triage report: the k worst pages by error presence
    and size (SURVEY.md §2.8 'fixture top-k error report')."""
    return (
        extracted.filter(F.col("err") != "")
        .select("url", "warc_ts", "err", "html_bytes")
        .orderBy(F.desc("html_bytes"), "url")
        .limit(k)
    )


def write_with_lineage(extracted: DataFrame, out_dir: str) -> None:
    """Idempotent sink: extracted rows + metrics side table, through the
    io seam (Iceberg MERGE INTO keyed on (url, warc_ts) when the runtime
    is present; parquet with a key anti-join otherwise — see io.py)."""
    from crystal_html5_spark.sparkjob import io as tableio

    spark = extracted.sparkSession
    tableio.write_extracted(spark, extracted, out_dir)
    tableio.write_metrics(partition_metrics(extracted), out_dir)


def read_done_keys(spark, out_dir: str) -> DataFrame | None:
    """High-water-mark for resume: keys already extracted (io seam)."""
    from crystal_html5_spark.sparkjob import io as tableio

    return tableio.read_done_keys(spark, out_dir)
