"""Table source/sink seam (north_rule: Iceberg tables of Common-Crawl
style pages).

This container has no iceberg-spark-runtime jar, so the seam selects the
storage backend at runtime instead of hard-coding one:

- **Iceberg available + table identifier**: reads via the catalog
  (``spark.read.table``), sink is ``MERGE INTO`` keyed on
  (url, warc_ts) — natively idempotent, resumable, time-travelable.
- **Otherwise (parquet path)**: reads via ``spark.read.parquet``, sink
  anti-joins the incoming batch against the keys already present before
  appending, so re-running a failed/duplicate batch cannot write
  duplicate rows.  Same contract, weaker isolation (no snapshot commit),
  which is exactly what the resume anti-join in
  ``extract_job.run_extract(done_keys=...)`` covers.

Every production read (pages scan, relational views, embeddings) and the
extraction sink route through these functions: pointing the pipeline at
a real Iceberg catalog is a source-string change, not a code change.

Reference behavior being re-expressed: crystal-html5 reads documents
from files/IO objects (src/html5.cr parse/parse_io entry points); the
table abstraction is the Spark-native equivalent surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MERGE_KEYS = ("url", "warc_ts")


def iceberg_available(spark) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions."
            "IcebergSparkSessionExtensions"
        )
        return True
    except Exception:  # noqa: BLE001 — absent class -> parquet fallback
        return False


def is_table_identifier(source: str) -> bool:
    """Qualified catalog identifier (``cat.db.pages``) vs filesystem
    path.  Only dotted, slash-free names qualify: a bare relative dir
    like ``out`` is a path, so single-part names never reach the
    catalog branch (they would crash ``spark.read.table`` on a plain
    filesystem dest)."""
    return ("/" not in source and "." in source
            and not source.endswith(".parquet"))


def use_catalog(spark, source: str) -> bool:
    """Single gate for EVERY catalog-path branch in this module: the
    name must be a qualified identifier AND the Iceberg runtime must
    actually be on the classpath — otherwise everything (reads, done
    keys, sinks, metrics) falls back to the parquet layout together,
    so no half-catalog state is possible."""
    return is_table_identifier(source) and iceberg_available(spark)


def read_table(spark, source: str) -> DataFrame:
    """THE read seam: catalog table identifiers go through the catalog
    (Iceberg partition pruning, snapshot isolation, metadata-only column
    stats), paths through the parquet reader (column pruning + predicate
    pushdown still apply — both arrive via DataSource V2)."""
    if use_catalog(spark, source):
        return spark.read.table(source)
    return spark.read.parquet(source)


# Split-count probes are a (cheap but nonzero) extra planning pass; the
# answer is a pure function of the file layout and the session's
# parallelism, so memoize per (session, source, parallelism).  This
# caches a PLANNING decision, never data or results.
_SPREAD_MEMO: dict = {}


def spread_small_scan(spark, df: DataFrame, source: str) -> DataFrame:
    """Scale-adaptive scan spreading (optimization guide §2.5 / §6):
    when a file scan yields fewer input splits than the session's
    parallelism — tiny or single-row-group files, like the sf parquet
    inputs — round-robin repartition to defaultParallelism so the heavy
    per-row work downstream (expression chains, Arrow UDF codecs) uses
    every core.  The shuffle moves only the pruned columns of a
    sub-split-size table; at real scale the scan already has >=
    parallelism splits and the frame is returned unchanged (no exchange
    in the plan)."""
    p = spark.sparkContext.defaultParallelism
    key = (spark, source, p)
    if key not in _SPREAD_MEMO:
        try:
            _SPREAD_MEMO[key] = df.rdd.getNumPartitions() < p
        except Exception:  # noqa: BLE001 — planning failure: no spread
            _SPREAD_MEMO[key] = False
    return df.repartition(p) if _SPREAD_MEMO[key] else df


def read_pages(spark, source: str) -> DataFrame:
    """The pages scan, pruned to the pipeline's input columns so only
    (url, warc_ts, html) survive into the physical scan."""
    return read_table(spark, source).select("url", "warc_ts", "html")


def merge_into_sql(dest: str, view: str,
                   keys: tuple = MERGE_KEYS) -> str:
    """Idempotent Iceberg sink statement, keyed on the capture identity."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return (
        f"MERGE INTO {dest} t USING {view} s ON {on} "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def read_done_keys(spark, dest: str) -> DataFrame | None:
    """Keys already durable at the sink (high-water mark for resume)."""
    try:
        if use_catalog(spark, dest):
            done = spark.read.table(dest)
        else:
            done = spark.read.parquet(f"{dest}/extracted")
        return done.select(*MERGE_KEYS)
    except Exception:  # noqa: BLE001 — first run: nothing done yet
        return None


def write_extracted(spark, extracted: DataFrame, dest: str) -> None:
    """THE sink seam — idempotent under re-delivery of the same batch.

    Iceberg: one atomic MERGE INTO commit (concurrent writers serialize
    on the snapshot; a retried batch matches on (url, warc_ts) and
    inserts nothing).  Parquet: anti-join the incoming batch against the
    keys already on disk, then append — a retried batch writes zero rows.
    The anti-join reads only the two key columns (column-pruned scan),
    and AQE picks broadcast while the done-set is small.

    The session is derived from the frame itself when possible:
    Structured Streaming's foreachBatch hands a DataFrame bound to a
    per-micro-batch CLONED session, and the MERGE temp view is only
    visible to ``spark.sql`` on that same clone — using a captured
    outer-driver session here would fail every micro-batch once
    Iceberg is present.
    """
    spark = getattr(extracted, "sparkSession", None) or spark
    if "batch_ts" not in extracted.columns:
        # Stamped HERE, in the seam, so every writer of a dest (batch
        # job, idempotent streaming sink) produces the same schema —
        # mixed-schema parquet under one directory reads back
        # non-deterministically, and an Iceberg MERGE INSERT * fails
        # outright on a column-count mismatch.
        extracted = extracted.withColumn(
            "batch_ts", F.current_timestamp())
    if use_catalog(spark, dest):
        if not spark.catalog.tableExists(dest):
            extracted.writeTo(dest).create()
            return
        view = "_incoming_extracted"
        extracted.createOrReplaceTempView(view)
        spark.sql(merge_into_sql(dest, view))
        return
    done = read_done_keys(spark, dest)
    if done is not None:
        extracted = extracted.join(
            done.distinct(), list(MERGE_KEYS), "left_anti"
        )
    extracted.write.mode("append").parquet(f"{dest}/extracted")


def compact_latest(spark, dest: str) -> int:
    """Offline compaction: rewrite the extracted table keeping only the
    LATEST capture per url (the read-time contract the streaming sink
    defers — exactly-once per (url, warc_ts) capture lands everything;
    this maintenance job collapses recrawls).  Returns rows kept.

    Iceberg: one atomic ``CREATE OR REPLACE TABLE AS`` snapshot commit
    (at real scale this is the backend to use — compaction rides the
    catalog's transactional swap).  Parquet: LOCAL filesystems only
    (loudly rejected otherwise — os renames cannot address object
    stores): write the compacted data beside the live directory, then a
    two-rename swap.  A crash between the renames is self-healed on the
    next call (the previous directory is restored before compacting),
    so a re-run after any outcome converges; there remains a sub-second
    reader-visible window, so run it offline as any non-transactional
    rewrite.  Ties on (url, warc_ts) break on the later batch_ts (when
    present), so re-runs are idempotent and deterministic."""
    import os
    import shutil

    from pyspark.sql import Window

    if use_catalog(spark, dest):
        # batch_ts is stamped by write_extracted, but tolerate legacy
        # tables without it (the parquet branch's guard, mirrored).
        cols = spark.read.table(dest).columns
        order = "warc_ts DESC" + (", batch_ts DESC"
                                  if "batch_ts" in cols else "")
        spark.sql(
            f"CREATE OR REPLACE TABLE {dest} AS "
            f"SELECT * EXCEPT (_rn) FROM (SELECT t.*, ROW_NUMBER() OVER ("
            f"PARTITION BY url ORDER BY {order}) AS _rn"
            f" FROM {dest} t) WHERE _rn = 1"
        )
        return spark.read.table(dest).count()

    if "://" in dest:
        raise ValueError(
            "parquet compaction swaps directories with local renames;"
            f" for remote storage ({dest!r}) use the Iceberg backend")
    src = f"{dest}/extracted"
    old = f"{dest}/extracted.old"
    if not os.path.exists(src) and os.path.exists(old):
        os.rename(old, src)  # heal a crash between a prior run's renames
    df = spark.read.parquet(src)
    order = [F.desc("warc_ts")]
    if "batch_ts" in df.columns:
        order.append(F.desc("batch_ts"))
    w = Window.partitionBy("url").orderBy(*order)
    latest = (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))
    tmp = f"{dest}/extracted.compact.tmp"
    latest.write.mode("overwrite").parquet(tmp)
    kept = spark.read.parquet(tmp).count()
    shutil.rmtree(old, ignore_errors=True)
    os.rename(src, old)
    os.rename(tmp, src)
    shutil.rmtree(old)
    return kept


def write_metrics(metrics: DataFrame, dest: str) -> None:
    """Per-batch lineage/metrics side table (append-only by design:
    each batch's row is a lineage fact, not state)."""
    stamped = metrics.withColumn("batch_ts", F.current_timestamp())
    if use_catalog(metrics.sparkSession, dest):
        stamped.writeTo(f"{dest}_metrics").append()
        return
    stamped.write.mode("append").parquet(f"{dest}/metrics")
