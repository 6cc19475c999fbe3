"""Incremental near-duplicate index maintenance.

The 100 TB dedup concern batch queries don't cover: a crawl arrives in
monthly snapshots, and re-minhashing the whole corpus per snapshot is
O(corpus) when the new slice is O(snapshot).  This module maintains a
persistent LSH band index (parquet: doc_id, band_no, band_key) and, per
ingest:

1. anti-joins the incoming docs against the index's doc_ids (only NEW
   docs are shingled/hashed — the expensive part scales with the delta),
2. appends the new docs' bands atomically (write-beside + rename, so a
   crashed ingest never leaves a half-indexed snapshot), and
3. reports the near-dup candidate pairs the new docs created — both
   new-vs-existing and new-vs-new — via one band equi-join against the
   updated index.

The equivalence test pins: ingesting a corpus in two halves yields
byte-identical index content AND the union of reported pairs equals the
batch `docs_near_dup_pairs` on the full corpus.

Band derivation is the SQL minhash family's (queries._mh_prefix), so
index entries are bit-compatible with every batch query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from . import io as tableio
from .queries import _mh_prefix

_INDEX_SUB = "bands"


def _bands_for(spark, docs: DataFrame) -> DataFrame:
    """(doc_id, band_no, band_key) for a docs(doc_id, text) frame via
    the exact SQL derivation the batch queries use."""
    docs.createOrReplaceTempView("documents")
    return spark.sql(
        _mh_prefix("spark", with_bands=True)
        + " SELECT doc_id, band_no, band_key FROM bands")


def index_path(index_dir: str) -> str:
    return os.path.join(index_dir, _INDEX_SUB)


def ingest(spark, docs: DataFrame, index_dir: str) -> DataFrame:
    """Ingest a snapshot: index only docs not yet present, append their
    bands, and return the candidate pairs (doc_a < doc_b, n_bands_agree)
    that involve at least one newly ingested doc."""
    import glob as _glob

    path = index_path(index_dir)
    exists = bool(_glob.glob(os.path.join(path, "delta-*")))
    if exists:
        existing = spark.read.parquet(os.path.join(path, "delta-*"))
        new_docs = docs.join(
            existing.select("doc_id").distinct(), "doc_id", "left_anti")
    else:
        new_docs = docs
    new_bands = _bands_for(spark, new_docs).localCheckpoint(eager=True)
    if new_bands.isEmpty():
        # nothing new (e.g. a replayed snapshot): the index is already
        # complete and no new pair can exist — write nothing (an empty
        # parquet delta would be schema-less and break dataset reads)
        return spark.createDataFrame(
            [], "doc_a long, doc_b long, n_bands_agree bigint")

    # atomic append: write the delta beside, then move it into the
    # dataset directory (parquet datasets are directories of files; a
    # crashed ingest leaves only a .tmp dir the next run overwrites)
    tmp = path + ".delta.tmp"
    new_bands.write.mode("overwrite").parquet(tmp)
    os.makedirs(path, exist_ok=True)
    import glob
    import shutil

    stamp = len(glob.glob(os.path.join(path, "delta-*")))
    dest = os.path.join(path, f"delta-{stamp:05d}")
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.replace(tmp, dest)

    full = spark.read.parquet(os.path.join(path, "delta-*"))
    new_keys = new_bands.select("band_no", "band_key").distinct()
    # only buckets a NEW doc touched can produce new pairs: prune the
    # full index to those buckets before the self-join (delta-sized
    # probe, not corpus-sized)
    touched = full.join(
        F.broadcast(new_keys), ["band_no", "band_key"])
    pairs = (
        touched.alias("a")
        .join(touched.alias("b"),
              (F.col("a.band_no") == F.col("b.band_no"))
              & (F.col("a.band_key") == F.col("b.band_key"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands_agree"))
    )
    # keep only pairs involving a new doc (old-old pairs in a touched
    # bucket were already reported by the ingest that created them)
    nd = new_bands.select("doc_id").distinct()
    cols = ["doc_a", "doc_b", "n_bands_agree"]
    # semi-joining on a key moves it to the front of the output — fix
    # the column order explicitly before the positional union
    return (
        pairs.join(nd.withColumnRenamed("doc_id", "doc_a"),
                   "doc_a", "left_semi").select(*cols)
        .union(
            pairs.join(nd.withColumnRenamed("doc_id", "doc_b"),
                       "doc_b", "left_semi").select(*cols))
        .distinct()
    )
