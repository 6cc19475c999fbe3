"""Multimodal column plumbing: opaque binary media + typed metadata.

Pattern for image/audio/video columns at 100 TB: media stays an opaque
``binary`` column with a mime/meta struct; decode / feature-extraction /
resize run as Arrow-batched ``mapInPandas``/``mapInArrow`` UDFs.  Real
codecs (PIL/ffmpeg) are not in this container, so the decode step is
STUBBED behind ``decode_image``: if a real decoder is importable it is
used, otherwise a clearly-marked deterministic fake produces stable
pseudo-features — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA_DDL = "doc_id bigint, media binary, mime string"
FEATURE_SCHEMA_DDL = (
    "doc_id bigint, media_len int, decoder string,"
    " width int, height int, feature array<double>"
)


def synth_media(spark, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media blobs derived from doc ids (stand-in
    for a real image column; no external data)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.expr(
            # repeat the hex string, unhex once: stays BinaryType
            "unhex(repeat(md5(cast(doc_id AS string)), 64))"
        ).alias("media"),
        F.lit("image/fake").alias("mime"),
    )


def decode_image(data: bytes) -> dict:
    """Decode stub.  Tries a real decoder; otherwise a deterministic fake
    (documented contract: same bytes -> same features)."""
    try:  # pragma: no cover - PIL not present in this container
        from io import BytesIO

        from PIL import Image  # type: ignore

        img = Image.open(BytesIO(data))
        return {
            "decoder": "pil",
            "width": img.width,
            "height": img.height,
        }
    except Exception:  # noqa: BLE001 — deterministic fake path
        n = len(data)
        return {
            "decoder": "fake",
            # fake dimensions derived from content, stable per input
            "width": 1 + (data[0] if n else 0),
            "height": 1 + (data[-1] if n else 0),
        }


def extract_media_features(media: DataFrame,
                           feature_dim: int = 4) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def feats(iterator):
        import numpy as np
        import pandas as pd

        for pdf in iterator:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(blob or b"")
                meta = decode_image(blob)
                arr = np.frombuffer(blob, dtype=np.uint8)
                if arr.size == 0:
                    feat = [0.0] * feature_dim
                else:
                    # deterministic pseudo-features: per-stripe byte means
                    stripes = np.array_split(arr, feature_dim)
                    feat = [float(s.mean()) if s.size else 0.0
                            for s in stripes]
                rows.append((
                    int(doc_id), len(blob), meta["decoder"],
                    meta["width"], meta["height"], feat,
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_len", "decoder", "width",
                         "height", "feature"],
            )

    return media.select("doc_id", "media").mapInPandas(
        feats, FEATURE_SCHEMA_DDL
    )


def media_features_query(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query: synthetic media -> features (rows-only)."""
    out = extract_media_features(synth_media(spark, sf_dir))
    return out.select(
        "doc_id", "media_len", "decoder", "width", "height",
        F.round(F.element_at("feature", 1), 6).alias("f1"),
        F.round(F.element_at("feature", 2), 6).alias("f2"),
    ).orderBy("doc_id")
