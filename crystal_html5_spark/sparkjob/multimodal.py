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
    from . import io as tableio
    docs = tableio.read_table(spark, f"{sf_dir}/documents.parquet")
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
    """Arrow-batched feature extraction over the binary column.

    The stub (no real decoder) path is fully vectorized: one
    concatenation + np.add.reduceat over stripe boundaries computes every
    row's per-stripe byte means without a Python loop — the shape a real
    vectorized decoder integration should keep.  With PIL present the
    per-row decode loop is unavoidable (codec calls), and only then."""

    def feats(iterator):
        import numpy as np
        import pandas as pd

        try:  # pragma: no cover — PIL not present in this container
            from PIL import Image  # noqa: F401
            have_pil = True
        except Exception:  # noqa: BLE001
            have_pil = False

        k = feature_dim
        for pdf in iterator:
            blobs = [bytes(b) if b is not None else b"" for b in pdf["media"]]
            n_rows = len(blobs)
            lens = np.fromiter((len(b) for b in blobs), dtype=np.int64,
                               count=n_rows)
            feat_mat = np.zeros((n_rows, k), dtype=np.float64)
            if n_rows and lens.sum() > 0:
                cat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
                offsets = np.concatenate(
                    ([0], np.cumsum(lens)[:-1])).astype(np.int64)
                # np.array_split boundaries: first (len % k) stripes get
                # one extra byte
                q, r = np.divmod(lens, k)
                j = np.arange(k, dtype=np.int64)
                starts = (offsets[:, None] + j[None, :] * q[:, None]
                          + np.minimum(j[None, :], r[:, None]))
                sizes = q[:, None] + (j[None, :] < r[:, None])
                flat = starts.ravel()
                sums = np.add.reduceat(
                    cat.astype(np.int64), np.minimum(flat, cat.size - 1))
                sums = sums.reshape(n_rows, k)
                nz = sizes > 0
                feat_mat[nz] = sums[nz] / sizes[nz]
            firsts = np.where(
                lens > 0,
                np.fromiter((b[0] if b else 0 for b in blobs),
                            dtype=np.int64, count=n_rows), 0)
            lasts = np.where(
                lens > 0,
                np.fromiter((b[-1] if b else 0 for b in blobs),
                            dtype=np.int64, count=n_rows), 0)
            if have_pil:  # pragma: no cover — real-decoder slow path
                metas = [decode_image(b) for b in blobs]
                decoder = [m["decoder"] for m in metas]
                width = [m["width"] for m in metas]
                height = [m["height"] for m in metas]
            else:
                decoder = ["fake"] * n_rows
                width = (1 + firsts).tolist()
                height = (1 + lasts).tolist()
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_len": lens.astype("int32"),
                "decoder": decoder,
                "width": np.asarray(width, dtype="int32"),
                "height": np.asarray(height, dtype="int32"),
                "feature": [row.tolist() for row in feat_mat],
            })

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
